"""Column profiling: the data-quality pass a pipeline runs over a new
source before training on it — per column: row count, null count,
distinct count, min, max — in ONE aggregation pass over the data.

Scale shape: a single partial+final hash aggregate (no per-column jobs,
no driver loop). With ``exact=True`` the multiple COUNT(DISTINCT)s make
Catalyst plan one Expand (input ×k columns) feeding the aggregate — the
standard multi-distinct strategy, fine into the tens of columns. At very
wide schemas or 100 TB inputs, ``exact=False`` switches to
``approx_count_distinct`` (HLL), which needs no Expand at all: one pass,
one shuffle of k sketches per partition.

The per-column results land as one row each via a single explode of an
array of structs over the 1-row aggregate — no union of k scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = True
) -> DataFrame:
    """One row per profiled column: ``col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val`` (min/max rendered as strings so the
    output schema is uniform across column types; pre-project timestamps /
    doubles to deterministic forms if cross-engine bit-stability matters —
    helpers.py rules 1 and 4)."""
    cols = list(cols if cols is not None else df.columns)
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            # SUM over zero rows is NULL; a profile of an empty frame
            # should say 0 nulls, not unknown
            F.coalesce(F.sum(col.isNull().cast("long")), F.lit(0)).alias(f"__nulls_{i}"),
            distinct(col).alias(f"__distinct_{i}"),
            F.min(col).cast("string").alias(f"__min_{i}"),
            F.max(col).cast("string").alias(f"__max_{i}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nulls_{i}").alias("n_nulls"),
            F.col(f"__distinct_{i}").cast("long").alias("n_distinct"),
            F.col(f"__min_{i}").alias("min_val"),
            F.col(f"__max_{i}").alias("max_val"),
        )
        for i, c in enumerate(cols)
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
