"""CDC merge: apply a keyed changelog (insert/update/delete rows with a
version) onto a base snapshot — the batch MERGE INTO a lakehouse pipeline
runs to roll a table forward, expressed engine-native.

Scale shape: exactly two key-shuffles, no driver involvement —
1. latest-change-per-key: window ``row_number`` over (key / version desc)
   on the changes side only (one hash exchange of the CHANGES, which are
   normally ≪ base);
2. base ⟗ latest-changes full-outer equi-join on the key. The window
   already hash-partitioned changes on the key, so Catalyst reuses that
   exchange for the join — the base is shuffled once, the changes once.
The per-key merge rule is a codegen'd CASE projection (change wins, 'D'
drops the key, untouched base rows pass through).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Roll ``base`` forward by ``changes``.

    ``changes`` carries the key columns, every value column of ``base``,
    an ``op_col`` in {'I','U','D'}, and a ``version_col`` that totally
    orders changes within a key (caller guarantees uniqueness per key —
    the usual CDC log offset). The highest version wins; a winning 'D'
    removes the key; 'I'/'U' replace the row wholesale ('I' on an
    existing key behaves as upsert, 'U' on an absent key inserts — the
    lenient MERGE semantics a log-replay needs).
    """
    keys = list(keys)
    value_cols = [c for c in base.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", version_col)
    )
    joined = base.alias("b").join(latest.alias("c"), on=keys, how="full_outer")
    changed = F.col(f"c.{op_col}").isNotNull()
    merged = [
        F.when(changed, F.col(f"c.{v}")).otherwise(F.col(f"b.{v}")).alias(v)
        for v in value_cols
    ]
    return (
        joined.filter(~changed | (F.col(f"c.{op_col}") != "D"))
        .select(*keys, *merged)
    )
