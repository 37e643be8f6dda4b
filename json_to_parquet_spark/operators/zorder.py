"""Z-order (Morton) clustering: interleave the bits of two dimension
columns into one sort key, so range-partitioning + sorting on the key
co-locates rows that are close in BOTH dimensions. Row-group min/max
stats then prune scans filtered on either dimension — the multi-column
generalization of the convert pipeline's single-column sorted layout
(the technique popularized by Delta/Iceberg OPTIMIZE ZORDER).

The key is a pure JVM expression (shift/mask/or fold — no UDF), so
clustering is one range exchange exactly like a plain sort."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits kept per dimension → 32-bit interleaved key


def _bits(col: Column) -> Column:
    """Clamp a non-negative integral column into ZBITS bits."""
    return col.cast("long").bitwiseAND(F.lit((1 << ZBITS) - 1))


def morton_key(x: Column | str, y: Column | str) -> Column:
    """Interleave the low ZBITS bits of x (even positions) and y (odd)."""
    xb = _bits(F.col(x) if isinstance(x, str) else x)
    yb = _bits(F.col(y) if isinstance(y, str) else y)
    terms = []
    for i in range(ZBITS):
        terms.append(F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def write_zordered(
    df: DataFrame, dest: str, x: str, y: str, n_files: int | None = None
) -> None:
    """Write ``df`` clustered by the (x, y) Morton key: one range exchange
    on the key, per-file sorted — downstream scans filtering on either
    dimension prune row groups via min/max stats."""
    keyed = df.withColumn("__zkey", morton_key(x, y))
    parts = (
        keyed.repartitionByRange(n_files, F.asc("__zkey"))
        if n_files
        else keyed.repartitionByRange(F.asc("__zkey"))
    )
    parts.sortWithinPartitions(F.asc("__zkey")).drop("__zkey").write.mode(
        "overwrite"
    ).parquet(dest)
