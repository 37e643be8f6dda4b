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


Ranges = dict[str, tuple[int, int]]


def ranges_from_parquet_stats(path: str, x: str, y: str) -> Ranges:
    """Min/max for two columns read from parquet FOOTER statistics — a
    driver-side metadata read (a few KiB per file), not a data scan.
    This is the 100 TB path: every writer already stamped row-group
    min/max into the footers, so re-scanning the data to learn its range
    is pure waste. Falls back to raising KeyError if a file lacks stats
    for a column (caller then uses the scan path)."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    out: dict[str, list] = {x: [], y: []}
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for col in (x, y):
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    raise KeyError(f"no min/max stats for {col!r} in {f}")
                out[col].append((st.min, st.max))
    return {
        col: (min(lo for lo, _ in pairs), max(hi for _, hi in pairs))
        for col, pairs in out.items()
    }


def normalized_morton_key(
    df: DataFrame, x: str, y: str, ranges: Ranges | None = None
) -> Column:
    """Morton key over RANGE-NORMALIZED dimensions: each column is scaled
    to the full ZBITS space from its actual min/max first. Raw
    interleaving is wrong whenever a dimension's range is small or offset
    (its high bits are constant — or worse, wrap under the mask — so it
    contributes nothing to file separation); normalizing is what makes
    both dimensions actually prune.

    ``ranges`` injects precomputed min/max per column (e.g. from
    ``ranges_from_parquet_stats`` or a table catalog) and skips the
    min/max aggregation entirely — so a z-ordered rewrite scans its
    input exactly once. Without it, one cheap min/max pass runs as the
    fallback."""
    if ranges is not None:
        (xmin, xmax), (ymin, ymax) = ranges[x], ranges[y]
    else:
        row = df.agg(
            F.min(x).alias("xmin"),
            F.max(x).alias("xmax"),
            F.min(y).alias("ymin"),
            F.max(y).alias("ymax"),
        ).collect()[0]
        xmin, xmax, ymin, ymax = row.xmin, row.xmax, row.ymin, row.ymax
    top = (1 << ZBITS) - 1

    def scale(col: str, lo, hi) -> Column:
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("long")
        return ((F.col(col).cast("long") - F.lit(int(lo))) * top / F.lit(int(hi - lo))).cast(
            "long"
        )

    return morton_key(scale(x, xmin, xmax), scale(y, ymin, ymax))


def write_zordered(
    df: DataFrame,
    dest: str,
    x: str,
    y: str,
    n_files: int | None = None,
    ranges: Ranges | None = None,
) -> None:
    """Write ``df`` clustered by the range-normalized (x, y) Morton key:
    one range exchange on the key, per-file sorted — downstream scans
    filtering on EITHER dimension prune files/row groups via min/max
    stats. Pass ``ranges`` (precomputed/stats-derived min-max) to skip
    the extra min/max scan of the input."""
    keyed = df.withColumn("__zkey", normalized_morton_key(df, x, y, ranges=ranges))
    parts = (
        keyed.repartitionByRange(n_files, F.asc("__zkey"))
        if n_files
        else keyed.repartitionByRange(F.asc("__zkey"))
    )
    parts.sortWithinPartitions(F.asc("__zkey")).drop("__zkey").write.mode(
        "overwrite"
    ).parquet(dest)
