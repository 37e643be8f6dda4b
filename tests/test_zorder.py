"""Z-order clustering: morton_key bit-exactness, and the layout claim —
a normalized z-ordered write gives file-level min/max pruning on BOTH
dimensions, where a plain single-column sort only prunes its own."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from json_to_parquet_spark.operators.zorder import morton_key, write_zordered


def test_morton_key_bit_exact(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton_key("x", "y").alias("z")).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): ref(x, y) for x, y in got}


def _file_coverages(path, col_idx, lo, hi):
    span = max(1, hi - lo)
    covs = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin = min(
            md.row_group(i).column(col_idx).statistics.min
            for i in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(i).column(col_idx).statistics.max
            for i in range(md.num_row_groups)
        )
        covs.append((fmax - fmin) / span)
    return covs


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Every file of a normalized z-ordered layout must cover a proper
    sub-range of BOTH dimensions on average; the single-column sort
    baseline covers ~everything in the other dimension. The hour
    dimension is offset by ~473k — the case raw bit-masking gets wrong."""
    from json_to_parquet_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.unix_micros("ts") / 3_600_000_000).alias("hour"),
    )
    lo_u, hi_u, lo_h, hi_h = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("hour"), F.max("hour")
    ).collect()[0]

    zdir = str(tmp_path / "z")
    write_zordered(ev, zdir, "user_id", "hour", n_files=8)
    z_ucov = _file_coverages(zdir, 1, lo_u, hi_u)
    z_hcov = _file_coverages(zdir, 2, lo_h, hi_h)

    sdir = str(tmp_path / "s")
    ev.repartitionByRange(8, "hour").sortWithinPartitions("hour").write.parquet(sdir)
    s_ucov = _file_coverages(sdir, 1, lo_u, hi_u)

    avg = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert avg(z_ucov) < 0.8 and avg(z_hcov) < 0.6  # both dims prune
    assert avg(s_ucov) > 0.95  # hour-sorted baseline can't prune user
    assert avg(z_ucov) < avg(s_ucov) - 0.2  # z-order strictly better


def test_zorder_injected_ranges_single_scan(spark, sf_dir, tmp_path):
    """Stats-injected ranges must (a) skip the min/max aggregation
    entirely — the input is scanned exactly once, by the write — and
    (b) produce the identical clustered layout as the scan fallback."""
    from json_to_parquet_spark.operators.zorder import (
        normalized_morton_key,
        ranges_from_parquet_stats,
    )
    from json_to_parquet_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.unix_micros("ts") / 3_600_000_000).alias("hour"),
    )
    lo_u, hi_u, lo_h, hi_h = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("hour"), F.max("hour")
    ).collect()[0]
    ranges = {"user_id": (lo_u, hi_u), "hour": (lo_h, hi_h)}

    # (a) same key values either way
    scan_keys = ev.select(
        "event_id", normalized_morton_key(ev, "user_id", "hour").alias("z")
    )
    inj_keys = ev.select(
        "event_id",
        normalized_morton_key(ev, "user_id", "hour", ranges=ranges).alias("z"),
    )
    assert scan_keys.exceptAll(inj_keys).isEmpty()

    # (b) with ranges injected, the min/max agg is never invoked
    def _boom(*a, **k):
        raise AssertionError("agg() called despite injected ranges")

    ev_guarded = ev.select("*")
    ev_guarded.agg = _boom  # instance-level guard
    write_zordered(
        ev_guarded, str(tmp_path / "zi"), "user_id", "hour", n_files=4, ranges=ranges
    )
    got = spark.read.parquet(str(tmp_path / "zi"))
    assert got.count() == ev.count()


def test_ranges_from_parquet_stats(spark, tmp_path):
    """Footer-stats ranges equal the true min/max — no data scan needed."""
    from json_to_parquet_spark.operators.zorder import ranges_from_parquet_stats

    df = spark.range(1000).select(
        (F.col("id") + 7).alias("a"), (F.col("id") * 3 - 50).alias("b")
    )
    p = str(tmp_path / "t")
    df.repartition(3).write.parquet(p)
    r = ranges_from_parquet_stats(p, "a", "b")
    assert r == {"a": (7, 1006), "b": (-50, 2947)}
