"""Compaction: many small files → few size-targeted files, same rows, and
the sorted/non-overlapping-range layout survives when a sort column is
given."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from json_to_parquet_spark.operators.compact import compact
from json_to_parquet_spark.sources.catalog import load_table


def test_compact_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "small")
    ev.repartition(40).write.parquet(src)  # simulate small-file buildup
    n_rows = ev.count()

    dest = str(tmp_path / "compacted")
    res = compact(spark, src, dest, target_file_bytes=1 << 30)  # everything fits one
    assert res.files_before == 40
    assert res.files_after < res.files_before
    assert res.rows == n_rows
    assert spark.read.parquet(dest).count() == n_rows


def test_compact_preserves_sorted_range_layout(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    src = str(tmp_path / "small")
    ev.repartition(16).write.parquet(src)

    dest = str(tmp_path / "compacted")
    # tiny target → several output files, each sorted, ranges disjoint
    res = compact(spark, src, dest, target_file_bytes=20_000, sort_column="us")
    assert res.files_after >= 2
    ranges = []
    for f in sorted(glob.glob(os.path.join(dest, "*.parquet"))):
        col = pq.read_table(f, columns=["us"]).column("us").to_pylist()
        if col:
            assert col == sorted(col), f
            ranges.append((min(col), max(col)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # non-overlapping
