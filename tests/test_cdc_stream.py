"""Streaming CDC apply: two changelog files drained as separate
micro-batches (maxFilesPerTrigger=1) must leave the snapshot identical
to applying all changes at once in version order."""

from __future__ import annotations

from json_to_parquet_spark.streaming.cdc_stream import stream_apply_changes
import pytest

# driver-window profile (pytest.ini): stream drains — release gate runs it via -m ""
pytestmark = pytest.mark.slow


SCHEMA = "k long, val string, op string, version long"


def _write_changes(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stream_apply_changes(spark, tmp_path):
    snap = str(tmp_path / "snapshot")
    changes = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, val string"
    ).write.parquet(snap)

    # batch 1: update k=1, delete k=2; batch 2: revive k=2, insert k=9
    _write_changes(spark, changes, [(1, "a1", "U", 1), (2, None, "D", 2)])
    _write_changes(spark, changes, [(2, "b2", "I", 3), (9, "new", "I", 4)])

    q = stream_apply_changes(
        spark,
        changes,
        snap,
        ckpt,
        schema=SCHEMA,
        keys=["k"],
        max_files_per_trigger=1,  # one file per trigger → ≥2 micro-batches
    )
    q.awaitTermination(300)
    assert q.lastProgress["batchId"] >= 1  # really merged across batches

    got = {r.k: r.val for r in spark.read.parquet(snap).collect()}
    assert got == {1: "a1", 2: "b2", 3: "c", 9: "new"}


def test_stream_apply_changes_single_batch_matches_batch_merge(spark, tmp_path):
    """Draining everything in one batch gives the same snapshot (latest
    version wins within a batch exactly as across batches)."""
    snap = str(tmp_path / "snap2")
    changes = str(tmp_path / "chg2")
    ckpt = str(tmp_path / "ck2")
    spark.createDataFrame([(1, "a")], "k long, val string").write.parquet(snap)
    _write_changes(
        spark, changes, [(1, "x", "U", 1), (1, "y", "U", 2), (5, "e", "I", 1)]
    )
    q = stream_apply_changes(spark, changes, snap, ckpt, schema=SCHEMA, keys=["k"])
    q.awaitTermination(300)
    got = {r.k: r.val for r in spark.read.parquet(snap).collect()}
    assert got == {1: "y", 5: "e"}
