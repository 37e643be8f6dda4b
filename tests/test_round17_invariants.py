"""Round-17 invariants: the three ADVICE-r13 fixes, each guarded so a
regression fails loudly — (1) ``decode_wav`` rejects a chunk whose
declared size overruns the payload instead of silently decoding fewer
samples, (2) x293's min-label propagation raises on non-convergence
instead of silently serving a non-transitive closure, and (3) the
``foreachBatch`` parquet sinks are idempotent under micro-batch retry
(a replayed batch overwrites its own ``bid=N`` directory rather than
appending a duplicate that could flip a drained policy decision)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_decode_wav_rejects_truncated_data_chunk():
    from json_to_parquet_spark.operators.media import decode_wav, make_audio

    payload = make_audio(7)
    # Chop two bytes (an even count) off the data chunk: the declared
    # chunk size now overruns the payload.  Pre-fix this decoded to one
    # fewer sample with no error.
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav(payload[:-2])
    # A *declared-size* lie is caught too, not just physical truncation.
    bad = bytearray(make_audio(7))
    pos = bad.index(b"data")
    size = int.from_bytes(bad[pos + 4 : pos + 8], "little")
    bad[pos + 4 : pos + 8] = (size + 8).to_bytes(4, "little")
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav(bytes(bad))
    # The untouched payload still decodes to the full sample count.
    from json_to_parquet_spark.operators.media import audio_spec

    _sr, n = audio_spec(7)
    assert len(decode_wav(payload)[1]) == n


def test_x293_raises_on_nonconvergence(spark, sf_dir, monkeypatch):
    """With the iteration bound forced to 1, any corpus whose pair graph
    has at least one edge cannot confirm convergence — the loop must
    raise, not return whatever labels it reached."""
    import json_to_parquet_spark.queries.multimodal as mm

    monkeypatch.setattr(mm, "X293_MAX_ITERS", 1)
    with pytest.raises(RuntimeError, match="did not converge"):
        mm.x293_image_neardup_clusters(spark, sf_dir)


def test_x293_converges_at_default_bound(spark, sf_dir):
    from json_to_parquet_spark.queries.multimodal import (
        x293_image_neardup_clusters,
    )

    assert x293_image_neardup_clusters(spark, sf_dir).count() > 0


def test_foreachbatch_sink_is_idempotent_under_retry(spark, tmp_path):
    """Replaying a micro-batch (same bid, same rows — the Structured
    Streaming retry contract) must leave the drained union unchanged;
    a genuinely new bid must append."""
    from json_to_parquet_spark.queries.streaming_gate import (
        _read_batches,
        _write_batch_idempotent,
    )

    dest = str(tmp_path / "sink")
    b0 = spark.range(5).select(F.col("id").alias("doc_id"))
    b1 = spark.range(5, 8).select(F.col("id").alias("doc_id"))
    _write_batch_idempotent(b0, 0, dest)
    _write_batch_idempotent(b0, 0, dest)  # retry of batch 0
    _write_batch_idempotent(b1, 1, dest)
    out = _read_batches(spark, dest)
    assert out.columns == ["doc_id"]
    assert sorted(r.doc_id for r in out.collect()) == list(range(8))
