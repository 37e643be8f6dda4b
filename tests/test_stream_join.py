"""Stream-stream interval join: streaming result must equal the batch
computation for watermark-closed rows; corrupt-record capture test for
the NDJSON source."""

from __future__ import annotations

from json_to_parquet_spark.sources.catalog import load_table
from json_to_parquet_spark.sources.ndjson import read_ndjson
from json_to_parquet_spark.streaming.joins import purchases_with_recent_clicks
import pytest

# driver-window profile (pytest.ini): stream drains — release gate runs it via -m ""
pytestmark = pytest.mark.slow



def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.write.parquet(src)

    batch = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in purchases_with_recent_clicks(ev).collect()
    }
    assert len(batch) > 0

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        purchases_with_recent_clicks(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    # append mode may withhold watermark-open pairs; everything emitted must
    # be a batch pair, and coverage must be substantial
    assert streamed <= batch
    assert len(streamed) >= 0.8 * len(batch)


def test_corrupt_record_capture(spark, tmp_path):
    p = tmp_path / "mixed.ndjson"
    p.write_text('{"a": 1}\n{not json at all\n{"a": 3}\n')
    df = read_ndjson(
        spark,
        str(p),
        schema=spark.createDataFrame([], "a long").schema,
        corrupt_column="_bad",
    )
    rows = df.collect()
    good = [r.a for r in rows if r._bad is None]
    bad = [r._bad for r in rows if r._bad is not None]
    assert sorted(good) == [1, 3]
    assert bad == ["{not json at all"]

def test_streaming_dedup_drops_cross_batch_duplicates(spark, sf_dir, tmp_path):
    from json_to_parquet_spark.streaming.dedup import dedup_stream

    ev = load_table(spark, sf_dir, "events").limit(200).cache()
    src = str(tmp_path / "dupsrc")
    # write the SAME rows twice as separate files → duplicates arrive in a
    # later micro-batch; watermarked dedup must drop them
    ev.coalesce(1).write.mode("append").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream(stream, ["event_id"], watermark="10 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)), "duplicates leaked through"
    assert sorted(ids) == sorted(r.event_id for r in ev.collect())
