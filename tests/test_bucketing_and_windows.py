"""Bucketed co-located joins (no Exchange) and watermarked windowed aggs."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_to_parquet_spark.operators.bucketing import bucketed_join, write_bucketed
from json_to_parquet_spark.sources.catalog import load_table
from json_to_parquet_spark.streaming.windowed import windowed_event_counts


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    # tiny local tables would auto-broadcast; disable to observe the plan
    # shape that matters at scale (where neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_b", "ord_b", on=["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets: no shuffle
        expected = li.join(orders, on=["l_orderkey"]).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_windowed_counts_static_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = windowed_event_counts(ev, "1 hour")
    rows = out.collect()
    assert sum(r.n for r in rows) == ev.count()
    # window bounds are aligned hour buckets
    assert all((r.win_end_us - r.win_start_us) == 3_600_000_000 for r in rows)


def test_windowed_counts_streaming_with_watermark(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "stream_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = windowed_event_counts(stream, "1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM win_out").collect()
    static = {
        (r.win_start_us, r.event_type): (r.n, r.sum_value)
        for r in windowed_event_counts(ev, "1 hour").collect()
    }
    # append mode emits only windows closed by the watermark; every emitted
    # window must agree exactly with the batch computation
    assert len(got) > 0
    for r in got:
        assert static[(r.win_start_us, r.event_type)] == (r.n, r.sum_value)