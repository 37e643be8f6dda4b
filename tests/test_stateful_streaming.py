"""applyInPandasWithState: per-key state must accumulate across
micro-batches and end at exactly the batch-computed totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_to_parquet_spark.sources.catalog import load_table
from json_to_parquet_spark.streaming.stateful import running_user_totals
import pytest

# driver-window profile (pytest.ini): stream drain — release gate runs it via -m ""
pytestmark = pytest.mark.slow



def test_running_totals_accumulate_across_microbatches(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    # several files → maxFilesPerTrigger=1 forces multiple micro-batches
    ev.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.lastProgress["batchId"] >= 2  # state really crossed batches

    # last emitted row per user == exact batch aggregate
    final = {
        r.user_id: r
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) AS rn
                 FROM running_totals) WHERE rn = 1"""
        ).collect()
    }
    expected = {
        r.user_id: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max(F.unix_micros("ts")).alias("last_seen_us"),
        )
        .collect()
    }
    assert set(final) == set(expected)
    for uid, exp in expected.items():
        got = final[uid]
        assert got.n_events == exp.n_events
        assert abs(got.sum_value - exp.sum_value) < 1e-6
        assert got.last_seen_us == exp.last_seen_us