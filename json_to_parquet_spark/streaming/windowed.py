"""Watermarked windowed aggregation over an event stream.

The reference has no stateful streaming (each Lambda invoke is stateless;
"late data" is whatever order S3 events arrive in — SURVEY §2.B). This
module adds the engine-native version a 100 TB event pipeline needs:
event-time tumbling/sliding windows with a watermark bounding state, so
late events beyond the threshold are dropped deterministically and the
state store cannot grow without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """count + sum(value) per (event-time window, key).

    Works on both a static DataFrame (windows computed exactly — used by
    the oracle-style tests) and a streaming one (watermark bounds state;
    append-mode emits a window once the watermark passes its end).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        df.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            F.unix_micros(F.col("win.end")).alias("win_end_us"),
            key_col,
            "n",
            "sum_value",
        )
    )
