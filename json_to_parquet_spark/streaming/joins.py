"""Watermarked stream-stream interval join.

The last stateful-streaming shape the engine needs: joining two live
streams (here: purchases ⋈ preceding clicks per user) with watermarks on
BOTH sides so the join state is bounded — each side buffers only rows
younger than its watermark, and the interval condition lets Spark evict
eagerly. Without the time bound, stream-stream join state grows forever.

Backfill caveat: during an ``availableNow`` catch-up over historical files
that are NOT in time order, the watermark advances to (max seen − delay)
after every micro-batch and later-arriving older rows are dropped as late.
For unordered backfills, widen the watermark to cover the backfill span or
feed files in time order; the default is tuned for live tailing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_recent_clicks(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """purchases joined to same-user clicks within ``lookback`` before the
    purchase. Works on a streaming events frame (bounded state via
    watermarks + interval condition) and on a static frame (exact batch
    semantics) for differential testing."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return clicks.join(purchases, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("click_us"),
    )
