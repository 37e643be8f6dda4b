"""Streaming deduplication with watermark-bounded state.

The streaming twin of X1 exact dedup: drop repeated keys as events flow
in, keeping state only as long as the watermark requires
(``dropDuplicatesWithinWatermark``) — without the bound, streaming dedup
state grows with every key ever seen, which at 100 TB/day is fatal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence per key within the watermark horizon survives;
    later duplicates are dropped. Works on static frames too (exact
    dropDuplicates) for differential testing."""
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
