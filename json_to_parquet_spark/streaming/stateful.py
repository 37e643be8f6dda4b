"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine-native shape for operators Structured Streaming doesn't ship:
per-key mutable state carried across micro-batches, updated with
Arrow-batched pandas, bounded by timeouts. Demonstrated here as running
per-user counters (count / sum / last-seen) over the event stream — the
building block for streaming dedup, rate limiting, and feature freshness
at 100 TB (state lives in the state store, partitioned by key; each
micro-batch touches only keys present in that batch).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_us", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [total],
            "last_seen_us": [last_us],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user running totals, one row per user
    per micro-batch the user appears in (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
