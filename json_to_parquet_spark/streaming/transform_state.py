"""Custom stateful streaming operator via ``transformWithStateInPandas``
(Spark 4's arbitrary-state API — the successor to ``applyInPandasWithState``
with typed composite state: ValueState / ListState / MapState + timers).

Demonstrated as a per-user event-type leaderboard: a ``MapState`` keyed by
event type accumulates counts across micro-batches, and each batch emits
the user's current top type (lexicographic tie-break, so the result is
deterministic). This is the shape for streaming feature stores and online
counters at scale: state lives in the per-key state store (RocksDB
provider), each micro-batch touches only the keys present in that batch,
and the map is read/written per key — no global shuffle beyond the
groupBy(user_id) the state store already requires.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = (
    "user_id bigint, top_type string, top_n bigint, n_types bigint, n_events bigint"
)

# RocksDB is required by transformWithState; it ships in every Spark 4
# build. Callers set this on the session before starting the stream.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class TopEventTypeProcessor(StatefulProcessor):
    """Per-user MapState(event_type → count); emits the argmax each batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("counts", "event_type string", "n bigint")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        batch = {}
        for pdf in rows:
            for etype, n in pdf.groupby("event_type").size().items():
                batch[etype] = batch.get(etype, 0) + int(n)
        for etype, n in batch.items():
            prev = self._counts.getValue((etype,)) if self._counts.containsKey((etype,)) else None
            self._counts.updateValue((etype,), (int(prev[0]) + n if prev else n,))
        totals = {k[0]: int(v[0]) for k, v in self._counts.iterator()}
        # deterministic argmax: max count, then lexicographically first type
        top_type = min((t for t in totals), key=lambda t: (-totals[t], t))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "top_type": [top_type],
                "top_n": [totals[top_type]],
                "n_types": [len(totals)],
                "n_events": [sum(totals.values())],
            }
        )

    def close(self) -> None:
        pass


def top_event_type_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user running top event type (update mode)."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TopEventTypeProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
