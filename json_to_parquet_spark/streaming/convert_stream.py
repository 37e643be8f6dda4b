"""Structured Streaming wrapper for the convert pipeline.

The reference is event-driven: one S3 object-created notification → one
Lambda invoke → one converted object (reference pyarrow/main.py:18-50,
enforced one-record-per-event at :31-36). The idiomatic Spark shape for
the same contract is a file-source stream: new NDJSON files landing in a
directory are discovered by the source, each micro-batch is converted by
the SAME batch ``convert`` logic via ``foreachBatch``, and checkpointing
gives exactly-once file processing — replacing S3-notification plumbing
with engine-native discovery + recovery.

``trigger(availableNow=True)`` drains everything currently present and
stops — a catch-up/backfill run; omit it for continuous tailing.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dt_rewrite import rewrite_dt_fields
from ..operators.convert import DEFAULT_SORT_COLUMN


def stream_convert(
    spark: SparkSession,
    source_dir: str,
    dest: str,
    checkpoint: str,
    schema: T.StructType,
    sort_column: str | None = None,
    dt_mode: str = "strict",
    available_now: bool = True,
):
    """Start the streaming convert; returns the StreamingQuery.

    ``schema`` is required: streaming file sources don't infer (and at
    100 TB you want inference pinned anyway — SURVEY §7c).
    """
    sort_column = DEFAULT_SORT_COLUMN if sort_column is None else sort_column
    stream = spark.readStream.schema(schema).json(source_dir)

    def process_batch(batch_df, epoch_id: int) -> None:
        out = rewrite_dt_fields(batch_df, mode=dt_mode)
        if sort_column in out.columns:
            out = out.sortWithinPartitions(F.asc(sort_column))
        out.write.mode("append").parquet(dest)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
