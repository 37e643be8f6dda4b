"""Streaming CDC apply: a changelog stream rolled into a base snapshot,
micro-batch by micro-batch — the streaming upsert sink.

Each micro-batch of (key, values, op, version) rows is merged into the
current snapshot with the SAME batch ``operators.cdc.apply_changes``
logic (one code path for batch backfill and streaming tail), then the
snapshot is atomically swapped (write to a staging dir, rename over).
The stream's checkpoint gives exactly-once batch processing, so replays
after failure re-apply the same changes idempotently (versions are
monotone per key — a re-applied batch is a no-op).

Scale shape: per batch, changes (small) shuffle once for
latest-per-key, the snapshot once for the merge join — identical to the
batch CDC cost. Rewriting the full snapshot per batch is the plain-
parquet trade-off and is how Delta/Iceberg-less pipelines actually do
it; on a lakehouse table format the same ``foreachBatch`` body becomes
MERGE INTO and only touched files rewrite. The atomic-rename swap keeps
concurrent readers on a consistent snapshot.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import SparkSession

from ..operators.cdc import apply_changes


def stream_apply_changes(
    spark: SparkSession,
    changes_dir: str,
    snapshot_dir: str,
    checkpoint: str,
    schema,
    keys: Sequence[str],
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming CDC apply; returns the StreamingQuery.

    ``snapshot_dir`` must hold the initial base snapshot as parquet;
    ``changes_dir`` is tailed for parquet changelog files with columns
    ``keys + value columns + op + version``. ``max_files_per_trigger``
    bounds each micro-batch (smaller batches = fresher snapshot, more
    rewrites).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(changes_dir)
    staging = snapshot_dir.rstrip("/") + ".staging"
    retired = snapshot_dir.rstrip("/") + ".retired"

    def process_batch(batch_df, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        base = spark.read.parquet(snapshot_dir)
        merged = apply_changes(base, batch_df, keys=keys)
        # materialize BEFORE touching the snapshot dir (merged reads it)
        merged.write.mode("overwrite").parquet(staging)
        shutil.rmtree(retired, ignore_errors=True)
        os.rename(snapshot_dir, retired)
        os.rename(staging, snapshot_dir)
        shutil.rmtree(retired, ignore_errors=True)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
