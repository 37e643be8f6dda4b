"""Bucketed tables: shuffle-free co-located joins for repeated big⋈big work.

At 100 TB the dominant cost of `lineitem ⋈ orders` is shuffling both sides
on the join key — every time the join runs. Bucketing pays that shuffle
ONCE at write time: both tables are hash-partitioned into the same number
of buckets on the join key and sorted within buckets, so every later join
(and groupBy on the key) reads co-located, pre-sorted buckets with **no
Exchange in the plan** — asserted in tests/test_bucketing.py.

This is Spark's `bucketBy` + managed-table path (the only way buckets are
recognized by the planner); the session needs a warehouse dir, which the
default local session has.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a managed bucketed table (overwrite)."""
    spark = df.sparkSession
    # A managed table whose metadata died with a previous session can leave
    # its warehouse directory behind; DROP alone won't clear the location.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(leftover):
        shutil.rmtree(leftover)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    With matching bucket counts Catalyst plans a SortMergeJoin with zero
    Exchange operators — the 100 TB shuffle is simply absent.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
