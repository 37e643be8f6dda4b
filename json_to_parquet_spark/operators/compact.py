"""Small-file compaction — the table-maintenance operator every
long-running parquet lake needs: streaming convert and per-object event
fan-out both produce many small files, and at 100 TB the resulting
footer/open overhead dominates scan time long before data volume does.

Mechanics: size the output by BYTES, not file count — read the input's
actual on-disk size, divide by the target file size, and repartition to
that many outputs. With a sort column the repartition is a range exchange
plus per-partition sort, so compaction PRESERVES the per-file-sorted,
non-overlapping-range layout the convert pipeline writes (min/max pruning
survives compaction). Writes to a fresh directory — atomic swap is the
caller's move (object stores have no atomic directory rename).
"""

from __future__ import annotations

import dataclasses
import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # one HDFS-ish block per file


@dataclasses.dataclass
class CompactResult:
    output_path: str
    rows: int
    files_before: int
    files_after: int
    bytes_before: int


def _dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet files under ``path``, via the
    Hadoop FS API so it works on any scheme (file://, s3a://, hdfs://)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    n, total = 0, 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            n += 1
            total += st.getLen()
    return n, total


def compact(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    sort_column: str | None = None,
) -> CompactResult:
    """Rewrite the parquet directory ``src`` into ``dest`` with files
    sized near ``target_file_bytes``. With ``sort_column``, output files
    are range-partitioned and internally sorted on it."""
    files_before, bytes_before = _dir_stats(spark, src)
    df = spark.read.parquet(src)
    n_out = max(1, math.ceil(bytes_before / target_file_bytes))
    if sort_column is not None and sort_column in df.columns:
        out = df.repartitionByRange(n_out, F.asc(sort_column)).sortWithinPartitions(
            F.asc(sort_column)
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dest)
    files_after, _ = _dir_stats(spark, dest)
    written = spark.read.parquet(dest)
    return CompactResult(
        output_path=dest,
        rows=written.count(),
        files_before=files_before,
        files_after=files_after,
        bytes_before=bytes_before,
    )
