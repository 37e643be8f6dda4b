"""XML source: Spark 4's built-in XML reader wired into the convert
pipeline.

A source format the reference never had — the NDJSON contract (infer →
``_dt`` rewrite → sort → tuned sink) applies unchanged once the scan
produces a DataFrame, which is the point of keeping convert
source-agnostic (operators/convert.py accepts any DataFrame).

Scale: the XML input format splits uncompressed files on the row tag
boundary (Hadoop start/end-tag input format), so a large XML file scans
in parallel like CSV — no single-task decompress bottleneck unless the
file is gzipped, in which case the same caveat as gzipped NDJSON applies
(SURVEY §7b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_ROW_TAG = "row"


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = DEFAULT_ROW_TAG,
    schema=None,
) -> DataFrame:
    """Scan an XML file/dir into a DataFrame, one row per ``row_tag``
    element. ``schema=None`` infers (an extra pass over the data — pin the
    schema for production feeds, same rule as NDJSON)."""
    reader = spark.read.option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.xml(path)
