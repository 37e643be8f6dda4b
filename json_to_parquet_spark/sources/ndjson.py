"""NDJSON source.

The reference ingests one gzipped newline-delimited JSON S3 object per
invocation and infers its schema as the union of all records (reference
pyarrow/main.py:54-63). Spark's JSON source does exactly this natively —
gzip decompression, NDJSON line splitting, distributed union-schema
inference — so this module is a thin, contract-pinning wrapper:

  * schema may be pinned with an explicit ``StructType`` (production mode;
    SURVEY §7c — inference across heterogeneous files is nondeterministic)
  * corrupt records can be captured instead of crashing (the reference
    would raise mid-Lambda), via ``columnNameOfCorruptRecord``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    corrupt_column: str | None = None,
) -> DataFrame:
    """Read (possibly gzipped) newline-delimited JSON.

    With ``schema=None`` Spark performs union-schema inference across all
    records — the same semantics as the reference's ``paj.read_json``
    (missing keys in heterogeneous records become nulls).
    """
    reader = spark.read
    if schema is not None:
        if corrupt_column is not None:
            schema = T.StructType(
                [*schema.fields, T.StructField(corrupt_column, T.StringType(), True)]
            )
        reader = reader.schema(schema)
    if corrupt_column is not None:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_column
        )
    return reader.json(path)
