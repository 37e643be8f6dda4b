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
from pyspark.sql import functions as F
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


def read_ndjson_parallel(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """NDJSON read that does not inherit the input's partitioning for the
    expensive work.

    Gzip is not splittable: one ``.ndjson.gz`` object = one partition, and
    with plain ``spark.read.json`` the whole parse→transform chain runs on
    a single core. Here the cheap part (decompress + line split) stays
    single-threaded, the raw lines are round-robined across the cluster,
    and the expensive JSON parse (``from_json``) plus everything after it
    runs fully parallel. On already-parallel input (many objects, or
    splittable compression) the repartition is skipped — no regression at
    scale, ~2-4× on the single-object shape.

    Already-parallel input (many objects, or splittable compression) goes
    straight to the native JSON datasource — distributed inference and
    parse, full pushdown/pruning, no extra shuffle: the at-scale shape is
    untouched. Only the single-unsplittable-object shape (the reference's
    own deployment unit) pays the spread: raw lines are round-robined and
    cached once, and with ``schema=None`` the union-schema inference runs
    over that SAME cached line frame — so inference is distributed too,
    and the decompress+shuffle cost is paid once, not once per pass. The
    cached line frame is attached to the returned DataFrame as
    ``_graft_text_cache``; callers that materialize the parse (e.g. the
    convert pipeline) should ``unpersist()`` it afterwards — otherwise
    the ContextCleaner reclaims it once the frame is unreachable.

    Pass a pinned schema to skip inference entirely (production mode).
    """
    target = min_partitions or _default_cpus()
    text = spark.read.text(path).filter(F.length("value") > 0)
    if text.rdd.getNumPartitions() >= target:
        return read_ndjson(spark, path, schema)
    text = text.repartition(target)
    if schema is None:
        cached_text = text.persist()
        try:
            parsed = _json_from_lines(spark, cached_text)
        except Exception:
            # Classic-session JVM handle unavailable (e.g. Spark Connect):
            # fall back to a single-threaded inference pass over the source.
            cached_text.unpersist()
            schema = spark.read.json(path).schema
        else:
            parsed._graft_text_cache = cached_text
            return parsed
    return text.select(
        F.from_json(F.col("value"), schema).alias("r")
    ).select("r.*")


def _json_from_lines(spark: SparkSession, text: DataFrame) -> DataFrame:
    """``DataFrameReader.json(Dataset[String])`` via the JVM handle:
    distributed union-schema inference + parse over an in-cluster line
    frame, with no Python round-trip. (PySpark only exposes the
    RDD-of-strings overload, which would pipe every line through the
    Python worker; the Scala Dataset overload is public API.)"""
    jdf = text.select(F.col("value").cast("string").alias("value"))._jdf
    jds = getattr(jdf, "as")(spark._jvm.org.apache.spark.sql.Encoders.STRING())
    return DataFrame(spark._jsparkSession.read().json(jds), spark)


def _default_cpus() -> int:
    from ..session import DEFAULT_CPUS

    return DEFAULT_CPUS
