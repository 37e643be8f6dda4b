"""Parquet catalog over the driver-generated test tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under a scale-factor
directory. On a real deployment these would be partitioned parquet/iceberg
datasets; the loader is path-shaped so nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H region
# is 5 rows, nation 25 at every SF). Used by queries to hint broadcast joins.
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def _ensure_session_confs(spark: SparkSession) -> None:
    """The engine's queries may run under a caller-provided SparkSession
    (the correctness driver builds its own) that lacks the session confs
    the data requires. Both are runtime-settable SQL confs, so pin them
    here, idempotently, at every table load:

      * nanosAsLong — events.ts is INT64 TIMESTAMP(NANOS) parquet, which
        Spark 4 refuses outright without it (PARQUET_TYPE_ILLEGAL)
      * UTC session TZ — date/hour string rendering must be
        timezone-stable to match the DuckDB oracle
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # Older testdata generations wrote events.ts as INT64
        # TIMESTAMP(NANOS); Spark 4 has no nanos type — with
        # spark.sql.legacy.parquet.nanosAsLong=true it surfaces as a
        # long, floor-divided here to micros (the same truncation the
        # DuckDB oracle applies to nanos).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Timestamp columns written without a timezone read back as
    # TIMESTAMP_NTZ, which instant functions (unix_micros, to_utc_*)
    # reject. Cast every NTZ column to a UTC-instant TIMESTAMP under the
    # pinned UTC session TZ — the identical wall-clock→instant reading
    # DuckDB gives a naive timestamp — so every query sees ONE type
    # regardless of which testdata generation is on disk.
    ntz = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL-expressed queries)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
