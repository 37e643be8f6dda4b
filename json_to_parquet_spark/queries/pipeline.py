"""Round-2 pipeline operators: no-equi-key interval join (binned), and the
deterministic sampling family a training-data pipeline runs before mixing
(stratified sampling, per-source quotas).

Scale notes live on each operator; the common theme is that every one of
these is expressed as equi-joins / windows over bounded key spaces — no
cartesian shapes, no rand() (hash-determinism so results are stable across
runs, engines, partitionings, and re-shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register

# 15-minute interval for the proximity join, in microseconds.
INTERVAL_US = 15 * 60 * 1_000_000


def q47_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, how many clicks — by ANY user — landed in the 15
    minutes before it. No equi key relates the two sides, so a naive join
    is an O(n·m) BroadcastNestedLoopJoin (exactly what the oracle's
    correlated subquery does). The scale shape is a binned range join:
    bucket both sides by interval-width time buckets, explode the
    purchase side into (bucket-1, bucket), equi-join on the bucket, and
    refine with the exact time predicate. Each click has one bucket and
    the two exploded purchase keys are distinct, so no pair is counted
    twice; the shuffle is a plain hash join on a dense integer key whose
    per-key population is bounded by traffic-per-15-minutes (AQE
    skew-join splits hot buckets)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", us.alias("p_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        us.alias("c_us"), F.floor(us / INTERVAL_US).alias("bucket")
    )
    p_binned = purchases.select(
        "event_id",
        "p_us",
        F.explode(
            F.array(
                F.floor(F.col("p_us") / INTERVAL_US) - 1,
                F.floor(F.col("p_us") / INTERVAL_US),
            )
        ).alias("bucket"),
    )
    hits = (
        p_binned.join(clicks, "bucket")
        .filter(
            (F.col("c_us") >= F.col("p_us") - INTERVAL_US)
            & (F.col("c_us") < F.col("p_us"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return purchases.join(hits, "event_id", "left").select(
        "event_id",
        "p_us",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_clicks_15m"),
    )


register(
    QuerySpec(
        "q47_interval_join",
        q47_interval_join,
        f"""
        SELECT p.event_id,
               epoch_us(p.ts) AS p_us,
               (SELECT COUNT(*) FROM events c
                 WHERE c.event_type = 'click'
                   AND epoch_us(c.ts) >= epoch_us(p.ts) - {INTERVAL_US}
                   AND epoch_us(c.ts) < epoch_us(p.ts)) AS n_clicks_15m
        FROM events p WHERE p.event_type = 'purchase'
        """,
        "no-equi-key interval join via time-bucket binning (vs oracle's correlated count)",
    )
)


# Per-language sampling rates in per-mille: flatten the head language,
# keep the tail. Deterministic md5-bucket membership, like x25.
STRATA_RATES = {"en": 200, "de": 600, "fr": 600}
DEFAULT_RATE = 900


def x31_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling: per-language keep rates applied by
    hash-bucket membership (md5(doc_id) mod 1000 < rate), NOT rand() — so
    the sample is reproducible across runs/engines/partitionings and
    shrinks monotonically as rates drop. Embarrassingly parallel: one
    projection + filter, no shuffle; the rate table is a literal CASE
    (broadcast-free)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 1000
    )
    rate = F.lit(DEFAULT_RATE)
    for lang, r in sorted(STRATA_RATES.items()):
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return docs.select("doc_id", "lang", "source", bucket.alias("bucket")).filter(
        F.col("bucket") < rate
    )


_RATE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in sorted(STRATA_RATES.items())
)

register(
    QuerySpec(
        "x31_stratified_sample",
        x31_stratified_sample,
        f"""
        WITH b AS (
          SELECT doc_id, lang, source,
                 CAST(from_hex(substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIT::INT
                      AS BIGINT) % 1000 AS bucket
          FROM documents)
        SELECT doc_id, lang, source, bucket FROM b
        WHERE bucket < (CASE {_RATE_CASE} ELSE {DEFAULT_RATE} END)
        """,
        "deterministic stratified sampling: per-language md5-bucket keep rates",
    )
)


SOURCE_QUOTA = 60  # max docs kept per source


def x32_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source down-sampling to a fixed quota (the data-mixing step:
    cap dominant sources before interleaving). Selection order is the
    md5 of the doc id — an arbitrary-but-deterministic shuffle — with
    doc_id as the total-order tie-break (helpers.py rule 6). One window
    per source; source cardinality is bounded, and heavy sources split
    fine because rank is computed after a hash partition on source (AQE
    handles stragglers)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= SOURCE_QUOTA)
        .select("doc_id", "lang", "source", F.col("rk").cast("long").alias("rk"))
    )


register(
    QuerySpec(
        "x32_source_quota",
        x32_source_quota,
        f"""
        WITH r AS (
          SELECT doc_id, lang, source,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents)
        SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= {SOURCE_QUOTA}
        """,
        "per-source quota down-sampling (deterministic hash order, data mixing)",
    )
)
