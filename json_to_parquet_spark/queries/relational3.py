"""Relational core, third batch (SURVEY §2.C X6 breadth): cohort
retention, OHLC time bars, approximate percentiles, recursive CTE
traversal, exponentially-weighted averages, and windowed distinct counts.

Determinism per helpers.py: int/int math throughout, decimal sums for any
aggregated double, EWMA weights as exact powers of two (1 / (1 << k) —
bit-shift, not libm pow), and composite (ts, event_id) orderings so every
window is tie-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM, dec_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q57: cohort retention ---------------------------------------------------
def q57_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by the ISO week of their first
    event; activity counted per (cohort week, whole weeks since first
    event). Two shuffles — one on user_id for the first-seen aggregate
    (map-side partial), one on the output grain; the firsts frame rejoins
    the stream on the same user_id key, so AQE plans it shuffle-reuse or
    broadcast depending on cohort cardinality."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    joined = ev.select("user_id", F.to_date("ts").alias("d")).join(firsts, "user_id")
    cohort = F.date_format(F.date_trunc("week", F.col("first_day")), "yyyy-MM-dd")
    offset = F.floor(F.datediff(F.col("d"), F.col("first_day")) / 7).cast("long")
    return (
        joined.groupBy(cohort.alias("cohort_week"), offset.alias("weeks_since"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


register(
    QuerySpec(
        "q57_cohort_retention",
        q57_cohort_retention,
        """
        WITH firsts AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
          FROM events GROUP BY user_id),
        joined AS (
          SELECT e.user_id, CAST(e.ts AS DATE) AS d, f.first_day
          FROM events e JOIN firsts f USING (user_id))
        SELECT strftime(date_trunc('week', first_day), '%Y-%m-%d') AS cohort_week,
               CAST(FLOOR(date_diff('day', first_day, d) / 7.0) AS BIGINT)
                   AS weeks_since,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM joined GROUP BY 1, 2
        """,
        "cohort retention: first-seen week × weeks-since activity grid",
    )
)


# --- q58: OHLC time bars -----------------------------------------------------
def q58_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the time-series downsampling
    primitive. Open/close are picked by tie-proof (ts, event_id) row
    numbers inside the bar; one shuffle on (event_type, hour) does both
    the windows and the final aggregate (same partitioning, no second
    exchange)."""
    ev = _t(spark, sf_dir, "events")
    bar = ev.select(
        "event_type",
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
            "hour"
        ),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type", "hour")
    asc = F.row_number().over(w.orderBy(F.asc("ts"), F.asc("event_id")))
    desc = F.row_number().over(w.orderBy(F.desc("ts"), F.desc("event_id")))
    return (
        bar.withColumn("rn_a", asc)
        .withColumn("rn_d", desc)
        .groupBy("event_type", "hour")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("n"),
            dec_sum("value", "volume"),
        )
    )


register(
    QuerySpec(
        "q58_ohlc_bars",
        q58_ohlc_bars,
        f"""
        WITH bar AS (
          SELECT event_type,
                 strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                 value,
                 row_number() OVER (PARTITION BY event_type,
                                    date_trunc('hour', ts)
                                    ORDER BY ts ASC, event_id ASC) AS rn_a,
                 row_number() OVER (PARTITION BY event_type,
                                    date_trunc('hour', ts)
                                    ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events)
        SELECT event_type, hour,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               MAX(value) AS high, MIN(value) AS low,
               COUNT(*) AS n,
               {SQL_DEC_SUM.format(x='value')} AS volume
        FROM bar GROUP BY event_type, hour
        """,
        "hourly OHLC bars per event type (tie-proof open/close picks)",
    )
)


# --- q59: approximate percentiles (sketch; rows-only at the gate) -----------
APPROX_ACC = 10_000


def q59_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) of order totals per
    priority — the scale path for quantiles (one pass, bounded memory,
    mergeable partials; exact percentile needs a full sort). Sketch
    internals are engine-specific, so no cross-engine oracle; the rank
    error bound vs the exact percentile is asserted in
    tests/test_invariants.py."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(APPROX_ACC)).alias(
            "p50_approx"
        ),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(APPROX_ACC)).alias(
            "p90_approx"
        ),
    )


register(
    QuerySpec(
        "q59_approx_percentile",
        q59_approx_percentile,
        None,  # sketch is engine-specific; bounded vs exact in test_invariants
        "approx_percentile sketch per priority (rank-error bound tested)",
    )
)


# --- q60: recursive CTE traversal -------------------------------------------
def q60_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk the synthetic
    5-step nation chains n → n+5 → … from the five root nations,
    accumulating depth and the visited path. Exercises iterative
    fixed-point execution inside the SQL engine itself (vs x45's
    driver-loop PageRank); each recursion step is one self-join against
    a 25-row broadcast dim, so the plan stays bounded."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("q60_nation")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT n_nationkey, n_nationkey AS root, CAST(0 AS BIGINT) AS depth,
                 CAST(n_nationkey AS STRING) AS path
          FROM q60_nation WHERE n_nationkey < 5
          UNION ALL
          SELECT n.n_nationkey, c.root, c.depth + 1,
                 CONCAT(c.path, '->', CAST(n.n_nationkey AS STRING))
          FROM chain c JOIN q60_nation n
            ON n.n_nationkey = c.n_nationkey + 5
        )
        SELECT n_nationkey, root, depth, path FROM chain
        """
    )


register(
    QuerySpec(
        "q60_recursive_chain",
        q60_recursive_chain,
        """
        WITH RECURSIVE chain AS (
          SELECT n_nationkey, n_nationkey AS root, CAST(0 AS BIGINT) AS depth,
                 CAST(n_nationkey AS VARCHAR) AS path
          FROM nation WHERE n_nationkey < 5
          UNION ALL
          SELECT n.n_nationkey, c.root, c.depth + 1,
                 CONCAT(c.path, '->', CAST(n.n_nationkey AS VARCHAR))
          FROM chain c JOIN nation n
            ON n.n_nationkey = c.n_nationkey + 5
        )
        SELECT n_nationkey, root, depth, path FROM chain
        """,
        "recursive CTE chain traversal with depth + path accumulation",
    )
)


# --- q61: exponentially-weighted moving average ------------------------------
EWMA_WINDOW = 10  # 2^-k weights stay exactly representable and the pivot stays narrow


def q61_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values over the most recent ≤16 events,
    decay α = 1/2, weights 2^-k exact doubles.

    Determinism: SUM over doubles is out (association order), and even
    the decimal path wobbles here — value·2^-k has a longer exact
    decimal expansion than DECIMAL scale 10 and binary fractions always
    end in …5, so the two engines' double→decimal tie rounding (HALF_UP
    vs HALF_EVEN) can disagree; ROUND(·, 6) first is no better (DuckDB
    rounds doubles via a ×10⁶ multiply that itself rounds). Instead the
    ≤10 lag values pivot into fixed columns (exactly one row per
    (user, k), so MAX(CASE…) is exact) and the weighted sum is one
    fixed-order, left-associative double expression — every op IEEE
    exactly-rounded, bit-identical across engines, no decimals at all.
    One shuffle on user_id covers the window and the aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    k = (F.row_number().over(w) - 1).cast("int")
    recent = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("k", k)
        .filter(F.col("k") < EWMA_WINDOW)
    )
    lags = recent.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_used"),
        *[
            F.max(F.when(F.col("k") == i, F.col("value"))).alias(f"v{i}")
            for i in range(EWMA_WINDOW)
        ],
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i in range(EWMA_WINDOW):
        wt = 0.5**i  # exact
        num = num + F.coalesce(F.col(f"v{i}"), F.lit(0.0)) * F.lit(wt)
        den = den + F.when(F.col(f"v{i}").isNull(), 0.0).otherwise(wt)
    return lags.select("user_id", "n_used", (num / den).alias("ewma_value"))


register(
    QuerySpec(
        "q61_ewma",
        q61_ewma,
        f"""
        WITH ranked AS (
          SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) - 1 AS k
          FROM events),
        lags AS (
          SELECT user_id, COUNT(*) AS n_used,
                 MAX(CASE WHEN k = 0 THEN value END) AS v0,
                 MAX(CASE WHEN k = 1 THEN value END) AS v1,
                 MAX(CASE WHEN k = 2 THEN value END) AS v2,
                 MAX(CASE WHEN k = 3 THEN value END) AS v3,
                 MAX(CASE WHEN k = 4 THEN value END) AS v4,
                 MAX(CASE WHEN k = 5 THEN value END) AS v5,
                 MAX(CASE WHEN k = 6 THEN value END) AS v6,
                 MAX(CASE WHEN k = 7 THEN value END) AS v7,
                 MAX(CASE WHEN k = 8 THEN value END) AS v8,
                 MAX(CASE WHEN k = 9 THEN value END) AS v9
          FROM ranked WHERE k < {EWMA_WINDOW}
          GROUP BY user_id)
        SELECT user_id, n_used,
               (0.0 + COALESCE(v0, 0.0) * 1.0 + COALESCE(v1, 0.0) * 0.5 + COALESCE(v2, 0.0) * 0.25 + COALESCE(v3, 0.0) * 0.125 + COALESCE(v4, 0.0) * 0.0625 + COALESCE(v5, 0.0) * 0.03125 + COALESCE(v6, 0.0) * 0.015625 + COALESCE(v7, 0.0) * 0.0078125 + COALESCE(v8, 0.0) * 0.00390625 + COALESCE(v9, 0.0) * 0.001953125)
               / (0.0 + (CASE WHEN v0 IS NULL THEN 0.0 ELSE 1.0 END) + (CASE WHEN v1 IS NULL THEN 0.0 ELSE 0.5 END) + (CASE WHEN v2 IS NULL THEN 0.0 ELSE 0.25 END) + (CASE WHEN v3 IS NULL THEN 0.0 ELSE 0.125 END) + (CASE WHEN v4 IS NULL THEN 0.0 ELSE 0.0625 END) + (CASE WHEN v5 IS NULL THEN 0.0 ELSE 0.03125 END) + (CASE WHEN v6 IS NULL THEN 0.0 ELSE 0.015625 END) + (CASE WHEN v7 IS NULL THEN 0.0 ELSE 0.0078125 END) + (CASE WHEN v8 IS NULL THEN 0.0 ELSE 0.00390625 END) + (CASE WHEN v9 IS NULL THEN 0.0 ELSE 0.001953125 END)) AS ewma_value
        FROM lags
        """,
        "per-user EWMA (α=1/2) over last 16 events; exact power-of-two weights",
    )
)


# --- q62: distinct count over a sliding window -------------------------------
DISTINCT_FRAME = 100


def q62_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing distinct-user count per event type over the last 100
    events. Spark has no DISTINCT window aggregate, so the operator is
    size(collect_set() OVER) — set semantics in the window buffer, one
    shuffle on event_type. The frame is row-bounded, so state is O(100)
    per window regardless of stream length."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-(DISTINCT_FRAME - 1), Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.size(F.collect_set("user_id").over(w)).cast("long").alias("distinct_users"),
    )


register(
    QuerySpec(
        "q62_window_distinct",
        q62_window_distinct,
        f"""
        SELECT event_id, event_type,
               CAST(COUNT(DISTINCT user_id) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN {DISTINCT_FRAME - 1} PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS distinct_users
        FROM events
        """,
        "trailing distinct-user count over a 100-row window per event type",
    )
)
