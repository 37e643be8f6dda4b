"""Relational core, fourth batch (SURVEY §2.C X6 breadth): the classic
decision-support shapes still missing from q01-q62 — order-count
distribution (TPC-H Q13), share-of-total HAVING with a scalar aggregate
(Q11 shape), the semi+anti self-join "lone failing supplier" shape (Q21),
grouped least-squares regression, deterministic mode, and the bool/bit
aggregate family.

Determinism per helpers.py: every aggregated double goes through decimal
sums with the VARCHAR round-trip on the DuckDB side; the regression's
closed-form arithmetic is then a fixed sequence of IEEE-exact double ops
over identical inputs, so both engines land on the same bits. Mode is
tie-broken (count DESC, bucket ASC), never the engines' own MODE().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM, dec_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q63: order-count distribution (TPC-H Q13 shape) -------------------------
def q63_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts, orders filtered by a
    predicate on the right side of a LEFT OUTER join (so zero-order
    customers survive with c_count = 0). Two hash aggregations: the
    first shuffles on c_custkey (the join key — AQE reuses the join's
    exchange), the second groups a few dozen distinct counts. The
    filter is applied to orders BEFORE the join, which is semantics-
    preserving for predicates on outer-side columns and lets the scan
    prune."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


register(
    QuerySpec(
        "q63_custdist",
        q63_custdist,
        """
        WITH counts AS (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM counts GROUP BY c_count
        """,
        "TPC-H Q13 shape: left-outer order counts per customer, count-of-counts",
    )
)


# --- q64: share-of-total HAVING (TPC-H Q11 shape) ----------------------------
SHARE_THRESHOLD = 0.0005


def q64_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds a fraction of GLOBAL revenue — the
    group-vs-scalar-aggregate HAVING shape. The global total is a 1-row
    frame cross-joined (broadcast) against the per-part aggregate; both
    totals come from the same decimal-sum path so the threshold compare
    sees bit-identical doubles in both engines. One shuffle on
    l_partkey; the global aggregate is map-side partial + 1-row final.
    """
    li = _t(spark, sf_dir, "lineitem")
    rev_expr = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(dec_sum(rev_expr, "part_rev"))
    total = li.agg(dec_sum(rev_expr, "total_rev"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_rev") > F.col("total_rev") * F.lit(SHARE_THRESHOLD))
        .select(
            "l_partkey",
            "part_rev",
            F.round(F.col("part_rev") / F.col("total_rev"), 8).alias("rev_share"),
        )
    )


register(
    QuerySpec(
        "q64_revenue_share",
        q64_revenue_share,
        f"""
        WITH per_part AS (
          SELECT l_partkey,
                 {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')}
                     AS part_rev
          FROM lineitem GROUP BY l_partkey),
        total AS (
          SELECT {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')}
                     AS total_rev
          FROM lineitem)
        SELECT p.l_partkey, p.part_rev,
               ROUND(p.part_rev / t.total_rev, 8) AS rev_share
        FROM per_part p CROSS JOIN total t
        WHERE p.part_rev > t.total_rev * {SHARE_THRESHOLD}
        """,
        "TPC-H Q11 shape: parts above a fraction of global revenue (scalar-agg HAVING)",
    )
)


# --- q65: lone failing supplier (TPC-H Q21 shape) ----------------------------
LONE_FAILURE_TOPK = 20


def q65_lone_failure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY supplier with a returned line on a
    multi-supplier order — TPC-H Q21's EXISTS + NOT EXISTS self-join
    pair, re-expressed as one windowed pass: collapse lineitem to
    (order, supplier, returned?), then COUNT(*)/SUM(ret) windows over
    the order give both existence tests without re-scanning lineitem.
    One shuffle on l_orderkey serves the collapse AND both windows
    (same partitioning); the supplier-name join is broadcast. Top-k is
    tie-broken by unique s_name."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret")
    )
    ow = Window.partitionBy("l_orderkey")
    hits = (
        per.withColumn("n_supp", F.count(F.lit(1)).over(ow))
        .withColumn("n_ret", F.sum("ret").over(ow))
        .filter((F.col("ret") == 1) & (F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
    )
    agg = hits.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait"))
    return (
        agg.join(F.broadcast(s), agg.l_suppkey == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(LONE_FAILURE_TOPK)
    )


register(
    QuerySpec(
        "q65_lone_failure",
        q65_lone_failure,
        f"""
        WITH per AS (
          SELECT l_orderkey, l_suppkey,
                 MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
          FROM lineitem GROUP BY l_orderkey, l_suppkey),
        st AS (
          SELECT *,
                 COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                 SUM(ret) OVER (PARTITION BY l_orderkey) AS n_ret
          FROM per),
        agg AS (
          SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
          FROM st WHERE ret = 1 AND n_supp >= 2 AND n_ret = 1
          GROUP BY l_suppkey)
        SELECT s.s_name, a.numwait
        FROM agg a JOIN supplier s ON s.s_suppkey = a.l_suppkey
        ORDER BY a.numwait DESC, s.s_name ASC
        LIMIT {LONE_FAILURE_TOPK}
        """,
        "TPC-H Q21 shape: lone returned-line supplier on multi-supplier orders",
    )
)


# --- q66: grouped least-squares regression -----------------------------------
# Epoch of 2024-01-01T00:00:00Z in microseconds; events start there, so
# x (whole hours since) stays small and Σx² fits comfortably in BIGINT.
_X_BASE_US = 1_704_067_200_000_000
_US_PER_HOUR = 3_600_000_000


def q66_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares fit of value against hours-since-
    epoch — the regr_slope/regr_intercept family, built from exact
    moments instead of the engines' own regr_* (whose double summation
    order is nondeterministic). Σy and Σxy go through decimal sums
    (order-independent); Σx, Σx², n are exact BIGINTs; the closed-form
    slope/intercept arithmetic is then a fixed sequence of IEEE-exact
    double ops over bit-identical inputs. Single shuffle, map-side
    partials."""
    ev = _t(spark, sf_dir, "events")
    x = F.floor((F.unix_micros("ts") - F.lit(_X_BASE_US)) / F.lit(_US_PER_HOUR)).cast(
        "long"
    )
    base = ev.select(
        "event_type",
        x.alias("x"),
        F.col("value").alias("y"),
        (x.cast("double") * F.col("value")).alias("xy"),
    )
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        dec_sum("y", "sy"),
        dec_sum("xy", "sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * F.col("sxy") - sx * F.col("sy")) / (n * sxx - sx * sx)
    intercept = (F.col("sy") - slope * sx) / n
    return agg.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


register(
    QuerySpec(
        "q66_regression",
        q66_regression,
        f"""
        WITH base AS (
          SELECT event_type,
                 CAST(FLOOR((epoch_us(ts) - {_X_BASE_US}) / {_US_PER_HOUR}.0)
                      AS BIGINT) AS x,
                 value AS y
          FROM events),
        agg AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 {SQL_DEC_SUM.format(x='y')} AS sy,
                 {SQL_DEC_SUM.format(x='CAST(x AS DOUBLE) * y')} AS sxy
          FROM base GROUP BY event_type)
        SELECT event_type, n,
               ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
               ROUND((sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                           * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                   AS intercept
        FROM agg
        """,
        "grouped least-squares slope/intercept from exact decimal moments",
    )
)


# --- q67: deterministic mode -------------------------------------------------
MODE_BUCKET_WIDTH = 10.0


def q67_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal value bucket per event type. Neither engine's MODE() has a
    defined tie rule, so the mode is computed as count + row_number
    with a total (count DESC, bucket ASC) order — same answer on every
    engine, every run. Two aggregations sharing the event_type
    partitioning; the ranking window sees only n_buckets rows per
    group."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / F.lit(MODE_BUCKET_WIDTH)).cast("long")
    counts = (
        ev.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("bucket"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("bucket").alias("modal_bucket"), "n")
    )


register(
    QuerySpec(
        "q67_mode",
        q67_mode,
        f"""
        WITH counts AS (
          SELECT event_type,
                 CAST(FLOOR(value / {MODE_BUCKET_WIDTH}) AS BIGINT) AS bucket,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT event_type, bucket AS modal_bucket, CAST(n AS BIGINT) AS n
        FROM counts
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, bucket ASC) = 1
        """,
        "deterministic mode: modal value bucket per event type (tie-broken)",
    )
)


# --- q68: bool/bit aggregate family ------------------------------------------
def q68_bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or and bit_and / bit_or / bit_xor aggregates per
    order priority. All five are commutative-associative, so partial
    aggregation is exact and order-free — safe at any scale. The
    bitwise args are bounded to 10 bits so the values are readable."""
    o = _t(spark, sf_dir, "orders")
    key10 = (F.col("o_orderkey") % 1024).cast("long")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_above_1k"),
        F.bool_or(F.col("o_orderstatus") == "O").alias("any_open"),
        F.bit_and(key10).alias("key_and"),
        F.bit_or(key10).alias("key_or"),
        F.bit_xor(key10).alias("key_xor"),
    )


register(
    QuerySpec(
        "q68_bool_bit_aggs",
        q68_bool_bit_aggs,
        """
        SELECT o_orderpriority,
               bool_and(o_totalprice > 1000.0) AS all_above_1k,
               bool_or(o_orderstatus = 'O') AS any_open,
               CAST(bit_and(CAST(o_orderkey % 1024 AS BIGINT)) AS BIGINT)
                   AS key_and,
               CAST(bit_or(CAST(o_orderkey % 1024 AS BIGINT)) AS BIGINT)
                   AS key_or,
               CAST(bit_xor(CAST(o_orderkey % 1024 AS BIGINT)) AS BIGINT)
                   AS key_xor
        FROM orders GROUP BY o_orderpriority
        """,
        "bool_and/bool_or + bit_and/bit_or/bit_xor aggregate family",
    )
)
