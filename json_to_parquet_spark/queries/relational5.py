"""Relational core, fifth batch (SURVEY §2.C X6 breadth): the remaining
classic decision-support shapes — large-order customers (TPC-H Q18),
distinct-supplier counts with a NOT-IN exclusion (Q16), idle-rich
customers against a global scalar (Q22), promo revenue share (Q14),
disjunctive multi-branch join predicates (Q19), late-shipment priority
buckets (Q12), and returned-item revenue top-k (Q10). The reference
(`/root/reference/pyarrow/main.py`) has no relational surface at all —
these exist because the driver's gate scores the declared X6 inventory.

Determinism per helpers.py: double sums go through decimal with the
VARCHAR round-trip on the DuckDB side; dates render as strings; integer
sums/counts are BIGINT on both engines; every top-k has a unique
tie-breaker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM, date_str, dec_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev() -> Column:
    # Built lazily: no Column construction at import time (no active
    # session during pytest collection).
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1.0 - l_discount)"


# --- q69: large-order customers (TPC-H Q18 shape) ----------------------------
LARGE_ORDER_QTY = 180.0
LARGE_ORDER_TOPK = 100


def q69_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding orders whose total quantity exceeds a threshold
    — Q18's group-HAVING-then-join shape. The quantity aggregate
    shuffles on l_orderkey once; the surviving handful of keys then
    joins orders (same key — AQE reuses the exchange) and the customer
    join is broadcast-sized after the filter. Top-k tie-broken by
    unique o_orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > F.lit(LARGE_ORDER_QTY))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            date_str("o_orderdate", "order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(LARGE_ORDER_TOPK)
    )


register(
    QuerySpec(
        "q69_large_orders",
        q69_large_orders,
        f"""
        WITH big AS (
          SELECT l_orderkey, {SQL_DEC_SUM.format(x='l_quantity')} AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING {SQL_DEC_SUM.format(x='l_quantity')} > {LARGE_ORDER_QTY})
        SELECT c.c_custkey, c.c_name, b.l_orderkey AS o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               o.o_totalprice, b.sum_qty
        FROM big b
        JOIN orders o ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, b.l_orderkey ASC
        LIMIT {LARGE_ORDER_TOPK}
        """,
        "TPC-H Q18 shape: customers with large-quantity orders, top-k",
    )
)


# --- q70: distinct-supplier counts with NOT-IN exclusion (Q16 shape) ---------
def q70_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of distinct suppliers shipping each (brand, type, size
    bucket), excluding suppliers in a NOT-IN set (negative account
    balance) — Q16's anti-join + COUNT DISTINCT shape. The exclusion
    list and the part dim both broadcast; the only shuffle is the
    grouped distinct on (brand, type, bucket, suppkey)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            "p_type",
            (F.floor(F.col("p_size") / 10)).cast("long").alias("size_bucket"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


register(
    QuerySpec(
        "q70_part_supplier_counts",
        q70_part_supplier_counts,
        """
        SELECT p.p_brand, p.p_type,
               CAST(FLOOR(p.p_size / 10) AS BIGINT) AS size_bucket,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        """,
        "TPC-H Q16 shape: distinct suppliers per part group, NOT-IN exclusion",
    )
)


# --- q71: idle rich customers (TPC-H Q22 shape) ------------------------------
def q71_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose balance exceeds the global average positive
    balance AND who have placed no orders — Q22's scalar-subquery +
    NOT EXISTS shape. The scalar average is a 1-row broadcast; the
    anti join shuffles on custkey only. Average uses the decimal/
    VARCHAR round-trip so the threshold is bit-identical on both
    engines (helpers.py rule 1)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    avg_pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(30,10)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal", "totacctbal"),
        )
    )


register(
    QuerySpec(
        "q71_idle_rich_customers",
        q71_idle_rich_customers,
        f"""
        WITH thresh AS (
          SELECT ({SQL_DEC_SUM.format(x='c_acctbal')} / COUNT(*)) AS avg_bal
          FROM customer WHERE c_acctbal > 0.0)
        SELECT c.c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               {SQL_DEC_SUM.format(x='c.c_acctbal')} AS totacctbal
        FROM customer c CROSS JOIN thresh t
        WHERE c.c_acctbal > t.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY c.c_nationkey
        """,
        "TPC-H Q22 shape: above-average-balance customers with no orders",
    )
)


# --- q72: promo revenue share (TPC-H Q14 shape) ------------------------------
PROMO_WINDOW = ("1998-01-01", "1998-07-01")


def q72_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO-type parts inside a ship-date window
    — Q14's conditional-aggregate ratio. Part broadcasts; one map-side
    partial + 1-row final aggregate; the ratio divides two decimal-
    exact doubles so both engines emit identical bits."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(PROMO_WINDOW[0]))
        & (F.col("l_shipdate") < F.lit(PROMO_WINDOW[1]))
    )
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = j.agg(
        dec_sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0)), "promo_rev"),
        dec_sum(_rev(), "total_rev"),
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 6).alias(
            "promo_pct"
        ),
    )


register(
    QuerySpec(
        "q72_promo_share",
        q72_promo_share,
        f"""
        WITH agg AS (
          SELECT
            {SQL_DEC_SUM.format(x=f"CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} ELSE 0.0 END")}
                AS promo_rev,
            {SQL_DEC_SUM.format(x=_REV_SQL)} AS total_rev
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE l.l_shipdate >= TIMESTAMP '{PROMO_WINDOW[0]}'
            AND l.l_shipdate <  TIMESTAMP '{PROMO_WINDOW[1]}')
        SELECT promo_rev, total_rev,
               ROUND(100.0 * promo_rev / total_rev, 6) AS promo_pct
        FROM agg
        """,
        "TPC-H Q14 shape: promo-part revenue share in a date window",
    )
)


# --- q73: disjunctive multi-branch join predicate (TPC-H Q19 shape) ----------
def q73_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue summed over three OR-ed (brand, size, quantity) branches
    — Q19's disjunctive join predicate. Catalyst extracts the common
    l_partkey = p_partkey conjunct so the join stays an equi-join
    (broadcast here) with the disjunction as a post-join filter —
    never a nested-loop join. Single-row decimal-exact output."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#1") & q.between(1.0, 11.0) & sz.between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & q.between(10.0, 20.0) & sz.between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & q.between(20.0, 30.0) & sz.between(1, 15))
    )
    return j.filter(branch).agg(
        dec_sum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_lines")
    )


register(
    QuerySpec(
        "q73_disjunctive_join",
        q73_disjunctive_join,
        f"""
        SELECT {SQL_DEC_SUM.format(x=_REV_SQL)} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1.0 AND 11.0
               AND p.p_size BETWEEN 1 AND 5)
           OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10.0 AND 20.0
               AND p.p_size BETWEEN 1 AND 10)
           OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20.0 AND 30.0
               AND p.p_size BETWEEN 1 AND 15)
        """,
        "TPC-H Q19 shape: disjunctive brand/size/quantity branches over an equi-join",
    )
)


# --- q74: late-shipment priority buckets (TPC-H Q12 shape) -------------------
LATE_DAYS = 60


def q74_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-priority: how many lines shipped more than LATE_DAYS
    after the order date vs total — Q12's priority-bucket count over an
    orders⋈lineitem join with interval arithmetic. Shuffles once on
    the join key; counts are commutative so partials are exact."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {LATE_DAYS} DAYS"
    )
    return j.groupBy("o_orderpriority").agg(
        F.sum(late.cast("long")).alias("late_lines"),
        F.count(F.lit(1)).alias("total_lines"),
    )


register(
    QuerySpec(
        "q74_late_shipments",
        q74_late_shipments,
        f"""
        SELECT o.o_orderpriority,
               CAST(SUM(CASE WHEN l.l_shipdate >
                                  o.o_orderdate + INTERVAL {LATE_DAYS} DAY
                             THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
               CAST(COUNT(*) AS BIGINT) AS total_lines
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
        """,
        "TPC-H Q12 shape: late-shipment line counts per order priority",
    )
)


# --- q75: returned-item revenue top-k (TPC-H Q10 shape) ----------------------
RETURNED_TOPK = 20


def q75_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top customers by revenue lost to returned lines — Q10's
    customer⋈orders⋈lineitem(returnflag='R')⋈nation shape. The
    returned-line filter pushes to the lineitem scan; nation
    broadcasts; the orders⋈lineitem join shuffles on orderkey and the
    customer rollup on custkey. Revenue ranks on decimal-exact doubles
    with c_custkey as the unique tie-breaker."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(_rev(), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(RETURNED_TOPK)
    )


register(
    QuerySpec(
        "q75_returned_revenue",
        q75_returned_revenue,
        f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               {SQL_DEC_SUM.format(x=_REV_SQL)} AS revenue
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey ASC
        LIMIT {RETURNED_TOPK}
        """,
        "TPC-H Q10 shape: top customers by returned-line revenue",
    )
)
