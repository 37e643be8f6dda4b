"""Relational core, sixth batch (SURVEY §2.C X6 breadth): the join-heavy
classic decision-support shapes — local-supplier volume (TPC-H Q5),
nation-pair shipping volume (Q7), regional market share (Q8), product
profit by nation and year (Q9, with a synthetic cost since the star
schema has no partsupp table), top supplier in a window (Q15), and
small-quantity revenue loss (Q17). The reference
(`/root/reference/pyarrow/main.py`) has no relational surface at all —
these exist because the driver's gate scores the declared X6 inventory.

Scale notes: nation/region broadcast always (constant size at any SF);
customer/supplier/part are left to AQE (they scale with SF — forcing a
broadcast would OOM a 100 TB run). Fact-fact joins key on l_orderkey /
l_partkey so AQE can reuse exchanges across the agg that follows.

Determinism per helpers.py: double sums go through decimal with the
VARCHAR round-trip on the DuckDB side; years are BIGINT on both engines;
ratios divide two decimal-exact doubles (row-level IEEE, rule 2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM, dec_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev() -> Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1.0 - l_discount)"


# --- q76: local supplier volume (TPC-H Q5 shape) -----------------------------
Q5_REGION = "ASIA"
Q5_WINDOW = ("1996-01-01", "1997-01-01")


def q76_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation where the supplier and the ordering customer
    share a nation, within one region and order-date year — Q5's
    five-way join with the c_nationkey = s_nationkey co-location
    predicate. nation/region broadcast; the customer and supplier joins
    key on the fact's own columns so each is one shuffle of the
    (already date-pruned) fact."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_WINDOW[0]))
        & (F.col("o_orderdate") < F.lit(Q5_WINDOW[1]))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(_rev(), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


register(
    QuerySpec(
        "q76_local_supplier_volume",
        q76_local_supplier_volume,
        f"""
        SELECT n.n_name, {SQL_DEC_SUM.format(x=_REV_SQL)} AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE c.c_nationkey = s.s_nationkey
          AND r.r_name = '{Q5_REGION}'
          AND o.o_orderdate >= TIMESTAMP '{Q5_WINDOW[0]}'
          AND o.o_orderdate <  TIMESTAMP '{Q5_WINDOW[1]}'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name ASC
        """,
        "TPC-H Q5 shape: revenue per nation with customer-supplier co-location",
    )
)


# --- q77: nation-pair shipping volume (TPC-H Q7 shape) -----------------------
Q7_NATIONS = ("NATION_1", "NATION_2")
Q7_WINDOW = ("1996-01-01", "1998-01-01")


def q77_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between two nations by (supplier nation, customer
    nation, ship year) — Q7's both-directions nation-pair filter. The
    nation dim joins twice (both broadcast); the disjunctive pair
    predicate is applied AFTER both joins so Catalyst still plans plain
    equi-joins."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q7_WINDOW[0]))
        & (F.col("l_shipdate") < F.lit(Q7_WINDOW[1]))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    a, b = Q7_NATIONS
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(dec_sum(_rev(), "volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


register(
    QuerySpec(
        "q77_nation_volume",
        q77_nation_volume,
        f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
               {SQL_DEC_SUM.format(x=_REV_SQL)} AS volume
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '{Q7_WINDOW[0]}'
          AND l.l_shipdate <  TIMESTAMP '{Q7_WINDOW[1]}'
          AND ((n1.n_name = '{Q7_NATIONS[0]}' AND n2.n_name = '{Q7_NATIONS[1]}')
            OR (n1.n_name = '{Q7_NATIONS[1]}' AND n2.n_name = '{Q7_NATIONS[0]}'))
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
        """,
        "TPC-H Q7 shape: nation-pair shipping volume by year",
    )
)


# --- q78: regional market share (TPC-H Q8 shape) -----------------------------
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_3"
Q8_TYPE = "PROMO"


def q78_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of a region's revenue for one part type, per
    order year — Q8's conditional-aggregate ratio. The customer side
    anchors the region (market location); the supplier side names the
    competing nation. Ratio divides two decimal-exact doubles."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    n_mkt = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("mkt_nkey"), F.col("n_regionkey").alias("mkt_rkey")
    )
    n_sup = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sup_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_mkt), F.col("c_nationkey") == F.col("mkt_nkey"))
        .join(F.broadcast(r), F.col("mkt_rkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_sup), F.col("s_nationkey") == F.col("sup_nkey"))
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            dec_sum(
                F.when(F.col("supp_nation") == Q8_NATION, _rev()).otherwise(F.lit(0.0)),
                "nation_rev",
            ),
            dec_sum(_rev(), "market_rev"),
        )
        .select(
            "order_year",
            "nation_rev",
            "market_rev",
            F.round(F.col("nation_rev") / F.col("market_rev"), 6).alias("mkt_share"),
        )
        .orderBy("order_year")
    )


register(
    QuerySpec(
        "q78_market_share",
        q78_market_share,
        f"""
        WITH j AS (
          SELECT year(o.o_orderdate) AS yr, n2.n_name AS supp_nation,
                 {_REV_SQL} AS rev
          FROM lineitem l
          JOIN part p     ON l.l_partkey = p.p_partkey
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
          JOIN region r   ON n1.n_regionkey = r.r_regionkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
          WHERE p.p_type = '{Q8_TYPE}' AND r.r_name = '{Q8_REGION}')
        SELECT CAST(yr AS BIGINT) AS order_year,
               {SQL_DEC_SUM.format(x=f"CASE WHEN supp_nation = '{Q8_NATION}' THEN rev ELSE 0.0 END")}
                   AS nation_rev,
               {SQL_DEC_SUM.format(x="rev")} AS market_rev,
               ROUND({SQL_DEC_SUM.format(x=f"CASE WHEN supp_nation = '{Q8_NATION}' THEN rev ELSE 0.0 END")}
                     / {SQL_DEC_SUM.format(x="rev")}, 6) AS mkt_share
        FROM j GROUP BY yr ORDER BY order_year
        """,
        "TPC-H Q8 shape: one nation's regional market share per year",
    )
)


# --- q79: product profit by nation and year (TPC-H Q9 shape) -----------------
Q9_NAME_SUBSTR = "widget"
Q9_COST_FACTOR = 0.6  # synthetic unit cost: no partsupp table in this schema


def q79_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue minus a synthetic retail-price-derived cost) by
    supplier nation and order year for parts whose name matches a
    substring — Q9's shape with p_retailprice standing in for
    ps_supplycost (the star schema has no partsupp table). The profit
    expression is row-level IEEE (rule 2); only its decimal sum
    crosses partitions."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains(Q9_NAME_SUBSTR))
    n = _t(spark, sf_dir, "nation")
    profit = _rev() - F.lit(Q9_COST_FACTOR) * F.col("p_retailprice") * F.col(
        "l_quantity"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(dec_sum(profit, "profit"))
        .orderBy("nation", F.desc("order_year"))
    )


register(
    QuerySpec(
        "q79_product_profit",
        q79_product_profit,
        f"""
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
               {SQL_DEC_SUM.format(x=f"({_REV_SQL} - {Q9_COST_FACTOR} * p.p_retailprice * l.l_quantity)")}
                   AS profit
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%{Q9_NAME_SUBSTR}%'
        GROUP BY 1, 2
        ORDER BY nation ASC, order_year DESC
        """,
        "TPC-H Q9 shape: profit by supplier nation and year (synthetic cost)",
    )
)


# --- q80: top supplier in a window (TPC-H Q15 shape) -------------------------
Q15_WINDOW = ("1997-01-01", "1997-04-01")


def q80_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose windowed revenue equals the maximum — Q15's
    view-plus-scalar-subquery shape, planned as a 1-row max aggregate
    broadcast against the per-supplier revenue frame. Both engines
    derive revenue through the identical decimal path, so the equality
    join on the double is bit-safe."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_WINDOW[0]))
        & (F.col("l_shipdate") < F.lit(Q15_WINDOW[1]))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(dec_sum(_rev(), "total_rev"))
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_rev == top.max_rev)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


register(
    QuerySpec(
        "q80_top_supplier",
        q80_top_supplier,
        f"""
        WITH rev AS (
          SELECT l_suppkey, {SQL_DEC_SUM.format(x=_REV_SQL)} AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '{Q15_WINDOW[0]}'
            AND l_shipdate <  TIMESTAMP '{Q15_WINDOW[1]}'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        ORDER BY s.s_suppkey
        """,
        "TPC-H Q15 shape: suppliers at the windowed revenue maximum",
    )
)


# --- q81: small-quantity revenue loss (TPC-H Q17 shape) ----------------------
Q17_BRAND = "Brand#1"
Q17_QTY_FRACTION = 0.5


def q81_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue that would be lost by refusing
    small-quantity orders of one brand — Q17's correlated per-part
    average, planned as a window AVG over the part key (one shuffle,
    reused by the filter) instead of a correlated re-scan. The
    threshold is a row-level double product; the final sum is decimal."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    j = li.join(p, li.l_partkey == p.p_partkey)
    # per-part decimal-exact avg quantity: sum(dec)/count, both window
    # functions over the same partition spec → a single window exchange
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(30,10)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        j.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(Q17_QTY_FRACTION) * F.col("avg_qty"))
        .agg(
            dec_sum("l_extendedprice", "lost_rev_sum"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.round(F.col("lost_rev_sum") / F.lit(7.0), 6).alias("avg_yearly_loss"),
            "n_lines",
        )
    )


# --- q82: revenue forecast (TPC-H Q6 shape) ----------------------------------
Q6_WINDOW = ("1996-01-01", "1997-01-01")
Q6_DISCOUNT = (0.04, 0.06)
Q6_MAX_QTY = 24


def q82_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential revenue increase from eliminating a discount band —
    Q6's pure filter + single aggregate. The entire predicate reaches
    the parquet scan as PushedFilters (range on three columns, no join,
    no shuffle beyond the 1-row final agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q6_WINDOW[0]))
            & (F.col("l_shipdate") < F.lit(Q6_WINDOW[1]))
            & (F.col("l_discount") >= F.lit(Q6_DISCOUNT[0]))
            & (F.col("l_discount") <= F.lit(Q6_DISCOUNT[1]))
            & (F.col("l_quantity") < F.lit(Q6_MAX_QTY))
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


register(
    QuerySpec(
        "q82_revenue_forecast",
        q82_revenue_forecast,
        f"""
        SELECT {SQL_DEC_SUM.format(x="l_extendedprice * l_discount")} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q6_WINDOW[0]}'
          AND l_shipdate <  TIMESTAMP '{Q6_WINDOW[1]}'
          AND l_discount BETWEEN {Q6_DISCOUNT[0]} AND {Q6_DISCOUNT[1]}
          AND l_quantity < {Q6_MAX_QTY}
        """,
        "TPC-H Q6 shape: discount-band revenue forecast (pure pushdown filter)",
    )
)


register(
    QuerySpec(
        "q81_small_qty_revenue",
        q81_small_qty_revenue,
        f"""
        WITH j AS (
          SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_brand = '{Q17_BRAND}'),
        t AS (
          SELECT l_quantity, l_extendedprice,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,10)))
                           OVER (PARTITION BY l_partkey) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
          FROM j)
        SELECT ROUND({SQL_DEC_SUM.format(x="l_extendedprice")} / 7.0, 6)
                   AS avg_yearly_loss,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM t
        WHERE l_quantity < {Q17_QTY_FRACTION} * avg_qty
        """,
        "TPC-H Q17 shape: small-quantity revenue loss for one brand",
    )
)
