"""Relational core (SURVEY §2.C X6): filter/project, aggregation, joins
(broadcast, shuffle, semi, anti), windows, set ops, rollup/cube/grouping
sets, top-k, scalar function families, distinct counting.

Each query is written DataFrame-first so Catalyst plans it (pushdown,
pruning, join selection); broadcast hints are explicit where a side is
known-small at every scale factor (region/nation are fixed-size dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_AVG, SQL_DEC_SUM, date_str, dec_avg, dec_sum, ts_us


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q01: pricing summary (TPC-H Q1 shape: scan → filter → hash agg) -------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


register(
    QuerySpec(
        "q01_pricing_summary",
        q01_pricing_summary,
        f"""
        SELECT l_returnflag, l_linestatus,
               {SQL_DEC_SUM.format(x='l_quantity')} AS sum_qty,
               {SQL_DEC_SUM.format(x='l_extendedprice')} AS sum_base_price,
               {SQL_DEC_SUM.format(x='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {SQL_DEC_SUM.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {SQL_DEC_AVG.format(x='l_quantity')} AS avg_qty,
               {SQL_DEC_AVG.format(x='l_extendedprice')} AS avg_price,
               {SQL_DEC_AVG.format(x='l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
        "TPC-H Q1-shaped pricing summary: filter → grouped 8-way agg",
    )
)


# --- q02: filter + projection (predicate pushdown to the parquet scan) -----
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_quantity") > 45)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            date_str("l_shipdate", "ship_date"),
        )
    )


register(
    QuerySpec(
        "q02_filter_project",
        q02_filter_project,
        """
        SELECT l_orderkey, l_linenumber, l_quantity,
               l_extendedprice * (1 - l_discount) AS revenue,
               strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_quantity > 45
        """,
        "selective filter + projection; predicates push to the parquet scan",
    )
)


# --- q03: multi-way join with broadcast dims → grouped agg ------------------
def q03_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        # region/nation are constant-size dims (5/25 rows at every SF):
        # always broadcast — no shuffle for the dim side at 100 TB either.
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dec_sum("o_totalprice", "total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


register(
    QuerySpec(
        "q03_join_revenue_by_nation",
        q03_join_revenue_by_nation,
        f"""
        SELECT r_name, n_name,
               {SQL_DEC_SUM.format(x='o_totalprice')} AS total_revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        """,
        "orders⋈customer⋈nation⋈region with broadcast dims → revenue rollup",
    )
)


# --- q04/q05: semi & anti joins --------------------------------------------
def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        customer.join(big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


register(
    QuerySpec(
        "q04_semi_join",
        q04_semi_join,
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY c_mktsegment
        """,
        "left-semi join (EXISTS): customers with a >400k order, by segment",
    )
)


def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Anti against a selective subset (urgent orders) so the result is
    # non-empty at every scale factor — every customer has some order.
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


register(
    QuerySpec(
        "q05_anti_join",
        q05_anti_join,
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        """,
        "left-anti join (NOT EXISTS): customers with no urgent orders",
    )
)


# --- q06: grouped statistics over the event stream table -------------------
def q06_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        dec_sum("value", "sum_value"),
        dec_avg("value", "avg_value"),
    )


register(
    QuerySpec(
        "q06_event_stats",
        q06_event_stats,
        f"""
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               MIN(value) AS min_value, MAX(value) AS max_value,
               {SQL_DEC_SUM.format(x='value')} AS sum_value,
               {SQL_DEC_AVG.format(x='value')} AS avg_value
        FROM events GROUP BY event_type
        """,
        "grouped count/distinct/min/max/sum/avg over events",
    )
)


# --- q07: windowed top-k per group -----------------------------------------
def q07_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("long").alias("rn"))
    )


register(
    QuerySpec(
        "q07_topk_per_customer",
        q07_topk_per_customer,
        """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        FROM orders
        QUALIFY rn <= 3
        """,
        "top-3 orders per customer via row_number window",
    )
)


# --- q08: running window aggregates + lag ----------------------------------
def q08_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        ts_us("ts", "ts_us"),
        F.count(F.lit(1)).over(run).alias("running_n"),
        F.sum(F.col("value").cast("decimal(30,10)")).over(run).cast("double").alias("running_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
    )


register(
    QuerySpec(
        "q08_running_window",
        q08_running_window,
        """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               COUNT(*) OVER w AS running_n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(30,10))) OVER w AS VARCHAR) AS DOUBLE)
                   AS running_value,
               lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "per-user running count/sum + lag over event time",
    )
)


# --- q09: set operations ----------------------------------------------------
def q09_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    active = (
        orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    )
    return (
        rich.union(active).distinct().withColumn("op", F.lit("union"))
        .unionAll(rich.intersect(active).withColumn("op", F.lit("intersect")))
        .unionAll(rich.subtract(active).withColumn("op", F.lit("except")))
        .select("op", "c_custkey")
    )


register(
    QuerySpec(
        "q09_set_ops",
        q09_set_ops,
        """
        WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
             active AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
        SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM rich UNION SELECT c_custkey FROM active)
        UNION ALL
        SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM active)
        UNION ALL
        SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM active)
        """,
        "union / intersect / except over customer key sets, tagged",
    )
)


# --- q10/q11/q12: rollup, cube, grouping sets ------------------------------
def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("l_quantity", "sum_qty")
    )


register(
    QuerySpec(
        "q10_rollup",
        q10_rollup,
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               {SQL_DEC_SUM.format(x='l_quantity')} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "hierarchical rollup totals",
    )
)


def q11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice", "sum_price")
    )


register(
    QuerySpec(
        "q11_cube",
        q11_cube,
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               {SQL_DEC_SUM.format(x='o_totalprice')} AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "cube over status × priority",
    )
)


def q12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


register(
    QuerySpec(
        "q12_grouping_sets",
        q12_grouping_sets,
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        "explicit grouping sets",
    )
)


# --- q13/q14/q15: scalar function families ---------------------------------
def q13_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.when(F.col("p_type").contains("PROMO"), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("is_promo"),
    )


register(
    QuerySpec(
        "q13_string_funcs",
        q13_string_funcs,
        """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               lower(p_brand) AS brand_lower,
               CAST(length(p_name) AS BIGINT) AS name_len,
               substring(p_type, 1, 5) AS type_prefix,
               concat_ws('/', p_brand, p_type) AS brand_type,
               reverse(p_name) AS name_rev,
               CAST(CASE WHEN p_type LIKE '%PROMO%' THEN 1 ELSE 0 END AS BIGINT) AS is_promo
        FROM part
        """,
        "string scalar family: case, length, substring, concat, reverse, LIKE",
    )
)


def q14_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_1995"),
        date_str(F.date_add(F.col("o_orderdate"), 30), "due_date"),
    )


register(
    QuerySpec(
        "q14_date_funcs",
        q14_date_funcs,
        """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(month(o_orderdate) AS BIGINT) AS o_month,
               CAST(day(o_orderdate) AS BIGINT) AS o_day,
               CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS days_since_1995,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
        FROM orders
        """,
        "date scalar family: extract fields, datediff, date arithmetic",
    )
)


def q15_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


register(
    QuerySpec(
        "q15_math_funcs",
        q15_math_funcs,
        """
        SELECT l_orderkey,
               sqrt(l_quantity) AS qty_sqrt,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
               greatest(l_tax, l_discount) AS max_rate,
               least(l_tax, l_discount) AS min_rate
        FROM lineitem WHERE l_linenumber = 1
        """,
        "math scalar family (IEEE-exact ops only: sqrt/floor/ceil/abs/mod)",
    )
)


# --- q16: array functions over the embedding vectors -----------------------
def q16_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
        F.array_max("embedding").cast("double").alias("vmax"),
        F.array_min("embedding").cast("double").alias("vmin"),
    )


register(
    QuerySpec(
        "q16_array_funcs",
        q16_array_funcs,
        """
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               CAST(embedding[64] AS DOUBLE) AS last_val,
               CAST(list_max(embedding) AS DOUBLE) AS vmax,
               CAST(list_min(embedding) AS DOUBLE) AS vmin
        FROM embeddings
        """,
        "array scalar family over 64-dim vectors",
    )
)


# --- q17: JSON extraction from the events.props column ---------------------
def q17_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_id", "event_type", k.alias("k"))
        .filter(F.col("k") > 50)
    )


register(
    QuerySpec(
        "q17_json_funcs",
        q17_json_funcs,
        """
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        """,
        "JSON path extraction + predicate on extracted value",
    )
)


# --- q18: global top-k ------------------------------------------------------
def q18_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k
    # then a k-row merge on the driver — no global sort even at 100 TB.
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


register(
    QuerySpec(
        "q18_global_topk",
        q18_global_topk,
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "global top-10 via TakeOrderedAndProject (no full sort)",
    )
)


# --- q19: exact distinct counting ------------------------------------------
def q19_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


register(
    QuerySpec(
        "q19_distinct_counts",
        q19_distinct_counts,
        """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
        """,
        "exact multi-column distinct counts",
    )
)


# --- q20: approximate distinct (HLL) — engine-specific sketch, rows-only ---
# Target relative standard deviation of the HLL++ sketch; shared with the
# x192 error audit, which asserts the estimate lands within a multiple of
# this bound of the exact count.
Q20_RSD = 0.01


def q20_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=Q20_RSD).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


register(
    QuerySpec(
        "q20_approx_distinct",
        q20_approx_distinct,
        None,  # HLL++ sketch values are engine-specific — rows-only check
        "approx_count_distinct (HyperLogLog++); no cross-engine oracle",
    )
)


# --- q21: scalar subquery (orders above global average) --------------------
def q21_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    avg_row = orders.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(30,10)")).cast("double") / F.count(F.lit(1))).alias("avg_price")
    )
    # 1-row aggregate broadcast-joined — the Spark shape of a scalar subquery.
    return (
        orders.crossJoin(F.broadcast(avg_row))
        .filter(F.col("o_totalprice") > F.col("avg_price") * 1.8)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


register(
    QuerySpec(
        "q21_above_avg_orders",
        q21_above_avg_orders,
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (
            -- VARCHAR round-trip (helpers.py SQL_DEC_AVG): DuckDB's
            -- decimal->double cast can be 1 ulp off Spark's, which could
            -- flip membership of rows sitting exactly at the threshold.
            SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS VARCHAR)
                        AS DOUBLE) / COUNT(*)
            FROM orders) * 1.8
        """,
        "scalar subquery as broadcast 1-row aggregate",
    )
)


# --- q22: pivot (conditional aggregation) ----------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q22_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return ev.groupBy("user_id").agg(*aggs)


register(
    QuerySpec(
        "q22_pivot_events",
        q22_pivot_events,
        """
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
               COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
        FROM events GROUP BY user_id
        """,
        "pivot via conditional aggregation (one pass, no per-value scans)",
    )
)


# --- q23: as-of join (custom operator: Spark lacks a native one) -----------
def q23_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the timestamp of the same user's most recent
    strictly-preceding click. Implemented scalably as ONE window pass over
    the union (sort within user partitions), not an O(n²) inequality join:
    last(click_ts, ignorenulls) over rows (-∞, -1]."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        ev.withColumn("last_click", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            ts_us("ts", "purchase_us"),
            ts_us("last_click", "last_click_us"),
        )
    )


register(
    QuerySpec(
        "q23_asof_last_click",
        q23_asof_last_click,
        """
        SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us,
               (SELECT epoch_us(max(c.ts)) FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id)))
                   AS last_click_us
        FROM events p WHERE p.event_type = 'purchase'
        """,
        "as-of join via single window pass (vs oracle's correlated subquery)",
    )
)
