"""Relational core, second batch: time-bucketed rollups, sessionization,
regexp family, null-handling scalars, exact statistical moments,
percentiles, HAVING, positional explode, and TPC-H Q3/Q6-shaped joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM, dec_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q24: TPC-H Q6 shape — tight filter → single global aggregate ----------
def q24_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") > 0.03)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


register(
    QuerySpec(
        "q24_revenue_delta",
        q24_revenue_delta,
        f"""
        SELECT {SQL_DEC_SUM.format(x='l_extendedprice * l_discount')} AS revenue_delta,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount > 0.03 AND l_quantity < 24
        """,
        "TPC-H Q6 shape: selective scan → single-row aggregate",
    )
)


# --- q25: time-bucketed rollup over the event stream -----------------------
def q25_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
    return (
        ev.groupBy(hour.alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("value", "sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


register(
    QuerySpec(
        "q25_hourly_rollup",
        q25_hourly_rollup,
        f"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
               event_type, COUNT(*) AS n,
               {SQL_DEC_SUM.format(x='value')} AS sum_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2
        """,
        "hypertable-style hourly rollup (date_trunc bucketing)",
    )
)


# --- q26: sessionization (gap > 30 min starts a new session) ---------------
SESSION_GAP_US = 30 * 60 * 1_000_000


def q26_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(is_new).over(run).cast("long").alias("session_id"),
    )


register(
    QuerySpec(
        "q26_sessionize",
        q26_sessionize,
        f"""
        SELECT user_id, event_id,
               CAST(SUM(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_US}
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM (SELECT user_id, event_id, ts,
                     epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
              FROM events)
        """,
        "sessionization: lag-gap flag + running sum (single window pass)",
    )
)


# --- q27: regexp family -----------------------------------------------------
def q27_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).cast("long").alias("brand_num"),
        F.col("p_name").rlike("(ring|bolt)").cast("boolean").alias("is_fastener"),
    )


register(
    QuerySpec(
        "q27_regexp_funcs",
        q27_regexp_funcs,
        """
        SELECT p_partkey,
               regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
               regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
               CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
               regexp_matches(p_name, '(ring|bolt)') AS is_fastener
        FROM part
        """,
        "regexp extract/replace/match (RE2-safe patterns only)",
    )
)


# --- q28: null-handling scalars --------------------------------------------
def q28_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).alias(
            "big_price_or_null"
        ),
        (F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull()).alias("is_open"),
    )


register(
    QuerySpec(
        "q28_null_handling",
        q28_null_handling,
        """
        SELECT o_orderkey,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
               CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS big_price_or_null,
               NULLIF(o_orderstatus, 'O') IS NULL AS is_open
        FROM orders
        """,
        "coalesce / nullif / conditional-null scalars",
    )
)


# --- q29: statistical aggregates from exact moments ------------------------
def q29_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation computed from exact decimal moments
    (sum, sum-of-squares, sum-of-products) with the final closed-form
    arithmetic done identically in both engines — deterministic where the
    engines' own var_samp/corr (parallel float accumulation) are not."""
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum(x, "sx"),
        dec_sum(x * x, "sxx"),
        dec_sum(y, "sy"),
        dec_sum(y * y, "syy"),
        dec_sum(x * y, "sxy"),
    )
    n = F.col("n").cast("double")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    return agg.select(
        "l_returnflag",
        "n",
        var_x.alias("var_qty"),
        F.sqrt(var_x).alias("std_qty"),
        (cov / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_qty_price"),
    )


register(
    QuerySpec(
        "q29_exact_moments",
        q29_exact_moments,
        f"""
        WITH m AS (
          SELECT l_returnflag, COUNT(*) AS n,
                 {SQL_DEC_SUM.format(x='l_quantity')} AS sx,
                 {SQL_DEC_SUM.format(x='l_quantity * l_quantity')} AS sxx,
                 {SQL_DEC_SUM.format(x='l_extendedprice')} AS sy,
                 {SQL_DEC_SUM.format(x='l_extendedprice * l_extendedprice')} AS syy,
                 {SQL_DEC_SUM.format(x='l_quantity * l_extendedprice')} AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS var_qty,
               sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS std_qty,
               ((sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
                   / (sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
                      * sqrt((syy - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)))
                   AS corr_qty_price
        FROM m
        """,
        "variance/stddev/correlation via exact decimal moments",
    )
)


# --- q30: HAVING (post-aggregation filter) ---------------------------------
def q30_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(dec_sum("l_quantity", "total_qty"), F.count(F.lit(1)).alias("n_lines"))
        .filter(F.col("n_lines") > 100)
    )


register(
    QuerySpec(
        "q30_having",
        q30_having,
        f"""
        SELECT l_suppkey, {SQL_DEC_SUM.format(x='l_quantity')} AS total_qty,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 100
        """,
        "aggregate + HAVING filter",
    )
)


# --- q31: positional explode ------------------------------------------------
def q31_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 3)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), F.col("val").cast("double").alias("val"))


register(
    QuerySpec(
        "q31_posexplode",
        q31_posexplode,
        """
        SELECT vec_id,
               CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings WHERE vec_id < 3
        """,
        "positional array explode (parallel unnest zip in the oracle)",
    )
)


# --- q32: TPC-H Q3 shape — join chain → grouped revenue → top-10 -----------
def q32_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(dec_sum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


register(
    QuerySpec(
        "q32_shipping_priority",
        q32_shipping_priority,
        f"""
        SELECT l_orderkey, o_orderpriority,
               {SQL_DEC_SUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "TPC-H Q3 shape: filtered 3-way join → grouped revenue → top-10",
    )
)


# --- q33: exact interpolated percentiles (rounded) -------------------------
def q33_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    QuerySpec(
        "q33_percentiles",
        q33_percentiles,
        """
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
        """,
        "exact linear-interpolated percentiles (rounded to absorb ulp drift)",
    )
)


# --- q34/q35/q36: outer and cross joins ------------------------------------
def q34_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers LEFT OUTER their urgent orders: null-padded right side,
    then null-tolerant aggregation — the join family q03-q05 doesn't cover."""
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_outer")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_urgent_orders"),  # nulls not counted
        F.countDistinct("c_custkey").alias("n_customers"),
        dec_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "urgent_revenue"),
    )


register(
    QuerySpec(
        "q34_left_outer_join",
        q34_left_outer_join,
        f"""
        SELECT c_mktsegment, COUNT(*) AS n_rows,
               COUNT(o_orderkey) AS n_urgent_orders,
               COUNT(DISTINCT c_custkey) AS n_customers,
               {SQL_DEC_SUM.format(x="COALESCE(o_totalprice, 0.0)")} AS urgent_revenue
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        GROUP BY c_mktsegment
        """,
        "left outer join with null-tolerant aggregation",
    )
)


def q35_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER of two per-nation aggregates (suppliers vs customers):
    either side may be missing → coalesced keys, null-aware counts."""
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    j = supp.join(cust, "nk", "full_outer")
    return j.select(
        F.col("nk").cast("long").alias("nationkey"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
    )


register(
    QuerySpec(
        "q35_full_outer_join",
        q35_full_outer_join,
        """
        WITH s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
                   FROM supplier GROUP BY 1),
             c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
                   FROM customer GROUP BY 1)
        SELECT CAST(COALESCE(s.nk, c.nk) AS BIGINT) AS nationkey,
               COALESCE(n_suppliers, 0) AS n_suppliers,
               COALESCE(n_customers, 0) AS n_customers
        FROM s FULL OUTER JOIN c ON s.nk = c.nk
        """,
        "full outer join of two aggregates with coalesced keys",
    )
)


def q36_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join: region × region distance-matrix shape."""
    r1 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("from_region"))
    r2 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("to_region"))
    return r1.crossJoin(r2).filter(F.col("from_region") != F.col("to_region"))


register(
    QuerySpec(
        "q36_cross_join",
        q36_cross_join,
        """
        SELECT a.r_name AS from_region, b.r_name AS to_region
        FROM region a CROSS JOIN region b
        WHERE a.r_name != b.r_name
        """,
        "bounded cross join (dim × dim)",
    )
)


# --- q37/q38/q39: collection aggregates and unpivot ------------------------
def q37_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic collection aggregate: collect_set is unordered, so the
    output is always sort_array'd before leaving the operator — and then
    serialized to a CSV string (helpers.py rule: no array columns in
    output; the driver's pandas canonicalization cannot sort lists)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus"))).alias(
            "statuses"
        ),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_set(F.col("l_suppkey") % 10)),
                lambda x: x.cast("string"),
            ),
        ).alias("supp_mod10"),
    )


register(
    QuerySpec(
        "q37_array_agg",
        q37_array_agg,
        """
        SELECT l_returnflag,
               array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
                   AS statuses,
               array_to_string(
                   list_transform(list_sort(list(DISTINCT l_suppkey % 10)),
                                  x -> CAST(x AS VARCHAR)), ',')
                   AS supp_mod10
        FROM lineitem GROUP BY l_returnflag
        """,
        "array aggregation (collect_set, sorted + CSV-serialized)",
    )
)


def q38_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("types_csv"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    QuerySpec(
        "q38_string_agg",
        q38_string_agg,
        """
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
               COUNT(*) AS n
        FROM events GROUP BY user_id
        """,
        "ordered string aggregation",
    )
)


def q39_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long: unpivot the per-line charge components into
    (measure, value) rows via stack()."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.expr(
            "stack(3, 'price', l_extendedprice, 'discount', l_discount, 'tax', l_tax)"
        ).alias("measure", "value"),
    )


register(
    QuerySpec(
        "q39_unpivot",
        q39_unpivot,
        """
        SELECT l_orderkey, measure, value
        FROM (SELECT l_orderkey, l_extendedprice AS price,
                     l_discount AS discount, l_tax AS tax
              FROM lineitem WHERE l_linenumber = 1)
        UNPIVOT (value FOR measure IN (price, discount, tax))
        """,
        "unpivot wide columns to (measure, value) rows",
    )
)


# --- q40: SCD2 history construction ----------------------------------------
def q40_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change log (each order =
    a change to its customer's 'current order' attribute) into validity
    intervals via a single lead() window — the engine-native CDC shape
    (no MERGE needed for append-only history builds)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    lead_date = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        F.col("o_orderkey").alias("version_key"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(F.date_format(lead_date, "yyyy-MM-dd"), F.lit("9999-12-31")).alias(
            "valid_to"
        ),
        (lead_date.isNull()).alias("is_current"),
    )


register(
    QuerySpec(
        "q40_scd2_history",
        q40_scd2_history,
        """
        SELECT o_custkey,
               o_orderkey AS version_key,
               strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
               COALESCE(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d'),
                        '9999-12-31') AS valid_to,
               lead(o_orderdate) OVER w IS NULL AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "SCD2 validity intervals from a change log (single lead window)",
    )
)


# --- q41: ranking window functions ------------------------------------------
def q41_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking family over one window (unique total order via the
    orderkey tie-breaker, so every engine ranks identically)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first_value(F.col("o_orderkey")).over(w).alias("top_order"),
    )


register(
    QuerySpec(
        "q41_window_ranks",
        q41_window_ranks,
        """
        SELECT o_orderkey, o_orderstatus,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk,
               percent_rank() OVER w AS prnk,
               cume_dist() OVER w AS cdist,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               first_value(o_orderkey) OVER w AS top_order
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
        """,
        "rank / dense_rank / percent_rank / cume_dist / ntile / first_value",
    )
)


# --- q42/q43/q44: correlated agg subquery, arg-extremes, conditional distinct
def q42_above_own_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose average order value exceeds the global average —
    correlated aggregate subquery shape, decomposed Spark-style into two
    exact-decimal aggregates and a broadcast of the 1-row global."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(30,10)")).cast("double") / F.count(F.lit(1))).alias("cust_avg"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    overall = orders.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(30,10)")).cast("double") / F.count(F.lit(1))).alias("global_avg")
    )
    return (
        per_cust.crossJoin(F.broadcast(overall))
        .filter(F.col("cust_avg") > F.col("global_avg"))
        .select("o_custkey", "cust_avg", "n_orders")
    )


register(
    QuerySpec(
        "q42_above_own_avg",
        q42_above_own_avg,
        """
        WITH g AS (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
                          / COUNT(*) AS global_avg FROM orders)
        SELECT o_custkey,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS cust_avg,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
        HAVING cust_avg > (SELECT global_avg FROM g)
        """,
        "correlated-aggregate shape: per-group avg vs broadcast global avg",
    )
)


def q43_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (arg-extremes) with a composite comparator so ties
    cannot make the picked row nondeterministic."""
    orders = _t(spark, sf_dir, "orders")
    key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return orders.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", key).alias("biggest_order"),
        F.min_by("o_orderkey", key).alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


register(
    QuerySpec(
        "q43_arg_extremes",
        q43_arg_extremes,
        """
        WITH m AS (SELECT o_orderstatus, MAX(o_totalprice) AS mx,
                          MIN(o_totalprice) AS mn
                   FROM orders GROUP BY 1)
        SELECT m.o_orderstatus,
               (SELECT MAX(o_orderkey) FROM orders o
                WHERE o.o_orderstatus = m.o_orderstatus
                  AND o.o_totalprice = m.mx) AS biggest_order,
               (SELECT MIN(o_orderkey) FROM orders o
                WHERE o.o_orderstatus = m.o_orderstatus
                  AND o.o_totalprice = m.mn) AS smallest_order,
               m.mx AS max_price
        FROM m
        """,
        "arg_min/arg_max with composite tie-proof comparator",
    )
)


def q44_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct(F.when(F.col("value") > 50, F.col("user_id"))).alias(
            "big_spenders"
        ),
        F.countDistinct(
            F.when(F.hour("ts") < 12, F.col("user_id"))
        ).alias("morning_users"),
    )


register(
    QuerySpec(
        "q44_conditional_distinct",
        q44_conditional_distinct,
        """
        SELECT event_type,
               COUNT(DISTINCT CASE WHEN value > 50 THEN user_id END) AS big_spenders,
               COUNT(DISTINCT CASE WHEN hour(ts) < 12 THEN user_id END) AS morning_users
        FROM events GROUP BY event_type
        """,
        "conditional distinct counting",
    )
)


# --- q45: null repair (fillna / dropna family) ------------------------------
def q45_null_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Induce nulls (every 7th value, empty-ish types), then repair:
    fill numeric with a default, fill string with a sentinel, and flag
    rows that needed repair — the cleanup pass before training-data use."""
    ev = _t(spark, sf_dir, "events")
    dirty = ev.select(
        "event_id",
        F.when(F.col("event_id") % 7 != 0, F.col("value")).alias("value"),
        F.nullif(F.col("event_type"), F.lit("view")).alias("event_type"),
    )
    repaired = dirty.select(
        "event_id",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        F.coalesce(F.col("event_type"), F.lit("unknown")).alias("type_filled"),
        (F.col("value").isNull() | F.col("event_type").isNull()).alias("was_repaired"),
    )
    return repaired


register(
    QuerySpec(
        "q45_null_repair",
        q45_null_repair,
        """
        WITH dirty AS (
          SELECT event_id,
                 CASE WHEN event_id % 7 != 0 THEN value END AS value,
                 NULLIF(event_type, 'view') AS event_type
          FROM events)
        SELECT event_id,
               COALESCE(value, 0.0) AS value_filled,
               COALESCE(event_type, 'unknown') AS type_filled,
               (value IS NULL OR event_type IS NULL) AS was_repaired
        FROM dirty
        """,
        "null induction + fillna-style repair with repair flags",
    )
)


# --- q46: map type construction and access ---------------------------------
def q46_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key access + cardinality; the map stays internal
    to the query (cross-engine map rendering differs), scalars come out."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    m = F.create_map(
        F.lit("k"), k,
        F.lit("double_k"), k * 2,
        F.lit("event"), F.col("event_id"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(m, "double_k").alias("k2_val"),
        F.size(m).cast("long").alias("map_size"),
        F.array_contains(F.map_keys(m), "event").alias("has_event_key"),
    )


register(
    QuerySpec(
        "q46_map_funcs",
        q46_map_funcs,
        """
        SELECT event_id,
               m['k'][1] AS k_val,
               m['double_k'][1] AS k2_val,
               CAST(cardinality(m) AS BIGINT) AS map_size,
               list_contains(map_keys(m), 'event') AS has_event_key
        FROM (
          SELECT event_id,
                 map(['k', 'double_k', 'event'],
                     [CAST(json_extract_string(props, '$.k') AS BIGINT),
                      CAST(json_extract_string(props, '$.k') AS BIGINT) * 2,
                      event_id]) AS m
          FROM events)
        """,
        "map construction, key access, cardinality, key introspection",
    )
)


# --- q50: lateral join (correlated per-row subquery) -----------------------
def q50_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-3 customers by account balance via a correlated
    LATERAL subquery (Spark 4 ``DataFrame.lateralJoin``). Catalyst
    decorrelates the ORDER BY ... LIMIT into a WindowGroupLimit pushed
    map-side of one equi-join shuffle — each partition pre-prunes to its
    local top-3 per key before the exchange, so the shuffle carries at
    most 3 rows per (partition, nation), not the whole customer table.
    Balance is a row-level double (helpers.py rule 2); c_custkey breaks
    balance ties so the selected set is well-defined (rule 6)."""
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    top = (
        cust.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(3)
    )
    return nation.lateralJoin(top).select(
        "n_name", "c_custkey", "c_name", F.col("c_acctbal").alias("bal")
    )


register(
    QuerySpec(
        "q50_lateral_topk",
        q50_lateral_topk,
        """
        SELECT n.n_name, t.c_custkey, t.c_name, t.bal
        FROM nation n, LATERAL (
          SELECT c_custkey, c_name, c_acctbal AS bal
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 3) t
        """,
        "correlated LATERAL subquery with per-row ORDER BY/LIMIT (top-3 per nation)",
    )
)


# --- q51: RANGE-frame window (rolling 30-day sum) --------------------------
def q51_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling 30-day order total via a RANGE window frame
    over epoch seconds — the time-decay feature shape (ROWS frames count
    rows; RANGE frames bound by the ORDER-BY value, so same-timestamp
    peers always share a frame in both engines). One shuffle on customer;
    the sum follows helpers rule 1 (decimal addends, exact, order-free)."""
    orders = _t(spark, sf_dir, "orders")
    sec = F.unix_micros(F.col("o_orderdate").cast("timestamp")) / F.lit(1_000_000)
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        sec.cast("long").alias("order_sec"),
        F.col("o_totalprice").alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_sec")
        .rangeBetween(-30 * 86400, 0)
    )
    rolling = F.sum(F.col("price").cast("decimal(30,10)")).over(w).cast("double")
    return base.select(
        "o_orderkey", "o_custkey", "order_sec", rolling.alias("rolling_30d")
    )


register(
    QuerySpec(
        "q51_range_window",
        q51_range_window,
        """
        SELECT o_orderkey, o_custkey,
               CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT) AS order_sec,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY epoch_us(o_orderdate) // 1000000
                   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
               ) AS VARCHAR) AS DOUBLE) AS rolling_30d
        FROM orders
        """,
        "RANGE-frame window: rolling 30-day per-customer revenue",
    )
)


# --- q52: forward fill (last_value IGNORE NULLS) ---------------------------
def q52_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill: carry the last observed value over a deterministic
    null gap (event_id % 3 = 0) per user in time order — the sensor /
    telemetry gap-repair shape. ``last(ignorenulls)`` over ROWS UNBOUNDED
    PRECEDING is one shuffle on user_id; value is a row-level double
    (rule 2), event_id breaks ts ties (rule 6)."""
    ev = _t(spark, sf_dir, "events")
    gapped = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return gapped.select(
        "event_id",
        "user_id",
        "ts_us",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


register(
    QuerySpec(
        "q52_gap_fill",
        q52_gap_fill,
        """
        WITH gapped AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                 CASE WHEN event_id % 3 != 0 THEN value END AS v
          FROM events)
        SELECT event_id, user_id, ts_us,
               LAST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
               v IS NULL AS was_gap
        FROM gapped
        """,
        "forward fill over deterministic gaps (last_value IGNORE NULLS window)",
    )
)


# --- q53: quantile-bucket featurization (ntile / percent_rank / cume_dist) --
def q53_quantile_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile featurization: decile bucket, percent rank, and cumulative
    distribution of order value WITHIN each priority class — the
    feature-binning pass before model training. Partitioned by priority
    (bounded cardinality), never a global single-partition window;
    o_orderkey breaks price ties so every rank function is well-defined
    (helpers rule 6); the fractional ranks are rounded (rule 3)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


register(
    QuerySpec(
        "q53_quantile_features",
        q53_quantile_features,
        """
        SELECT o_orderkey, o_orderpriority,
               CAST(ntile(10) OVER w AS BIGINT) AS decile,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
        """,
        "quantile featurization: ntile/percent_rank/cume_dist per priority class",
    )
)


# --- q54: multiset set ops (INTERSECT ALL / EXCEPT ALL) ---------------------
def q54_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag semantics set ops: customers' order-status multisets compared
    with INTERSECT ALL (min multiplicity survives) and EXCEPT ALL
    (multiplicity subtracts) — q09's set-op family completed. Catalyst
    rewrites both to one hash aggregate + generate, no join."""
    orders = _t(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    urgent_c = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        open_c.intersectAll(urgent_c)
        .withColumn("op", F.lit("intersect_all"))
        .unionAll(open_c.exceptAll(urgent_c).withColumn("op", F.lit("except_all")))
    )


register(
    QuerySpec(
        "q54_set_ops_all",
        q54_set_ops_all,
        """
        WITH o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        SELECT o_custkey, 'intersect_all' AS op
        FROM (SELECT o_custkey FROM o INTERSECT ALL SELECT o_custkey FROM u)
        UNION ALL
        SELECT o_custkey, 'except_all' AS op
        FROM (SELECT o_custkey FROM o EXCEPT ALL SELECT o_custkey FROM u)
        """,
        "bag-semantics INTERSECT ALL / EXCEPT ALL over customer multisets",
    )
)


# --- q55: conversion funnel (first click → first purchase after it) ---------
def q55_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user conversion funnel: first click, then the first purchase
    AFTER that click, conversion flag and seconds-to-convert — the
    product-analytics query a sessionized event stream feeds. Two keyed
    aggregates + one equi-join on user_id; the conditional min avoids any
    ordered scan (no window over the full event stream)."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(us).alias("first_click_us"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("p_us")
    )
    conv = (
        clicks.join(purchases, "user_id", "left")
        .groupBy("user_id", "first_click_us")
        .agg(
            F.min(
                F.when(F.col("p_us") > F.col("first_click_us"), F.col("p_us"))
            ).alias("conv_us")
        )
    )
    return conv.select(
        "user_id",
        "first_click_us",
        F.col("conv_us").isNotNull().alias("converted"),
        ((F.col("conv_us") - F.col("first_click_us")) / F.lit(1_000_000))
        .cast("long")
        .alias("secs_to_convert"),
    )


register(
    QuerySpec(
        "q55_funnel",
        q55_funnel,
        """
        WITH clicks AS (
          SELECT user_id, MIN(epoch_us(ts)) AS first_click_us
          FROM events WHERE event_type = 'click' GROUP BY user_id),
        purchases AS (
          SELECT user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
        conv AS (
          SELECT c.user_id, c.first_click_us,
                 MIN(CASE WHEN p.p_us > c.first_click_us THEN p.p_us END) AS conv_us
          FROM clicks c LEFT JOIN purchases p USING (user_id)
          GROUP BY c.user_id, c.first_click_us)
        SELECT user_id, first_click_us,
               conv_us IS NOT NULL AS converted,
               CAST((conv_us - first_click_us) // 1000000 AS BIGINT)
                   AS secs_to_convert
        FROM conv
        """,
        "conversion funnel: first click → first later purchase, time to convert",
    )
)


# --- q56: null-safe join (<=> / IS NOT DISTINCT FROM) ----------------------
def q56_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join: NULL keys match each other under ``eqNullSafe``
    (SQL ``IS NOT DISTINCT FROM``) instead of dropping out — the semantics
    a dimension join needs when 'unknown' is itself a category. Nulls are
    induced deterministically (event_id % 11) on both sides; the join
    stays a hash join (null-safe equality is still an equi-key)."""
    ev = _t(spark, sf_dir, "events")
    typed = ev.select(
        "event_id",
        F.when(F.col("event_id") % 11 != 0, F.col("event_type")).alias("et"),
    )
    dim = (
        typed.groupBy("et")
        .agg(F.count(F.lit(1)).alias("n_of_type"))
        .withColumnRenamed("et", "d_et")
    )
    return typed.join(dim, F.col("et").eqNullSafe(F.col("d_et"))).select(
        "event_id",
        F.coalesce(F.col("et"), F.lit("<null>")).alias("et"),
        F.col("n_of_type").cast("long").alias("n_of_type"),
    )


register(
    QuerySpec(
        "q56_null_safe_join",
        q56_null_safe_join,
        """
        WITH typed AS (
          SELECT event_id,
                 CASE WHEN event_id % 11 != 0 THEN event_type END AS et
          FROM events),
        dim AS (
          SELECT et, CAST(COUNT(*) AS BIGINT) AS n_of_type
          FROM typed GROUP BY et)
        SELECT t.event_id, COALESCE(t.et, '<null>') AS et, d.n_of_type
        FROM typed t JOIN dim d ON t.et IS NOT DISTINCT FROM d.et
        """,
        "null-safe equi-join: NULL keys match (IS NOT DISTINCT FROM / eqNullSafe)",
    )
)
