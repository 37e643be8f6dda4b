"""Relational core, seventh batch (SURVEY §2.C X6 breadth): the
multi-correlated EXISTS / NOT EXISTS shape (q83, TPC-H Q21 adapted to
this star schema's columns) and a full-outer-join data-reconciliation
report (q84) — the audit query every warehouse runs between a header
table and its recomputed line-level rollup; later additions: the
order-priority checking shape (q85, Q4), min-cost supplier (q86, Q2),
excess-share suppliers (q87, Q20), the referential-integrity audit
(x114), the native hopping-window aggregate (x131), the
gaps-and-islands longest-activity-streak summary (x132), and the
trimmed/winsorized robust aggregates (x135). The reference
(`/root/reference/pyarrow/main.py`) has no relational surface; these
exist because the driver's gate scores the declared X6 inventory.

Scale notes:
- q83's three self-references to lineitem all key on l_orderkey, so the
  semi and anti joins reuse one hash partitioning of the fact (AQE
  exchange reuse); supplier/nation are dim-sized (broadcast / AQE).
  Nothing is quadratic: each join is equi on the order key with a
  residual suppkey inequality evaluated post-probe.
- q84 is one shuffle on l_orderkey for the rollup, then a key-co-located
  full outer join against orders — both sides partitioned on the same
  key. The classification is row-local.

Determinism per helpers.py: the Q21 count is a plain BIGINT; q84's money
diff is computed as (decimal-exact recomputed sum, VARCHAR-round-tripped
to double on the DuckDB side) subtracted from the raw double
o_totalprice — row-level IEEE subtraction (rule 2) — then
ROUND(abs, 6) → decimal-summed (rules 1+3). The match threshold (0.01)
compares a deterministic double against a constant, so classification is
engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM, dec_sum

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q83: suppliers who kept orders waiting (TPC-H Q21 shape) ----------------
# The schema has no l_commitdate/l_receiptdate, so "late" is adapted to
# the available columns: shipped more than LATE_DAYS after the order
# date. The SHAPE is the point: one fact predicate plus a correlated
# EXISTS (another supplier contributed to the same order) and a
# correlated NOT EXISTS (no OTHER supplier was also late) — the classic
# multi-self-join decision-support query.
LATE_DAYS = 90
Q21_NATION = "NATION_9"  # testdata nations are NATION_0..24; _9 has the most suppliers
Q21_TOPK = 50


def q83_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    # One orderkey-keyed frame with the lateness flag; all three roles
    # (l1 culprit, l2 co-supplier, l3 other-late) read from it, so AQE
    # reuses a single hash partitioning of the fact.
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        # timestamp + interval (not date_add, which truncates to DATE) so
        # both engines compare at full timestamp precision
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        ).alias("late"),
    )
    l1 = lo.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    l2 = lo.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = lo.filter(F.col("late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(
            l2, (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2), "left_semi"
        )
        .join(l3, (l1.l_orderkey == l3.k3) & (l1.l_suppkey != l3.s3), "left_anti")
    )
    return (
        waiting.join(supplier, waiting.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == Q21_NATION)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOPK)
    )


register(
    QuerySpec(
        "q83_suppliers_kept_waiting",
        q83_suppliers_kept_waiting,
        f"""
        WITH lo AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT s_name, COUNT(*) AS numwait
        FROM lo l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE l1.late
          AND n_name = '{Q21_NATION}'
          AND EXISTS (SELECT 1 FROM lo l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lo l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT {Q21_TOPK}
        """,
        "TPC-H Q21 shape: correlated EXISTS + NOT EXISTS over the fact",
    )
)


# --- q84: order/lineitem reconciliation --------------------------------------
MATCH_EPS = 0.01


def q84_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation of the orders header total against the
    line-level recomputed charge sum(extprice·(1-disc)·(1+tax)): per
    status (match / mismatch / order_only / lineitem_only), how many
    orders and how much absolute money gap. The recomputed sum is
    decimal-exact per order; the header comparison is a row-local double
    subtraction, so the classification is deterministic cross-engine."""
    charge = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    )
    lag = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(charge.cast("decimal(30,10)")).cast("double").alias("recomputed"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    j = orders.join(lag, orders.o_orderkey == lag.l_orderkey, "full_outer")
    diff = F.round(F.abs(F.col("o_totalprice") - F.col("recomputed")), 6)
    status = (
        F.when(F.col("o_orderkey").isNull(), F.lit("lineitem_only"))
        .when(F.col("l_orderkey").isNull(), F.lit("order_only"))
        .when(diff < MATCH_EPS, F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return (
        j.select(
            status.alias("status"),
            F.coalesce(diff, F.lit(0.0)).alias("abs_diff"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("abs_diff", "sum_abs_diff"),
        )
        .orderBy("status")
    )


register(
    QuerySpec(
        "q84_order_reconciliation",
        q84_order_reconciliation,
        f"""
        WITH lag AS (
          SELECT l_orderkey,
                 CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       * (1.0 + l_tax) AS DECIMAL(30,10))) AS VARCHAR)
                      AS DOUBLE) AS recomputed,
                 COUNT(*) AS n_items
          FROM lineitem GROUP BY l_orderkey),
        j AS (
          SELECT o_orderkey, l_orderkey,
                 ROUND(ABS(o_totalprice - recomputed), 6) AS diff
          FROM orders FULL OUTER JOIN lag ON o_orderkey = l_orderkey)
        SELECT CASE WHEN o_orderkey IS NULL THEN 'lineitem_only'
                    WHEN l_orderkey IS NULL THEN 'order_only'
                    WHEN diff < {MATCH_EPS} THEN 'match'
                    ELSE 'mismatch' END AS status,
               COUNT(*) AS n_orders,
               {SQL_DEC_SUM.format(x='COALESCE(diff, 0.0)')} AS sum_abs_diff
        FROM j
        GROUP BY 1
        ORDER BY status
        """,
        "full-outer header-vs-recomputed-lines reconciliation report",
    )
)


# --- q85: order-priority checking (TPC-H Q4 shape) ---------------------------
# One quarter of orders, counted per priority, keeping only orders where
# at least one line item shipped more than Q4_LATE_DAYS after the order
# date — a correlated EXISTS with a cross-table date inequality. Spark
# expresses it as LEFT SEMI join with the residual predicate evaluated
# at probe time; the semi join keys on the order key, so at scale it is
# one co-partitioned shuffle (AQE-reusable with q83's fact hashing) and
# the quarter filter pushes into the orders scan.
Q4_DATE_LO = "1996-01-01"
Q4_DATE_HI = "1996-04-01"  # exclusive
Q4_LATE_DAYS = 60


def q85_priority_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    quarter = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q4_DATE_LO))
        & (F.col("o_orderdate") < F.lit(Q4_DATE_HI))
    )
    late_exists = quarter.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late_exists.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


register(
    QuerySpec(
        "q85_priority_waiting",
        q85_priority_waiting,
        f"""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{Q4_DATE_LO} 00:00:00'
          AND o_orderdate < TIMESTAMP '{Q4_DATE_HI} 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        "order-priority checking: correlated EXISTS with cross-table date inequality (Q4 shape)",
    )
)


# --- q86: minimum-cost supplier (TPC-H Q2 shape) -----------------------------
# The schema has no partsupp table, so the supply-cost relation is
# DERIVED: per (part, supplier), the average realized unit price over
# lineitem. The Q2 shape is the point — a two-level correlated subquery
# (cost = min cost for that part among suppliers of one region)
# decorrelated into a per-part window minimum, plus the dim-join chain
# supplier→nation→region. At scale: one (part,supp)-keyed fact
# aggregation, the window runs per part (bounded fan-in), and
# nation/region broadcast; the final TOP-K is TakeOrderedAndProject.
Q2_REGION = "EUROPE"
Q2_SIZE_MAX = 10
Q2_TYPE = "STANDARD"
Q2_TOPK = 100


def q86_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    unit = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            F.sum(unit.cast("decimal(30,10)")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("supplycost")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") <= Q2_SIZE_MAX) & (F.col("p_type") == Q2_TYPE))
        .select("p_partkey", "p_type", "p_size")
    )
    offers = (
        ps.join(part, ps.l_partkey == part.p_partkey)
        .join(supp, ps.l_suppkey == supp.s_suppkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("supplycost"), F.asc("s_suppkey")
    )
    best = offers.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        best.select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supplycost"
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(Q2_TOPK)
    )


register(
    QuerySpec(
        "q86_min_cost_supplier",
        q86_min_cost_supplier,
        f"""
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 ROUND({SQL_DEC_SUM.format(x="ROUND(l_extendedprice / l_quantity, 6)")}
                       / COUNT(*), 6) AS supplycost
          FROM lineitem GROUP BY l_partkey, l_suppkey),
        supp AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = '{Q2_REGION}'),
        part_f AS (
          SELECT p_partkey, p_type, p_size FROM part
          WHERE p_size <= {Q2_SIZE_MAX} AND p_type = '{Q2_TYPE}'),
        offers AS (
          SELECT p.p_partkey, p.p_type, s.s_suppkey, s.s_name, s.s_acctbal,
                 s.n_name, ps.supplycost
          FROM ps
          JOIN part_f p ON ps.l_partkey = p.p_partkey
          JOIN supp s ON ps.l_suppkey = s.s_suppkey),
        best AS (
          SELECT * FROM offers
          QUALIFY row_number() OVER (PARTITION BY p_partkey
                  ORDER BY supplycost ASC, s_suppkey ASC) = 1)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supplycost
        FROM best
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT {Q2_TOPK}
        """,
        "minimum-cost supplier per part in one region (Q2 shape, derived partsupp)",
    )
)


# --- x114: referential-integrity audit ---------------------------------------
# The warehouse pre-flight q84 generalizes: every declared fact→dim edge
# is checked for orphaned foreign keys in one report. Each edge is a
# LEFT ANTI join on its key — dim-sided edges broadcast, the fact-fact
# edge (lineitem→orders) co-partitions on the order key. Counting
# orphans (not listing them) keeps every edge's output one row at any
# scale; a non-zero row is the signal to materialize the offenders.
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def x114_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for edge, fact, fk, dim, pk in _FK_EDGES:
        f = _t(spark, sf_dir, fact).select(F.col(fk).alias("k"))
        d = _t(spark, sf_dir, dim).select(F.col(pk).alias("k")).distinct()
        orphans = f.join(d, "k", "left_anti")
        row = f.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        ).select(
            F.lit(edge).alias("edge"),
            "n_rows",
            "n_orphans",
            F.round(
                F.col("n_orphans").cast("double") / F.col("n_rows").cast("double"),
                6,
            ).alias("orphan_rate"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("edge")


def _x114_sql() -> str:
    selects = []
    for edge, fact, fk, dim, pk in _FK_EDGES:
        selects.append(f"""
        SELECT '{edge}' AS edge,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {fact}) AS n_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {fact}
                WHERE {fk} NOT IN (SELECT {pk} FROM {dim})) AS n_orphans,
               ROUND(CAST((SELECT COUNT(*) FROM {fact}
                           WHERE {fk} NOT IN (SELECT {pk} FROM {dim}))
                          AS DOUBLE)
                     / (SELECT COUNT(*) FROM {fact}), 6) AS orphan_rate""")
    union = "\n        UNION ALL ".join(selects)
    return f"SELECT * FROM ({union}) ORDER BY edge"


register(
    QuerySpec(
        "x114_referential_audit",
        x114_referential_audit,
        _x114_sql(),
        "orphaned-FK audit over every fact->dim edge of the star schema",
    )
)


# --- q87: excess-share suppliers (TPC-H Q20 shape) ---------------------------
# The last classic decision-support shape not yet in the registry: a
# nested IN whose inner query filters on a CORRELATED aggregate
# threshold. No partsupp/availqty in this schema, so "excess" is
# adapted: a supplier is flagged if, for some PROMO part, their shipped
# quantity exceeds EXCESS_MULT times their FAIR SHARE of that part's
# total (total / number of suppliers of the part) — a scale-invariant
# threshold, so the flagged tail exists at every SF (an absolute
# fraction degenerates to zero rows as supplier counts grow).
# Decorrelated Spark-side into two fact aggregations joined on the part
# key (both keyed shuffles reusable under AQE), a row-local ratio
# filter, and a dim-chain semi-join — never a correlated re-scan per
# outer row.
Q20_TYPE = "PROMO"
Q20_NATION = "NATION_18"  # non-empty at sf0.001 (1 row) and sf0.01 (5)
EXCESS_MULT = 2.0


def q87_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    promo = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == Q20_TYPE)
        .select("p_partkey")
    )
    shipped = li.join(promo, li.l_partkey == promo.p_partkey).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    per_ps = shipped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,10)"))
        .cast("double")
        .alias("q_ps")
    )
    per_p = shipped.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,10)")).cast("double").alias("q_p"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    excess = (
        per_ps.join(per_p, "l_partkey")
        .filter(
            F.col("q_ps") * F.col("n_supp") > F.lit(EXCESS_MULT) * F.col("q_p")
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_excess_parts"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_name") == Q20_NATION)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        supp.join(excess, supp.s_suppkey == excess.l_suppkey)
        .select("s_suppkey", "s_name", F.col("n_excess_parts").cast("long"))
        .orderBy("s_suppkey")
    )


register(
    QuerySpec(
        "q87_excess_share_suppliers",
        q87_excess_share_suppliers,
        f"""
        WITH shipped AS (
          SELECT l_partkey, l_suppkey, l_quantity
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_type = '{Q20_TYPE}'),
        per_ps AS (
          SELECT l_partkey, l_suppkey,
                 {SQL_DEC_SUM.format(x="l_quantity")} AS q_ps
          FROM shipped GROUP BY l_partkey, l_suppkey),
        per_p AS (
          SELECT l_partkey, {SQL_DEC_SUM.format(x="l_quantity")} AS q_p,
                 CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
          FROM shipped GROUP BY l_partkey),
        excess AS (
          SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_excess_parts
          FROM per_ps JOIN per_p USING (l_partkey)
          WHERE q_ps * n_supp > {EXCESS_MULT} * q_p
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, n_excess_parts
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN excess ON s_suppkey = l_suppkey
        WHERE n_name = '{Q20_NATION}'
        ORDER BY s_suppkey
        """,
        "TPC-H Q20 shape: suppliers with excess part share via correlated-threshold IN",
    )
)


# --- x131: hopping-window aggregate ------------------------------------------
HOP_SLIDE_US = 300_000_000  # 5 minutes
HOP_WIDTH_US = 600_000_000  # 10 minutes (= 2 slides: each event in 2 windows)


def x131_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (hopping) time-window aggregate over the event log:
    10-minute windows sliding every 5 — Spark's native ``F.window``
    sliding form, the smoothing shape dashboards and rate monitors use.
    Each event lands in exactly width/slide = 2 windows, so the explode
    factor is a small constant; the aggregate shuffles on
    (window, event_type) like any keyed agg.  The oracle reproduces
    Spark's epoch-aligned window assignment with integer micro
    arithmetic: starts = {t - t%slide, t - t%slide - slide}."""
    ev = _t(spark, sf_dir, "events")
    # window strings derived from the shared constants so one retune
    # moves the Spark side and the oracle together (ADVICE r3 x81 rule)
    win = F.window(
        "ts",
        f"{HOP_WIDTH_US // 60_000_000} minutes",
        f"{HOP_SLIDE_US // 60_000_000} minutes",
    )
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start_us", "event_type")
    )


register(
    QuerySpec(
        "x131_hopping_window",
        x131_hopping_window,
        f"""
        WITH e AS (
          SELECT epoch_us(ts) AS t, event_type, value FROM events),
        h AS (
          SELECT (t - t % {HOP_SLIDE_US}) - off * {HOP_SLIDE_US} AS window_start_us,
                 event_type, value
          FROM e, (SELECT UNNEST([0, 1]) AS off))
        SELECT window_start_us, event_type, COUNT(*) AS n_events,
               {SQL_DEC_SUM.format(x="value")} AS sum_value
        FROM h GROUP BY 1, 2 ORDER BY window_start_us, event_type
        """,
        "10-min/5-min hopping-window event aggregate (native sliding window)",
    )
)


# --- x132: longest activity streak (gaps and islands) ------------------------
STREAK_EPOCH = "2024-01-01"  # fixed day-index origin inside the event span


def x132_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity-day summary: distinct active days and the
    longest run of consecutive active days — the gaps-and-islands
    pattern (island id = day_index − row_number, constant within each
    consecutive run).  Two user-keyed shuffles (distinct days, then the
    windowed island id); per-user partitions are bounded by the
    calendar, never by event volume."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit(STREAK_EPOCH).cast("date")).alias("day_ix"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_ix")
    grouped = days.withColumn(
        "island", F.col("day_ix") - F.row_number().over(w)
    )
    streaks = grouped.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("streak_len").cast("long").alias("n_active_days"),
            F.max("streak_len").cast("long").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


register(
    QuerySpec(
        "x132_activity_streaks",
        x132_activity_streaks,
        f"""
        WITH days AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '{STREAK_EPOCH}', CAST(ts AS DATE)) AS day_ix
          FROM events),
        g AS (
          SELECT user_id, day_ix,
                 day_ix - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_ix)
                     AS island
          FROM days),
        s AS (
          SELECT user_id, island, COUNT(*) AS streak_len
          FROM g GROUP BY 1, 2)
        SELECT user_id, CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
               CAST(MAX(streak_len) AS BIGINT) AS longest_streak
        FROM s GROUP BY 1 ORDER BY user_id
        """,
        "per-user longest consecutive-active-day streak (gaps and islands)",
    )
)


# --- x135: robust aggregates (trimmed + winsorized means) --------------------
TRIM_LO, TRIM_HI = 0.05, 0.95


def x135_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust value statistics: 5/95% trimmed mean (drop
    the tails) and winsorized mean (clamp the tails) alongside the raw
    mean — the outlier-resistant aggregates a telemetry pipeline
    publishes when a feed can emit garbage spikes.  The cut points are
    DISCRETE quantiles selected by integer rank (row ceil(q·n) in
    (value, event_id) order), not interpolated — selection is exact
    integer arithmetic, so both engines pick the identical data value
    and no 1-ulp interpolation divergence can flip a row's
    classification.  One window shuffle on event_type (rank), one
    groups-sized cut-point frame joined back, one final aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select("event_type", "event_id", "value").withColumn(
        "rn", F.row_number().over(w)
    )
    n = ranked.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    cuts = (
        ranked.join(F.broadcast(n), "event_type")
        .filter(
            (F.col("rn") == F.ceil(F.col("n") * TRIM_LO))
            | (F.col("rn") == F.ceil(F.col("n") * TRIM_HI))
        )
        .groupBy("event_type")
        .agg(
            F.min("value").alias("lo_cut"),
            F.max("value").alias("hi_cut"),
        )
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo_cut")), F.col("hi_cut"))
    inside = F.col("value").between(F.col("lo_cut"), F.col("hi_cut"))
    return (
        ranked.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("value", "sum_all"),
            F.sum(F.when(inside, F.col("value")).cast("decimal(30,10)"))
            .cast("double")
            .alias("sum_inside"),
            F.sum(inside.cast("long")).cast("long").alias("n_inside"),
            dec_sum(clamped, "sum_winsor"),
            F.min("lo_cut").alias("lo_cut"),
            F.min("hi_cut").alias("hi_cut"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("sum_all") / F.col("n"), 6).alias("mean"),
            F.round(F.col("sum_inside") / F.col("n_inside"), 6).alias("trimmed_mean"),
            F.round(F.col("sum_winsor") / F.col("n"), 6).alias("winsorized_mean"),
            "lo_cut",
            "hi_cut",
        )
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "x135_robust_stats",
        x135_robust_stats,
        f"""
        WITH r AS (
          SELECT event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events),
        cuts AS (
          SELECT event_type, MIN(value) AS lo_cut, MAX(value) AS hi_cut
          FROM r
          WHERE rn = CEIL(n * {TRIM_LO}) OR rn = CEIL(n * {TRIM_HI})
          GROUP BY 1),
        j AS (
          SELECT r.event_type, r.value, r.n, c.lo_cut, c.hi_cut,
                 r.value BETWEEN c.lo_cut AND c.hi_cut AS inside,
                 least(greatest(r.value, c.lo_cut), c.hi_cut) AS clamped
          FROM r JOIN cuts c USING (event_type))
        SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
               ROUND({SQL_DEC_SUM.format(x="value")} / MIN(n), 6) AS mean,
               ROUND(CAST(CAST(SUM(CASE WHEN inside
                                        THEN CAST(value AS DECIMAL(30,10)) END)
                          AS VARCHAR) AS DOUBLE)
                     / SUM(CASE WHEN inside THEN 1 ELSE 0 END), 6)
                   AS trimmed_mean,
               ROUND({SQL_DEC_SUM.format(x="clamped")} / MIN(n), 6)
                   AS winsorized_mean,
               MIN(lo_cut) AS lo_cut, MIN(hi_cut) AS hi_cut
        FROM j GROUP BY 1 ORDER BY event_type
        """,
        "trimmed + winsorized means with rank-selected discrete quantile cuts",
    )
)
