"""Preference-data and human-evaluation operators (round 6; SURVEY §2.C
X4 extension toward the RLHF/eval side of a training-data pipeline):
Bradley-Terry strength fitting from pairwise outcomes (x200),
inter-annotator agreement (Cohen's kappa, x201), and DPO preference-pair
assembly with margin floors (x202).

The reference (`/root/reference/`) has no preference surface; these
model the post-pretraining data ops an LLM pipeline runs over logged
comparisons and ratings, on the synthetic `events` table (event_type =
the competing system, value = the rating).

Scale notes (100 TB posture):
- x200's corpus-sized work is ONE pass building the pairwise win matrix
  (a user-keyed window + pair-keyed count); the MM fixed point then
  iterates on the entity²-bounded matrix (≤25 rows here; ≤ model-count²
  in production) — the x45 economics: data cost in the extraction,
  model-sized iteration frames.
- x201/x202 are one window/aggregation pass each, keyed by event_type /
  user — nothing corpus-global.
- Every recurrence value is ROUND(·,6)-then-decimal-summed (helpers
  rules 1+3) so the unrolled-CTE oracles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM

# --- x200: Bradley-Terry strength fit ----------------------------------------
BT_ITERS = 8


def _contests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise outcomes: each user's consecutive events (by ts, tie
    event_id) form a contest between their event_types; the higher
    value wins (exact tie → lexicographically smaller type wins —
    deterministic). Same-type pairs are skipped."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    lagged = ev.select(
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("value").over(w).alias("prev_value"),
    ).filter(
        F.col("prev_type").isNotNull() & (F.col("prev_type") != F.col("event_type"))
    )
    win_cur = (F.col("value") > F.col("prev_value")) | (
        (F.col("value") == F.col("prev_value"))
        & (F.col("event_type") < F.col("prev_type"))
    )
    return lagged.select(
        F.when(win_cur, F.col("event_type")).otherwise(F.col("prev_type")).alias(
            "winner"
        ),
        F.when(win_cur, F.col("prev_type")).otherwise(F.col("event_type")).alias(
            "loser"
        ),
    )


def x200_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength estimation from logged pairwise outcomes
    (Hunter 2004's MM recurrence, fixed BT_ITERS rounds): the ranking
    model behind arena-style system comparison and preference-data
    curation. π_i ← w_i / Σ_j n_ij/(π_i+π_j), renormalized each round;
    every term ROUND(·,6) then decimal-summed so the unrolled oracle is
    bit-identical.

    Scale: the one corpus pass builds the win matrix (user-keyed lag
    window → pair count); iterations run on the entity²-bounded matrix
    via broadcast joins — model-sized, corpus-size-invariant."""
    contests = _contests(spark, sf_dir)
    wins = contests.groupBy("winner", "loser").agg(F.count(F.lit(1)).alias("w"))
    # symmetric pair totals n_ij and per-entity win counts w_i
    ab = wins.select(F.col("winner").alias("i"), F.col("loser").alias("j"), "w")
    ba = wins.select(F.col("loser").alias("i"), F.col("winner").alias("j"), F.lit(0).alias("w"))
    n_ij = (
        ab.unionAll(ba)
        .groupBy("i", "j")
        .agg(F.sum("w").alias("w_ij"))
    )
    tot = n_ij.alias("a").join(
        n_ij.select(F.col("i").alias("j"), F.col("j").alias("i"), F.col("w_ij").alias("w_ji")).alias("b"),
        ["i", "j"],
    ).select("i", "j", "w_ij", (F.col("w_ij") + F.col("w_ji")).alias("n_ij"))
    mat = tot.coalesce(1).persist()
    w_i = mat.groupBy("i").agg(F.sum("w_ij").alias("w_i"))
    ents = mat.select("i").distinct()
    pi = ents.select("i", F.lit(1.0).alias("pi")).coalesce(1)
    dec = "decimal(30,10)"
    for _ in range(BT_ITERS):
        pj = pi.select(F.col("i").alias("j"), F.col("pi").alias("pi_j"))
        terms = (
            mat.join(F.broadcast(pi), "i")
            .join(F.broadcast(pj), "j")
            .select(
                "i",
                F.round(F.col("n_ij") / (F.col("pi") + F.col("pi_j")), 6).alias(
                    "t"
                ),
            )
        )
        raw = (
            terms.groupBy("i")
            .agg(F.sum(F.col("t").cast(dec)).cast("double").alias("s"))
            .join(F.broadcast(w_i), "i")
            .select("i", F.round(F.col("w_i") / F.col("s"), 6).alias("raw"))
        )
        z = raw.agg(F.sum(F.col("raw").cast(dec)).cast("double").alias("z"))
        pi = (
            raw.crossJoin(F.broadcast(z))
            .select("i", F.round(F.col("raw") / F.col("z"), 6).alias("pi"))
            .coalesce(1)
            .localCheckpoint()
        )
    out = pi.select(
        F.col("i").alias("event_type"),
        F.col("pi").alias("strength"),
    )
    mat.unpersist()
    w2 = Window.orderBy(F.desc("strength"), F.asc("event_type"))
    return out.select(
        F.row_number().over(w2).cast("long").alias("rank"),
        "event_type",
        "strength",
    ).orderBy("rank")


def _x200_sql() -> str:
    head = """
        WITH ev AS (
          SELECT user_id, event_id, event_type, value, ts FROM events),
        lagged AS (
          SELECT event_type, value,
                 lag(event_type) OVER w AS prev_type,
                 lag(value) OVER w AS prev_value
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        contests AS (
          SELECT CASE WHEN value > prev_value
                        OR (value = prev_value AND event_type < prev_type)
                      THEN event_type ELSE prev_type END AS winner,
                 CASE WHEN value > prev_value
                        OR (value = prev_value AND event_type < prev_type)
                      THEN prev_type ELSE event_type END AS loser
          FROM lagged
          WHERE prev_type IS NOT NULL AND prev_type <> event_type),
        wins AS (
          SELECT winner, loser, COUNT(*) AS w FROM contests GROUP BY 1, 2),
        nij AS (
          SELECT i, j, SUM(w) AS w_ij FROM (
            SELECT winner AS i, loser AS j, w FROM wins
            UNION ALL
            SELECT loser AS i, winner AS j, 0 AS w FROM wins)
          GROUP BY i, j),
        mat AS MATERIALIZED (
          SELECT a.i, a.j, a.w_ij, a.w_ij + b.w_ij AS n_ij
          FROM nij a JOIN nij b ON a.i = b.j AND a.j = b.i),
        wi AS MATERIALIZED (SELECT i, SUM(w_ij) AS w_i FROM mat GROUP BY i),
        pi0 AS MATERIALIZED (
          SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS pi FROM mat)"""
    steps = []
    for t in range(1, BT_ITERS + 1):
        prev = f"pi{t - 1}"
        ssum = SQL_DEC_SUM.format(x="t")
        zsum = SQL_DEC_SUM.format(x="raw")
        steps.append(f"""
        raw{t} AS MATERIALIZED (
          SELECT s.i, ROUND(w.w_i / s.s, 6) AS raw
          FROM (SELECT i, {ssum} AS s FROM (
                  SELECT m.i,
                         ROUND(m.n_ij / (p.pi + q.pi), 6) AS t
                  FROM mat m
                  JOIN {prev} p ON m.i = p.i
                  JOIN {prev} q ON m.j = q.i)
                GROUP BY i) s
          JOIN wi w ON s.i = w.i),
        pi{t} AS MATERIALIZED (
          SELECT i, ROUND(raw / z, 6) AS pi
          FROM raw{t} CROSS JOIN (SELECT {zsum} AS z FROM raw{t}))""")
    tail = f"""
        SELECT CAST(row_number() OVER (ORDER BY pi DESC, i ASC) AS BIGINT)
                   AS rank,
               i AS event_type, pi AS strength
        FROM pi{BT_ITERS}
        ORDER BY rank"""
    return head + "," + ",".join(steps) + tail


register(
    QuerySpec(
        "x200_bradley_terry",
        x200_bradley_terry,
        _x200_sql(),
        "Bradley-Terry MM fit over logged pairwise outcomes (8 rounds)",
    )
)


# --- x201: inter-annotator agreement (Cohen's kappa) -------------------------
K_CUT = 50.0  # binary label threshold on the rating
K_NOISE_SPAN = 2001  # rater-B perturbation: md5-hash uniform in ±10.00


def _rater_b_noise_spark() -> "F.Column":
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (h % K_NOISE_SPAN - (K_NOISE_SPAN - 1) / 2) / F.lit(100.0)


_SQL_NOISE = (
    "(CAST(from_hex(substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIT::BIGINT"
    f" AS BIGINT) % {K_NOISE_SPAN} - {(K_NOISE_SPAN - 1) / 2}) / 100.0"
)


def x201_annotator_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per event type between two deterministic raters —
    the agreement audit run before trusting a labeling pipeline.  Rater
    A labels value ≥ K_CUT; rater B labels a hash-perturbed score
    (value + uniform ±10 derived from a portable md5 hash, so both
    engines see identical raters).  κ = (p_o − p_e)/(1 − p_e) with the
    chance agreement p_e from the raters' marginals; all shares are
    exact count ratios ROUND(·,6).

    Scale: one pass, event_type-keyed aggregation of four counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    labeled = ev.select(
        "event_type",
        (F.col("value") >= K_CUT).cast("long").alias("a"),
        ((F.col("value") + _rater_b_noise_spark()) >= K_CUT)
        .cast("long")
        .alias("b"),
    )
    agg = labeled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum((F.col("a") == F.col("b")).cast("long")).alias("n_agree"),
    )
    po = F.round(F.col("n_agree") / F.col("n").cast("double"), 6)
    pa = F.col("na") / F.col("n").cast("double")
    pb = F.col("nb") / F.col("n").cast("double")
    pe = F.round(pa * pb + (1 - pa) * (1 - pb), 6)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        po.alias("po"),
        pe.alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    ).orderBy("event_type")


register(
    QuerySpec(
        "x201_annotator_agreement",
        x201_annotator_agreement,
        f"""
        WITH l AS (
          SELECT event_type,
                 CASE WHEN value >= {K_CUT} THEN 1 ELSE 0 END AS a,
                 CASE WHEN value + {_SQL_NOISE} >= {K_CUT} THEN 1 ELSE 0 END AS b
          FROM events),
        agg AS (
          SELECT event_type, COUNT(*) AS n, SUM(a) AS na, SUM(b) AS nb,
                 SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS n_agree
          FROM l GROUP BY event_type),
        s AS (
          SELECT event_type, n,
                 ROUND(CAST(n_agree AS DOUBLE) / n, 6) AS po,
                 ROUND((CAST(na AS DOUBLE) / n) * (CAST(nb AS DOUBLE) / n)
                       + (1 - CAST(na AS DOUBLE) / n)
                         * (1 - CAST(nb AS DOUBLE) / n), 6) AS pe
          FROM agg)
        SELECT event_type, CAST(n AS BIGINT) AS n, po, pe,
               ROUND((po - pe) / (1 - pe), 6) AS kappa
        FROM s ORDER BY event_type
        """,
        "Cohen's kappa per event type between two deterministic raters",
    )
)


# --- x202: DPO preference-pair assembly --------------------------------------
DPO_MIN_MARGIN = 10.0  # minimum chosen-rejected rating gap


def x202_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble DPO training pairs (Rafailov et al. 2023) from logged
    ratings: per user (= per prompt context), chosen = the top-rated
    event (tie → lower event_id), rejected = the bottom-rated (tie →
    lower event_id), kept only when the margin clears DPO_MIN_MARGIN —
    the low-signal pairs a preference-training run excludes.

    Scale: two WindowGroupLimit picks per user key, one join — no
    corpus-global state; margins are exact 2-decimal rating deltas."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value"
    )
    w_top = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    w_bot = Window.partitionBy("user_id").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    chosen = (
        ev.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("chosen_event"),
            F.col("event_type").alias("chosen_type"),
            F.col("value").alias("chosen_value"),
        )
    )
    rejected = (
        ev.withColumn("rn", F.row_number().over(w_bot))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("rejected_event"),
            F.col("event_type").alias("rejected_type"),
            F.col("value").alias("rejected_value"),
        )
    )
    return (
        chosen.join(rejected, "user_id")
        .filter(F.col("chosen_event") != F.col("rejected_event"))
        .select(
            "user_id",
            "chosen_event",
            "chosen_type",
            "rejected_event",
            "rejected_type",
            F.round(F.col("chosen_value") - F.col("rejected_value"), 2).alias(
                "margin"
            ),
        )
        .filter(F.col("margin") >= DPO_MIN_MARGIN)
        .orderBy("user_id")
    )


register(
    QuerySpec(
        "x202_dpo_pairs",
        x202_dpo_pairs,
        f"""
        WITH ev AS (
          SELECT user_id, event_id, event_type, value FROM events),
        chosen AS (
          SELECT user_id, event_id AS chosen_event,
                 event_type AS chosen_type, value AS chosen_value
          FROM ev
          QUALIFY row_number() OVER (PARTITION BY user_id
                  ORDER BY value DESC, event_id ASC) = 1),
        rejected AS (
          SELECT user_id, event_id AS rejected_event,
                 event_type AS rejected_type, value AS rejected_value
          FROM ev
          QUALIFY row_number() OVER (PARTITION BY user_id
                  ORDER BY value ASC, event_id ASC) = 1)
        SELECT c.user_id, c.chosen_event, c.chosen_type,
               r.rejected_event, r.rejected_type,
               ROUND(c.chosen_value - r.rejected_value, 2) AS margin
        FROM chosen c JOIN rejected r USING (user_id)
        WHERE c.chosen_event <> r.rejected_event
          AND ROUND(c.chosen_value - r.rejected_value, 2) >= {DPO_MIN_MARGIN}
        ORDER BY c.user_id
        """,
        "DPO preference pairs per user with deterministic ties + margin floor",
    )
)


# --- x210: reliability bins + expected calibration error ---------------------
CAL_BINS = 10
CAL_SCALE = 10.0  # sigmoid temperature on the centered rating


def x210_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected-calibration-error contribution per
    confidence bin — the audit run before trusting a scorer's
    probabilities (reward models, quality classifiers).  Predicted
    probability = sigmoid of the centered rating; outcome = x201's
    hash-perturbed rater (so the score is informative but imperfect and
    the bins have real gaps).  Conf/acc are exact count ratios and
    decimal-summed rounded scores; ECE = Σ (n_b/N)·|acc_b − conf_b| is
    reported as the per-bin weighted contribution.

    Scale: one row-local scoring pass + one bin-keyed aggregation."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    p = F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(F.col("value") - F.lit(K_CUT)) / F.lit(CAL_SCALE))),
        6,
    )
    y = ((F.col("value") + _rater_b_noise_spark()) >= K_CUT).cast("long")
    scored = ev.select(
        p.alias("p"),
        y.alias("y"),
        F.least(F.floor(p * CAL_BINS), F.lit(CAL_BINS - 1))
        .cast("long")
        .alias("bin"),
    )
    n_total = scored.agg(F.count(F.lit(1)).alias("n_total"))
    agg = scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p").cast("decimal(30,10)")).cast("double").alias("p_sum"),
        F.sum("y").alias("y_sum"),
    )
    conf = F.round(F.col("p_sum") / F.col("n"), 6)
    acc = F.round(F.col("y_sum") / F.col("n").cast("double"), 6)
    return (
        agg.crossJoin(F.broadcast(n_total))
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            conf.alias("conf"),
            acc.alias("acc"),
            F.round(F.abs(acc - conf), 6).alias("gap"),
            F.round(
                (F.col("n") / F.col("n_total").cast("double"))
                * F.abs(acc - conf),
                6,
            ).alias("ece_contrib"),
        )
        .orderBy("bin")
    )


register(
    QuerySpec(
        "x210_calibration_ece",
        x210_calibration_ece,
        f"""
        WITH scored AS (
          SELECT ROUND(CAST(1.0 AS DOUBLE)
                       / (CAST(1.0 AS DOUBLE)
                          + exp(-(value - {K_CUT}) / CAST({CAL_SCALE} AS DOUBLE))),
                       6) AS p,
                 CASE WHEN value + {_SQL_NOISE} >= {K_CUT} THEN 1 ELSE 0 END AS y
          FROM events),
        binned AS (
          SELECT p, y,
                 least(CAST(FLOOR(p * {CAL_BINS}) AS BIGINT), {CAL_BINS - 1})
                     AS bin
          FROM scored),
        nt AS (SELECT COUNT(*) AS n_total FROM binned),
        agg AS (
          SELECT bin, COUNT(*) AS n,
                 {SQL_DEC_SUM.format(x="p")} AS p_sum,
                 SUM(y) AS y_sum
          FROM binned GROUP BY bin)
        SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
               ROUND(p_sum / n, 6) AS conf,
               ROUND(CAST(y_sum AS DOUBLE) / n, 6) AS acc,
               ROUND(abs(ROUND(CAST(y_sum AS DOUBLE) / n, 6)
                         - ROUND(p_sum / n, 6)), 6) AS gap,
               ROUND((CAST(n AS DOUBLE) / nt.n_total)
                     * abs(ROUND(CAST(y_sum AS DOUBLE) / n, 6)
                           - ROUND(p_sum / n, 6)), 6) AS ece_contrib
        FROM agg CROSS JOIN nt
        ORDER BY bin
        """,
        "reliability bins + per-bin ECE contribution for the rating scorer",
    )
)


# --- x213: temperature-scaling calibration fit -------------------------------
TEMP_GRID = (0.5, 0.75, 1.0, 1.5, 2.0, 3.0)


def x213_temperature_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature scaling (Guo et al. 2017): rescale the scorer's
    logits by each candidate temperature, measure expected calibration
    error against the rater outcome, and flag the grid argmin — the
    single-parameter post-hoc calibration fix applied after an x210
    audit shows miscalibration.  Deterministic: the grid is fixed, every
    bin share is an exact count ratio, ECE sums ROUND(·,6) contributions
    decimally, argmin ties break toward the smaller temperature.

    Scale: the corpus is scored once per grid point via one row-local
    fan-out (×|grid|) and aggregated by (temp, bin) — a single keyed
    pass; no per-T rescans."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    y = ((F.col("value") + _rater_b_noise_spark()) >= K_CUT).cast("long")
    fanned = ev.select(
        y.alias("y"),
        ((F.col("value") - K_CUT) / F.lit(CAL_SCALE)).alias("logit"),
        F.explode(F.array(*[F.lit(t) for t in TEMP_GRID])).alias("temp"),
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit") / F.col("temp"))), 6)
    binned = fanned.select(
        "temp",
        "y",
        p.alias("p"),
        F.least(F.floor(p * CAL_BINS), F.lit(CAL_BINS - 1)).cast("long").alias("bin"),
    )
    n_total = ev.agg(F.count(F.lit(1)).alias("n_total"))
    per_bin = (
        binned.groupBy("temp", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p").cast("decimal(30,10)")).cast("double").alias("p_sum"),
            F.sum("y").alias("y_sum"),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "temp",
            F.round(
                (F.col("n") / F.col("n_total").cast("double"))
                * F.abs(
                    F.round(F.col("y_sum") / F.col("n").cast("double"), 6)
                    - F.round(F.col("p_sum") / F.col("n"), 6)
                ),
                6,
            ).alias("contrib"),
        )
    )
    ece = per_bin.groupBy("temp").agg(
        F.sum(F.col("contrib").cast("decimal(30,10)")).cast("double").alias("ece")
    )
    w = Window.orderBy(F.asc("ece"), F.asc("temp"))
    return (
        ece.withColumn("rank", F.row_number().over(w))
        .select(
            "temp",
            F.round("ece", 6).alias("ece"),
            (F.col("rank") == 1).alias("is_best"),
        )
        .orderBy("temp")
    )


register(
    QuerySpec(
        "x213_temperature_fit",
        x213_temperature_fit,
        f"""
        WITH ev AS (
          SELECT (value - {K_CUT}) / CAST({CAL_SCALE} AS DOUBLE) AS logit,
                 CASE WHEN value + {_SQL_NOISE} >= {K_CUT} THEN 1 ELSE 0 END AS y
          FROM events),
        nt AS (SELECT COUNT(*) AS n_total FROM ev),
        fanned AS (
          SELECT y, logit, unnest([{", ".join(f"CAST({t} AS DOUBLE)" for t in TEMP_GRID)}]) AS temp
          FROM ev),
        binned AS (
          SELECT temp, y, p,
                 least(CAST(FLOOR(p * {CAL_BINS}) AS BIGINT), {CAL_BINS - 1}) AS bin
          FROM (SELECT temp, y,
                       ROUND(CAST(1.0 AS DOUBLE)
                             / (CAST(1.0 AS DOUBLE) + exp(-logit / temp)), 6) AS p
                FROM fanned)),
        per_bin AS (
          SELECT temp,
                 ROUND((CAST(COUNT(*) AS DOUBLE) / MAX(nt.n_total))
                       * abs(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6)
                             - ROUND({SQL_DEC_SUM.format(x="p")} / COUNT(*), 6)),
                       6) AS contrib
          FROM binned CROSS JOIN nt
          GROUP BY temp, bin),
        ece AS (
          SELECT temp, {SQL_DEC_SUM.format(x="contrib")} AS ece
          FROM per_bin GROUP BY temp)
        SELECT temp, ROUND(ece, 6) AS ece,
               row_number() OVER (ORDER BY ece ASC, temp ASC) = 1 AS is_best
        FROM ece
        ORDER BY temp
        """,
        "temperature-scaling grid fit: ECE per T, argmin flagged",
    )
)
