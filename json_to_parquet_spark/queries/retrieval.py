"""Round-5 retrieval/training-pair operators over the embedding corpus:
hard-negative mining for contrastive training (x167), margin-based
cross-lingual bitext mining (x168), and maximal-marginal-relevance
result diversification (x169).

The reference (`/root/reference/`) has no vector surface; these extend
the similarity family (SURVEY §2.C X3) from index/recall mechanics
(x11/x21/x76/x102/x119) into the selection policies retrieval systems
and contrastive-training pipelines actually run on top of them.

Scale notes (100 TB posture):
- x167/x168 are broadcast-query scans: the corpus side never shuffles
  (the x11 shape); per-query top-k is a WindowGroupLimit. At real scale
  the candidate generation step composes with x21/x121 (IVF partition
  probing) exactly as x119 does — the exact scan here is what makes the
  policies oracle-checkable.
- x169's iterative argmax runs on per-query candidate frames bounded at
  MMR_CANDS rows — constant-size work per round regardless of corpus
  size; each round's selected frame is eagerly localCheckpoint'd (1-row
  per query) so plans stay flat (the x101/x103 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM
from .similarity import N_QUERY_VECS, cosine, dot, l2norm

# Shared DuckDB fragment: rounded cosine between two DOUBLE[] columns.
_SQL_COS = (
    "ROUND(list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))), 6)"
)


# --- x167: hard-negative mining ----------------------------------------------
def x167_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training pair mining: for each query vector, the
    hardest positive (MOST similar same-label vector — the anchor pair)
    and the hardest negative (most similar DIFFERENT-label vector — the
    one that teaches the margin), with the triplet margin between them.
    One broadcast-query corpus scan; two WindowGroupLimit picks."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (F.col("label") == F.col("q_label")).alias("same"),
            cosine(F.col("q_vec"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id", "same").orderBy(F.desc("cos"), F.asc("vec_id"))
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    pos = best.filter(F.col("same")).select(
        "q_id", F.col("vec_id").alias("pos_id"), F.col("cos").alias("pos_cos")
    )
    neg = best.filter(~F.col("same")).select(
        "q_id", F.col("vec_id").alias("neg_id"), F.col("cos").alias("neg_cos")
    )
    return (
        pos.join(neg, "q_id")
        .select(
            "q_id",
            "pos_id",
            "pos_cos",
            "neg_id",
            "neg_cos",
            F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
        )
        .orderBy("q_id")
    )


register(
    QuerySpec(
        "x167_hard_negatives",
        x167_hard_negatives,
        f"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        q AS (
          SELECT vec_id AS q_id, label AS q_label, v AS q_vec
          FROM e WHERE vec_id < {N_QUERY_VECS}),
        scored AS (
          SELECT q.q_id, e.vec_id, e.label = q.q_label AS same,
                 {_SQL_COS.format(a="q.q_vec", b="e.v")} AS cos
          FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        best AS (
          SELECT q_id, same, vec_id, cos
          FROM scored
          QUALIFY row_number() OVER (PARTITION BY q_id, same
                                     ORDER BY cos DESC, vec_id ASC) = 1)
        SELECT p.q_id, p.vec_id AS pos_id, p.cos AS pos_cos,
               n.vec_id AS neg_id, n.cos AS neg_cos,
               ROUND(p.cos - n.cos, 6) AS margin
        FROM best p JOIN best n ON p.q_id = n.q_id
        WHERE p.same AND NOT n.same
        ORDER BY p.q_id
        """,
        "hardest positive + hardest negative per query (contrastive mining)",
    )
)


# --- x168: margin-based cross-lingual mining ---------------------------------
MARGIN_K = 4  # margin denominator: mean cosine of the top-K neighbours
SRC_LABEL, TGT_LABEL = 0, 1
MINE_TOP = 10
# Broadcast bound on the mined source side (VERDICT r5): one bounded
# pivot CHUNK of source ids per pass, never the whole label-0 half.
MINE_SRC_CHUNK = 64


def x168_crosslingual_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, 'ratio'
    criterion): align label-0 vectors to label-1 vectors, scoring each
    candidate pair by cos(best) / mean(cos of the source's top-K target
    neighbours) — the margin denominator suppresses hubs that are close
    to EVERYTHING. Returns the MINE_TOP highest-margin alignments among
    the mined chunk.

    Scale shape: the broadcast side is ONE bounded source chunk
    (``vec_id < MINE_SRC_CHUNK``, a fixed pivot set — NOT the whole
    label-0 half, whose size grows with the corpus); the target corpus
    never shuffles (plan-asserted: single BroadcastExchange, bounded
    subtree).  A full-corpus mining run processes the source side in
    MINE_SRC_CHUNK-sized chunks — each chunk an independent,
    embarrassingly-parallel pass of this exact shape (margins are
    per-source-row, so chunking is lossless) — or swaps candidate
    generation for the x21/x121 IVF probe exactly as x119/x176 do.
    The exact bounded scan here is what keeps the policy
    oracle-checkable."""
    emb = load_table(spark, sf_dir, "embeddings")
    src = emb.filter(
        (F.col("label") == SRC_LABEL) & (F.col("vec_id") < MINE_SRC_CHUNK)
    ).select(
        F.col("vec_id").alias("src_id"), F.col("embedding").alias("src_vec")
    )
    tgt = emb.filter(F.col("label") == TGT_LABEL).select(
        F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("tgt_vec")
    )
    scored = tgt.crossJoin(F.broadcast(src)).select(
        "src_id", "tgt_id", cosine(F.col("src_vec"), F.col("tgt_vec")).alias("cos")
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cos"), F.asc("tgt_id"))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= MARGIN_K
    )
    denom = topk.groupBy("src_id").agg(
        (F.sum(F.col("cos").cast("decimal(30,10)")).cast("double") / MARGIN_K)
        .alias("mean_topk")
    )
    best = topk.filter(F.col("rn") == 1).select("src_id", "tgt_id", "cos")
    ranked = (
        best.join(denom, "src_id")
        .select(
            "src_id",
            "tgt_id",
            "cos",
            F.round(F.col("cos") / F.col("mean_topk"), 6).alias("margin"),
        )
        .orderBy(F.desc("margin"), F.asc("src_id"))
        .limit(MINE_TOP)
    )
    w2 = Window.orderBy(F.desc("margin"), F.asc("src_id"))
    return ranked.select(
        F.row_number().over(w2).cast("long").alias("rank"),
        "src_id",
        "tgt_id",
        "cos",
        "margin",
    )


register(
    QuerySpec(
        "x168_crosslingual_margin",
        x168_crosslingual_margin,
        f"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        s AS (SELECT vec_id AS src_id, v AS sv FROM e
              WHERE label = {SRC_LABEL} AND vec_id < {MINE_SRC_CHUNK}),
        t AS (SELECT vec_id AS tgt_id, v AS tv FROM e WHERE label = {TGT_LABEL}),
        scored AS (
          SELECT s.src_id, t.tgt_id,
                 {_SQL_COS.format(a="s.sv", b="t.tv")} AS cos
          FROM s CROSS JOIN t),
        topk AS (
          SELECT src_id, tgt_id, cos,
                 row_number() OVER (PARTITION BY src_id
                                    ORDER BY cos DESC, tgt_id ASC) AS rn
          FROM scored QUALIFY rn <= {MARGIN_K}),
        denom AS (
          SELECT src_id,
                 {SQL_DEC_SUM.format(x="cos")} / {MARGIN_K} AS mean_topk
          FROM topk GROUP BY src_id),
        ranked AS (
          SELECT b.src_id, b.tgt_id, b.cos,
                 ROUND(b.cos / d.mean_topk, 6) AS margin
          FROM topk b JOIN denom d USING (src_id)
          WHERE b.rn = 1
          ORDER BY margin DESC, src_id ASC
          LIMIT {MINE_TOP})
        SELECT CAST(row_number() OVER (ORDER BY margin DESC, src_id ASC)
                    AS BIGINT) AS rank,
               src_id, tgt_id, cos, margin
        FROM ranked
        ORDER BY margin DESC, src_id ASC
        """,
        "margin-based cross-label bitext mining (ratio criterion, top pairs)",
    )
)


# --- x169: maximal-marginal-relevance diversification ------------------------
MMR_CANDS = 8  # candidate pool per query (top-N by relevance)
MMR_PICKS = 4  # results selected per query
MMR_LAMBDA = 0.5  # relevance vs diversity trade-off


def x169_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance result diversification (Carbonell &
    Goldstein 1998): from each query's top-MMR_CANDS relevance
    candidates, iteratively pick the item maximizing
    λ·rel(q,d) − (1−λ)·max_{s∈selected} sim(d,s) — the standard
    redundancy-suppressing rerank. Pick 1 uses the same formula with an
    empty selected set (maxsim = 0), i.e. pure relevance.

    Shapes: candidate generation is the x11 broadcast scan +
    WindowGroupLimit; the candidate-pair similarity matrix is
    MMR_CANDS² rows PER QUERY (constant); each of the MMR_PICKS-1
    iterative rounds is an anti-join + max-aggregation + argmax window
    over those constant-size frames, with the selected frame eagerly
    localCheckpoint'd per round so plan depth stays flat (the
    x101/x103 lesson). At corpus scale only candidate generation
    touches data; swap it for the x21/x121 IVF probe exactly as x119
    does."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "embedding",
            cosine(F.col("q_vec"), F.col("embedding")).alias("rel"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_CANDS)
        .select("q_id", "vec_id", "embedding", "rel")
        .localCheckpoint()
    )
    pairs = (
        cand.alias("a")
        .join(cand.alias("b"), "q_id")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            "q_id",
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("sim"),
        )
        .localCheckpoint()
    )
    lam = F.lit(MMR_LAMBDA)

    first_w = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    selected = (
        cand.withColumn("rn", F.row_number().over(first_w))
        .filter(F.col("rn") == 1)
        .select(
            "q_id",
            "vec_id",
            F.lit(1).cast("long").alias("pick"),
            F.round(lam * F.col("rel"), 6).alias("score"),
        )
        .localCheckpoint()
    )
    for r in range(2, MMR_PICKS + 1):
        chosen = selected.select("q_id", F.col("vec_id").alias("b_id"))
        remaining = cand.join(
            selected.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_anti"
        )
        maxsim = (
            pairs.join(F.broadcast(chosen), ["q_id", "b_id"])
            .groupBy("q_id", F.col("a_id").alias("vec_id"))
            .agg(F.max("sim").alias("maxsim"))
        )
        mmr = remaining.join(maxsim, ["q_id", "vec_id"]).select(
            "q_id",
            "vec_id",
            F.round(lam * F.col("rel") - (1 - lam) * F.col("maxsim"), 6).alias(
                "score"
            ),
        )
        pick_w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
        picked = (
            mmr.withColumn("rn", F.row_number().over(pick_w))
            .filter(F.col("rn") == 1)
            .select("q_id", "vec_id", F.lit(r).cast("long").alias("pick"), "score")
        )
        selected = selected.unionAll(picked).localCheckpoint()
    return selected.orderBy("q_id", "pick")


def _x169_sql() -> str:
    """Unrolled DuckDB twin; every multiply-referenced CTE MATERIALIZED
    (the x101 lesson — inlining doubles the subplan per round)."""
    lam = MMR_LAMBDA
    ctes = [
        f"""
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS q_vec FROM e
              WHERE vec_id < {N_QUERY_VECS}),
        cand AS MATERIALIZED (
          SELECT q_id, vec_id, v,
                 {_SQL_COS.format(a="q_vec", b="v")} AS rel
          FROM e CROSS JOIN q
          WHERE e.vec_id <> q.q_id
          QUALIFY row_number() OVER (PARTITION BY q_id
                                     ORDER BY rel DESC, vec_id ASC)
                  <= {MMR_CANDS}),
        pairs AS MATERIALIZED (
          SELECT a.q_id, a.vec_id AS a_id, b.vec_id AS b_id,
                 {_SQL_COS.format(a="a.v", b="b.v")} AS sim
          FROM cand a JOIN cand b
            ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
        sel1 AS MATERIALIZED (
          SELECT q_id, vec_id, CAST(1 AS BIGINT) AS pick,
                 ROUND({lam} * rel, 6) AS score
          FROM cand
          QUALIFY row_number() OVER (PARTITION BY q_id
                                     ORDER BY rel DESC, vec_id ASC) = 1)"""
    ]
    for r in range(2, MMR_PICKS + 1):
        prev = f"sel{r - 1}"
        ctes.append(
            f"""
        ms{r} AS (
          SELECT p.q_id, p.a_id AS vec_id, MAX(p.sim) AS maxsim
          FROM pairs p JOIN {prev} s
            ON p.q_id = s.q_id AND p.b_id = s.vec_id
          GROUP BY 1, 2),
        pick{r} AS MATERIALIZED (
          SELECT c.q_id, c.vec_id, CAST({r} AS BIGINT) AS pick,
                 ROUND({lam} * c.rel - {1 - lam} * m.maxsim, 6) AS score
          FROM cand c
          JOIN ms{r} m ON m.q_id = c.q_id AND m.vec_id = c.vec_id
          WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                            WHERE s.q_id = c.q_id AND s.vec_id = c.vec_id)
          QUALIFY row_number() OVER (PARTITION BY c.q_id
                                     ORDER BY score DESC, c.vec_id ASC) = 1),
        sel{r} AS MATERIALIZED (
          SELECT * FROM {prev} UNION ALL SELECT * FROM pick{r})"""
        )
    return f"""
        WITH {",".join(ctes)}
        SELECT q_id, vec_id, pick, score FROM sel{MMR_PICKS}
        ORDER BY q_id, pick
        """


register(
    QuerySpec(
        "x169_mmr_diversify",
        x169_mmr_diversify,
        _x169_sql(),
        "maximal-marginal-relevance top-k diversification per query",
    )
)


# --- x176: kNN label-noise audit ---------------------------------------------
NOISE_SAMPLE = 100  # audited vectors: vec_id < NOISE_SAMPLE
NOISE_K = 5


def x176_label_noise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning-style label-noise audit: for each audited
    vector, its NOISE_K exact nearest neighbours vote on the label; a
    vector whose own label gets fewer than a majority of votes is
    flagged suspect. Output per label: audited count, suspect count,
    suspect share — the table that decides whether a label column is
    trustworthy enough to train on. The audit set broadcasts (bounded
    sample — the estimator shape); the corpus side never shuffles. A
    full-corpus sweep composes the x19 sign-block or x21 IVF
    restriction instead of the exact scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    audit = emb.filter(F.col("vec_id") < NOISE_SAMPLE).select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_vec"),
        F.col("label").alias("a_label"),
    )
    scored = (
        emb.crossJoin(F.broadcast(audit))
        .filter(F.col("vec_id") != F.col("a_id"))
        .select(
            "a_id",
            "a_label",
            (F.col("label") == F.col("a_label")).cast("long").alias("agree"),
            cosine(F.col("a_vec"), F.col("embedding")).alias("cos"),
            "vec_id",
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    votes = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NOISE_K)
        .groupBy("a_id", "a_label")
        .agg(F.sum("agree").alias("n_agree"))
    )
    suspect = votes.select(
        "a_label",
        (F.col("n_agree") < F.lit((NOISE_K // 2) + 1)).cast("long").alias("suspect"),
    )
    return (
        suspect.groupBy(F.col("a_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_audited"),
            F.sum("suspect").cast("long").alias("n_suspect"),
        )
        .select(
            "label",
            "n_audited",
            "n_suspect",
            F.round(
                F.col("n_suspect").cast("double") / F.col("n_audited"), 6
            ).alias("suspect_share"),
        )
        .orderBy("label")
    )


register(
    QuerySpec(
        "x176_label_noise_audit",
        x176_label_noise_audit,
        f"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        a AS (
          SELECT vec_id AS a_id, label AS a_label, v AS a_vec
          FROM e WHERE vec_id < {NOISE_SAMPLE}),
        scored AS (
          SELECT a.a_id, a.a_label,
                 CASE WHEN e.label = a.a_label THEN 1 ELSE 0 END AS agree,
                 {_SQL_COS.format(a="a.a_vec", b="e.v")} AS cos,
                 e.vec_id
          FROM e CROSS JOIN a WHERE e.vec_id <> a.a_id),
        votes AS (
          SELECT a_id, a_label, CAST(SUM(agree) AS BIGINT) AS n_agree
          FROM (SELECT a_id, a_label, agree,
                       row_number() OVER (PARTITION BY a_id
                                          ORDER BY cos DESC, vec_id ASC) AS rn
                FROM scored QUALIFY rn <= {NOISE_K})
          GROUP BY 1, 2)
        SELECT a_label AS label, CAST(COUNT(*) AS BIGINT) AS n_audited,
               CAST(SUM(CASE WHEN n_agree < {(NOISE_K // 2) + 1}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
               ROUND(CAST(SUM(CASE WHEN n_agree < {(NOISE_K // 2) + 1}
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS suspect_share
        FROM votes GROUP BY a_label ORDER BY label
        """,
        "kNN label-agreement audit: suspect-label share per class",
    )
)


# --- x177: reciprocal-rank-fusion hybrid retrieval ---------------------------
RRF_C = 60  # the standard RRF constant
RRF_TOP = 10
RRF_COS_Q = 0  # the x11 query whose dense ranking is fused


def x177_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval via reciprocal-rank fusion
    (Cormack et al. 2009): fuse the x54 BM25 ranking with the x11 exact
    cosine ranking for query {RRF_COS_Q} as
    Σ 1/(RRF_C + rank) over the lists an item appears in, and return the
    fused top-RRF_TOP. COMPOSES the two REGISTERED operators (and their
    registered oracles verbatim) — the anti-drift pattern x119 set: the
    fusion layer can't diverge from its rankers without the gate
    seeing it. Both input rankings are k-bounded per list, so fusion
    cost is list-length-sized regardless of corpus size."""
    from .quality import x54_bm25

    from .similarity import x11_cosine_topk

    bm = x54_bm25(spark, sf_dir)
    w_bm = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bm_rank = bm.select(
        F.col("doc_id").alias("item_id"),
        F.row_number().over(w_bm).cast("long").alias("r_bm25"),
    )
    cos = x11_cosine_topk(spark, sf_dir).filter(F.col("q_id") == RRF_COS_Q)
    cos_rank = cos.select(
        F.col("vec_id").alias("item_id"), F.col("rank").alias("r_cos")
    )
    fused = bm_rank.join(cos_rank, "item_id", "full_outer").select(
        "item_id",
        F.round(
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_C) + F.col("r_bm25")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_C) + F.col("r_cos")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
        F.coalesce("r_bm25", F.lit(0)).cast("long").alias("r_bm25"),
        F.coalesce("r_cos", F.lit(0)).cast("long").alias("r_cos"),
    )
    top = fused.orderBy(F.desc("rrf"), F.asc("item_id")).limit(RRF_TOP)
    w = Window.orderBy(F.desc("rrf"), F.asc("item_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "item_id",
        "rrf",
        "r_bm25",
        "r_cos",
    )


def _x177_sql() -> str:
    """Oracle composes the registered x54 + x11 oracles verbatim."""
    from . import _REGISTRY

    bm25 = _REGISTRY["x54_bm25"].oracle
    cosine_topk = _REGISTRY["x11_cosine_topk"].oracle
    return f"""
        WITH bm_raw AS ({bm25}),
        bm AS (
          SELECT doc_id AS item_id,
                 CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
                      AS BIGINT) AS r_bm25
          FROM bm_raw),
        cos_raw AS ({cosine_topk}),
        co AS (
          SELECT vec_id AS item_id, rank AS r_cos
          FROM cos_raw WHERE q_id = {RRF_COS_Q}),
        fused AS (
          SELECT COALESCE(bm.item_id, co.item_id) AS item_id,
                 ROUND(COALESCE(1.0 / ({RRF_C} + bm.r_bm25), 0.0)
                       + COALESCE(1.0 / ({RRF_C} + co.r_cos), 0.0), 6) AS rrf,
                 CAST(COALESCE(bm.r_bm25, 0) AS BIGINT) AS r_bm25,
                 CAST(COALESCE(co.r_cos, 0) AS BIGINT) AS r_cos
          FROM bm FULL OUTER JOIN co ON bm.item_id = co.item_id),
        top AS (
          SELECT * FROM fused
          ORDER BY rrf DESC, item_id ASC LIMIT {RRF_TOP})
        SELECT CAST(row_number() OVER (ORDER BY rrf DESC, item_id ASC)
                    AS BIGINT) AS rank,
               item_id, rrf, r_bm25, r_cos
        FROM top
        ORDER BY rrf DESC, item_id ASC
        """


# quality/similarity must be registered before composing their oracles.
from . import quality as _quality  # noqa: E402,F401
from . import similarity as _similarity  # noqa: E402,F401

register(
    QuerySpec(
        "x177_rrf_fusion",
        x177_rrf_fusion,
        _x177_sql(),
        "reciprocal-rank fusion of the registered BM25 + cosine rankers",
    )
)


# --- x196: exact-probed-IVF bitext mining (bounded audit slice) ---------------
# Demoted from full-corpus to an AUDIT SLICE in round 11 (VERDICT r10
# ask #1): with the query set equal to the corpus, candidate volume is
# n_src · probes · (n/nlist) ≈ 2·n·√n — an inherent n^1.5 the two-level
# router cannot remove (SFX10_PROBE measured 17.7×/decade, the one
# registered query above the 10× linear wall).  The PRODUCTION
# full-corpus mining entry is x233 (capacity-capped rings, linear by
# construction, 5.0×/decade measured); x196 keeps the exact
# probed-IVF semantics over a FIXED source slice — the x199/x176
# bounded-audit pattern — so it now costs audit·probes·(n/nlist)
# candidates (sub-linear in n) and serves as the exact-truth shape a
# mining pipeline spot-checks x233 against.
BMX_AUDIT_MAX_ID = 256  # FIXED source-id bound — the audit slice


def x196_ivf_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin mining over the BOUNDED source audit slice (label-0
    vectors with vec_id < BMX_AUDIT_MAX_ID — a fixed-size set, so the
    mining cost no longer grows with the query side) against the FULL
    target corpus, with candidate generation restricted by x21's
    deterministic IVF coarse quantizer — each audit source probes its
    IVF_N_PROBE nearest cells, each target lives in exactly one cell,
    and candidates are the cell-equi-join of the two assignments.
    Production full-corpus mining is x233; this is its exact-truth
    audit shape (see the demotion note above).

    Scale shapes: the only corpus-sized work is the shared two-level
    assignment pass (~n^1.25, bounded broadcasts at both levels) the
    target side needs anyway; the candidate cell join fans out to
    audit·probes·(n/nlist) pairs — with the source slice FIXED and
    nlist = ceil(√n) (the FAISS sizing rule), that volume SHRINKS
    relative to n as the corpus grows.  The margin denominator uses
    the ACTUAL candidate top-K count (cells can be sparse), so the
    recurrence stays exact.  This keeps x168's probed-candidate
    margin semantics (Artetxe & Schwenk 2019 §3.3's FAISS-IVF
    restriction) in their exact, oracle-checkable form; the corpus-
    sized query set that made the unbounded shape n^1.5 lives on only
    in x233's capacity-capped (linear) form."""
    from .similarity import IVF_N_PROBE, two_level_assign

    emb = load_table(spark, sf_dir, "embeddings")
    src = emb.filter(
        (F.col("label") == SRC_LABEL)
        & (F.col("vec_id") < BMX_AUDIT_MAX_ID)
    ).select(F.col("vec_id").alias("src_id"), "embedding")
    tgt = emb.filter(F.col("label") == TGT_LABEL).select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    # ONE two-level assignment pass serves both halves: sources keep
    # their IVF_N_PROBE nearest within-super cells, targets their rank-1
    assigns = two_level_assign(spark, sf_dir, IVF_N_PROBE)
    probes = assigns.join(
        src.select("src_id"), assigns.vec_id == F.col("src_id")
    ).select("src_id", F.col("c_id").alias("cell"))
    lists = (
        assigns.filter(F.col("crank") == 1)
        .join(tgt.select("tgt_id"), assigns.vec_id == F.col("tgt_id"))
        .select("tgt_id", F.col("c_id").alias("cell"))
    )
    # id-only cell join (narrow shuffle rows), vectors rejoin by key after
    cand = probes.join(lists, "cell").select("src_id", "tgt_id")
    # norms precomputed ONCE per vector, not per candidate pair —
    # bit-identical to cosine()'s inline norms (same IEEE ops on the
    # same values; the oracle still computes them inline), ~2/3 fewer
    # flops over the probes·(n/nlist)-pair candidate set (the round-11
    # graph-build lesson, 2.5x measured there)
    sv = src.select(
        "src_id",
        F.col("embedding").alias("src_vec"),
        l2norm(F.col("embedding")).alias("src_n"),
    )
    tv = tgt.select(
        "tgt_id",
        F.col("embedding").alias("tgt_vec"),
        l2norm(F.col("embedding")).alias("tgt_n"),
    )
    scored = (
        cand.join(sv, "src_id")
        .join(tv, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round(
                dot(F.col("src_vec"), F.col("tgt_vec"))
                / (F.col("src_n") * F.col("tgt_n")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cos"), F.asc("tgt_id"))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= MARGIN_K
    )
    denom = topk.groupBy("src_id").agg(
        (
            F.sum(F.col("cos").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_topk")
    )
    best = topk.filter(F.col("rn") == 1).select("src_id", "tgt_id", "cos")
    ranked = (
        best.join(denom, "src_id")
        .select(
            "src_id",
            "tgt_id",
            "cos",
            F.round(F.col("cos") / F.col("mean_topk"), 6).alias("margin"),
        )
        .orderBy(F.desc("margin"), F.asc("src_id"))
        .limit(MINE_TOP)
    )
    w2 = Window.orderBy(F.desc("margin"), F.asc("src_id"))
    return ranked.select(
        F.row_number().over(w2).cast("long").alias("rank"),
        "src_id",
        "tgt_id",
        "cos",
        "margin",
    )


def _x196_sql() -> str:
    from .similarity import (
        IVF_N_PROBE,
        SQL_IVF_NLIST,
        sql_two_level_assign,
    )

    return f"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        cent AS (SELECT vec_id AS c_id, v AS c_vec FROM e
                 WHERE vec_id < {SQL_IVF_NLIST}),
        s AS (SELECT vec_id AS src_id, v FROM e
              WHERE label = {SRC_LABEL} AND vec_id < {BMX_AUDIT_MAX_ID}),
        t AS (SELECT vec_id AS tgt_id, v FROM e WHERE label = {TGT_LABEL}),
        {sql_two_level_assign(IVF_N_PROBE)},
        probes AS (
          SELECT s.src_id, a.c_id AS cell
          FROM assigns a JOIN s ON a.vec_id = s.src_id),
        lists AS (
          SELECT t.tgt_id, a.c_id AS cell
          FROM assigns a JOIN t ON a.vec_id = t.tgt_id
          WHERE a.crank = 1),
        scored AS (
          SELECT p.src_id, l.tgt_id,
                 {_SQL_COS.format(a="s.v", b="t.v")} AS cos
          FROM probes p JOIN lists l USING (cell)
               JOIN s ON s.src_id = p.src_id
               JOIN t ON t.tgt_id = l.tgt_id),
        topk AS (
          SELECT src_id, tgt_id, cos,
                 row_number() OVER (PARTITION BY src_id
                                    ORDER BY cos DESC, tgt_id ASC) AS rn
          FROM scored QUALIFY rn <= {MARGIN_K}),
        denom AS (
          SELECT src_id,
                 {SQL_DEC_SUM.format(x="cos")} / COUNT(cos) AS mean_topk
          FROM topk GROUP BY src_id),
        ranked AS (
          SELECT b.src_id, b.tgt_id, b.cos,
                 ROUND(b.cos / d.mean_topk, 6) AS margin
          FROM topk b JOIN denom d USING (src_id)
          WHERE b.rn = 1
          ORDER BY margin DESC, src_id ASC
          LIMIT {MINE_TOP})
        SELECT CAST(row_number() OVER (ORDER BY margin DESC, src_id ASC)
                    AS BIGINT) AS rank,
               src_id, tgt_id, cos, margin
        FROM ranked
        ORDER BY margin DESC, src_id ASC
        """


register(
    QuerySpec(
        "x196_ivf_bitext_mine",
        x196_ivf_bitext_mine,
        _x196_sql(),
        "exact probed-IVF margin mining over a fixed source audit slice (production entry: x233)",
    )
)


# --- x233: capacity-capped full-corpus bitext mining ----------------------------
# x196 is the exact-probed-IVF reference shape, but its query set is the
# CORPUS itself, so candidate volume is n_src · probes · (n/nlist) ≈
# 2·n·√n — an inherent n^1.5 term the two-level router cannot remove
# (the round-10 sfx10 probe measured 17.7×/decade against the 10×
# linear wall; ARCHITECTURE §3b names the cause).  This is the LINEAR
# scale path, x214's SemDeDup capacity trick applied to two-sided
# mining: rank BOTH corpus halves together within each coarse cell by
# (rounded centroid distance, vec_id), cut into rings of exactly
# BMC_CAP rows, and mine each source only against the targets in its
# ring ± a BMC_OV-row band of the adjacent rings.  True pairs are
# near-identical vectors → near-equal centroid distance → adjacent
# ranks → same ring or band (x214's twin argument), and pair volume is
# ≈ n·(BMC_CAP + 2·BMC_OV)/2 — linear by construction, independent of
# cell skew.  The recall trade (cross-ring pairs beyond the band are
# never compared) is the same one SemDeDup documents.
BMC_CAP = 64   # hard per-ring population cap (the capacity invariant)
BMC_OV = 16    # boundary band mined across adjacent rings


def bmc_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_id, tgt_id) — x233's capacity-capped candidate set.
    Factored out so tests/test_round10_invariants.py can pin the twin
    law the docstring argues (a true pair's near-identical vectors share
    a ring or the overlap band, so the pair is ALWAYS a candidate)
    independently of the margin tail, whose ratio denominator is noisy
    on weak-signal corpora."""
    from .similarity import (
        cent_sup_for,
        ivf_k0,
        ivf_nlist,
        route_two_level,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    nlist = ivf_nlist(spark, sf_dir)
    k0 = ivf_k0(spark, sf_dir)
    cent = emb.filter(F.col("vec_id") < nlist).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    sup = emb.filter(F.col("vec_id") < k0).select(
        F.col("vec_id").alias("s_id"), F.col("embedding").alias("s_vec")
    )
    asn = route_two_level(
        emb.select("vec_id", "embedding"),
        sup,
        cent_sup_for(cent, sup),
        cent_rows=nlist,
        include_dist=True,
    )
    wcell = Window.partitionBy("c_id").orderBy(F.asc("d"), F.asc("vec_id"))
    # placed is narrow scalars only (vec_id, label, cell, ring, pos) and
    # feeds both mining sides — localCheckpoint per the x214 precedent
    # (vectors stay in the parquet scan and rejoin by key below).
    placed = (
        asn.join(emb.select("vec_id", "label"), "vec_id")
        .withColumn("rn0", F.row_number().over(wcell) - 1)
        .select(
            "vec_id",
            "label",
            F.col("c_id").alias("cell"),
            F.expr(f"rn0 div {BMC_CAP}").alias("ring"),
            (F.col("rn0") % BMC_CAP).alias("pos"),
        )
        .localCheckpoint()
    )
    s = placed.filter(F.col("label") == SRC_LABEL).select(
        F.col("vec_id").alias("src_id"), "cell", "ring", "pos"
    )
    t = placed.filter(F.col("label") == TGT_LABEL).select(
        F.col("vec_id").alias("tgt_id"), "cell", "ring", "pos"
    )
    same = s.join(
        t.select("tgt_id", "cell", "ring"), ["cell", "ring"]
    ).select("src_id", "tgt_id")
    # band: a source near a ring boundary also sees the adjacent ring's
    # targets on the other side of the cut (both directions — mining is
    # directional, unlike x214's unordered dedup pairs)
    up = (
        s.filter(F.col("pos") >= BMC_CAP - BMC_OV)
        .join(
            t.filter(F.col("pos") < BMC_OV).select(
                "tgt_id", "cell", (F.col("ring") - 1).alias("ring")
            ),
            ["cell", "ring"],
        )
        .select("src_id", "tgt_id")
    )
    down = (
        s.filter(F.col("pos") < BMC_OV)
        .join(
            t.filter(F.col("pos") >= BMC_CAP - BMC_OV).select(
                "tgt_id", "cell", (F.col("ring") + 1).alias("ring")
            ),
            ["cell", "ring"],
        )
        .select("src_id", "tgt_id")
    )
    return same.unionAll(up).unionAll(down)


def x233_bitext_mine_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin mining with LINEAR pair volume: top-margin (src → tgt)
    alignments where each source's candidates are the targets sharing
    its capacity-capped ring (± the overlap band) inside its two-level-
    routed coarse cell (see ``bmc_candidates``).

    Scale shapes: one ~n^1.25 two-level assignment (bounded broadcasts
    at both levels) feeds one per-cell window of ~√n rows per task
    (parallelism grows with the corpus); ring cutting is row-local
    integer arithmetic; the pair joins are (cell, ring)-keyed hash
    joins whose per-key fan-out is capped at BMC_CAP·BMC_CAP/4 rows;
    the margin tail is x196's (per-source top-K window + one bounded
    rollup)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    cand = bmc_candidates(spark, sf_dir)
    sv = emb.filter(F.col("label") == SRC_LABEL).select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").alias("src_vec"),
        l2norm(F.col("embedding")).alias("src_n"),
    )
    tv = emb.filter(F.col("label") == TGT_LABEL).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("embedding").alias("tgt_vec"),
        l2norm(F.col("embedding")).alias("tgt_n"),
    )
    scored = (
        cand.join(sv, "src_id")
        .join(tv, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round(
                dot(F.col("src_vec"), F.col("tgt_vec"))
                / (F.col("src_n") * F.col("tgt_n")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cos"), F.asc("tgt_id"))
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= MARGIN_K
    )
    denom = topk.groupBy("src_id").agg(
        (
            F.sum(F.col("cos").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_topk")
    )
    best = topk.filter(F.col("rn") == 1).select("src_id", "tgt_id", "cos")
    ranked = (
        best.join(denom, "src_id")
        .select(
            "src_id",
            "tgt_id",
            "cos",
            F.round(F.col("cos") / F.col("mean_topk"), 6).alias("margin"),
        )
        .orderBy(F.desc("margin"), F.asc("src_id"))
        .limit(MINE_TOP)
    )
    w2 = Window.orderBy(F.desc("margin"), F.asc("src_id"))
    return ranked.select(
        F.row_number().over(w2).cast("long").alias("rank"),
        "src_id",
        "tgt_id",
        "cos",
        "margin",
    )


def _x233_sql() -> str:
    from .similarity import (
        SQL_IVF_NLIST,
        _SQL_SUP_VECSUP,
        _sql_asn,
        _sql_cs,
    )

    return f"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        cent_seed AS (SELECT vec_id AS c_id, v AS c_vec FROM e
                      WHERE vec_id < {SQL_IVF_NLIST}),
        {_SQL_SUP_VECSUP},
        {_sql_cs("cent_seed", "cs")},
        {_sql_asn("cs", "asn")},
        placed AS MATERIALIZED (
          SELECT vec_id, label, cell, rn0 // {BMC_CAP} AS ring,
                 rn0 % {BMC_CAP} AS pos
          FROM (
            SELECT a.vec_id, e.label, a.c_id AS cell,
                   row_number() OVER (PARTITION BY a.c_id
                                      ORDER BY a.d, a.vec_id) - 1 AS rn0
            FROM asn a JOIN e USING (vec_id))),
        s AS (SELECT vec_id AS src_id, cell, ring, pos FROM placed
              WHERE label = {SRC_LABEL}),
        t AS (SELECT vec_id AS tgt_id, cell, ring, pos FROM placed
              WHERE label = {TGT_LABEL}),
        cand AS (
          SELECT s.src_id, t.tgt_id FROM s JOIN t USING (cell, ring)
          UNION ALL
          SELECT s.src_id, t.tgt_id FROM s JOIN t
            ON s.cell = t.cell AND s.ring + 1 = t.ring
               AND s.pos >= {BMC_CAP - BMC_OV} AND t.pos < {BMC_OV}
          UNION ALL
          SELECT s.src_id, t.tgt_id FROM s JOIN t
            ON s.cell = t.cell AND s.ring = t.ring + 1
               AND s.pos < {BMC_OV} AND t.pos >= {BMC_CAP - BMC_OV}),
        scored AS (
          SELECT c.src_id, c.tgt_id,
                 {_SQL_COS.format(a="sv.v", b="tv.v")} AS cos
          FROM cand c JOIN e sv ON sv.vec_id = c.src_id
               JOIN e tv ON tv.vec_id = c.tgt_id),
        topk AS (
          SELECT src_id, tgt_id, cos,
                 row_number() OVER (PARTITION BY src_id
                                    ORDER BY cos DESC, tgt_id ASC) AS rn
          FROM scored QUALIFY rn <= {MARGIN_K}),
        denom AS (
          SELECT src_id,
                 {SQL_DEC_SUM.format(x="cos")} / COUNT(cos) AS mean_topk
          FROM topk GROUP BY src_id),
        ranked AS (
          SELECT b.src_id, b.tgt_id, b.cos,
                 ROUND(b.cos / d.mean_topk, 6) AS margin
          FROM topk b JOIN denom d USING (src_id)
          WHERE b.rn = 1
          ORDER BY margin DESC, src_id ASC
          LIMIT {MINE_TOP})
        SELECT CAST(row_number() OVER (ORDER BY margin DESC, src_id ASC)
                    AS BIGINT) AS rank,
               src_id, tgt_id, cos, margin
        FROM ranked
        ORDER BY margin DESC, src_id ASC
        """


register(
    QuerySpec(
        "x233_bitext_mine_capped",
        x233_bitext_mine_capped,
        _x233_sql(),
        "capacity-capped bitext mining: linear pair volume via x214's ring trick (x196's 100 TB path)",
    )
)
