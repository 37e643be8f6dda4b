"""Oracle-backed audits for the engine-specific sketches (VERDICT r5
ask #7) plus a fully portable distinct sketch.

Six registry entries are rows-only by design — their sketch internals
(xxhash64 seeds, HLL++ registers, Greenwald-Khanna summaries) are not
reproducible in DuckDB: x09 (MinHash-LSH), x12 (sign-LSH buckets),
x18 (SimHash), x20 (LSH ANN), q20 (approx distinct), q59 (approx
percentile).  Each audit here runs the REAL production sketch pipeline
(shared kernels, not re-implementations) and outputs only properties
the sketch THEOREMS guarantee deterministically, so a DuckDB oracle can
assert them value-for-value and the sketches get hash-green driver rows
by proxy:

- x188: exact-twin docs have identical MinHash signatures in every band
  → LSH recalls 100% of twin pairs (x09's pipeline, x09's offset).
- x189: SimHash is token-SET semantics → permutation-invariant (x18's
  kernel on order-reversed text).
- x190: sign-LSH buckets are scale-invariant — bucket(2·v) == bucket(v)
  bit-exactly, because scaling by a power of two commutes with IEEE-754
  rounding, so every hyperplane dot doubles exactly and no sign flips
  (x12/x20's kernel).  This is the property that makes the bucket a
  COSINE structure.
- x191: an exact copy of a query vector lands in the query's bucket and
  reranks to rank 1 at cosine 1.0 (x20's full pipeline on an augmented
  corpus).
- x192: q20's HLL++ estimate lands within HLL_AUDIT_TOL of the exact
  distinct count (a wide multiple of the configured rsd — a broken
  sketch is off by orders of magnitude, a healthy one by ~rsd).
- x193: q59's GK percentile value has rank within PCTL_AUDIT_EPS of the
  target quantile (the sketch's actual guarantee: rank error, not value
  error).

x195 is the constructive counterpart: a bottom-k distinct sketch over a
PORTABLE hash (md5 prefix — bit-identical in Spark and DuckDB), so the
estimate itself — not just a theorem about it — is value-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .dedup import SHINGLE_WIDTH, X09_TWIN_OFF, simhash_fingerprints, x09_minhash_lsh
from .relational import Q20_RSD
from .relational3 import APPROX_ACC
from .similarity import N_QUERY_VECS, cosine, sign_lsh_bucket


# --- x188: MinHash-LSH twin-recall audit (proxy row for x09) -----------------
def x188_minhash_twin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run x09's production MinHash-LSH pipeline (xxhash64 sketches and
    all) and assert its deterministic guarantee: the doubled corpus's
    exact twins (d, d + X09_TWIN_OFF) have identical signatures, hence
    identical band buckets, hence 100% candidate recall at estimated
    Jaccard 1.0.  Any break in shingling, signature aggregation, banding
    or the candidate join drops recall below 1 and fails the value hash.
    Docs too short to shingle (< SHINGLE_WIDTH words) have no signature
    and are excluded from the expectation on both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected = docs.filter(
        F.size(F.split("text", " ")) >= SHINGLE_WIDTH
    ).agg(F.count(F.lit(1)).alias("n_twins_expected"))
    pairs = x09_minhash_lsh(spark, sf_dir)
    recalled = pairs.filter(
        (F.col("id_b") - F.col("id_a") == X09_TWIN_OFF)
        & (F.col("id_a") < X09_TWIN_OFF)
        & (F.col("est_jaccard") == 1.0)
    ).agg(F.count(F.lit(1)).alias("n_twins_recalled"))
    return expected.crossJoin(recalled).select(
        "n_twins_expected",
        "n_twins_recalled",
        F.round(
            F.col("n_twins_recalled").cast("double")
            / F.col("n_twins_expected").cast("double"),
            6,
        ).alias("recall"),
    )


register(
    QuerySpec(
        "x188_minhash_twin_audit",
        x188_minhash_twin_audit,
        f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_twins_expected,
               CAST(COUNT(*) AS BIGINT) AS n_twins_recalled,
               CAST(1.0 AS DOUBLE) AS recall
        FROM documents
        WHERE len(string_split(text, ' ')) >= {SHINGLE_WIDTH}
        """,
        "x09's sketch vs ground truth: exact twins must be 100% recalled",
    )
)


# --- x189: SimHash permutation-invariance audit (proxy row for x18) ----------
def x189_simhash_perm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run x18's production SimHash kernel twice — on each document and
    on its token-order REVERSAL — and assert the fingerprints are
    bit-identical: SimHash votes over the distinct token SET, so word
    order must not move a single bit.  A regression in tokenization,
    the distinct step, or the vote/sign aggregation breaks equality."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fwd = simhash_fingerprints(docs)
    rev = simhash_fingerprints(
        docs.select(
            "doc_id",
            F.array_join(F.reverse(F.split("text", " ")), " ").alias("text"),
        )
    ).select(F.col("doc_id"), F.col("simhash").alias("simhash_rev"))
    return (
        fwd.join(rev, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("simhash") == F.col("simhash_rev")).cast("long"))
            .cast("long")
            .alias("n_perm_invariant"),
        )
        .select(
            "n_docs",
            "n_perm_invariant",
            F.round(
                F.col("n_perm_invariant").cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("frac_invariant"),
        )
    )


register(
    QuerySpec(
        "x189_simhash_perm_audit",
        x189_simhash_perm_audit,
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_perm_invariant,
               CAST(1.0 AS DOUBLE) AS frac_invariant
        FROM documents
        """,
        "x18's sketch property: SimHash is token-set (order-invariant)",
    )
)


# --- x190: sign-LSH scale-invariance audit (proxy row for x12) ---------------
def x190_lsh_scale_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run x12/x20's production sign-LSH kernel on each vector and on
    the vector scaled by 2 and assert identical buckets.  Doubling every
    component is EXACT in IEEE-754 (exponent increment), and scaling by
    a power of two commutes with rounding, so every hyperplane dot
    product doubles exactly and no sign can flip — the theorem that the
    bucket depends only on DIRECTION (what makes it a cosine-LSH).  A
    kernel change that sneaks in magnitude sensitivity fails here."""
    emb = load_table(spark, sf_dir, "embeddings")
    both = emb.select(
        "vec_id",
        sign_lsh_bucket(F.col("embedding")).alias("b1"),
        sign_lsh_bucket(
            F.transform("embedding", lambda x: x * F.lit(2.0))
        ).alias("b2"),
    )
    return both.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum((F.col("b1") == F.col("b2")).cast("long"))
        .cast("long")
        .alias("n_scale_invariant"),
    ).select(
        "n_vecs",
        "n_scale_invariant",
        F.round(
            F.col("n_scale_invariant").cast("double")
            / F.col("n_vecs").cast("double"),
            6,
        ).alias("frac_invariant"),
    )


register(
    QuerySpec(
        "x190_lsh_scale_audit",
        x190_lsh_scale_audit,
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(COUNT(*) AS BIGINT) AS n_scale_invariant,
               CAST(1.0 AS DOUBLE) AS frac_invariant
        FROM embeddings
        """,
        "x12/x20's kernel property: sign-LSH bucket is magnitude-blind",
    )
)


# --- x191: LSH-ANN self-recall audit (proxy row for x20) ---------------------
X191_COPY_OFF = 900_000


def x191_ann_self_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x20's full pipeline (bucket → same-bucket candidates → exact
    cosine rerank) on a corpus augmented with an exact COPY of each
    query vector: the copy shares the query's bucket by construction
    and reranks to rank 1 at cosine 1.0.  A break anywhere — bucket
    kernel, candidate join, rerank window — loses the copy."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.unionAll(
        queries.select(
            (F.col("q_id") + X191_COPY_OFF).alias("vec_id"),
            F.col("q_vec").alias("embedding"),
        )
    ).select("vec_id", "embedding", sign_lsh_bucket(F.col("embedding")).alias("bucket"))
    qb = queries.select(
        "q_id", "q_vec", sign_lsh_bucket(F.col("q_vec")).alias("q_bucket")
    )
    cand = corpus.join(
        F.broadcast(qb),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    )
    scored = cand.select(
        "q_id", "vec_id", cosine(F.col("q_vec"), F.col("embedding")).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("vec_id") == F.col("q_id") + X191_COPY_OFF)
        .select(
            "q_id",
            F.col("rank").cast("long").alias("copy_rank"),
            F.col("cos_sim").alias("copy_cos"),
        )
        .orderBy("q_id")
    )


register(
    QuerySpec(
        "x191_ann_self_recall",
        x191_ann_self_recall,
        f"""
        SELECT vec_id AS q_id,
               CAST(1 AS BIGINT) AS copy_rank,
               CAST(1.0 AS DOUBLE) AS copy_cos
        FROM embeddings WHERE vec_id < {N_QUERY_VECS}
        ORDER BY q_id
        """,
        "x20's pipeline guarantee: an exact copy retrieves at rank 1, cos 1.0",
    )
)


# --- x192: HLL error audit (proxy row for q20) -------------------------------
# A healthy HLL++ at rsd=Q20_RSD errs by ~rsd; tolerate 5× before the
# audit (and so the driver gate) fails — a broken sketch is off by
# orders of magnitude, not basis points.
HLL_AUDIT_TOL = 5 * Q20_RSD


def x192_hll_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20's approx_count_distinct (HLL++, engine-specific registers)
    checked against the exact distinct count per group: the audit emits
    the exact count plus a boolean the sketch's accuracy contract
    guarantees, which the oracle asserts as a literal."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=Q20_RSD).alias("approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx") - F.col("exact_parts"))
                <= F.col("exact_parts").cast("double") * HLL_AUDIT_TOL
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


register(
    QuerySpec(
        "x192_hll_error_audit",
        x192_hll_error_audit,
        """
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q20's HLL++ estimate must land within the tolerance of exact",
    )
)


# --- x193: GK percentile rank audit (proxy row for q59) ----------------------
# GK with accuracy APPROX_ACC guarantees rank error <= n/APPROX_ACC; the
# audit tolerates a rank fraction off by PCTL_AUDIT_EPS (orders above
# the guarantee, far below what a broken sketch produces).
PCTL_AUDIT_EPS = 0.01


def x193_pctl_rank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q59's approx_percentile values checked by their RANK — the
    quantity the Greenwald-Khanna sketch actually bounds: the fraction
    of rows at or below the returned p50/p90 values must sit within
    PCTL_AUDIT_EPS of 0.5/0.9.  The oracle asserts the booleans as
    literals; the group sizes are value-checked."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(APPROX_ACC)).alias(
            "p50"
        ),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(APPROX_ACC)).alias(
            "p90"
        ),
    )
    ranked = (
        o.select("o_orderpriority", "o_totalprice")
        .join(F.broadcast(agg), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.sum((F.col("o_totalprice") <= F.col("p50")).cast("long")).alias(
                "le_p50"
            ),
            F.sum((F.col("o_totalprice") <= F.col("p90")).cast("long")).alias(
                "le_p90"
            ),
            F.first("n").alias("n"),
        )
    )
    frac = lambda c: F.col(c).cast("double") / F.col("n").cast("double")  # noqa: E731
    return ranked.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        (F.abs(frac("le_p50") - 0.5) <= PCTL_AUDIT_EPS).alias("p50_ok"),
        (F.abs(frac("le_p90") - 0.9) <= PCTL_AUDIT_EPS).alias("p90_ok"),
    ).orderBy("o_orderpriority")


register(
    QuerySpec(
        "x193_pctl_rank_audit",
        x193_pctl_rank_audit,
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               TRUE AS p50_ok,
               TRUE AS p90_ok
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q59's GK values must rank within eps of their target quantiles",
    )
)


# --- x195: portable bottom-k distinct sketch ---------------------------------
# k-minimum-values estimator (Bar-Yossef et al. 2002): with hashes
# uniform on [0, BK_SPACE), E[distinct] ≈ (k-1) · BK_SPACE / h_(k).
# The hash is an md5 prefix — bit-identical in Spark (conv) and DuckDB
# (from_hex::BIT) — so unlike q20's HLL++ the ESTIMATE itself is
# value-checked cross-engine, and the sketch state (the k smallest
# hashes per group) is mergeable across partitions/shards.
BK_K = 64
BK_HEX = 14  # md5 prefix length → 56-bit hash space
BK_SPACE = 16**BK_HEX


def x195_bottomk_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) distinct estimate per group over a portable hash,
    next to the exact count and the realized relative error.  Scale
    shape: the per-group k-th-smallest is a WindowGroupLimit over the
    distinct-hash frame — only ~k rows per group survive the shuffle,
    and the k smallest hashes are exactly the mergeable sketch state a
    100 TB rollup would carry per shard."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    hashes = li.distinct().select(
        "l_returnflag",
        F.conv(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, BK_HEX), 16, 10
        )
        .cast("long")
        .alias("h"),
    )
    # distinct (group, h): md5 is effectively injective on the key space,
    # but dedup by hash VALUE is what the estimator is defined over.
    dh = hashes.distinct()
    w = Window.partitionBy("l_returnflag").orderBy(F.asc("h"))
    kth = (
        dh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == BK_K)
        .select("l_returnflag", F.col("h").alias("h_k"))
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_exact")
    )
    return (
        exact.join(kth, "l_returnflag")
        .select(
            "l_returnflag",
            "n_exact",
            F.expr(f"CAST({BK_K - 1} * {BK_SPACE} DIV h_k AS BIGINT)").alias(
                "n_est"
            ),
        )
        .select(
            "l_returnflag",
            "n_exact",
            "n_est",
            F.round(
                F.abs(F.col("n_est") - F.col("n_exact")).cast("double")
                / F.col("n_exact").cast("double"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("l_returnflag")
    )


register(
    QuerySpec(
        "x195_bottomk_distinct",
        x195_bottomk_distinct,
        f"""
        WITH dh AS (
          SELECT DISTINCT l_returnflag,
                 CAST(from_hex(substring(md5(CAST(l_partkey AS VARCHAR)),
                                         1, {BK_HEX}))::BIT::BIGINT AS BIGINT) AS h
          FROM lineitem),
        kth AS (
          SELECT l_returnflag, h AS h_k
          FROM dh
          QUALIFY row_number() OVER (PARTITION BY l_returnflag ORDER BY h ASC)
                  = {BK_K}),
        exact AS (
          SELECT l_returnflag,
                 CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact
          FROM lineitem GROUP BY l_returnflag)
        SELECT e.l_returnflag, e.n_exact,
               CAST(({BK_K - 1} * {BK_SPACE}::BIGINT) // k.h_k AS BIGINT) AS n_est,
               ROUND(CAST(abs(CAST(({BK_K - 1} * {BK_SPACE}::BIGINT) // k.h_k
                                   AS BIGINT) - e.n_exact) AS DOUBLE)
                     / e.n_exact, 6) AS rel_err
        FROM exact e JOIN kth k USING (l_returnflag)
        ORDER BY e.l_returnflag
        """,
        "portable bottom-k (KMV) distinct sketch, estimate value-checked",
    )
)
