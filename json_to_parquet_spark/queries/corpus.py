"""Corpus/embedding operators, third LLM-pipeline batch (SURVEY §2.C
X3/X4 breadth): matryoshka truncation (x59), int8 embedding quantization
(x60), sliding-window chunking (x61), unigram-LM log-probability scoring
(x62), exact heavy-hitter tokens (x63), robust MAD outlier flagging
(x64), similarity-graph triangle counting (x65), time-decayed user
activity (x66), and the end-to-end corpus cleaning pipeline (x99:
dedup → quality gates → shard manifest as one declarative plan). The reference (`/root/reference/pyarrow/main.py`) has no
text/embedding surface; these are driver-mandated LLM-pipeline operators
(repo:BASELINE.json north_star).

Scale shapes:
- x59/x60 are pure per-row projections (no shuffle at any SF).
- x61 explodes each doc into ~n_tokens/stride chunks — output scales
  with corpus size, never buffered per-executor beyond a batch.
- x62 is two token-keyed aggregations plus a token-keyed join; the
  vocabulary frame is key-shuffled, never broadcast (open-vocab safe).
- x63 ends in ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
  a per-partition top-k + driver merge of k·partitions rows, never a
  single-partition global sort.
- x64 joins per-lang medians back by lang; the lang dim is
  group-count-sized (
  broadcastable at any SF).
- x65 builds edges only within sign-blocks (never all-pairs, the x19
  pattern) and counts triangles with the degree-ordered orientation
  [Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  Reducer", WWW'11]: each triangle is counted exactly once from its
  lowest-degree vertex, so wedge fan-out is bounded by the oriented
  out-degree (≤ sqrt(2m)) rather than the max raw degree.
- x66 broadcasts a 1-row global max timestamp against the fact.

Determinism per helpers.py: fold-order-fixed ``dot`` from similarity.py
(oracle twin list_dot_product, gate-proven by x11/x13/x19/x21);
ROUND-then-decimal-sum for every transcendental term (rules 1+3);
``FLOOR(x + 0.5)`` instead of ROUND for quantization codes (both
engines' ROUND-half tie rules differ on doubles; floor is exact IEEE);
computed ints cast to long (rule 5); integer sums wrapped in BIGINT
(rule 7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM, dec_sum, inline_rows
from .similarity import cosine, dot, l2norm


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# SQL twin of similarity.dot / l2norm on a DuckDB DOUBLE[] expression.
_SQL_DOT = "list_dot_product({a}, {b})"
_SQL_NORM = "sqrt(list_dot_product({a}, {a}))"
_SQL_VEC = "CAST(embedding AS DOUBLE[])"


# --- x59: matryoshka truncation ---------------------------------------------
MATRYOSHKA_DIM = 16


def x59_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncate each embedding to its MATRYOSHKA_DIM-prefix (the
    matryoshka-representation-learning serving trick) and report the
    retained-norm fraction — per-row projection, no shuffle."""
    emb = _emb(spark, sf_dir)
    head = F.slice(F.col("embedding"), 1, MATRYOSHKA_DIM)
    full_norm = l2norm(F.col("embedding"))
    head_norm = l2norm(head)
    return emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.round(head_norm, 6).alias("trunc_norm"),
        F.round(head_norm / full_norm, 6).alias("norm_retained"),
    ).orderBy("vec_id")


register(
    QuerySpec(
        "x59_matryoshka",
        x59_matryoshka,
        f"""
        WITH t AS (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
                 {_SQL_VEC} AS v, ({_SQL_VEC})[1:{MATRYOSHKA_DIM}] AS h
          FROM embeddings)
        SELECT vec_id, label,
               ROUND({_SQL_NORM.format(a="h")}, 6) AS trunc_norm,
               ROUND({_SQL_NORM.format(a="h")} / {_SQL_NORM.format(a="v")}, 6)
                   AS norm_retained
        FROM t ORDER BY vec_id
        """,
        "matryoshka prefix truncation with retained-norm fraction",
    )
)


# --- x60: int8 symmetric quantization ---------------------------------------
def x60_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: per-vector scale = max|v|/127, codes
    = floor(v/scale + 0.5) (floor, not round — engines disagree on
    double round-half ties; floor is exactly-rounded IEEE everywhere).
    Per-row projection, no shuffle; codes serialized to CSV for the
    driver's canonicalizer."""
    emb = _emb(spark, sf_dir)
    vd = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(vd, F.abs)) / F.lit(127.0)
    code = lambda v: F.floor(v / scale + F.lit(0.5)).cast("long")  # noqa: E731
    codes = F.transform(vd, code)
    return emb.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.concat_ws(",", F.transform(codes, lambda c: c.cast("string"))).alias(
            "codes_csv"
        ),
        F.size(F.filter(codes, lambda c: F.abs(c) >= 127)).cast("long").alias("n_sat"),
    ).orderBy("vec_id")


register(
    QuerySpec(
        "x60_embedding_quantize",
        x60_embedding_quantize,
        f"""
        WITH t AS (
          SELECT vec_id, {_SQL_VEC} AS v,
                 list_max(list_transform({_SQL_VEC}, x -> abs(x))) / 127.0 AS scale
          FROM embeddings),
        c AS (
          SELECT vec_id, scale,
                 list_transform(v, x -> CAST(FLOOR(x / scale + 0.5) AS BIGINT)) AS codes
          FROM t)
        SELECT vec_id, ROUND(scale, 6) AS scale,
               array_to_string(codes, ',') AS codes_csv,
               CAST(len(list_filter(codes, x -> abs(x) >= 127)) AS BIGINT) AS n_sat
        FROM c ORDER BY vec_id
        """,
        "per-vector symmetric int8 quantization (scale + CSV codes)",
    )
)


# --- x61: sliding-window chunking -------------------------------------------
CHUNK_WINDOW = 8
CHUNK_STRIDE = 4


def x61_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunks (window CHUNK_WINDOW, stride
    CHUNK_STRIDE) — the RAG/pretraining chunker. One explode; output
    rows scale with corpus token count, per-doc state never exceeds one
    document's token array."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(CHUNK_STRIDE)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(toks, i * CHUNK_STRIDE + 1, CHUNK_WINDOW)
            ).alias("chunk_text"),
            F.size(F.slice(toks, i * CHUNK_STRIDE + 1, CHUNK_WINDOW))
            .cast("long")
            .alias("n_tokens"),
        ),
    )
    return (
        d.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_id", "c.chunk_text", "c.n_tokens")
        .orderBy("doc_id", "chunk_id")
    )


register(
    QuerySpec(
        "x61_chunk_sliding",
        x61_chunk_sliding,
        f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        c AS (
          SELECT doc_id,
                 unnest([{{'chunk_id': CAST(i AS BIGINT),
                           'chunk_text': array_to_string(
                               tk[(i*{CHUNK_STRIDE}+1):(i*{CHUNK_STRIDE}+{CHUNK_WINDOW})], ' '),
                           'n_tokens': CAST(len(
                               tk[(i*{CHUNK_STRIDE}+1):(i*{CHUNK_STRIDE}+{CHUNK_WINDOW})]) AS BIGINT)}}
                          FOR i IN generate_series(0,
                              CAST(CEIL(len(tk)/{CHUNK_STRIDE}.0) AS BIGINT) - 1)]) AS c
          FROM t)
        SELECT doc_id, c.chunk_id AS chunk_id, c.chunk_text AS chunk_text,
               c.n_tokens AS n_tokens
        FROM c ORDER BY doc_id, chunk_id
        """,
        "overlapping sliding-window token chunks (RAG chunker)",
    )
)


# --- x62: unigram-LM log-probability (perplexity proxy) ----------------------
def x62_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the classic cheap perplexity proxy for quality
    filtering. Two token-keyed aggregations + one token-keyed join; the
    vocabulary is shuffled by token, never broadcast or collected
    (open-vocabulary safe at 100 TB)."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    term = F.round(
        F.log(F.col("cnt").cast("double") / F.col("total").cast("double")), 6
    )
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", term.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.col("lp").cast("decimal(30,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


register(
    QuerySpec(
        "x62_unigram_logprob",
        x62_unigram_logprob,
        """
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
        tot AS (SELECT COUNT(*) AS total FROM toks),
        terms AS (
          SELECT t.doc_id,
                 ROUND(ln(CAST(f.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE)), 6) AS lp
          FROM toks t JOIN freq f USING (tok), tot)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(CAST(CAST(SUM(CAST(lp AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
                     / COUNT(*), 6) AS avg_logprob
        FROM terms GROUP BY doc_id ORDER BY doc_id
        """,
        "per-doc mean unigram log-prob (perplexity proxy for quality filtering)",
    )
)


# --- x63: exact heavy hitters ------------------------------------------------
HH_TOPK = 50


def x63_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-K corpus tokens. groupBy gets map-side partial
    aggregation; the final ``orderBy().limit(K)`` plans
    TakeOrderedAndProject (per-partition top-K, driver merges
    K·n_partitions rows) — no global sort, no single-partition window.
    The rank window runs over the already-limited K rows."""
    d = _docs(spark, sf_dir)
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(HH_TOPK)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    return counts.select(
        F.row_number().over(w).cast("long").alias("rank"), "tok", "cnt"
    )


register(
    QuerySpec(
        "x63_heavy_hitters",
        x63_heavy_hitters,
        f"""
        WITH c AS (
          SELECT tok, COUNT(*) AS cnt
          FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT {HH_TOPK})
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT) AS rank,
               tok, cnt
        FROM c
        """,
        "exact top-K corpus tokens via distributed TakeOrdered",
    )
)


# --- x64: robust outlier flagging (median/MAD) -------------------------------
MAD_CONST = 0.6745  # Φ⁻¹(0.75): scales MAD to σ-equivalents
MAD_CUTOFF = 3.5  # Iglewicz–Hoaglin modified-z cutoff


def x64_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified z-score outliers on document length per language —
    median/MAD, robust to the heavy tails that break mean/stddev
    filters. Two per-lang exact-percentile aggregations; the lang dim
    (group-count rows) broadcasts back both times."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("x")
    )
    med = d.groupBy("lang").agg(F.percentile("x", 0.5).alias("med"))
    dev = d.join(F.broadcast(med), "lang").withColumn(
        "adev", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("lang").agg(F.percentile("adev", 0.5).alias("mad"))
    z = F.round(
        F.lit(MAD_CONST)
        * (F.col("x") - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0.0)),
        6,
    )
    return (
        dev.join(F.broadcast(mad), "lang")
        .select(
            "doc_id",
            "lang",
            F.col("x").cast("long").alias("n_chars"),
            z.alias("z"),
            F.coalesce(F.abs(z) > MAD_CUTOFF, F.lit(False)).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )


register(
    QuerySpec(
        "x64_outlier_mad",
        x64_outlier_mad,
        f"""
        WITH d AS (
          SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS x FROM documents),
        med AS (SELECT lang, quantile_cont(x, 0.5) AS med FROM d GROUP BY lang),
        dev AS (
          SELECT d.doc_id, d.lang, d.x, med.med, abs(d.x - med.med) AS adev
          FROM d JOIN med USING (lang)),
        mad AS (SELECT lang, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY lang)
        SELECT dev.doc_id, dev.lang, CAST(dev.x AS BIGINT) AS n_chars,
               ROUND({MAD_CONST} * (dev.x - dev.med) / NULLIF(mad.mad, 0.0), 6) AS z,
               COALESCE(abs(ROUND({MAD_CONST} * (dev.x - dev.med)
                                  / NULLIF(mad.mad, 0.0), 6)) > {MAD_CUTOFF}, FALSE)
                   AS is_outlier
        FROM dev JOIN mad USING (lang) ORDER BY dev.doc_id
        """,
        "median/MAD modified-z outlier flags on doc length per language",
    )
)


# --- x65: similarity-graph triangle count ------------------------------------
TRI_SIGN_BITS = 6  # floor: 64 sign-blocks (exact historical behavior ≤ sf0.1)
TRI_COS_THRESHOLD = 0.2
# Corpus-adaptive blocking (round-6 scale fix): with FIXED bits the
# within-block candidate pairs grow as n²/2^bits — the sfx1 probe
# measured 27× wall-clock at 10× vectors.  Both engines therefore derive
# the bit count from the corpus size so block POPULATION stays ~constant
# (bits = max(TRI_SIGN_BITS, ceil(log2(n / TRI_BLOCK_POP)))): candidates
# scale ~linearly, recall trades exactly as LSH blocking always does.
# At every shipped fixture (n ≤ 2000) the formula yields the historical
# 6 bits, so gate/mirror/bench results are unchanged.
TRI_BLOCK_POP = 32


def _tri_bits(n: int) -> int:
    import math

    return max(TRI_SIGN_BITS, math.ceil(math.log2(max(n, 1) / TRI_BLOCK_POP)))


def _tri_sign_block(vec: Column, bits: int = TRI_SIGN_BITS) -> Column:
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + (F.element_at(vec, i + 1) > 0).cast("long") * F.lit(1 << i)
    return out


def x65_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the embedding-similarity graph (edges =
    same-sign-block pairs with cosine ≥ threshold) — the local-structure
    statistic behind community pruning of near-dup clusters.

    Scale shape: edges come from the x19 sign-block equi-join (never
    all-pairs). Triangles use degree-ordered orientation [Suri &
    Vassilvitskii WWW'11]: orient each edge toward the higher
    (degree, id) endpoint, build wedges from oriented out-neighbors
    (out-degree ≤ √(2m) regardless of raw skew — the "last reducer"
    fix), close them against the oriented edge set with one more
    equi-join. Three key-shuffles total, each carrying two longs."""
    base = _emb(spark, sf_dir)
    n = base.count()  # bounded scalar (corpus cardinality; table stats at scale)
    emb = base.select(
        "vec_id",
        F.col("embedding").alias("v"),
        _tri_sign_block(F.col("embedding"), _tri_bits(n)).alias("blk"),
    )
    a = emb.select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va"), "blk"
    )
    b = emb.select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb"), "blk"
    )
    edges = (
        a.join(b, "blk")
        .filter(F.col("ia") < F.col("ib"))
        .filter(cosine(F.col("va"), F.col("vb")) >= TRI_COS_THRESHOLD)
        .select(F.col("ia").alias("u"), F.col("ib").alias("w"))
    )
    both = edges.union(edges.select(F.col("w").alias("u"), F.col("u").alias("w")))
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # orient toward the higher (deg, id): src is the triangle's apex
    oriented = (
        both.join(deg.withColumnRenamed("u", "src_n").withColumnRenamed("deg", "dsrc"),
                  F.col("u") == F.col("src_n"))
        .join(deg.withColumnRenamed("u", "dst_n").withColumnRenamed("deg", "ddst"),
              F.col("w") == F.col("dst_n"))
        .filter(
            (F.col("dsrc") < F.col("ddst"))
            | ((F.col("dsrc") == F.col("ddst")) & (F.col("u") < F.col("w")))
        )
        .select(F.col("u").alias("src"), F.col("w").alias("dst"))
    )
    e1 = oriented.select(F.col("src").alias("a0"), F.col("dst").alias("b0"))
    e2 = oriented.select(F.col("src").alias("a1"), F.col("dst").alias("c0"))
    wedges = e1.join(e2, (F.col("a0") == F.col("a1")) & (F.col("b0") < F.col("c0")))
    # canonicalize the oriented closer edge to (min, max) so the closing
    # test is a plain equi-join (an OR of both directions would force a
    # nested-loop join)
    closer = oriented.select(
        F.least("src", "dst").alias("b1"), F.greatest("src", "dst").alias("c1")
    )
    tri = wedges.join(
        closer, (F.col("b0") == F.col("b1")) & (F.col("c0") == F.col("c1"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_vertices = deg.agg(F.count(F.lit(1)).alias("n_vertices"))
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return n_vertices.crossJoin(n_edges).crossJoin(n_tri)


register(
    QuerySpec(
        "x65_triangle_count",
        x65_triangle_count,
        f"""
        WITH nb AS (
          SELECT GREATEST({TRI_SIGN_BITS},
                          CAST(CEIL(LOG2(COUNT(*) / {TRI_BLOCK_POP}.0)) AS BIGINT))
              AS bits
          FROM embeddings),
        b AS (
          SELECT vec_id, {_SQL_VEC} AS v,
                 list_sum(list_transform(range(0, nb.bits),
                     i -> CASE WHEN ({_SQL_VEC})[i + 1] > 0
                               THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS blk
          FROM embeddings CROSS JOIN nb),
        ed AS (
          SELECT a.vec_id AS u, bb.vec_id AS w
          FROM b a JOIN b bb ON a.blk = bb.blk AND a.vec_id < bb.vec_id
          WHERE ROUND({_SQL_DOT.format(a="a.v", b="bb.v")}
                      / ({_SQL_NORM.format(a="a.v")} * {_SQL_NORM.format(a="bb.v")}),
                      6) >= {TRI_COS_THRESHOLD})
        SELECT
          (SELECT CAST(COUNT(*) AS BIGINT)
           FROM (SELECT u FROM ed UNION SELECT w FROM ed)) AS n_vertices,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM ed) AS n_edges,
          (SELECT CAST(COUNT(*) AS BIGINT)
           FROM ed e1 JOIN ed e2 ON e2.u = e1.w
                      JOIN ed e3 ON e3.u = e1.u AND e3.w = e2.w) AS n_triangles
        """,
        "triangle census of the sign-blocked similarity graph (degree-ordered)",
    )
)


# --- x66: time-decayed user activity ----------------------------------------
DECAY_HALF_DAYS = 30.0


def x66_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed activity score (recency
    weighting for sampling weights / freshness mixes). The global
    reference timestamp is a 1-row aggregate broadcast against the
    fact; decay terms are ROUND-ed then decimal-summed (rules 1+3)."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    age_days = (
        (F.col("ref_us") - F.unix_micros("ts"))
        / F.lit(86400000000.0)
    )
    term = F.round(F.col("value") * F.exp(-age_days / F.lit(DECAY_HALF_DAYS)), 6)
    return (
        ev.crossJoin(F.broadcast(ref))
        .select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("term", "decayed_value"),
        )
        .orderBy("user_id")
    )


register(
    QuerySpec(
        "x66_time_decay",
        x66_time_decay,
        f"""
        WITH m AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
        t AS (
          SELECT user_id,
                 ROUND(value * exp(-((m.ref_us - epoch_us(ts)) / 86400000000.0)
                                   / {DECAY_HALF_DAYS}), 6) AS term
          FROM events, m)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               {SQL_DEC_SUM.format(x="term")} AS decayed_value
        FROM t GROUP BY user_id ORDER BY user_id
        """,
        "per-user exponentially time-decayed activity score",
    )
)


# --- x71: cross-source duplication overlap matrix ----------------------------
def x71_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise shingle-set Jaccard between sources — the governance view
    of WHERE duplication comes from (mirror sites, scraped re-posts)
    before doc-level dedup decides what to drop.

    Scale shape: the corpus collapses to distinct (source, shingle-md5)
    pairs first (map-side partial dedup), so the self-join shuffles
    32-char keys, never text; a shingle shared by k sources fans out to
    C(k,2) ≤ C(n_sources,2) pairs — bounded by the source-count squared,
    independent of corpus size. Set sizes (one row per source) broadcast
    back onto the pair counts."""
    d = _docs(spark, sf_dir)
    sh = d.select(
        "source",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(F.split("text", " ")) - 3),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.split("text", " "), i + 1, 3)
                    ),
                )
            )
        ).alias("shingle"),
    ).select("source", F.md5(F.col("shingle").cast("binary")).alias("fp")).distinct()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "fp")
    b = sh.select(F.col("source").alias("src_b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


register(
    QuerySpec(
        "x71_source_overlap",
        x71_source_overlap,
        """
        WITH sh AS (
          SELECT DISTINCT source, md5(s) AS fp
          FROM (
            SELECT source,
                   unnest([array_to_string(t[i+1:i+3], ' ')
                           FOR i IN generate_series(0, len(t)-3)]) AS s
            FROM (SELECT source, string_split(text, ' ') AS t FROM documents))),
        sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
          FROM sh a JOIN sh b ON a.fp = b.fp AND a.source < b.source
          GROUP BY 1, 2)
        SELECT i.src_a, i.src_b, CAST(i.n_shared AS BIGINT) AS n_shared,
               ROUND(CAST(i.n_shared AS DOUBLE)
                     / CAST(na.n + nb.n - i.n_shared AS DOUBLE), 6) AS jaccard
        FROM inter i
        JOIN sizes na ON na.source = i.src_a
        JOIN sizes nb ON nb.source = i.src_b
        ORDER BY i.src_a, i.src_b
        """,
        "pairwise source shingle-Jaccard — where corpus duplication comes from",
    )
)


# --- x72: deterministic per-source eval sample -------------------------------
EVAL_SAMPLE_K = 5


def x72_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K docs per source, chosen by md5-hash order — the reproducible
    "random" holdout every eval/inspection pipeline needs: stable across
    runs, engines and partitionings, no RNG state. One source-keyed
    window whose per-group limit Catalyst executes as WindowGroupLimit
    (top-K retained per partition map-side before the shuffle)."""
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat_ws("|", F.col("source"), F.col("doc_id"))), F.col("doc_id")
    )
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            F.row_number().over(w).cast("long").alias("pick"),
        )
        .filter(F.col("pick") <= EVAL_SAMPLE_K)
        .orderBy("source", "pick")
    )


register(
    QuerySpec(
        "x72_eval_sample",
        x72_eval_sample,
        f"""
        SELECT doc_id, source, lang, n_chars, pick
        FROM (
          SELECT doc_id, source, lang, n_chars,
                 CAST(ROW_NUMBER() OVER (
                     PARTITION BY source
                     ORDER BY md5(source || '|' || CAST(doc_id AS VARCHAR)), doc_id
                 ) AS BIGINT) AS pick
          FROM documents)
        WHERE pick <= {EVAL_SAMPLE_K}
        ORDER BY source, pick
        """,
        "deterministic hash-ordered K-per-source eval sample",
    )
)


# --- x73: PSI distribution drift ---------------------------------------------
PSI_BINS = 10
PSI_SPLIT = "2024-01-16"  # events span 2024-01-01..30: early vs late half


def x73_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift of the event value distribution,
    early half vs late half, per event type — the monitor that catches a
    feed silently changing under a training pipeline.

    Equal-width bins over the global [min, max] (computed in one 1-row
    aggregate, broadcast) — percentile-free, so binning is exact integer
    arithmetic on both engines. Laplace-smoothed shares keep empty bins
    finite with integer-exact ratios; the ln terms are ROUND-ed then
    decimal-summed (helpers rules 1+3). Two key-shuffles total:
    (event_type, bin, half) counts, then event_type rollup."""
    ev = load_table(spark, sf_dir, "events")
    rng = ev.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    binned = (
        ev.crossJoin(F.broadcast(rng))
        .select(
            "event_type",
            F.when(F.col("ts") < F.lit(PSI_SPLIT), "early")
            .otherwise("late")
            .alias("half"),
            F.least(
                F.lit(PSI_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    / ((F.col("vmax") - F.col("vmin")) / F.lit(float(PSI_BINS)))
                ).cast("long"),
            ).alias("bin"),
        )
        .groupBy("event_type", "half", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = binned.groupBy("event_type", "half").agg(
        F.sum("cnt").alias("n_half")
    )
    # Laplace smoothing: (cnt+1)/(n_half+BINS) — exact rational both sides.
    # Re-densify missing (bin, half) pairs via the full bin spine so empty
    # bins contribute their smoothed mass.
    spine = (
        binned.select("event_type").distinct()
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(PSI_BINS).select(F.col("id").alias("bin"))
            )
        )
        .crossJoin(
            F.broadcast(
                inline_rows(
                    ev.sparkSession, [("early",), ("late",)], "half string"
                )
            )
        )
    )
    dense = (
        spine.join(binned, ["event_type", "half", "bin"], "left")
        .fillna(0, subset=["cnt"])
        .join(F.broadcast(totals), ["event_type", "half"])
        .select(
            "event_type",
            "bin",
            "half",
            (
                (F.col("cnt") + 1).cast("double")
                / (F.col("n_half") + PSI_BINS).cast("double")
            ).alias("share"),
        )
    )
    e = dense.filter(F.col("half") == "early").select(
        "event_type", "bin", F.col("share").alias("p")
    )
    l = dense.filter(F.col("half") == "late").select(
        "event_type", "bin", F.col("share").alias("q")
    )
    term = F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 6)
    return (
        e.join(l, ["event_type", "bin"])
        .select("event_type", term.alias("t"))
        .groupBy("event_type")
        .agg(dec_sum("t", "psi"))
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "x73_psi_drift",
        x73_psi_drift,
        f"""
        WITH rng AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events),
        binned AS (
          SELECT event_type,
                 CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 'early' ELSE 'late' END
                     AS half,
                 LEAST({PSI_BINS - 1},
                       CAST(FLOOR((value - vmin) / ((vmax - vmin) / {float(PSI_BINS)}))
                            AS BIGINT)) AS bin
          FROM events, rng),
        cnts AS (
          SELECT event_type, half, bin, COUNT(*) AS cnt
          FROM binned GROUP BY 1, 2, 3),
        totals AS (
          SELECT event_type, half, SUM(cnt) AS n_half
          FROM cnts GROUP BY 1, 2),
        spine AS (
          SELECT DISTINCT c.event_type, b.bin, h.half
          FROM cnts c,
               generate_series(0, {PSI_BINS - 1}) AS b(bin),
               (VALUES ('early'), ('late')) AS h(half)),
        dense AS (
          SELECT s.event_type, s.bin, s.half,
                 CAST(COALESCE(c.cnt, 0) + 1 AS DOUBLE)
                 / CAST(t.n_half + {PSI_BINS} AS DOUBLE) AS share
          FROM spine s
          LEFT JOIN cnts c
            ON c.event_type = s.event_type AND c.half = s.half AND c.bin = s.bin
          JOIN totals t ON t.event_type = s.event_type AND t.half = s.half),
        terms AS (
          SELECT e.event_type,
                 ROUND((e.share - l.share) * ln(e.share / l.share), 6) AS t
          FROM dense e JOIN dense l
            ON e.event_type = l.event_type AND e.bin = l.bin
           AND e.half = 'early' AND l.half = 'late')
        SELECT event_type,
               {SQL_DEC_SUM.format(x="t")} AS psi
        FROM terms GROUP BY event_type ORDER BY event_type
        """,
        "population-stability-index drift per event type, early vs late half",
    )
)


# --- x99: end-to-end corpus cleaning pipeline --------------------------------
# The composition story: a user of this engine chains dedup → quality
# filter → shard assignment as ONE declarative plan (no materialization
# between stages), and Catalyst pipelines the filters into the dedup
# window's shuffle. Constants shared with the SQL twin below.
CLEAN_MIN_CHARS, CLEAN_MAX_CHARS = 100, 20_000
CLEAN_MIN_TOKENS = 20
CLEAN_SHARDS = 16
_SHARD_MIX = 2654435761  # Knuth multiplicative constant; doc_id·mix < 2^63


def x99_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus cleanup as one plan: exact dedup (survivor =
    lowest doc_id per identical text), length/token-count quality gates,
    deterministic shard assignment, then per-(lang, shard) manifest
    counts. One shuffle for the dedup window (keyed on text — at 100 TB
    you key on a fingerprint; x01/x74 are that shape), one for the final
    small aggregation; the filters are row-local and run inside the same
    stage as the window."""
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("text")
    toks = F.split("text", " ")
    shard = ((F.col("doc_id") * F.lit(_SHARD_MIX)) % CLEAN_SHARDS).cast("long")
    return (
        docs.withColumn("min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("min_id"))
        .filter(
            (F.col("n_chars") >= CLEAN_MIN_CHARS)
            & (F.col("n_chars") <= CLEAN_MAX_CHARS)
            & (F.size(toks) >= CLEAN_MIN_TOKENS)
        )
        .select("lang", shard.alias("shard"), "n_chars")
        .groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang", "shard")
    )


register(
    QuerySpec(
        "x99_corpus_clean_pipeline",
        x99_corpus_clean_pipeline,
        f"""
        WITH surv AS (
          SELECT doc_id, lang, n_chars, text
          FROM documents
          QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)),
        clean AS (
          SELECT lang,
                 CAST((doc_id * {_SHARD_MIX}) % {CLEAN_SHARDS} AS BIGINT) AS shard,
                 n_chars
          FROM surv
          WHERE n_chars BETWEEN {CLEAN_MIN_CHARS} AND {CLEAN_MAX_CHARS}
            AND len(string_split(text, ' ')) >= {CLEAN_MIN_TOKENS})
        SELECT lang, shard, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM clean
        GROUP BY lang, shard
        ORDER BY lang, shard
        """,
        "dedup → quality gates → shard manifest as one declarative plan",
    )
)


# --- x180: sketch-vs-exact source overlap ------------------------------------
def x180_source_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair overlap from MERGED MinHash sketches, measured against
    the exact Jaccard: each source keeps one 16-coordinate signature
    (min over all its shingle fingerprints per hash — the mergeable-
    sketch algebra), pairs estimate Jaccard as the matching-coordinate
    fraction, and the exact set Jaccard (x71's quantity, recomputed over
    the same md5-prefix fingerprints) sits alongside with the absolute
    error. This is how cross-dataset overlap is audited at 100 TB:
    signatures are source-cardinality-sized state that merges
    commutatively under ingest, so the pairwise audit never rejoins the
    corpus — only this eval pays the exact join, to certify the sketch.

    Shapes: one (source, shingle-fp) distinct pass feeds BOTH the
    signature aggregation (source-keyed, 16 longs of state) and the
    exact intersection join (fp-keyed, fan-out ≤ C(n_sources,2) per
    shared fp)."""
    from .dedup import _ARITH_HASHES, ARITH_P, shingles

    d = _docs(spark, sf_dir)
    # md5-prefix fingerprint (48-bit BIGINT): one native hash per shingle
    # instead of the per-codepoint charfold aggregate — measured 9.7 s ->
    # ~2.5 s for this pass at sf0.1; any injective-enough numeric fp
    # works, the MinHash affine family only needs a BIGINT key.
    # reduce into the prime field so the affine (a*fp + b) stays inside
    # BIGINT under ANSI (a ~ 1e9, so fp must be < ARITH_P, not 2^48)
    fp = F.conv(F.substring(F.md5("sh"), 1, 12), 16, 10).cast("long") % F.lit(
        ARITH_P
    )
    sh = (
        d.select("source", F.explode(shingles(F.col("text"))).alias("sh"))
        .select("source", fp.alias("fp"))
        .distinct()
        .persist()
    )
    mins = [
        F.min((F.lit(a) * F.col("fp") + F.lit(b)) % F.lit(ARITH_P)).alias(f"h{j}")
        for j, (a, b) in enumerate(_ARITH_HASHES)
    ]
    sig = sh.groupBy("source").agg(*mins)
    sa = sig.select(
        F.col("source").alias("src_a"),
        *[F.col(f"h{j}").alias(f"a{j}") for j in range(len(_ARITH_HASHES))],
    )
    sb = sig.select(
        F.col("source").alias("src_b"),
        *[F.col(f"h{j}").alias(f"b{j}") for j in range(len(_ARITH_HASHES))],
    )
    n_eq = sum(
        (F.col(f"a{j}") == F.col(f"b{j}")).cast("long")
        for j in range(len(_ARITH_HASHES))
    )
    est = (
        # source-cardinality² pair frame; broadcast keeps it a BNLJ, not
        # a cartesian (tests/test_plans.py forbids CartesianProduct)
        sa.crossJoin(F.broadcast(sb))
        .filter(F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.round(n_eq.cast("double") / F.lit(float(len(_ARITH_HASHES))), 6)
            .alias("est_jaccard"),
        )
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "fp")
    b = sh.select(F.col("source").alias("src_b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    exact = (
        inter.join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("exact_jaccard"),
        )
    )
    out = (
        est.join(exact, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "est_jaccard",
            F.coalesce("exact_jaccard", F.lit(0.0)).alias("exact_jaccard"),
        )
        .select(
            "src_a",
            "src_b",
            "est_jaccard",
            "exact_jaccard",
            F.round(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")), 6).alias(
                "abs_err"
            ),
        )
        .orderBy("src_a", "src_b")
    )
    sh.unpersist()
    return out


def _x180_sql() -> str:
    from .dedup import _ARITH_HASHES, ARITH_P, SHINGLE_WIDTH

    P, W = ARITH_P, SHINGLE_WIDTH
    sig_cols = ",\n                 ".join(
        f"MIN(({a}*fp + {b}) % {P}) AS h{j}"
        for j, (a, b) in enumerate(_ARITH_HASHES)
    )
    eq_sum = " + ".join(
        f"CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END"
        for j in range(len(_ARITH_HASHES))
    )
    nh = float(len(_ARITH_HASHES))
    return f"""
        WITH tk AS (SELECT source, string_split(text, ' ') AS t FROM documents),
        shl AS (
          SELECT source,
                 unnest(list_distinct([array_to_string(t[i+1:i+{W}], ' ')
                     FOR i IN generate_series(0, len(t)-{W})])) AS sh
          FROM tk),
        fps AS MATERIALIZED (
          SELECT DISTINCT source,
                 CAST(concat('0x', substr(md5(sh), 1, 12)) AS BIGINT)
                     % {P} AS fp
          FROM shl),
        sig AS MATERIALIZED (
          SELECT source,
                 {sig_cols}
          FROM fps GROUP BY source),
        est AS (
          SELECT sa.source AS src_a, sb.source AS src_b,
                 ROUND(CAST({eq_sum} AS DOUBLE) / {nh}, 6) AS est_jaccard
          FROM sig sa JOIN sig sb ON sa.source < sb.source),
        sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                  FROM fps GROUP BY source),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
          GROUP BY 1, 2),
        exact AS (
          SELECT i.src_a, i.src_b,
                 ROUND(CAST(i.n_shared AS DOUBLE)
                       / (na.n + nb.n - i.n_shared), 6) AS exact_jaccard
          FROM inter i
          JOIN sizes na ON na.source = i.src_a
          JOIN sizes nb ON nb.source = i.src_b)
        SELECT e.src_a, e.src_b, e.est_jaccard,
               COALESCE(x.exact_jaccard, 0.0) AS exact_jaccard,
               ROUND(abs(e.est_jaccard - COALESCE(x.exact_jaccard, 0.0)), 6)
                   AS abs_err
        FROM est e LEFT JOIN exact x
          ON e.src_a = x.src_a AND e.src_b = x.src_b
        ORDER BY e.src_a, e.src_b
        """


register(
    QuerySpec(
        "x180_source_overlap_sketch",
        x180_source_overlap_sketch,
        _x180_sql(),
        "mergeable MinHash source-overlap estimates vs exact Jaccard",
    )
)
