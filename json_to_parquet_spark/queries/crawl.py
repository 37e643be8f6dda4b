"""Web-crawl cleanup operators, second batch (SURVEY §2.C X4 breadth):
the *apply* stages that follow the detection signals in quality.py —
boilerplate-chunk removal with order-preserving document rebuild (x56),
per-document token-entropy scoring (x57), and CCNet-style per-language
quality bucketing (x58). The reference has no text surface; these are
driver-mandated LLM-pipeline operators (repo:BASELINE.json north_star).

Scale shapes: x56 is two key-shuffles (chunk-frequency count, then doc
rebuild on doc_id) — the chunk frame carries (doc_id, cid, chunk), never
whole documents, and partial aggregation collapses repeated chunks
map-side. x57/x58 are explode → two aggregations sharing the doc_id
partitioning; the ntile window in x58 partitions by lang (25-way here,
thousands-way in practice), never a single global window.

Determinism: entropy terms are ROUND-ed before an order-independent
decimal sum (helpers.py rules 1 and 3 — engine log() can differ by 1 ulp,
~1e-16 relative, far below the 1e-7 rounding grain) and NOT re-rounded
after summing (double rounding at a coarser grain can flip a boundary
the fine grain already settled); rebuilt text is an
exact string fold ordered by chunk index; ntile is taken over a total
(score, doc_id) order so bucket membership is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM, dec_sum

CHUNK_W = 3  # tokens per chunk (the "line" granularity of the corpus)
BOILER_MIN_DOCS = 5  # chunk in >= this many distinct docs => boilerplate


def _chunks(text: Column) -> Column:
    """Non-overlapping CHUNK_W-token chunks with their index:
    array<struct<cid,chunk>>. SQL twin: the list comprehension in
    _CHUNKS_SQL (DuckDB list slicing is 1-based inclusive, matching
    F.slice's start/length clamping)."""
    toks = F.split(text, " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(CHUNK_W)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("cid"),
            F.concat_ws(" ", F.slice(toks, i * CHUNK_W + 1, CHUNK_W)).alias("chunk"),
        ),
    )


_CHUNKS_SQL = f"""
  SELECT doc_id,
         [{{'cid': CAST(i AS BIGINT),
            'chunk': array_to_string(t[(i*{CHUNK_W}+1):(i*{CHUNK_W}+{CHUNK_W})], ' ')}}
          FOR i IN generate_series(0, CAST(CEIL(len(t)/{CHUNK_W}.0) AS BIGINT) - 1)]
             AS cs
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
"""


# --- x56: boilerplate-chunk removal + document rebuild -----------------------
def x56_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove chunks that occur in >= BOILER_MIN_DOCS distinct documents
    (the navigation/footer/duplicate-phrase signal) and rebuild each
    document from its surviving chunks in original order — the apply
    stage behind x53's duplicated-span detection.

    The frequency table is grouped on the chunk text (partial agg
    collapses repeats map-side); marking is a broadcast-sized join at
    this corpus and stays a key-shuffle semi-join at 100 TB (the
    boilerplate set is tiny relative to the corpus, but never assume —
    no F.broadcast hint, AQE decides). Rebuild sorts each doc's kept
    chunks by index inside an array fold, not a window."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ex = docs.select(
        "doc_id", F.explode(_chunks(F.col("text"))).alias("c")
    ).select("doc_id", F.col("c.cid").alias("cid"), F.col("c.chunk").alias("chunk"))
    boiler = (
        ex.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("chunk")
    )
    marked = ex.join(boiler.withColumn("is_boiler", F.lit(1)), "chunk", "left_outer")
    kept = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("is_boiler").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_boiler").isNull(),
                            F.struct(F.col("cid"), F.col("chunk")),
                        )
                    )
                ),
                lambda s: s.getField("chunk"),
            ),
        ).alias("cleaned_text"),
    )
    return kept


register(
    QuerySpec(
        "x56_boilerplate_strip",
        x56_boilerplate_strip,
        f"""
        WITH chunked AS ({_CHUNKS_SQL}),
        ex AS (SELECT doc_id, unnest(cs, recursive := true) FROM chunked),
        boiler AS (
          SELECT chunk FROM ex GROUP BY chunk
          HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS})
        SELECT e.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN b.chunk IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               COALESCE(string_agg(CASE WHEN b.chunk IS NULL THEN e.chunk END,
                                   ' ' ORDER BY e.cid), '') AS cleaned_text
        FROM ex e LEFT OUTER JOIN boiler b ON b.chunk = e.chunk
        GROUP BY e.doc_id
        """,
        "boilerplate-chunk removal with order-preserving doc rebuild",
    )
)


# --- x57: per-document token entropy -----------------------------------------
def _entropy_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-doc unigram entropy: H = -Σ (c/n) log2 (c/n) over token counts.
    Explode → (doc, token) counts → per-doc decimal sum of ROUND-ed
    terms; n comes from a window over the counts frame, which reuses the
    doc_id hash partitioning the groupBy just produced (no extra
    shuffle)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    counts = (
        docs.select("doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = F.round(-p * F.log2(p), 7)
    return (
        counts.withColumn("n", n)
        .withColumn("term", term)
        .groupBy("doc_id", "lang")
        .agg(
            F.max("n").alias("n_tokens"),
            dec_sum("term", "entropy"),
        )
    )


_ENTROPY_SQL = f"""
  WITH counts AS (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
    FROM documents),
  grouped AS (
    SELECT doc_id, lang, tok, COUNT(*) AS c
    FROM counts GROUP BY doc_id, lang, tok),
  withn AS (
    SELECT doc_id, lang, c,
           SUM(c) OVER (PARTITION BY doc_id) AS n
    FROM grouped),
  terms AS (
    SELECT doc_id, lang, n,
           ROUND(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                 * log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 7) AS term
    FROM withn)
  SELECT doc_id, lang,
         CAST(MAX(n) AS BIGINT) AS n_tokens,
         {SQL_DEC_SUM.format(x='term')} AS entropy
  FROM terms GROUP BY doc_id, lang
"""


def x57_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _entropy_frames(spark, sf_dir).select(
        "doc_id", "n_tokens", "entropy"
    )


register(
    QuerySpec(
        "x57_token_entropy",
        x57_token_entropy,
        f"""
        SELECT doc_id, n_tokens, entropy
        FROM ({_ENTROPY_SQL})
        """,
        "per-document unigram token entropy (quality/perplexity proxy)",
    )
)


# --- x58: CCNet-style per-language quality buckets ---------------------------
N_BUCKETS = 3


def x58_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing: within each language,
    ntile(3) over the entropy score (doc_id tie-break makes membership
    a total order), then per-(lang, bucket) size and score stats. The
    ntile window partitions by lang — bounded fan-in per partition at
    any corpus size, never a global window."""
    scored = _entropy_frames(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.asc("entropy"), F.asc("doc_id"))
    return (
        scored.withColumn("bucket", F.ntile(N_BUCKETS).over(w).cast("long"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("entropy").alias("min_entropy"),
            F.max("entropy").alias("max_entropy"),
            dec_sum("entropy", "sum_entropy"),
        )
    )


register(
    QuerySpec(
        "x58_quality_buckets",
        x58_quality_buckets,
        f"""
        WITH scored AS ({_ENTROPY_SQL}),
        tiled AS (
          SELECT lang, entropy,
                 CAST(ntile({N_BUCKETS}) OVER (PARTITION BY lang
                      ORDER BY entropy ASC, doc_id ASC) AS BIGINT) AS bucket
          FROM scored)
        SELECT lang, bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(entropy) AS min_entropy,
               MAX(entropy) AS max_entropy,
               {SQL_DEC_SUM.format(x='entropy')} AS sum_entropy
        FROM tiled GROUP BY lang, bucket
        """,
        "CCNet-style head/middle/tail quality buckets per language",
    )
)
