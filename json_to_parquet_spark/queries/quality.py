"""Training-corpus quality & decontamination operators (SURVEY §2.C X4/X2
extensions): benchmark-overlap decontamination, exact duplicated-span
detection, BM25 relevance scoring, and embedding-level semantic dedup.

These are the corpus-hygiene passes an LLM data pipeline runs between raw
ingest and tokenization. All token math is JVM-side (split / transform /
slice higher-order functions, no Python UDFs); doubles follow the
helpers.py determinism rules (int/int divisions, ROUND before any
ordering, decimal sums for aggregated floats).

Scale shapes, per ARCHITECTURE.md §3 conventions:
  * x52: the benchmark shingle set is tiny relative to the corpus —
    broadcast it; the corpus side streams map-side with a per-doc
    partial aggregation. One shuffle on doc_id.
  * x53: one shuffle on the span string (production would pre-hash the
    span to a fixed 8-byte key via xxhash64 to shrink shuffle rows; the
    string key is kept here because it IS the useful output and the
    oracle compares it).
  * x54: corpus scanned once; the 5-number global stats frame (N, avg
    len, per-term document frequencies) is a 1-row broadcast.
  * x55: pairing is restricted to sign-LSH blocks (equi-join on block),
    never all-pairs — same contract as x19, plan-asserted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .similarity import NEAR_DUP_THRESHOLD, _sign_block, cosine

# ---------------------------------------------------------------------------
# shared word-shingle machinery (wider windows than dedup.py's 3-gram)


def _shingles(text_col: Column, width: int, distinct: bool) -> Column:
    """All ``width``-word shingles of a whitespace-tokenized text as an
    array<string>; empty array when the doc is shorter than ``width``
    (Spark's ``sequence`` would otherwise descend and fabricate windows).
    """
    toks = F.split(text_col, " ")
    arr = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (width - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, width)),
    )
    if distinct:
        arr = F.array_distinct(arr)
    return F.when(F.size(toks) >= width, arr).otherwise(
        F.array().cast("array<string>")
    )


def _sql_shingles(width: int, distinct: bool) -> str:
    """DuckDB twin of :func:`_shingles` over a token-list column ``t``
    (``generate_series(1, 0)`` is already empty, so no guard needed)."""
    inner = (
        f"list_transform(generate_series(1, len(t)-{width - 1}), "
        f"i -> array_to_string(list_slice(t, i, i+{width - 1}), ' '))"
    )
    return f"list_distinct({inner})" if distinct else inner


# ---------------------------------------------------------------------------
# x52: benchmark decontamination (n-gram overlap against a holdout set)

CONTAM_W = 5  # shingle width; the classic 13-gram rule scaled to ~25-token docs
BENCH_MOD = 97  # doc_id % 97 == 0 → the held-out "benchmark" set


def x52_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    5-word shingle with a held-out benchmark split (doc_id % 97 == 0).

    The shape GPT-3/PaLM-style pipelines use for eval-set leakage: build
    the benchmark's shingle set once (small — broadcast), stream the
    training corpus against it, and report per-doc overlap counts.
    Documents shorter than the shingle width contribute no shingles and
    drop out identically in both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), CONTAM_W, distinct=True)).alias("sh")
    )
    bench = (
        sh.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("sh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("contam_ratio"),
            (F.col("n_contaminated") > 0).alias("contaminated"),
        )
    )


register(
    QuerySpec(
        "x52_contamination",
        x52_contamination,
        f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (
          SELECT doc_id, unnest({_sql_shingles(CONTAM_W, True)}) AS sh
          FROM toks),
        bench AS (
          SELECT DISTINCT sh FROM sh WHERE doc_id % {BENCH_MOD} = 0),
        train AS (SELECT * FROM sh WHERE doc_id % {BENCH_MOD} != 0)
        SELECT train.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(bench.sh) AS BIGINT) AS n_contaminated,
               CAST(COUNT(bench.sh) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS contam_ratio,
               COUNT(bench.sh) > 0 AS contaminated
        FROM train LEFT JOIN bench USING (sh)
        GROUP BY train.doc_id
        """,
        "benchmark decontamination: 5-gram overlap vs held-out split",
    )
)


# ---------------------------------------------------------------------------
# x53: exact duplicated-span inventory (substring-dedup signal)

SPAN_W = 8


def x53_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection: every 8-word span occurring in two
    or more documents, with document and occurrence counts — the signal
    behind suffix-style exact substring dedup ("memorized boilerplate"),
    at fixed-window granularity so it stays one groupBy.

    Spans are NOT per-doc-deduplicated (n_occ counts repeats within a
    doc too). One shuffle, keyed on the span text; partial aggregation
    collapses repeats map-side before the exchange."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spans = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), SPAN_W, distinct=False)).alias("span")
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


register(
    QuerySpec(
        "x53_dup_spans",
        x53_dup_spans,
        f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        spans AS (
          SELECT doc_id, unnest({_sql_shingles(SPAN_W, False)}) AS span
          FROM toks)
        SELECT span,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM spans GROUP BY span
        HAVING COUNT(DISTINCT doc_id) >= 2
        """,
        "exact duplicated 8-word spans across documents (substring-dedup signal)",
    )
)


# ---------------------------------------------------------------------------
# x54: BM25 relevance scoring for a fixed query

BM25_TERMS = ("spark", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75


def x54_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scoring of the corpus against a fixed 3-term query — the
    lexical-retrieval primitive (quality-weighted data selection, nearest
    lexical neighbors for contamination triage).

    Determinism: tf/df/N are exact ints; avg doc length is a decimal-exact
    sum divided by a count; idf's ``ln`` input is built from exact
    divisions. The only cross-engine risk is ``ln`` itself (not required
    correctly-rounded by IEEE) — absorbed by ROUND(score, 6), eight
    orders coarser than a 1-ulp log wobble, and the per-term score sum is
    a fixed-order (left-associative) 3-addend expression, not an
    aggregation. Verified value-identical vs the oracle at sf0.001/0.01.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")

    def _tf(term: str) -> Column:
        # single-arg lambda: a 2-arg one would be called as (element, index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per_doc = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf_{t}") for t in BM25_TERMS],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score: Column = F.lit(0.0)
    for t in BM25_TERMS:
        tf = F.col(f"tf_{t}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5)
            / (F.col(f"df_{t}") + 0.5)
            + 1.0
        )
        norm = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        score = score + idf * (tf * (BM25_K1 + 1.0)) / norm
    return (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0.0)
    )


def _bm25_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in BM25_TERMS
    )
    terms = " + ".join(
        f"(ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
        f" * (CAST(tf_{t} AS DOUBLE) * ({BM25_K1} + 1.0))"
        f" / (CAST(tf_{t} AS DOUBLE)"
        f"    + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl)))"
        for t in BM25_TERMS
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        per_doc AS (
          SELECT doc_id, len(t) AS dl, {tf_cols}
          FROM toks),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(CAST(SUM(CAST(dl AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
                     / COUNT(*) AS avgdl,
                 {df_cols}
          FROM per_doc)
        SELECT doc_id, ROUND(0.0 + {terms}, 6) AS bm25
        FROM per_doc CROSS JOIN stats
        WHERE ROUND(0.0 + {terms}, 6) > 0.0
        """


register(
    QuerySpec(
        "x54_bm25",
        x54_bm25,
        _bm25_oracle(),
        "BM25 relevance scoring against a fixed query (lexical retrieval)",
    )
)


# ---------------------------------------------------------------------------
# x55: semantic dedup survivors (embedding-level keep-one)


def x55_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup shape): within each sign-LSH block, any
    vector with a near-identical lower-id neighbour (cosine ≥ threshold)
    is dropped; the survivors are the semantically-deduplicated corpus.
    The embedding analogue of x33's text survivors — x19 reports the
    pairs, this reports the kept set.

    Same injected exact copies as x19 (vec_id + 10000) so the op
    demonstrably removes rows. Pairing shuffles on the block key only —
    never all-pairs."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionAll(
        emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    ).select("vec_id", "embedding", _sign_block(F.col("embedding")).alias("block"))
    a, b = corpus.alias("a"), corpus.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            cosine(F.col("a.embedding"), F.col("b.embedding")) >= NEAR_DUP_THRESHOLD
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        corpus.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "block")
    )


_X55_ORACLE = f"""
        WITH corpus AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          UNION ALL
          SELECT vec_id + 10000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        blocked AS (
          SELECT vec_id, v, {{block_sql}} AS block FROM corpus),
        dropped AS (
          SELECT DISTINCT b.vec_id
          FROM blocked a JOIN blocked b
            ON a.block = b.block AND a.vec_id < b.vec_id
          WHERE ROUND(list_dot_product(a.v, b.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(b.v, b.v))), 6)
                >= {NEAR_DUP_THRESHOLD})
        SELECT vec_id, block FROM blocked
        WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        """


def _x55_sql() -> str:
    from .similarity import _SIGN_BLOCK_SQL

    return _X55_ORACLE.format(block_sql=_SIGN_BLOCK_SQL)


register(
    QuerySpec(
        "x55_semantic_dedup",
        x55_semantic_dedup,
        _x55_sql(),
        "semantic dedup survivors: keep-min-id within sign-LSH blocks",
    )
)


# --- x107: per-doc duplicated-ngram coverage ----------------------------------
# The Gopher-style quality signal built on x53's corpus-wide span counts:
# for each document, what fraction of its 8-word span POSITIONS are
# covered by a span that also appears in some OTHER document. High
# coverage = boilerplate/memorized text; the filter threshold is applied
# downstream. Three bounded key shuffles: span-keyed dup-set aggregation,
# span-keyed membership join, doc-keyed rollup — never all-pairs.


def x107_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spans = docs.select(
        "doc_id",
        F.explode(_shingles(F.col("text"), SPAN_W, distinct=False)).alias("span"),
    )
    dup = (
        spans.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("span", F.lit(1).alias("is_dup"))
    )
    counts = (
        spans.join(dup, "span", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_dup"),
        )
    )
    return (
        docs.select("doc_id")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_spans"), F.lit(0).cast("long")).alias("n_spans"),
            F.coalesce(F.col("n_dup"), F.lit(0).cast("long")).alias("n_dup"),
            # guard: docs shorter than the span width have zero spans
            F.when(
                F.coalesce(F.col("n_spans"), F.lit(0).cast("long")) > 0,
                F.round(
                    F.col("n_dup").cast("double") / F.col("n_spans").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


register(
    QuerySpec(
        "x107_dup_ngram_coverage",
        x107_dup_ngram_coverage,
        f"""
        WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        spans AS (
          SELECT doc_id, unnest({_sql_shingles(SPAN_W, False)}) AS span
          FROM tk),
        dup AS (
          SELECT span FROM spans
          GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2),
        counts AS (
          SELECT s.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_spans,
                 CAST(SUM(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_dup
          FROM spans s LEFT JOIN dup d ON s.span = d.span
          GROUP BY s.doc_id)
        SELECT dd.doc_id,
               COALESCE(c.n_spans, 0) AS n_spans,
               COALESCE(c.n_dup, 0) AS n_dup,
               CASE WHEN COALESCE(c.n_spans, 0) > 0
                    THEN ROUND(CAST(c.n_dup AS DOUBLE)
                               / CAST(c.n_spans AS DOUBLE), 6)
                    ELSE 0.0 END AS dup_frac
        FROM documents dd LEFT JOIN counts c ON dd.doc_id = c.doc_id
        ORDER BY dd.doc_id
        """,
        "per-doc fraction of span positions duplicated across documents (Gopher signal)",
    )
)


# --- x182: duplicated-span interval merge ------------------------------------
def x182_dup_span_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge x53's duplicated SPAN_W-word windows into MAXIMAL dup
    regions per document (overlapping/adjacent windows coalesce — the
    interval-union pass an exact-substring dedup needs before it can
    cut: you remove regions, not windows). Output per doc: dup-window
    count, merged-region count, and covered token positions.

    Shapes: the span-keyed dup lookup is x53's aggregation; the merge is
    a classic gaps-and-islands window PARTITIONED BY doc (state bounded
    by one doc's window count). Token positions are 1-based."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    posed = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= SPAN_W,
                F.sequence(F.lit(1), F.size(toks) - (SPAN_W - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
        toks.alias("t"),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.concat_ws(" ", F.slice(F.col("t"), F.col("pos"), SPAN_W)).alias("span"),
    )
    dup = (
        posed.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("span")
    )
    hits = posed.join(dup, "span").select("doc_id", "pos")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.select(
        "doc_id",
        "pos",
        (
            F.col("pos")
            > F.coalesce(
                F.max(F.col("pos") + F.lit(SPAN_W - 1)).over(w_prev), F.lit(-1)
            )
        )
        .cast("long")
        .alias("starts"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    regions = flagged.select(
        "doc_id", "pos", F.sum("starts").over(w_run).alias("region")
    )
    per_region = regions.groupBy("doc_id", "region").agg(
        F.min("pos").alias("r_start"),
        (F.max("pos") + F.lit(SPAN_W - 1)).alias("r_end"),
        F.count(F.lit(1)).alias("n_windows"),
    )
    return (
        per_region.groupBy("doc_id")
        .agg(
            F.sum("n_windows").cast("long").alias("n_dup_windows"),
            F.count(F.lit(1)).alias("n_regions"),
            F.sum(F.col("r_end") - F.col("r_start") + 1)
            .cast("long")
            .alias("covered_tokens"),
        )
        .orderBy("doc_id")
    )


register(
    QuerySpec(
        "x182_dup_span_merge",
        x182_dup_span_merge,
        f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        posed AS (
          SELECT doc_id, CAST(i AS BIGINT) AS pos,
                 array_to_string(t[i:i+{SPAN_W - 1}], ' ') AS span
          FROM toks, LATERAL unnest(generate_series(1, len(t) - {SPAN_W - 1}))
               AS u(i)
          WHERE len(t) >= {SPAN_W}),
        dup AS (
          SELECT span FROM posed
          GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2),
        hits AS (
          SELECT p.doc_id, p.pos FROM posed p JOIN dup USING (span)),
        flagged AS (
          SELECT doc_id, pos,
                 CASE WHEN pos > COALESCE(MAX(pos + {SPAN_W - 1}) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                      THEN 1 ELSE 0 END AS starts
          FROM hits),
        regions AS (
          SELECT doc_id, pos,
                 SUM(starts) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS region
          FROM flagged),
        per_region AS (
          SELECT doc_id, region, MIN(pos) AS r_start,
                 MAX(pos) + {SPAN_W - 1} AS r_end,
                 COUNT(*) AS n_windows
          FROM regions GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(n_windows) AS BIGINT) AS n_dup_windows,
               CAST(COUNT(*) AS BIGINT) AS n_regions,
               CAST(SUM(r_end - r_start + 1) AS BIGINT) AS covered_tokens
        FROM per_region GROUP BY doc_id ORDER BY doc_id
        """,
        "merge duplicated spans into maximal per-doc dup regions",
    )
)
