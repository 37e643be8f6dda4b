"""Text analysis operators (SURVEY §2.C X4): tokenization, token/char
stats, per-language profiles, quality scoring, language-ID heuristic,
document fingerprinting.

All token math stays JVM-side (split / size / array_distinct / filter
higher-order functions) — no Python UDFs. Counts are ints (exact);
ratios are int/int double divisions (deterministic across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register

def _tokens():
    return F.split(F.col("text"), " ")

# Small English-stopword marker set for the language-ID heuristic.
EN_MARKERS = ("the", "a", "an", "of", "and", "to", "in", "is")


def x04_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(_tokens())).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


register(
    QuerySpec(
        "x04_token_stats",
        x04_token_stats,
        """
        SELECT doc_id, lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_measured
        FROM documents
        """,
        "per-document token/char counts (whitespace tokenizer)",
    )
)


def x05_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens()).cast("long")
    return (
        docs.select("lang", "source", "n_chars", n_tokens.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


register(
    QuerySpec(
        "x05_lang_profile",
        x05_lang_profile,
        """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE) / COUNT(*)
                   AS avg_tokens,
               COUNT(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang
        """,
        "per-language corpus profile (int-exact sums, deterministic ratios)",
    )
)


def x06_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio + length band — the shape of a pretraining quality
    filter (exact-arithmetic stand-in for a model-based scorer)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens()).cast("long")
    n_distinct = F.size(F.array_distinct(_tokens())).cast("long")
    ttr = n_distinct.cast("double") / n_tokens.cast("double")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        ttr.alias("ttr"),
        F.when(n_tokens < 30, "short")
        .when(n_tokens > 80, "long")
        .otherwise("medium")
        .alias("length_band"),
        (ttr >= 0.25).cast("boolean").alias("keep"),
    )


register(
    QuerySpec(
        "x06_quality_score",
        x06_quality_score,
        """
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
          FROM documents)
        SELECT doc_id, n_tokens,
               CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
               CASE WHEN n_tokens < 30 THEN 'short'
                    WHEN n_tokens > 80 THEN 'long'
                    ELSE 'medium' END AS length_band,
               (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)) >= 0.25 AS keep
        FROM t
        """,
        "quality scoring: type-token ratio + length bands + keep flag",
    )
)


def x07_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: fraction of tokens that are
    English marker words; threshold → predicted label."""
    docs = load_table(spark, sf_dir, "documents")
    markers = F.array(*[F.lit(m) for m in EN_MARKERS])
    n_tokens = F.size(_tokens()).cast("long")
    n_hits = F.size(F.filter(_tokens(), lambda t: F.array_contains(markers, t))).cast("long")
    ratio = n_hits.cast("double") / n_tokens.cast("double")
    return docs.select(
        "doc_id",
        "lang",
        n_hits.alias("n_marker_hits"),
        ratio.alias("en_ratio"),
        F.when(ratio >= 0.05, "en").otherwise("other").alias("predicted"),
    )


register(
    QuerySpec(
        "x07_langid",
        x07_langid,
        f"""
        WITH t AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(string_split(text, ' '),
                      x -> list_contains({list(EN_MARKERS)!r}, x))) AS BIGINT) AS n_hits
          FROM documents)
        SELECT doc_id, lang, n_hits AS n_marker_hits,
               CAST(n_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS en_ratio,
               CASE WHEN CAST(n_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.05
                    THEN 'en' ELSE 'other' END AS predicted
        FROM t
        """,
        "stopword-ratio language-ID heuristic",
    )
)


def x03_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 + sha256 of the raw text, plus a cheap
    128-char prefix fingerprint — the exact-dedup keys a 100 TB pipeline
    groups on (hash first, compare bytes only on hash collision)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("md5_fp"),
        F.sha2(F.col("text").cast("binary"), 256).alias("sha256_fp"),
        F.md5(F.substring("text", 1, 128).cast("binary")).alias("prefix_fp"),
    )


register(
    QuerySpec(
        "x03_fingerprint",
        x03_fingerprint,
        """
        SELECT doc_id,
               md5(text) AS md5_fp,
               sha256(text) AS sha256_fp,
               md5(substring(text, 1, 128)) AS prefix_fp
        FROM documents
        """,
        "document fingerprints (md5/sha256/prefix-hash)",
    )
)


BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def x16_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, twice: whitespace tokens and a BPE-ish regex
    tokenizer (letter runs / digit runs / single punctuation — the
    pre-tokenization split most BPE vocabularies start from)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(_tokens()).cast("long")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        (bpe.cast("double") / ws.cast("double")).alias("bpe_per_word"),
    )


register(
    QuerySpec(
        "x16_bpe_token_count",
        x16_bpe_token_count,
        f"""
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS bpe_per_word,
        FROM documents
        """,
        "whitespace vs BPE-ish-regex token counts",
    )
)


ROLL_MOD = 1_000_000_007
ROLL_BASE = 31


def x17_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial (Rabin-Karp-style) rolling fingerprint over the token
    stream: h = ((h*B) + f(token)) mod M, f(token) = 256*len + ascii of
    first char. Pure integer arithmetic — bit-identical everywhere —
    computed in one pass with the fold (aggregate) higher-order function."""
    docs = load_table(spark, sf_dir, "documents")
    feats = F.transform(
        _tokens(),
        lambda t: (F.length(t) * 256 + F.ascii(F.substring(t, 1, 1))).cast("long"),
    )
    rolled = F.aggregate(
        feats,
        F.lit(0).cast("long"),
        lambda h, x: (h * ROLL_BASE + x) % ROLL_MOD,
    )
    return docs.select("doc_id", rolled.alias("roll_fp"))


register(
    QuerySpec(
        "x17_rolling_hash",
        x17_rolling_hash,
        f"""
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ' '),
                     t -> CAST(length(t) * 256 + ascii(substring(t, 1, 1)) AS BIGINT))),
                 (h, x) -> (h * {ROLL_BASE} + x) % {ROLL_MOD}) AS roll_fp
        FROM documents
        """,
        "polynomial rolling-hash document fingerprint (integer-exact fold)",
    )
)


TOP_BIGRAMS_PER_LANG = 5


def x22_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram frequency tables: top word-bigrams per language — the
    vocabulary-analysis pass of a corpus pipeline (explode bigrams →
    count → per-group top-k)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )
    exploded = docs.select("lang", F.explode(bigrams).alias("bigram"))
    counts = exploded.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_BIGRAMS_PER_LANG)
        .select("lang", "bigram", "n", F.col("rank").cast("long").alias("rank"))
    )


register(
    QuerySpec(
        "x22_bigram_freq",
        x22_bigram_freq,
        f"""
        WITH toks AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
        bi AS (
          SELECT lang,
                 unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i+1])) AS bigram
          FROM toks),
        counts AS (SELECT lang, bigram, COUNT(*) AS n FROM bi GROUP BY 1, 2)
        SELECT lang, bigram, n,
               CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY n DESC, bigram ASC) AS BIGINT) AS rank
        FROM counts QUALIFY rank <= {TOP_BIGRAMS_PER_LANG}
        """,
        "top word-bigrams per language (vocabulary analysis)",
    )
)


HIST_BUCKET_CHARS = 100


def x23_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (fixed-width integer buckets) per lang —
    the size-distribution profile used to pick filtering thresholds."""
    docs = load_table(spark, sf_dir, "documents")
    # floor explicitly: Spark's double→long cast truncates toward zero but
    # DuckDB's CAST rounds to nearest — floor() agrees everywhere
    bucket = F.floor(F.col("n_chars") / HIST_BUCKET_CHARS).cast("long")
    return (
        docs.groupBy("lang", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "lang",
            (F.col("bucket") * HIST_BUCKET_CHARS).alias("bucket_lo"),
            "n_docs",
        )
    )


register(
    QuerySpec(
        "x23_length_histogram",
        x23_length_histogram,
        f"""
        SELECT lang,
               CAST(floor(n_chars / {HIST_BUCKET_CHARS}) AS BIGINT)
                   * {HIST_BUCKET_CHARS} AS bucket_lo,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1, 2
        """,
        "per-language document-length histogram",
    )
)


TFIDF_TOP_K = 5


def x24_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: tf(token, doc) × ln(N/df(token)), top-5 tokens per doc.
    ln() differs by ≤1 ulp across libm implementations — scores are
    ROUND(·,6) before ranking (helpers rule 3) and ties break on token."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    n_docs = docs.count()
    posting = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = posting.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        posting.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = tf.join(df_, "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "token", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


register(
    QuerySpec(
        "x24_tfidf",
        x24_tfidf,
        f"""
        WITH docs AS (SELECT * FROM documents WHERE doc_id < 100),
        n AS (SELECT COUNT(*) AS n_docs FROM docs),
        posting AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM docs),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM posting GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS df
               FROM (SELECT DISTINCT doc_id, token FROM posting) GROUP BY 1),
        scored AS (
          SELECT tf.doc_id, tf.token,
                 ROUND(tf.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df.df), 6)
                     AS tfidf
          FROM tf JOIN df ON tf.token = df.token)
        SELECT doc_id, token, tfidf,
               CAST(row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, token ASC) AS BIGINT) AS rank
        FROM scored QUALIFY rank <= {TFIDF_TOP_K}
        """,
        "TF-IDF top tokens per document",
    )
)


SPLIT_BOUNDARIES = (80, 90)  # train < 80 <= val < 90 <= test (md5 % 100)


def x25_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first 4 hex chars
    of md5(doc_id) mod 100. Hash-based (not rand()) so the split is stable
    across runs, engines, partitionings, and re-shards — the property a
    training pipeline needs so examples never migrate between splits."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < SPLIT_BOUNDARIES[0], "train")
        .when(bucket < SPLIT_BOUNDARIES[1], "val")
        .otherwise("test")
    )
    assigned = docs.select("doc_id", "lang", bucket.alias("bucket"), split.alias("split"))
    return assigned.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))


register(
    QuerySpec(
        "x25_dataset_split",
        x25_dataset_split,
        f"""
        WITH a AS (
          SELECT doc_id, lang,
                 CAST(from_hex(substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIT::INT
                      AS BIGINT) % 100 AS bucket
          FROM documents)
        SELECT CASE WHEN bucket < {SPLIT_BOUNDARIES[0]} THEN 'train'
                    WHEN bucket < {SPLIT_BOUNDARIES[1]} THEN 'val'
                    ELSE 'test' END AS split,
               lang, COUNT(*) AS n_docs
        FROM a GROUP BY 1, 2
        """,
        "deterministic md5-bucket train/val/test split, per-language counts",
    )
)


PACK_BUDGET = 2048  # tokens per packed sequence


def x27_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in deterministic doc_id order)
    to fixed-token-budget bins via running token count — the batching step
    before training.

    Scale shape: a naive global-ordered window is a single-partition
    bottleneck, so the prefix sum is two-phase — range-partition by
    doc_id, per-partition running sums, then add each partition's starting
    offset (a tiny per-partition aggregate, broadcast back). Identical
    values to a global window, no global sort."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens()).cast("long")
    parts = docs.repartitionByRange(F.col("doc_id")).select(
        "doc_id", n_tokens.alias("n_tokens"), F.spark_partition_id().alias("pid")
    )
    # phase 1: per-partition running sum (partition-local window, parallel)
    wp = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.withColumn("local_cum", F.sum("n_tokens").over(wp))
    # phase 2: partition offsets = exclusive prefix over per-partition totals
    totals = local.groupBy("pid").agg(F.sum("n_tokens").alias("tot"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("tot").over(wo), F.lit(0)).alias("offset")
    )  # rows = number of partitions: trivially small, broadcast below
    cum = F.col("local_cum") + F.col("offset")
    assigned = local.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_tokens",
        F.floor((cum - 1) / PACK_BUDGET).cast("long").alias("bin_id"),
    )
    return assigned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


register(
    QuerySpec(
        "x27_sequence_packing",
        x27_sequence_packing,
        f"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        a AS (
          SELECT doc_id, n_tokens,
                 CAST(floor((SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                      / {PACK_BUDGET}) AS BIGINT) AS bin_id
          FROM t)
        SELECT bin_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM a GROUP BY bin_id
        """,
        "sequence packing: token-budget bin assignment via running sums",
    )
)


def x43_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup cleanup: strip tags, collapse whitespace, pull URLs, count
    tags — the HTML-to-plain-text pass of a web-crawl pipeline. The markup
    is injected deterministically around the corpus text (like q45's null
    induction) so the regex semantics — not a fixture — are what's
    value-checked across engines. All JVM-side regexp functions, no UDFs.
    (DuckDB's regexp_replace is first-match-only by default; the oracle
    passes the 'g' flag to match Spark's replace-all.)"""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<p class="d'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('">'),
        F.col("text"),
        F.lit(" see https://ex"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".com/a?q="),
        F.col("doc_id").cast("string"),
        F.lit("</p><br/>"),
    )
    dirty = docs.select("doc_id", html.alias("html"))
    stripped = F.trim(
        F.regexp_replace(F.regexp_replace("html", r"<[^>]+>", " "), r"\s+", " ")
    )
    return dirty.select(
        "doc_id",
        stripped.alias("clean_text"),
        F.regexp_extract("html", r"https?://[^\s<]+", 0).alias("url"),
        F.size(F.regexp_extract_all("html", F.lit(r"<[^>]+>"), F.lit(0)))
        .cast("long")
        .alias("n_tags"),
    )


register(
    QuerySpec(
        "x43_text_clean",
        x43_text_clean,
        """
        WITH dirty AS (
          SELECT doc_id,
                 '<p class="d' || CAST(doc_id % 7 AS VARCHAR) || '">' || text ||
                 ' see https://ex' || CAST(doc_id % 5 AS VARCHAR) ||
                 '.com/a?q=' || CAST(doc_id AS VARCHAR) || '</p><br/>' AS html
          FROM documents)
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(html, '<[^>]+>', ' ', 'g'),
                                   '\\s+', ' ', 'g')) AS clean_text,
               regexp_extract(html, 'https?://[^\\s<]+', 0) AS url,
               CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags
        FROM dirty
        """,
        "markup strip + URL extraction + tag counts (web-crawl cleanup pass)",
    )
)


VOCAB_SIZE = 200


def x46_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary build: corpus-wide token counts, keep the top
    VOCAB_SIZE as the vocab with dense ids assigned by (count desc, token)
    — a total order, so ids are reproducible (helpers rule 6) — and fold
    everything else into one OOV row carrying its mass. The id table is
    what a downstream encode step broadcast-joins against.

    Scale shape: explode → hash agg on token (map-side combine: shuffle
    carries one (token, count) per partition), then top-K via
    orderBy+limit — Catalyst plans TakeOrderedAndProject: each partition
    keeps K rows, the driver merges K·p, never a global sort even at
    100M-token cardinality. Ids come from a window over the K-row result
    (tiny by construction); the OOV mass is a broadcast anti-join of the
    counts frame against the vocab."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    ).persist()
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(VOCAB_SIZE)
    w = Window.orderBy(F.desc("n"), F.asc("tok"))  # over the K-row top only
    vocab = top.withColumn("token_id", F.row_number().over(w).cast("long")).select(
        "tok", "token_id", "n"
    )
    oov = (
        counts.join(F.broadcast(vocab.select("tok")), "tok", "left_anti")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n"))
        .select(
            F.lit("<OOV>").alias("tok"),
            F.lit(VOCAB_SIZE + 1).cast("long").alias("token_id"),
            "n",
        )
    )
    out = vocab.unionAll(oov)
    counts.unpersist()
    return out


register(
    QuerySpec(
        "x46_vocab_build",
        x46_vocab_build,
        f"""
        WITH counts AS (
          SELECT tok, COUNT(*) AS n
          FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents)
          WHERE tok != ''
          GROUP BY tok),
        ranked AS (
          SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS token_id
          FROM counts)
        SELECT tok, CAST(token_id AS BIGINT) AS token_id, n
        FROM ranked WHERE token_id <= {VOCAB_SIZE}
        UNION ALL
        SELECT '<OOV>', {VOCAB_SIZE + 1}, CAST(COALESCE(SUM(n), 0) AS BIGINT)
        FROM ranked WHERE token_id > {VOCAB_SIZE}
        """,
        "tokenizer vocab build: top-K tokens with dense ids + OOV mass fold",
    )
)


def x47_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoding against the x46 vocabulary: every token becomes its
    dense id, unknowns become the OOV id — the tokenize step that feeds
    packing (x27). posexplode keeps token order; the vocab joins
    broadcast (it is VOCAB_SIZE rows by construction), so encoding is one
    narrow shuffle-free map over the corpus — the shape that matters when
    the corpus is 100 TB and the vocab is kilobytes."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = x46_vocab_build(spark, sf_dir).filter(F.col("tok") != "<OOV>")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.join(F.broadcast(vocab.select("tok", "token_id")), "tok", "left")
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.coalesce(F.col("token_id"), F.lit(VOCAB_SIZE + 1))
            .cast("long")
            .alias("token_id"),
        )
    )


register(
    QuerySpec(
        "x47_vocab_encode",
        x47_vocab_encode,
        f"""
        WITH counts AS (
          SELECT tok, COUNT(*) AS n
          FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents)
          WHERE tok != ''
          GROUP BY tok),
        vocab AS (
          SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS token_id
          FROM counts
          QUALIFY token_id <= {VOCAB_SIZE}),
        toks AS (
          SELECT doc_id, pos - 1 AS pos, tok FROM (
            SELECT doc_id,
                   unnest(l) AS tok,
                   generate_subscripts(l, 1) AS pos
            FROM (SELECT doc_id,
                         string_split_regex(lower(text), '\\s+') AS l
                  FROM documents))
          WHERE tok != '')
        SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
               CAST(COALESCE(v.token_id, {VOCAB_SIZE + 1}) AS BIGINT) AS token_id
        FROM toks t LEFT JOIN vocab v USING (tok)
        """,
        "dictionary encode: corpus tokens → dense vocab ids with OOV fallback",
    )
)


# --- x113: tokenize → encode → pack, end to end ------------------------------
# The x99-style composition query for the tokenization pipeline: x46's
# vocab encodes the corpus (x47), per-doc token-id streams are digested
# order-sensitively, docs pack into fixed-budget bins (x27's two-phase
# prefix sum — no global window), and each bin's manifest row carries an
# md5 over its docs' digests in doc order. The digest chain makes the
# gate prove BIT-EQUALITY of the entire packed content across engines,
# not just counts. One declarative plan, no materialization between
# stages.


def x113_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    enc = x47_vocab_encode(spark, sf_dir)
    docs = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        # order-sensitive id-stream digest: sort (pos, id) structs, join
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
                    lambda s: s.token_id.cast("string"),
                ),
                ",",
            )
        ).alias("digest"),
    )
    parts = docs.repartitionByRange(F.col("doc_id")).select(
        "doc_id", "n_tokens", "digest", F.spark_partition_id().alias("pid")
    )
    wp = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.withColumn("local_cum", F.sum("n_tokens").over(wp))
    totals = local.groupBy("pid").agg(F.sum("n_tokens").alias("tot"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("tot").over(wo), F.lit(0)).alias("offset")
    )
    assigned = local.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_tokens",
        "digest",
        F.floor((F.col("local_cum") + F.col("offset") - 1) / PACK_BUDGET)
        .cast("long")
        .alias("bin_id"),
    )
    return (
        assigned.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("doc_id", "digest"))),
                        lambda s: s.digest,
                    ),
                    "",
                )
            ).alias("content_md5"),
        )
        .orderBy("bin_id")
    )


# Oracle composes x47's REGISTERED SQL (anti-drift: a vocab retune moves
# both engines); the global-window prefix sum is the oracle-side
# equivalent of the two-phase sum (identical values by construction).
from . import _REGISTRY as _TEXT_REG  # noqa: E402

_X113_SQL = f"""
        WITH enc AS ({_TEXT_REG["x47_vocab_encode"].oracle}),
        docs AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 md5(string_agg(CAST(token_id AS VARCHAR), ','
                     ORDER BY pos)) AS digest
          FROM enc GROUP BY doc_id),
        a AS (
          SELECT doc_id, n_tokens, digest,
                 CAST(floor((SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                      / {PACK_BUDGET}) AS BIGINT) AS bin_id
          FROM docs)
        SELECT bin_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
               md5(string_agg(digest, '' ORDER BY doc_id)) AS content_md5
        FROM a GROUP BY bin_id
        ORDER BY bin_id
        """

register(
    QuerySpec(
        "x113_tokenize_pack",
        x113_tokenize_pack,
        _X113_SQL,
        "end-to-end tokenize/encode/pack with per-bin content digests",
    )
)
