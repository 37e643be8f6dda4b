"""Round-5 data-curation operators — the model-driven half of corpus
curation that rounds 1-4 did not cover: measuring a tokenizer
(fertility), TRAINING a classifier distributed (naive-Bayes language
ID), model-based data selection (DSIR importance weights), feature
hashing, crawl-side URL canonicalization and domain reputation, context
-length sizing (packing sweep), privacy-budgeted releases (deterministic
DP noise), and span-corruption pretraining examples.

The reference (`/root/reference/`) is a schema-driven NDJSON→Parquet
converter with no text surface; these extend the driver-mandated
LLM-pipeline north star (repo:BASELINE.json, SURVEY §2.C X4) beyond the
statistics/dedup layers of rounds 2-4 into ops whose OUTPUT is a model
artifact or a model-scored selection.

Scale notes (100 TB posture):
- Every operator's corpus-sized work is one token- or doc-keyed
  aggregation with map-side partials; model frames (class-token counts,
  vocab constants, per-language totals) are vocabulary- or
  label-cardinality-sized and broadcast.
- x159/x160 fan each doc-token row out only by the LANGUAGE count
  (5 here; ≤ dozens in production) — never by vocabulary.
- Log-probabilities follow the x83/x134 precedent: ROUND(ln(·), 6) at
  the leaf (1-ulp libm skew is far below 5e-7), then decimal-summed so
  accumulation order cannot matter (helpers rules 1+3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .helpers import SQL_DEC_SUM
from .text import BPE_PATTERN


def _words(docs: DataFrame, *keep: str) -> DataFrame:
    """Whitespace tokens of lowercased text (the x101 tokenization),
    one row per token occurrence, with the requested doc columns."""
    return docs.select(
        *keep, F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")


# SQL twin of _words (a CTE body over `documents`).
_SQL_WORDS = """
          SELECT {keep}, word
          FROM (SELECT {keep}, unnest(string_split(lower(text), ' ')) AS word
                FROM documents)
          WHERE word <> ''"""


# --- x158: tokenizer fertility ------------------------------------------------
def x158_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-pretokenizer tokens per
    whitespace word, and characters per BPE token — the two numbers that
    size a context budget per language (high-fertility languages consume
    disproportionate sequence length). One corpus scan, one
    language-keyed aggregation; every sum is integer (exact), ratios are
    single deterministic double divisions."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    per_doc = docs.select(
        "lang",
        F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w != "")).alias(
            "n_words"
        ),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_PATTERN), 0)).alias(
            "n_bpe"
        ),
        F.length("text").alias("n_chars"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("words"),
        F.sum("n_bpe").cast("long").alias("bpe_tokens"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "words",
        "bpe_tokens",
        F.round(F.col("bpe_tokens").cast("double") / F.col("words"), 6).alias(
            "fertility"
        ),
        F.round(F.col("chars").cast("double") / F.col("bpe_tokens"), 6).alias(
            "chars_per_token"
        ),
    ).orderBy("lang")


register(
    QuerySpec(
        "x158_tokenizer_fertility",
        x158_tokenizer_fertility,
        f"""
        WITH per_doc AS (
          SELECT lang,
                 len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
                     AS n_words,
                 len(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS n_bpe,
                 length(text) AS n_chars
          FROM documents)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS words,
               CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
               ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_words), 6) AS fertility,
               ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe), 6)
                   AS chars_per_token
        FROM per_doc GROUP BY lang ORDER BY lang
        """,
        "tokenizer fertility per language (BPE tokens/word, chars/token)",
    )
)


# --- x159: naive-Bayes language-ID training + confusion ----------------------
NB_ROUND = 6  # leaf rounding for log-probs (helpers rule 3)


def x159_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN a multinomial naive-Bayes language classifier from the
    corpus (token-class counts + Laplace smoothing) and evaluate it on
    the same corpus: confusion matrix (true_lang, pred_lang, n_docs).
    Unlike x07 (a fixed stopword heuristic, confusion-audited by x112),
    the model here is LEARNED — the distributed training shape is the
    point: class-conditional token counts are one (lang, token)-keyed
    aggregation; scoring fans each doc-token row out by the LANGUAGE
    cardinality only (5), never the vocabulary; the argmax is a per-doc
    window.

    Determinism: each leaf log-prob is ROUND(ln(p), 6) (x83 precedent),
    per-doc scores sum those leaves as decimals (order-free), and the
    argmax tiebreak is (score desc, lang asc) — total in both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tok = _words(docs, "doc_id", "lang")

    # Training: class-token counts, class totals, vocabulary size, priors.
    cls = tok.groupBy(F.col("lang").alias("c_lang"), "word").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = cls.groupBy("c_lang").agg(F.sum("cnt").cast("long").alias("tok_l"))
    vocab = tok.agg(F.countDistinct("word").alias("v"))
    priors = docs.groupBy(F.col("lang").alias("c_lang")).agg(
        F.count(F.lit(1)).alias("d_l")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("d"))

    # Per-language constants: smoothing denominator, unseen-token
    # log-prob, log prior. Label-cardinality-sized frame; broadcast.
    lang_const = (
        totals.join(priors, "c_lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "c_lang",
            (F.col("tok_l") + F.col("v")).alias("denom"),
            F.round(F.log(F.lit(1.0) / (F.col("tok_l") + F.col("v"))), NB_ROUND)
            .alias("logp0"),
            F.round(
                F.log(F.col("d_l").cast("double") / F.col("d")), NB_ROUND
            ).alias("ln_prior"),
        )
    )
    # Seen (token, lang) log-probs: vocabulary×labels-sized at worst.
    tok_logp = cls.join(F.broadcast(lang_const.select("c_lang", "denom")), "c_lang")
    tok_logp = tok_logp.select(
        "c_lang",
        "word",
        F.round(
            F.log((F.col("cnt") + 1).cast("double") / F.col("denom")), NB_ROUND
        ).alias("logp"),
    )

    # Scoring: doc term frequencies × each candidate language.
    tf = tok.groupBy("doc_id", F.col("lang").alias("true_lang"), "word").agg(
        F.count(F.lit(1)).alias("tf")
    )
    scored = (
        tf.crossJoin(F.broadcast(lang_const))
        .join(tok_logp, ["c_lang", "word"], "left")
        .select(
            "doc_id",
            "true_lang",
            "c_lang",
            "ln_prior",
            (F.col("tf") * F.coalesce(F.col("logp"), F.col("logp0")))
            .cast("decimal(30,10)")
            .alias("addend"),
        )
    )
    doc_scores = scored.groupBy("doc_id", "true_lang", "c_lang").agg(
        (F.first("ln_prior") + F.sum("addend").cast("double")).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("c_lang"))
    pred = (
        doc_scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "true_lang", F.col("c_lang").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


register(
    QuerySpec(
        "x159_nb_langid",
        x159_nb_langid,
        f"""
        WITH tok AS ({_SQL_WORDS.format(keep="doc_id, lang")}),
        cls AS (
          SELECT lang AS c_lang, word, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM tok GROUP BY 1, 2),
        totals AS (
          SELECT c_lang, CAST(SUM(cnt) AS BIGINT) AS tok_l
          FROM cls GROUP BY 1),
        vocab AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM tok),
        priors AS (
          SELECT lang AS c_lang, CAST(COUNT(*) AS BIGINT) AS d_l
          FROM documents GROUP BY 1),
        n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents),
        lang_const AS (
          SELECT t.c_lang, t.tok_l + v.v AS denom,
                 ROUND(ln(1.0 / (t.tok_l + v.v)), {NB_ROUND}) AS logp0,
                 ROUND(ln(CAST(p.d_l AS DOUBLE) / n.d), {NB_ROUND}) AS ln_prior
          FROM totals t JOIN priors p USING (c_lang)
          CROSS JOIN vocab v CROSS JOIN n_docs n),
        tok_logp AS (
          SELECT c.c_lang, c.word,
                 ROUND(ln(CAST(c.cnt + 1 AS DOUBLE) / l.denom), {NB_ROUND})
                     AS logp
          FROM cls c JOIN lang_const l USING (c_lang)),
        tf AS (
          SELECT doc_id, lang AS true_lang, word,
                 CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok GROUP BY 1, 2, 3),
        scored AS (
          SELECT tf.doc_id, tf.true_lang, lc.c_lang, lc.ln_prior,
                 CAST(tf.tf * COALESCE(tl.logp, lc.logp0)
                      AS DECIMAL(30,10)) AS addend
          FROM tf CROSS JOIN lang_const lc
          LEFT JOIN tok_logp tl
            ON tl.c_lang = lc.c_lang AND tl.word = tf.word),
        doc_scores AS (
          SELECT doc_id, true_lang, c_lang,
                 ANY_VALUE(ln_prior)
                   + CAST(CAST(SUM(addend) AS VARCHAR) AS DOUBLE) AS score
          FROM scored GROUP BY 1, 2, 3),
        pred AS (
          SELECT doc_id, true_lang, c_lang AS pred_lang
          FROM doc_scores
          QUALIFY row_number() OVER (
              PARTITION BY doc_id ORDER BY score DESC, c_lang ASC) = 1)
        SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY 1, 2 ORDER BY true_lang, pred_lang
        """,
        "train multinomial naive-Bayes language ID; confusion matrix on corpus",
    )
)


# --- x160: DSIR importance-weighted data selection ---------------------------
DSIR_TOP_K = 20


def x160_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023):
    score every NON-target document by the log-likelihood ratio of its
    unigrams under a target-domain LM (here: the English subcorpus)
    versus the full-corpus LM, and select the top-K by mean per-token
    ratio — 'which de/fr/es/zh documents look most like the target
    distribution'. Shapes: two (token)-keyed count aggregations build
    the two LMs (vocabulary-sized, broadcast); scoring is one pass over
    doc term frequencies; selection is a TakeOrdered top-K, no global
    sort."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tok = _words(docs, "doc_id", "lang")

    corpus_cnt = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c_cnt"))
    target_cnt = (
        tok.filter(F.col("lang") == "en")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
    )
    consts = corpus_cnt.agg(
        F.sum("c_cnt").cast("long").alias("c_tot"),
        F.count(F.lit(1)).alias("v"),
    ).crossJoin(
        F.broadcast(target_cnt.agg(F.sum("t_cnt").cast("long").alias("t_tot")))
    )
    # Per-word importance ratio over the corpus vocabulary (target counts
    # left-joined: unseen-in-target words get the smoothed floor).
    lam = (
        corpus_cnt.join(target_cnt, "word", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "word",
            F.round(
                F.log(
                    (F.coalesce(F.col("t_cnt"), F.lit(0)) + 1).cast("double")
                    / (F.col("t_tot") + F.col("v"))
                )
                - F.log(
                    (F.col("c_cnt") + 1).cast("double")
                    / (F.col("c_tot") + F.col("v"))
                ),
                NB_ROUND,
            ).alias("lam"),
        )
    )
    tf = (
        tok.filter(F.col("lang") != "en")
        .groupBy("doc_id", "lang", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    weights = (
        tf.join(lam, "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum((F.col("tf") * F.col("lam")).cast("decimal(30,10)"))
            .cast("double")
            .alias("llr"),
            F.sum("tf").cast("long").alias("n_tok"),
        )
        .select(
            "doc_id",
            "lang",
            F.round(F.col("llr") / F.col("n_tok"), NB_ROUND).alias("weight"),
        )
    )
    top = weights.orderBy(F.desc("weight"), F.asc("doc_id")).limit(DSIR_TOP_K)
    w = Window.orderBy(F.desc("weight"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "lang",
        "weight",
    )


register(
    QuerySpec(
        "x160_dsir_select",
        x160_dsir_select,
        f"""
        WITH tok AS ({_SQL_WORDS.format(keep="doc_id, lang")}),
        corpus_cnt AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS c_cnt
          FROM tok GROUP BY 1),
        target_cnt AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS t_cnt
          FROM tok WHERE lang = 'en' GROUP BY 1),
        consts AS (
          SELECT (SELECT CAST(SUM(c_cnt) AS BIGINT) FROM corpus_cnt) AS c_tot,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus_cnt) AS v,
                 (SELECT CAST(SUM(t_cnt) AS BIGINT) FROM target_cnt) AS t_tot),
        lam AS (
          SELECT c.word,
                 ROUND(ln(CAST(COALESCE(t.t_cnt, 0) + 1 AS DOUBLE)
                          / (k.t_tot + k.v))
                       - ln(CAST(c.c_cnt + 1 AS DOUBLE) / (k.c_tot + k.v)),
                       {NB_ROUND}) AS lam
          FROM corpus_cnt c LEFT JOIN target_cnt t USING (word)
          CROSS JOIN consts k),
        tf AS (
          SELECT doc_id, lang, word, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok WHERE lang <> 'en' GROUP BY 1, 2, 3),
        weights AS (
          SELECT tf.doc_id, tf.lang,
                 ROUND({SQL_DEC_SUM.format(x="tf.tf * lam.lam")}
                       / CAST(SUM(tf.tf) AS BIGINT), {NB_ROUND}) AS weight
          FROM tf JOIN lam USING (word)
          GROUP BY 1, 2)
        SELECT CAST(row_number() OVER (ORDER BY weight DESC, doc_id ASC)
                    AS BIGINT) AS rank,
               doc_id, lang, weight
        FROM weights
        ORDER BY weight DESC, doc_id ASC
        LIMIT {DSIR_TOP_K}
        """,
        "DSIR importance-weighted selection of target-like documents",
    )
)


# --- x161: hashing-trick feature vectors -------------------------------------
from .dedup import ARITH_P, _charfold  # noqa: E402  (shared hash family)

HASH_DIM = 32


def x161_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the 'hashing trick', Weinberger et al. 2009):
    project each document's unigram counts into a fixed HASH_DIM-dim
    signed feature vector — dim = h(word) mod D, sign = parity of the
    next hash bit — the input representation of fastText-style linear
    classifiers. No vocabulary table exists at all: the op is ONE
    doc+dim-keyed integer aggregation, so it runs identically at any
    vocabulary size — the whole point of the trick at 100 TB. Output is
    integer-exact: (doc_id, nnz, l1, features CSV 'dim:val' sorted)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = _words(docs, "doc_id")
    feat = (
        tok.withColumn("fp", _charfold(F.col("word")))
        .select(
            "doc_id",
            (F.col("fp") % HASH_DIM).alias("dim"),
            F.expr(f"CASE WHEN (fp DIV {HASH_DIM}) % 2 = 0 THEN 1 ELSE -1 END")
            .cast("long")
            .alias("sgn"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("sgn").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )
    return (
        feat.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nnz"),
            F.sum(F.abs("val")).cast("long").alias("l1"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "val"))),
                    lambda s: F.concat_ws(":", s.dim, s.val),
                ),
                ",",
            ).alias("features"),
        )
        .orderBy("doc_id")
    )


register(
    QuerySpec(
        "x161_hash_features",
        x161_hash_features,
        f"""
        WITH tok AS ({_SQL_WORDS.format(keep="doc_id")}),
        fp AS (
          SELECT doc_id,
                 list_reduce(list_transform(string_split(word, ''),
                                            c -> CAST(ascii(c) AS BIGINT)),
                             (a, b) -> (a*31 + b) % {ARITH_P}) AS fp
          FROM tok),
        feat AS (
          SELECT doc_id, fp % {HASH_DIM} AS dim,
                 CAST(SUM(CASE WHEN (fp // {HASH_DIM}) % 2 = 0
                               THEN 1 ELSE -1 END) AS BIGINT) AS val
          FROM fp GROUP BY 1, 2
          HAVING SUM(CASE WHEN (fp // {HASH_DIM}) % 2 = 0
                          THEN 1 ELSE -1 END) <> 0)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nnz,
               CAST(SUM(abs(val)) AS BIGINT) AS l1,
               string_agg(dim || ':' || val, ',' ORDER BY dim) AS features
        FROM feat GROUP BY doc_id ORDER BY doc_id
        """,
        "hashing-trick signed feature vectors (fastText input shape)",
    )
)


# --- x162/x163: URL canonicalization + domain reputation ---------------------
# Deterministic synthetic URL per document (placeholder domains, the x43
# convention): mixed case, www/no-www, query strings, fragments, and
# trailing slashes so each canonicalization rung collapses something.
_URL_DOMAINS = [
    "Docs.Example.ORG",
    "docs.example.org",
    "WWW.Example.com",
    "example.com",
    "media.example.net",
]


def _synth_url() -> F.Column:
    dom = F.element_at(
        F.array(*[F.lit(d) for d in _URL_DOMAINS]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    return F.concat(
        F.lit("https://"),
        dom,
        F.lit("/P/"),
        (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("?utm=1&id="), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("#Frag")).otherwise(F.lit("")),
    )


_SQL_URL = """
          'https://' ||
          (['Docs.Example.ORG', 'docs.example.org', 'WWW.Example.com',
            'example.com', 'media.example.net'])[(doc_id % 5) + 1] ||
          '/P/' || CAST(doc_id % 7 AS VARCHAR) ||
          CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
          CASE WHEN doc_id % 2 = 0
               THEN '?utm=1&id=' || CAST(doc_id AS VARCHAR) ELSE '' END ||
          CASE WHEN doc_id % 4 = 0 THEN '#Frag' ELSE '' END"""


def x162_url_canon_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL canonicalization ladder: distinct-URL counts at
    five strictness rungs (raw → lowercase → strip fragment → strip
    query → strip www + trailing slash) — the x89 normalization-ladder
    audit applied to the URL key a crawler dedups on. Each rung is a
    row-local rewrite; the only shuffle is the per-rung distinct count
    (level-keyed, 5 groups)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    u0 = _synth_url()
    u1 = F.lower(u0)
    u2 = F.regexp_replace(u1, "#.*$", "")
    u3 = F.regexp_replace(u2, r"\?.*$", "")
    u4 = F.regexp_replace(
        F.regexp_replace(u3, r"://www\.", "://"), "/$", ""
    )
    levels = F.array(
        *[
            F.struct(F.lit(i).cast("long").alias("level"), u.alias("u"))
            for i, u in enumerate([u0, u1, u2, u3, u4])
        ]
    )
    return (
        docs.select(F.explode(levels).alias("lv"))
        .select("lv.level", "lv.u")
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("u").cast("long").alias("n_distinct"),
        )
        .select(
            "level",
            "n_urls",
            "n_distinct",
            F.round(
                F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_urls"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("level")
    )


register(
    QuerySpec(
        "x162_url_canon_dedup",
        x162_url_canon_dedup,
        f"""
        WITH u AS (
          SELECT doc_id, {_SQL_URL} AS u0 FROM documents),
        canon AS (
          SELECT doc_id, u0,
                 lower(u0) AS u1,
                 regexp_replace(lower(u0), '#.*$', '') AS u2,
                 regexp_replace(regexp_replace(lower(u0), '#.*$', ''),
                                '\\?.*$', '') AS u3,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(regexp_replace(lower(u0), '#.*$', ''),
                                    '\\?.*$', ''),
                     '://www\\.', '://'),
                   '/$', '') AS u4
          FROM u),
        lv AS (
          SELECT CAST(0 AS BIGINT) AS level, u0 AS u FROM canon
          UNION ALL SELECT 1, u1 FROM canon
          UNION ALL SELECT 2, u2 FROM canon
          UNION ALL SELECT 3, u3 FROM canon
          UNION ALL SELECT 4, u4 FROM canon)
        SELECT level, CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT u) AS BIGINT) AS n_distinct,
               ROUND(1.0 - CAST(COUNT(DISTINCT u) AS DOUBLE) / COUNT(*), 6)
                   AS dup_rate
        FROM lv GROUP BY level ORDER BY level
        """,
        "URL canonicalization ladder: distinct counts per strictness rung",
    )
)


def x163_domain_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl reputation table: for each (canonicalized) URL
    domain — doc volume, source spread, exact-text duplication share,
    and mean document length. The aggregation a crawler's blocklist /
    recrawl scheduler reads. One domain-keyed aggregation; the text-dup
    signal reuses the x01 fingerprint (md5) so no raw text shuffles."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    domain = F.regexp_extract(
        F.lower(_synth_url()), r"://(?:www\.)?([^/#?]+)", 1
    )
    return (
        docs.select(
            domain.alias("domain"),
            "source",
            F.md5("text").alias("fp"),
            "n_chars",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.countDistinct("fp").cast("long").alias("n_unique_texts"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .select(
            "domain",
            "n_docs",
            "n_sources",
            F.round(
                F.lit(1.0)
                - F.col("n_unique_texts").cast("double") / F.col("n_docs"),
                6,
            ).alias("dup_share"),
            F.round(F.col("chars").cast("double") / F.col("n_docs"), 6).alias(
                "avg_chars"
            ),
        )
        .orderBy("domain")
    )


register(
    QuerySpec(
        "x163_domain_reputation",
        x163_domain_reputation,
        f"""
        WITH u AS (
          SELECT doc_id, text, source, n_chars,
                 regexp_extract(lower({_SQL_URL}),
                                '://(?:www\\.)?([^/#?]+)', 1) AS domain
          FROM documents)
        SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE)
                           / COUNT(*), 6) AS dup_share,
               ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
        FROM u GROUP BY domain ORDER BY domain
        """,
        "per-domain crawl reputation: volume, spread, dup share, mean length",
    )
)


# --- x164: context-length packing sweep --------------------------------------
PACK_LENS = (64, 128, 256, 512)


def x164_packing_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste sweep over candidate context lengths: for each
    max_len, chunk every document into ceil(n/L) sequences and measure
    total padded tokens vs real tokens — the number that picks a
    training context length. (x27 packs greedily into bins; this is the
    simpler per-doc chunking model a sweep can afford.) Integer-exact
    until the final percentage; the fan-out is ×|PACK_LENS|, then one
    L-keyed aggregation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w != ""))
    lens = F.array(*[F.lit(length).cast("long") for length in PACK_LENS])
    per = docs.select(n.cast("long").alias("n"), F.explode(lens).alias("max_len"))
    chunks = F.expr("(n + max_len - 1) DIV max_len")
    return (
        per.select("max_len", "n", chunks.cast("long").alias("chunks"))
        .groupBy("max_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("tokens"),
            F.sum("chunks").cast("long").alias("n_chunks"),
            F.sum(F.col("chunks") * F.col("max_len")).cast("long").alias("padded"),
        )
        .select(
            "max_len",
            "n_docs",
            "tokens",
            "n_chunks",
            "padded",
            F.round(
                (F.col("padded") - F.col("tokens")).cast("double")
                / F.col("padded")
                * 100,
                6,
            ).alias("waste_pct"),
        )
        .orderBy("max_len")
    )


register(
    QuerySpec(
        "x164_packing_sweep",
        x164_packing_sweep,
        f"""
        WITH per AS (
          SELECT CAST(len(list_filter(string_split(lower(text), ' '),
                                      w -> w <> '')) AS BIGINT) AS n,
                 CAST(unnest([{", ".join(str(pl) for pl in PACK_LENS)}])
                      AS BIGINT) AS max_len
          FROM documents),
        c AS (
          SELECT max_len, n, (n + max_len - 1) // max_len AS chunks FROM per)
        SELECT max_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS tokens,
               CAST(SUM(chunks) AS BIGINT) AS n_chunks,
               CAST(SUM(chunks * max_len) AS BIGINT) AS padded,
               ROUND(CAST(SUM(chunks * max_len) - SUM(n) AS DOUBLE)
                     / SUM(chunks * max_len) * 100, 6) AS waste_pct
        FROM c GROUP BY max_len ORDER BY max_len
        """,
        "padding-waste sweep over candidate training context lengths",
    )
)


# --- x165: differentially-private release with deterministic noise -----------
DP_EPS = 1.0  # Laplace scale b = sensitivity/eps = 1.0 (count queries)
_DP_A, _DP_B = 48_271, 11_213  # affine mix into the shared prime field


def x165_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-budget accounting for a per-language count release: each
    group's true count plus Laplace(1/ε) noise, the noise drawn by
    INVERSE-CDF from a hash-derived uniform (the x83 derandomization:
    u = (affine-mixed charfold of the group key)/P) — so the 'random'
    release is reproducible across engines and runs, which is what makes
    a privacy pipeline auditable/differential-testable at all. Columns
    carry the accounting: sensitivity, epsilon, noise, noisy count.
    One label-cardinality aggregation; noise math is row-local."""
    docs = load_table(spark, sf_dir, "documents").select("lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    h = (F.lit(_DP_A) * _charfold(F.col("lang")) + F.lit(_DP_B)) % F.lit(ARITH_P)
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(ARITH_P + 1))
    mag = F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))
    sgn = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = F.round(-sgn * F.log(mag) / F.lit(DP_EPS), 6)
    return (
        counts.select(
            "lang",
            "n_true",
            F.lit(1).cast("long").alias("sensitivity"),
            F.lit(DP_EPS).alias("epsilon"),
            noise.alias("noise"),
            F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "x165_dp_release",
        x165_dp_release,
        f"""
        WITH counts AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_true
          FROM documents GROUP BY lang),
        keyed AS (
          SELECT lang, n_true,
                 (CAST(({_DP_A} * list_reduce(
                      list_transform(string_split(lang, ''),
                                     c -> CAST(ascii(c) AS BIGINT)),
                      (a, b) -> (a*31 + b) % {ARITH_P})
                    + {_DP_B}) % {ARITH_P} AS DOUBLE) + 1.0)
                 / {float(ARITH_P + 1)} AS u
          FROM counts),
        noised AS (
          SELECT lang, n_true,
                 ROUND(-(CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
                       * ln(1.0 - 2.0 * abs(u - 0.5)) / {DP_EPS}, 6) AS noise
          FROM keyed)
        SELECT lang, n_true, CAST(1 AS BIGINT) AS sensitivity,
               CAST({DP_EPS} AS DOUBLE) AS epsilon, noise,
               ROUND(n_true + noise, 6) AS n_noisy
        FROM noised ORDER BY lang
        """,
        "per-language DP count release with deterministic Laplace noise",
    )
)


# --- x166: span-corruption pretraining examples ------------------------------
SPAN_COUNT = 3
SPAN_LEN = 3
_SC_A, _SC_B = 69_621, 40_289


def x166_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption example manifest: per document, SPAN_COUNT
    deterministic mask spans of SPAN_LEN tokens (starts hash-derived from
    (doc_id, k), overlaps merged), with the masked-token digest that lets
    a downstream trainer verify its (inputs, targets) split byte-exactly.
    Everything is row-local array math over the token list — zero
    shuffles beyond the final orderBy; at 100 TB this is a pure map
    stage."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    base = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id", "toks", F.size("toks").cast("long").alias("n")
    ).filter(F.col("n") >= F.lit(SPAN_LEN))
    starts = F.transform(
        F.sequence(F.lit(0), F.lit(SPAN_COUNT - 1)),
        lambda k: (
            (F.lit(_SC_A) * (F.col("doc_id") * SPAN_COUNT + k) + F.lit(_SC_B))
            % F.lit(ARITH_P)
        )
        % (F.col("n") - F.lit(SPAN_LEN - 1)),
    )
    positions = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform(starts, lambda s: F.sequence(s, s + F.lit(SPAN_LEN - 1)))
            )
        )
    )
    masked = F.transform(positions, lambda i: F.element_at("toks", (i + 1).cast("int")))
    return base.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.size(positions).cast("long").alias("n_masked"),
        F.round(F.size(positions).cast("double") / F.col("n"), 6).alias(
            "corruption_rate"
        ),
        F.md5(F.array_join(masked, " ")).alias("masked_digest"),
    ).orderBy("doc_id")


register(
    QuerySpec(
        "x166_span_corruption",
        x166_span_corruption,
        f"""
        WITH base AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), w -> w <> '')
                     AS toks
          FROM documents),
        sized AS (
          SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
          FROM base WHERE len(toks) >= {SPAN_LEN}),
        spans AS (
          SELECT doc_id, toks, n,
                 list_sort(list_distinct(flatten(
                   [generate_series(s, s + {SPAN_LEN - 1})
                    FOR s IN [(({_SC_A} * (doc_id * {SPAN_COUNT} + k)
                                + {_SC_B}) % {ARITH_P})
                              % (n - {SPAN_LEN - 1})
                              FOR k IN generate_series(0, {SPAN_COUNT - 1})]]
                 ))) AS positions
          FROM sized)
        SELECT doc_id, n AS n_tokens,
               CAST(len(positions) AS BIGINT) AS n_masked,
               ROUND(CAST(len(positions) AS DOUBLE) / n, 6) AS corruption_rate,
               md5(array_to_string([toks[CAST(i + 1 AS BIGINT)]
                                    FOR i IN positions], ' ')) AS masked_digest
        FROM spans ORDER BY doc_id
        """,
        "T5 span-corruption mask manifest with masked-token digests",
    )
)


# --- x173: readability scoring -----------------------------------------------
def x173_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language readability profile: mean words/sentence,
    syllables/word (vowel-group proxy), and Flesch reading-ease — the
    classic text-difficulty gate a curriculum or quality filter sorts
    on. All per-doc signals are row-local regex/array math, rounded at
    the leaf (helpers rule 3) then decimal-summed; one language-keyed
    aggregation."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    w = F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != ""))
    s = F.greatest(
        F.size(F.filter(F.split(F.col("text"), r"\."), lambda x: F.trim(x) != "")),
        F.lit(1),
    )
    syll = F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0))
    wps = F.round(w.cast("double") / s, 6)
    spw = F.round(syll.cast("double") / w, 6)
    flesch = F.round(
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
    )
    per_doc = docs.select(
        "lang", wps.alias("wps"), spw.alias("spw"), flesch.alias("flesch")
    )
    n = F.count(F.lit(1))
    return (
        per_doc.groupBy("lang")
        .agg(
            n.alias("n_docs"),
            F.round(
                F.sum(F.col("wps").cast("decimal(30,10)")).cast("double") / n, 6
            ).alias("avg_words_per_sentence"),
            F.round(
                F.sum(F.col("spw").cast("decimal(30,10)")).cast("double") / n, 6
            ).alias("avg_syllables_per_word"),
            F.round(
                F.sum(F.col("flesch").cast("decimal(30,10)")).cast("double") / n, 6
            ).alias("avg_flesch"),
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "x173_readability",
        x173_readability,
        f"""
        WITH per_doc AS (
          SELECT lang,
                 ROUND(CAST(len(list_filter(string_split(lower(text), ' '),
                                            x -> x <> '')) AS DOUBLE)
                       / greatest(len(list_filter(string_split(text, '.'),
                                                  x -> trim(x) <> '')), 1),
                       6) AS wps,
                 ROUND(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                            AS DOUBLE)
                       / len(list_filter(string_split(lower(text), ' '),
                                         x -> x <> '')), 6) AS spw
          FROM documents),
        scored AS (
          SELECT lang, wps, spw,
                 ROUND(206.835 - 1.015 * wps - 84.6 * spw, 6) AS flesch
          FROM per_doc)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND({SQL_DEC_SUM.format(x="wps")} / COUNT(*), 6)
                   AS avg_words_per_sentence,
               ROUND({SQL_DEC_SUM.format(x="spw")} / COUNT(*), 6)
                   AS avg_syllables_per_word,
               ROUND({SQL_DEC_SUM.format(x="flesch")} / COUNT(*), 6)
                   AS avg_flesch
        FROM scored GROUP BY lang ORDER BY lang
        """,
        "per-language readability: words/sentence, syllables/word, Flesch",
    )
)


# --- x174: code-vs-prose detection -------------------------------------------
CODE_TAU = 0.01  # symbol-density threshold; shared with the oracle
_CODE_SNIPPET = " if (x == 1) { return foo(x); }"


def x174_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbol-density code detector over a mixed corpus: every fourth
    document gets a deterministic code snippet appended (the x43
    fixture-augmentation convention — the raw corpus is pure prose, so
    the detector needs something to detect), then docs whose
    code-symbol density crosses CODE_TAU are flagged and the per-source
    code share reported — the curation signal that routes code-ish
    content to a different pipeline. Row-local regex; one source-keyed
    aggregation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    aug = F.when(
        F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(_CODE_SNIPPET))
    ).otherwise(F.col("text"))
    n_sym = F.size(F.regexp_extract_all(aug, F.lit("[{}();=<>]"), 0))
    ratio = F.round(n_sym.cast("double") / F.length(aug), 6)
    flagged = docs.select(
        "source", (ratio >= F.lit(CODE_TAU)).cast("long").alias("is_code")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_code").cast("long").alias("n_code"),
        )
        .select(
            "source",
            "n_docs",
            "n_code",
            F.round(F.col("n_code").cast("double") / F.col("n_docs"), 6).alias(
                "code_share"
            ),
        )
        .orderBy("source")
    )


register(
    QuerySpec(
        "x174_code_detect",
        x174_code_detect,
        f"""
        WITH aug AS (
          SELECT source,
                 CASE WHEN doc_id % 4 = 0 THEN text || '{_CODE_SNIPPET}'
                      ELSE text END AS t
          FROM documents),
        flagged AS (
          SELECT source,
                 CASE WHEN ROUND(CAST(len(regexp_extract_all(t, '[{{}}();=<>]'))
                                      AS DOUBLE) / length(t), 6)
                           >= {CODE_TAU}
                      THEN 1 ELSE 0 END AS is_code
          FROM aug)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(is_code) AS BIGINT) AS n_code,
               ROUND(CAST(SUM(is_code) AS DOUBLE) / COUNT(*), 6) AS code_share
        FROM flagged GROUP BY source ORDER BY source
        """,
        "symbol-density code-vs-prose detection, per-source code share",
    )
)


# --- x175: stratified k-fold assignment --------------------------------------
KFOLD_K = 5
_KF_A, _KF_B = 16_807, 32_771


def x175_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment with per-language balance audit:
    fold = affine-hash(doc_id) mod K, and each (fold, lang) cell reports
    its deviation from the perfectly-stratified expectation — the table
    a cross-validation harness checks before trusting fold metrics.
    One corpus aggregation + a label-cardinality broadcast."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    fold = (
        (F.lit(_KF_A) * F.col("doc_id") + F.lit(_KF_B)) % F.lit(ARITH_P)
    ) % F.lit(KFOLD_K)
    cells = (
        docs.select(fold.cast("long").alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    lang_tot = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_total"))
    exp = F.col("lang_total").cast("double") / F.lit(KFOLD_K)
    return (
        cells.join(F.broadcast(lang_tot), "lang")
        .select(
            "fold",
            "lang",
            "n_docs",
            F.round((F.col("n_docs") - exp) / exp * 100, 6).alias("dev_pct"),
        )
        .orderBy("fold", "lang")
    )


register(
    QuerySpec(
        "x175_stratified_kfold",
        x175_stratified_kfold,
        f"""
        WITH cells AS (
          SELECT (({_KF_A} * doc_id + {_KF_B}) % {ARITH_P}) % {KFOLD_K} AS fold,
                 lang, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1, 2),
        tot AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS lang_total
          FROM documents GROUP BY lang)
        SELECT c.fold, c.lang, c.n_docs,
               ROUND((c.n_docs - CAST(t.lang_total AS DOUBLE) / {KFOLD_K})
                     / (CAST(t.lang_total AS DOUBLE) / {KFOLD_K}) * 100, 6)
                   AS dev_pct
        FROM cells c JOIN tot t USING (lang)
        ORDER BY fold, lang
        """,
        "deterministic stratified k-fold assignment with balance audit",
    )
)


# --- x178: RAG chunker coverage audit ----------------------------------------
def x178_chunk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage/redundancy audit of the x61 sliding-window chunker: per
    document, the chunk count, total chunk tokens, and the redundancy
    factor (chunk tokens / doc tokens — the storage multiplier overlap
    costs a RAG index). COMPOSES the registered x61 operator (anti-
    drift: the audit can't diverge from the chunker it audits); the
    rollup is one doc-keyed aggregation."""
    from .corpus import x61_chunk_sliding

    chunks = x61_chunk_sliding(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("doc_tokens")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("chunk_tokens"),
    )
    return (
        per_doc.join(docs, "doc_id")
        .select(
            "doc_id",
            "doc_tokens",
            "n_chunks",
            "chunk_tokens",
            F.round(
                F.col("chunk_tokens").cast("double") / F.col("doc_tokens"), 6
            ).alias("redundancy"),
        )
        .orderBy("doc_id")
    )


def _x178_sql() -> str:
    """Oracle composes x61's registered SQL verbatim (anti-drift)."""
    from . import _REGISTRY

    x61 = _REGISTRY["x61_chunk_sliding"].oracle
    return f"""
        WITH chunks AS ({x61}),
        per_doc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                 CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
          FROM chunks GROUP BY doc_id),
        d AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS doc_tokens
          FROM documents)
        SELECT p.doc_id, d.doc_tokens, p.n_chunks, p.chunk_tokens,
               ROUND(CAST(p.chunk_tokens AS DOUBLE) / d.doc_tokens, 6)
                   AS redundancy
        FROM per_doc p JOIN d USING (doc_id)
        ORDER BY p.doc_id
        """


# x179's oracle needs x61 registered first; corpus is imported by
# registry() before curation only alphabetically — import explicitly.
from . import corpus as _corpus  # noqa: E402,F401

register(
    QuerySpec(
        "x178_chunk_coverage",
        x178_chunk_coverage,
        _x178_sql(),
        "chunker coverage/redundancy audit composing the registered x61",
    )
)


# --- x183: skip-gram pairs with deterministic negative sampling --------------
SG_VOCAB = 40  # skip-gram vocabulary (top-V corpus tokens)
SG_WINDOW = 2  # context window ±SG_WINDOW
SG_NEG = 2  # negatives per positive pair
SG_TOP = 20  # emitted rows: the top pairs by frequency
_SG_A, _SG_B = 22_695_477, 7_919


def x183_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2vec-style training-pair construction: (center, context)
    positives from a ±SG_WINDOW token window over the corpus, restricted
    to the top-SG_VOCAB vocabulary, each paired with SG_NEG
    deterministically hash-sampled negative words (uniform over the
    vocabulary — the derandomized stand-in for unigram^0.75 sampling;
    the x83 derandomization argument). Output: the SG_TOP most frequent
    pairs with their sampled negatives — the verifiable head of the
    training-pair stream.

    Shapes: pair extraction is row-local list math; one pair-keyed count
    aggregation over the bounded vocab (≤V² keys); the vocab index joins
    are broadcasts. At 100 TB the pair stream is written, not
    aggregated — the aggregation here is what makes the head oracle-
    checkable."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    # token array materialized as a column before element_at-indexing —
    # an inline filter(split(...)) re-evaluates per element inside the
    # transform lambda, O(n²) per row (the x179 lesson)
    t = F.col("t")
    toked = docs.select(
        F.filter(F.split(F.lower("text"), " "), lambda w: w != "").alias("t")
    )
    vocab_w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    vocab = (
        _words(docs)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(SG_VOCAB)
        .select(
            "word", (F.row_number().over(vocab_w) - 1).cast("long").alias("idx")
        )
    )
    offs = [d for d in range(-SG_WINDOW, SG_WINDOW + 1) if d != 0]
    pairs = toked.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size(t)),
                    lambda i: F.filter(
                        F.array(
                            *[
                                F.struct(
                                    F.element_at(t, i).alias("center"),
                                    F.when(
                                        (i + F.lit(d) >= 1)
                                        & (i + F.lit(d) <= F.size(t)),
                                        F.element_at(t, (i + F.lit(d)).cast("int")),
                                    ).alias("ctx"),
                                )
                                for d in offs
                            ]
                        ),
                        lambda s: s.ctx.isNotNull(),
                    ),
                )
            )
        ).alias("p")
    ).select("p.center", "p.ctx")
    counted = (
        pairs.join(F.broadcast(vocab.select(F.col("word").alias("center"))), "center")
        .join(F.broadcast(vocab.select(F.col("word").alias("ctx"))), "ctx")
        .filter(F.col("center") != F.col("ctx"))
        .groupBy("center", "ctx")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    top = counted.orderBy(
        F.desc("n_occ"), F.asc("center"), F.asc("ctx")
    ).limit(SG_TOP)
    pair_fp = _charfold(F.concat(F.col("center"), F.lit("|"), F.col("ctx")))
    with_negs = top.withColumn("pfp", pair_fp)
    for j in range(1, SG_NEG + 1):
        neg_idx = (
            (F.lit(_SG_A) * (F.col("pfp") + F.lit(j)) + F.lit(_SG_B))
            % F.lit(ARITH_P)
        ) % F.lit(SG_VOCAB)
        with_negs = with_negs.join(
            F.broadcast(
                vocab.select(
                    F.col("idx").alias(f"nidx{j}"), F.col("word").alias(f"neg{j}")
                )
            ),
            neg_idx == F.col(f"nidx{j}"),
        ).drop(f"nidx{j}")
    w = Window.orderBy(F.desc("n_occ"), F.asc("center"), F.asc("ctx"))
    return with_negs.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "center",
        "ctx",
        "n_occ",
        *[F.col(f"neg{j}") for j in range(1, SG_NEG + 1)],
    ).orderBy("rank")


def _x183_sql() -> str:
    offs = [d for d in range(-SG_WINDOW, SG_WINDOW + 1) if d != 0]
    pair_comp = ", ".join(
        f"""CASE WHEN i + {d} >= 1 AND i + {d} <= len(t)
             THEN {{'center': t[i], 'ctx': t[i + {d}]}} END"""
        for d in offs
    )
    neg_joins, neg_cols = [], []
    for j in range(1, SG_NEG + 1):
        neg_joins.append(
            f"""JOIN vocab v{j}
            ON v{j}.idx = (({_SG_A} * (tp.pfp + {j}) + {_SG_B})
                           % {ARITH_P}) % {SG_VOCAB}"""
        )
        neg_cols.append(f"v{j}.word AS neg{j}")
    return f"""
        WITH tok AS ({_SQL_WORDS.format(keep="doc_id")}),
        vocab AS MATERIALIZED (
          SELECT word,
                 CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) - 1
                      AS BIGINT) AS idx
          FROM (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word)
          ORDER BY cnt DESC, word ASC LIMIT {SG_VOCAB}),
        tl AS (
          SELECT list_filter(string_split(lower(text), ' '), w -> w <> '') AS t
          FROM documents),
        rawp AS (
          SELECT p['center'] AS center, p['ctx'] AS ctx
          FROM (
            SELECT unnest(list_filter(flatten(
                [[{pair_comp}] FOR i IN generate_series(1, len(t))]),
                s -> s IS NOT NULL AND s['ctx'] IS NOT NULL)) AS p
            FROM tl WHERE len(t) >= 1)),
        counted AS (
          SELECT center, ctx, CAST(COUNT(*) AS BIGINT) AS n_occ
          FROM rawp
          WHERE center IN (SELECT word FROM vocab)
            AND ctx IN (SELECT word FROM vocab)
            AND center <> ctx
          GROUP BY 1, 2),
        top AS MATERIALIZED (
          SELECT center, ctx, n_occ,
                 list_reduce(list_transform(
                     string_split(center || '|' || ctx, ''),
                     c -> CAST(ascii(c) AS BIGINT)),
                     (a, b) -> (a*31 + b) % {ARITH_P}) AS pfp
          FROM counted
          ORDER BY n_occ DESC, center ASC, ctx ASC LIMIT {SG_TOP})
        SELECT CAST(row_number() OVER (
                   ORDER BY n_occ DESC, center ASC, ctx ASC) AS BIGINT)
                   AS rank,
               tp.center, tp.ctx, tp.n_occ, {", ".join(neg_cols)}
        FROM top tp
        {" ".join(neg_joins)}
        ORDER BY rank
        """


register(
    QuerySpec(
        "x183_skipgram_pairs",
        x183_skipgram_pairs,
        _x183_sql(),
        "skip-gram training pairs with deterministic negative sampling",
    )
)


# --- x184: length-bucketed dynamic batching ----------------------------------
BATCH_BAND = 32  # token-length band width per bucket
BATCH_BUDGET = 512  # token budget per batch (next-fit within a bucket)


def x184_length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic (length-bucketed) batch construction: documents bucket by
    token-length band, then pack next-fit in deterministic md5 order
    into BATCH_BUDGET-token batches; each batch pads to ITS OWN max
    length, and the per-bucket padding waste shows the win over x164's
    global fixed-length chunking — the standard throughput lever in
    training-data loaders. Window state is per-bucket; the batch
    assignment is one cumulative-sum pass (the x27 prefix-sum shape)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.size(F.filter(F.split(F.lower("text"), " "), lambda w: w != ""))
    sized = docs.select(
        "doc_id",
        n.cast("long").alias("n_tok"),
        (n.cast("long") / F.lit(BATCH_BAND)).cast("long").alias("bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w_cum = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batched = sized.select(
        "bucket",
        "n_tok",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w_cum), F.lit(0)) / F.lit(BATCH_BUDGET)
        )
        .cast("long")
        .alias("batch"),
    )
    per_batch = batched.groupBy("bucket", "batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tokens"),
        F.max("n_tok").alias("max_len"),
    )
    return (
        per_batch.groupBy("bucket")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("tokens").cast("long").alias("tokens"),
            F.sum(F.col("max_len") * F.col("n_docs")).cast("long").alias("padded"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_batches",
            "tokens",
            "padded",
            F.round(
                (F.col("padded") - F.col("tokens")).cast("double")
                / F.col("padded")
                * 100,
                6,
            ).alias("waste_pct"),
        )
        .orderBy("bucket")
    )


register(
    QuerySpec(
        "x184_length_bucketed_batching",
        x184_length_bucketed_batching,
        f"""
        WITH sized AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                                      w -> w <> '')) AS BIGINT) AS n_tok,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                                      w -> w <> '')) // {BATCH_BAND}
                      AS BIGINT) AS bucket,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        batched AS (
          SELECT bucket, n_tok,
                 CAST(floor(COALESCE(SUM(n_tok) OVER (
                          PARTITION BY bucket ORDER BY h, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) / {BATCH_BUDGET}) AS BIGINT) AS batch
          FROM sized),
        per_batch AS (
          SELECT bucket, batch, COUNT(*) AS n_docs,
                 SUM(n_tok) AS tokens, MAX(n_tok) AS max_len
          FROM batched GROUP BY 1, 2)
        SELECT bucket, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_batches,
               CAST(SUM(tokens) AS BIGINT) AS tokens,
               CAST(SUM(max_len * n_docs) AS BIGINT) AS padded,
               ROUND(CAST(SUM(max_len * n_docs) - SUM(tokens) AS DOUBLE)
                     / SUM(max_len * n_docs) * 100, 6) AS waste_pct
        FROM per_batch GROUP BY bucket ORDER BY bucket
        """,
        "length-bucketed dynamic batching with per-bucket padding waste",
    )
)


# --- x194: logistic-regression quality classifier, trained distributed -------
# Batch gradient descent in the parameter-server shape: each epoch is ONE
# distributed pass over the per-doc feature frame producing decimal-exact
# gradient sums; the 4-weight model state lives driver-side (a bounded
# scalar collect per epoch, the x45 pattern).  All per-row math follows
# helpers rules 2+3 (row-level IEEE ops, ROUND(·,6) before any
# aggregation; exp follows the x83/x134 ln precedent), so the oracle can
# unroll the identical recurrence as chained MATERIALIZED 1-row CTEs.
X194_ITERS = 8
X194_LR = 2.0  # learning rate (tuned for the ~unit-scaled features)
X194_X2_SCALE = 10  # mean-word-length feature scaled to ~unit range
X194_LEN_T = 300  # label: doc is "long-form" if n_chars > this


def x194_lr_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression document classifier (label: long-form
    vs short, the fasttext-style quality-gate shape) by full-batch
    gradient descent.  Features are deterministic surface rationals
    (doc length in words /100, mean word length, type-token ratio) so
    the whole training trajectory — weights, Brier score, accuracy per
    epoch — is bit-reproducible and value-checked against the oracle's
    unrolled recurrence.

    Scale: the ONLY corpus-sized work is one feature-frame aggregation
    per epoch (map-side decimal partials, 1-row result); the model is 4
    doubles.  Epochs scale as O(iters × one corpus pass) — exactly how
    a distributed LR/linear probe trains on 100 TB (compute gradients
    where the data is, step the tiny model centrally)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("n_chars").alias("nc"), F.split(F.lower("text"), " ").alias("t")
    )
    feats = (
        toks.select(
            "nc", F.size("t").alias("nw"), F.size(F.array_distinct("t")).alias("nd")
        )
        .select(
            F.round(F.col("nw") / F.lit(100), 6).alias("x1"),
            F.round(F.col("nc") / F.col("nw") / X194_X2_SCALE, 6).alias("x2"),
            F.round(F.col("nd") / F.col("nw"), 6).alias("x3"),
            F.when(F.col("nc") > X194_LEN_T, 1.0).otherwise(0.0).alias("y"),
        )
        .persist()
    )
    n = feats.count()  # scalar; also materializes the persisted frame
    dec = "decimal(30,10)"
    w = [0.0, 0.0, 0.0, 0.0]
    rows = []
    for it in range(1, X194_ITERS + 1):
        z = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
        )
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        scored = feats.select(
            p.alias("p"), "y", F.lit(1.0).alias("x0"), "x1", "x2", "x3"
        )
        aggs = [
            F.sum(F.round((F.col("p") - F.col("y")) * F.col(f"x{j}"), 6).cast(dec))
            .cast("double")
            .alias(f"g{j}")
            for j in range(4)
        ] + [
            F.sum(
                F.round((F.col("p") - F.col("y")) * (F.col("p") - F.col("y")), 6).cast(
                    dec
                )
            )
            .cast("double")
            .alias("se"),
            F.sum(((F.col("p") >= 0.5) == (F.col("y") == 1.0)).cast("long")).alias(
                "hits"
            ),
        ]
        stat = scored.agg(*aggs).select(
            *[
                F.round(F.lit(w[j]) - X194_LR * F.round(F.col(f"g{j}") / n, 6), 6).alias(
                    f"w{j}"
                )
                for j in range(4)
            ],
            F.round(F.col("se") / n, 6).alias("brier"),
            F.round(F.col("hits") / F.lit(n), 6).alias("acc"),
        ).collect()[0]
        w = [stat[f"w{j}"] for j in range(4)]
        rows.append((it, w[0], w[1], w[2], w[3], stat.brier, stat.acc))
    feats.unpersist()
    from .helpers import inline_rows

    return inline_rows(
        spark,
        rows,
        "iter long, w0 double, w1 double, w2 double, w3 double, "
        "brier double, acc double",
    )


def _x194_sql() -> str:
    """x194's oracle: the identical recurrence unrolled as chained
    MATERIALIZED 1-row CTEs (helpers rule 9)."""
    head = f"""
        WITH feats AS MATERIALIZED (
          SELECT ROUND(CAST(nw AS DOUBLE) / 100, 6) AS x1,
                 ROUND(CAST(nc AS DOUBLE) / nw / {X194_X2_SCALE}, 6) AS x2,
                 ROUND(CAST(nd AS DOUBLE) / nw, 6) AS x3,
                 CASE WHEN nc > {X194_LEN_T} THEN 1.0 ELSE 0.0 END AS y
          FROM (SELECT n_chars AS nc,
                       len(string_split(lower(text), ' ')) AS nw,
                       len(list_distinct(string_split(lower(text), ' '))) AS nd
                FROM documents)),
        n AS MATERIALIZED (SELECT COUNT(*) AS n FROM feats),
        w0 AS MATERIALIZED (
          SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
                 CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3,
                 CAST(NULL AS DOUBLE) AS brier, CAST(NULL AS DOUBLE) AS acc)"""
    steps = []
    for t in range(1, X194_ITERS + 1):
        prev = f"w{t - 1}"
        gsum = SQL_DEC_SUM.format(x="ROUND((p - y) * {xj}, 6)")
        sesum = SQL_DEC_SUM.format(x="ROUND((p - y) * (p - y), 6)")
        grads = ",\n                 ".join(
            f"ROUND(MAX(w.{{w}}) - {X194_LR} * ROUND({gsum.format(xj=xj)} / MAX(n.n), 6), 6)"
            f" AS {{w}}".format(w=f"w{j}")
            for j, xj in enumerate(["1.0", "x1", "x2", "x3"])
        )
        steps.append(f"""
        s{t} AS MATERIALIZED (
          SELECT p, y, x1, x2, x3
          FROM (SELECT ROUND(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1
                                                + w.w2 * f.x2 + w.w3 * f.x3))), 6)
                           AS p,
                       f.y, f.x1, f.x2, f.x3
                FROM feats f CROSS JOIN {prev} w)),
        w{t} AS MATERIALIZED (
          SELECT {grads},
                 ROUND({sesum} / MAX(n.n), 6) AS brier,
                 ROUND(CAST(SUM(CASE WHEN (p >= 0.5) = (y = 1.0)
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / MAX(n.n), 6) AS acc
          FROM s{t} CROSS JOIN {prev} w CROSS JOIN n)""")
    tail = "\n        UNION ALL\n".join(
        f"        SELECT CAST({t} AS BIGINT) AS iter, w0, w1, w2, w3, brier, acc"
        f" FROM w{t}"
        for t in range(1, X194_ITERS + 1)
    )
    return head + "," + ",".join(steps) + "\n" + tail + "\n        ORDER BY iter"


register(
    QuerySpec(
        "x194_lr_quality_train",
        x194_lr_quality_train,
        _x194_sql(),
        "distributed full-batch LR training (weights/Brier/acc per epoch)",
    )
)


# --- x203: Gopher-rules quality battery --------------------------------------
# Repetition/quality heuristics after Rae et al. 2021 (Gopher, §A1.1),
# thresholds calibrated to this corpus so the battery has signal (R2 is
# the one rule every doc here passes — kept at the published band for
# realism).  Every threshold is shared with the oracle via f-string.
GOPHER_MIN_WORDS = 30          # R1: too-short docs
GOPHER_WL_LO, GOPHER_WL_HI = 3.0, 10.0  # R2: mean word length band
GOPHER_SHORT_FRAC_MAX = 0.08   # R3: fraction of <2-char words
GOPHER_STOP_MIN = 2            # R4: distinct stop-word hits required
GOPHER_TOP_FRAC_MAX = 0.2     # R5: single-token dominance cap
GOPHER_STOPWORDS = ("join", "hash", "row", "batch", "scan")


def x203_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-filter battery as one pass: five per-document
    rules (length floor, mean-word-length band, short-word fraction,
    stop-word presence, single-token dominance) evaluated row-locally,
    rolled up per source — the go/no-go table a corpus intake reads
    before admitting a crawl slice.

    Scale: R1–R4 are pure map-side array math over the materialized
    token column (helpers rule 10); R5 needs each doc's top token
    frequency, computed as a (doc, token) count + per-doc max — one
    narrow keyed aggregation, map-side combined.  The rollup is
    source-keyed.  Nothing is corpus-global."""
    docs = load_table(spark, sf_dir, "documents")
    return gopher_pass_rates(gopher_rule_counts(docs))


def gopher_rule_counts(docs: DataFrame) -> DataFrame:
    """x203's per-source rule-pass COUNTS over any documents frame —
    additive across document subsets, so a streaming twin (x212) can
    emit per-micro-batch counts and re-aggregate to the identical batch
    result."""
    toks = docs.select(
        "doc_id", "source", F.col("n_chars").alias("nc"),
        F.split(F.lower("text"), " ").alias("w"),
    )
    tf = (
        toks.select("doc_id", F.explode("w").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    feats = (
        toks.join(tf, "doc_id")
        .select(
            "source",
            F.size("w").alias("nw"),
            F.round(F.col("nc") / F.size("w"), 6).alias("mwl"),
            F.round(
                F.size(F.filter("w", lambda x: F.length(x) < 2))
                / F.size("w").cast("double"),
                6,
            ).alias("short_frac"),
            F.size(
                F.array_intersect(
                    F.array_distinct("w"),
                    F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
                )
            ).alias("stop_hits"),
            F.round(F.col("top_c") / F.size("w").cast("double"), 6).alias(
                "top_frac"
            ),
        )
    )
    r = {
        "r1": F.col("nw") >= GOPHER_MIN_WORDS,
        "r2": (F.col("mwl") >= GOPHER_WL_LO) & (F.col("mwl") <= GOPHER_WL_HI),
        "r3": F.col("short_frac") <= GOPHER_SHORT_FRAC_MAX,
        "r4": F.col("stop_hits") >= GOPHER_STOP_MIN,
        "r5": F.col("top_frac") <= GOPHER_TOP_FRAC_MAX,
    }
    all_pass = r["r1"] & r["r2"] & r["r3"] & r["r4"] & r["r5"]
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(c.cast("long")).cast("long").alias(f"pass_{k}") for k, c in r.items()],
        F.sum(all_pass.cast("long")).cast("long").alias("n_pass_all"),
    )


def gopher_pass_rates(counts: DataFrame) -> DataFrame:
    """Rate projection over (possibly re-aggregated) rule counts."""
    summed = counts.groupBy("source").agg(
        *[
            F.sum(c).cast("long").alias(c)
            for c in (
                "n_docs", "pass_r1", "pass_r2", "pass_r3", "pass_r4",
                "pass_r5", "n_pass_all",
            )
        ]
    )
    return summed.select(
        "source", "n_docs", "pass_r1", "pass_r2", "pass_r3", "pass_r4",
        "pass_r5",
        "n_pass_all",
        F.round(F.col("n_pass_all") / F.col("n_docs").cast("double"), 6).alias(
            "pass_rate"
        ),
    ).orderBy("source")


register(
    QuerySpec(
        "x203_gopher_rules",
        x203_gopher_rules,
        f"""
        WITH d AS (
          SELECT doc_id, source, n_chars AS nc,
                 string_split(lower(text), ' ') AS w
          FROM documents),
        tf AS (
          SELECT doc_id, MAX(c) AS top_c FROM (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(w) AS tok FROM d)
            GROUP BY doc_id, tok)
          GROUP BY doc_id),
        f AS (
          SELECT d.source,
                 len(d.w) AS nw,
                 ROUND(CAST(d.nc AS DOUBLE) / len(d.w), 6) AS mwl,
                 ROUND(CAST(len(list_filter(d.w, x -> strlen(x) < 2)) AS DOUBLE)
                       / len(d.w), 6) AS short_frac,
                 len(list_intersect(list_distinct(d.w),
                     [{", ".join(repr(s) for s in GOPHER_STOPWORDS)}])) AS stop_hits,
                 ROUND(CAST(tf.top_c AS DOUBLE) / len(d.w), 6) AS top_frac
          FROM d JOIN tf USING (doc_id)),
        rules AS (
          SELECT source,
                 CASE WHEN nw >= {GOPHER_MIN_WORDS} THEN 1 ELSE 0 END AS r1,
                 CASE WHEN mwl >= {GOPHER_WL_LO} AND mwl <= {GOPHER_WL_HI}
                      THEN 1 ELSE 0 END AS r2,
                 CASE WHEN short_frac <= {GOPHER_SHORT_FRAC_MAX} THEN 1 ELSE 0 END AS r3,
                 CASE WHEN stop_hits >= {GOPHER_STOP_MIN} THEN 1 ELSE 0 END AS r4,
                 CASE WHEN top_frac <= {GOPHER_TOP_FRAC_MAX} THEN 1 ELSE 0 END AS r5
          FROM f)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(r1) AS BIGINT) AS pass_r1,
               CAST(SUM(r2) AS BIGINT) AS pass_r2,
               CAST(SUM(r3) AS BIGINT) AS pass_r3,
               CAST(SUM(r4) AS BIGINT) AS pass_r4,
               CAST(SUM(r5) AS BIGINT) AS pass_r5,
               CAST(SUM(r1 * r2 * r3 * r4 * r5) AS BIGINT) AS n_pass_all,
               ROUND(CAST(SUM(r1 * r2 * r3 * r4 * r5) AS DOUBLE) / COUNT(*), 6)
                   AS pass_rate
        FROM rules GROUP BY source ORDER BY source
        """,
        "Gopher quality-rule battery: five per-doc rules, per-source pass rates",
    )
)


# --- x222: global chunk-level dedup with document reconstruction ---------------
# The CCNet/RefinedWeb curation shape the corpus-level near-dup passes
# (x09/x26/x33) don't cover: duplication lives INSIDE documents — shared
# boilerplate paragraphs — so the unit of dedup is the paragraph and the
# output is each document REBUILT from its surviving paragraphs.  The
# synthetic corpus has no paragraph breaks, so the unit is a fixed
# CHUNK_W-word window (the unit definition is corpus-specific; the
# operator shape — explode, global keep-first, reconstruct in order —
# is the production one).
CHUNK_W = 8


def x222_chunk_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global keep-first chunk dedup: every CHUNK_W-word chunk keeps its
    first occurrence in (doc_id, position) order and every later copy is
    dropped; each document is rebuilt from its surviving chunks in
    position order.  Output per doc: chunk counts before/after and the
    md5 of the rebuilt text (the value check that the reconstruction —
    not just the counts — is right).

    Scale shapes: explode to one narrow row per chunk (~n·len/W rows);
    the keep-first decision is ONE window ranked by (doc_id, pos) per
    chunk hash — a key-shuffle on the chunk's md5, never content; the
    rebuild is a per-doc ordered string_agg (key-shuffle on doc_id).
    At 100 TB both shuffles carry (hash, ids) rows, with text only in
    the final per-doc agg."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.lower("text"), " ")
    nch = F.ceil(F.size(toks) / F.lit(CHUNK_W)).cast("int")
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, ceil(size(split(lower(text), ' ')) "
                f"/ {CHUNK_W}) - 1), i -> array_join(slice(split(lower(text),"
                f" ' '), i * {CHUNK_W} + 1, {CHUNK_W}), ' '))"
            )
        ).alias("pos", "chunk"),
    ).select("doc_id", "pos", F.md5("chunk").alias("h"), "chunk")
    wfirst = Window.partitionBy("h").orderBy(F.asc("doc_id"), F.asc("pos"))
    kept = (
        chunks.withColumn("rn", F.row_number().over(wfirst))
        .filter(F.col("rn") == 1)
        .select("doc_id", "pos", "chunk")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "chunk"))
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    )
    totals = docs.select("doc_id", nch.alias("n_chunks"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


def _x222_sql() -> str:
    return f"""
        WITH docs AS (
          SELECT doc_id, string_split(lower(text), ' ') AS toks
          FROM documents),
        chunks AS MATERIALIZED (
          SELECT doc_id, t.i AS pos,
                 md5(array_to_string(
                     toks[t.i * {CHUNK_W} + 1 : (t.i + 1) * {CHUNK_W}],
                     ' ')) AS h,
                 array_to_string(
                     toks[t.i * {CHUNK_W} + 1 : (t.i + 1) * {CHUNK_W}],
                     ' ') AS chunk
          FROM docs, LATERAL (
            SELECT unnest(range(0,
                CAST(CEIL(len(toks) * 1.0 / {CHUNK_W}) AS BIGINT))) AS i) t),
        kept AS (
          SELECT doc_id, pos, chunk FROM chunks
          QUALIFY row_number() OVER (PARTITION BY h
                                     ORDER BY doc_id, pos) = 1),
        rebuilt AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 md5(string_agg(chunk, ' ' ORDER BY pos)) AS kept_md5
          FROM kept GROUP BY doc_id),
        totals AS (
          SELECT doc_id,
                 CAST(CEIL(len(toks) * 1.0 / {CHUNK_W}) AS BIGINT) AS n_chunks
          FROM docs)
        SELECT t.doc_id,
               t.n_chunks,
               CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
               COALESCE(r.kept_md5, md5('')) AS kept_md5
        FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
        ORDER BY t.doc_id
        """


register(
    QuerySpec(
        "x222_chunk_dedup_rebuild",
        x222_chunk_dedup_rebuild,
        _x222_sql(),
        "global keep-first chunk dedup + per-document reconstruction digest",
    )
)
