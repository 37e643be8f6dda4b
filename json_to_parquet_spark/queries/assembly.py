"""Dataset-assembly and governance operators, round-4 fifth batch
(SURVEY §2.C X4 breadth): the multi-epoch mixture plan (x123), the
shard-rebalance migration audit (x124), tf-idf-weighted shingle cosine
pairs (x125), quality-ordered token-budget selection (x126), the
deletion-request forget cascade (x127), the sort-free budget threshold
sweep (x128 — x126's scale path, made checkable), the vocabulary-size
coverage curve (x129), the mergeable-statistics cross-check (x130),
the snapshot-over-snapshot token-drift monitor (x134), the
k-anonymity release audit (x136), the watermark-delay late-data sweep
(x140), the hourly volume-anomaly monitor (x142), the
duplicate-weighted effective-size readout (x143), deterministic
contrastive-triplet construction (x144), the language-pair
char-trigram similarity matrix (x145), derandomized bootstrap bands
(x150), jackknife source influence (x151), the token-weighted median
length (x152), the session handoff matrix (x153), within-session
co-occurrence lift (x154), novelty decay over ingest order (x155),
inter-arrival burstiness (x156), and user-activity Lorenz
concentration (x157).  The reference
(`/root/reference/pyarrow/main.py`) has no dataset-assembly surface;
these are driver-mandated LLM-pipeline operators (repo:BASELINE.json
north_star) — the planning/governance half that sits AROUND the
cleaning ops: deciding what each epoch reads, how shards migrate when
the trainer fleet resizes, which near-dup pairs a weighted scorer
keeps, what fits a token budget, and what a deletion request cascades
into.

Scale shapes:
- x123 is one map-side hash + a 3-way epoch explode + a single
  (epoch, source)-keyed aggregation — linear in corpus size, output
  bounded at epochs x sources.  Nothing is sampled by shuffling: epoch
  membership is a pure function of (doc_id, epoch), so a 1000-executor
  run plans epochs without materializing them.
- x124 is a single scan with a 2-way strategy explode and a
  strategy-keyed 2-row aggregate — the cheapest possible answer to
  "what fraction of 100 TB moves if we grow the shard fleet 8 -> 10".
- x125 bounds its posting self-join by document frequency
  (DF_MIN..DF_MAX): pair fan-out per shingle is df^2 <= DF_MAX^2
  regardless of corpus size — the x08/x19 no-all-pairs pattern, but
  idf-weighted so boilerplate shingles that survive the cap still
  contribute ~nothing to the score.
- x126 is one lang-partitioned window (cumulative token sum in quality
  order) + a lang-keyed aggregate.  At 100 TB the per-lang sort is the
  cost; the scale path replaces it with an approx-quantile score
  threshold (two scans, no sort) — the window form here is the exact
  gate oracle for that replacement.
- x127 is a pure per-row projection (forget flag, chunk count, shard
  id are all row-local arithmetic) + one source-keyed aggregate with a
  distinct shard count — no joins, because every derived artifact
  (chunks x61, shards x85) is hash-addressed, which is precisely what
  makes deletion tractable at scale.
- x128 replaces x126's per-lang sort with one (lang, decile)-keyed
  aggregation + a window over the ≤ langs x 11-row histogram — the
  histogram-then-choose pattern for thresholding without sorting.
- x129's corpus-sized work is one token-keyed count; its ranking
  window runs over the aggregated vocabulary frame only.
- x130 proves the merge algebra (integer partial sums fold exactly)
  that lets an incremental pipeline maintain running corpus moments
  without rescanning history.
- x134 is one token-keyed conditional-sum pass + a 1-row totals
  broadcast + TakeOrderedAndProject — trending detection without a
  global sort or a second corpus scan.
- x136 is two bounded-key aggregations (quasi-identifier group sizes,
  then the per-language risk rollup); the release decision consumes
  group sizes only, so nothing row-granular leaves the executors.
- x140's watermark state lives on the arrival-window frame
  (timespan/10 min rows), never a global ordering of the log.
- x142's robust statistics run on the hours x types frame after one
  keyed count of the raw log.
- x143 shuffles the content key once; multiplicities join back by key.
- x144's negative assignment routes through a broadcastable
  (lang, bucket) representative frame — no RNG, no self-join.
- x150's bootstrap explodes ×B but aggregates to types×B groups; x151
  derives every leave-one-out mean from one partials frame; x152 is a
  lang-keyed cumulative window; x153 reuses q26's sessionize shuffle
  with a bounded types² rollup.
- x154 joins distinct per-session type sets (fan-out ≤ types² per
  session); x155's first-seen attribution is one (source,shingle) MIN;
  x156 is a lag window + exact integer moments; x157 never sorts users
  (count-of-counts histogram + tiny-frame cumsum).

Determinism per helpers.py: md5-bucket sampling (the x25 pattern —
stable across runs, engines, partitionings); ROUND-then-decimal-sum
for every ln/product aggregate (rules 1+3); computed ints cast to long
(rule 5); integer sums wrapped in BIGINT (rule 7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register
from .corpus import CHUNK_STRIDE
from .evalsuite import ARITH_P, N_SHARDS, _SHARD_A, _SHARD_B
from .helpers import SQL_DEC_SUM

# md5-bucket in [0, 100): the deterministic cross-engine "coin flip"
# (same construction x25_dataset_split gate-proved in round 1).
def _bucket100(expr: Column) -> Column:
    return (
        F.conv(F.substring(F.md5(expr), 1, 4), 16, 10).cast("long") % 100
    )


def _sql_bucket100(expr: str) -> str:
    return (
        f"CAST(from_hex(substring(md5({expr}), 1, 4))::BIT::INT AS BIGINT) % 100"
    )


# --- x123: multi-epoch mixture plan ------------------------------------------
N_EPOCHS = 3


def x123_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch, per-source sampling plan: each source gets a sampling
    rate from its own hash bucket (20/40/60/80/100%), and a document
    participates in epoch e iff md5(doc_id # e) lands under the rate —
    independent draws per epoch, so oversampled sources repeat across
    epochs while undersampled ones rotate.  This is the mixture schedule
    a trainer's data loader executes; computing it as a query means the
    plan (docs + tokens per epoch per source) is known before any epoch
    is materialized."""
    docs = load_table(spark, sf_dir, "documents")
    rate_bucket = _bucket100(F.col("source")) % 5  # 0..4
    sample_pct = ((rate_bucket + 1) * 20).cast("long")  # 20..100
    n_toks = F.size(F.split("text", " ")).cast("long")
    base = docs.select(
        "doc_id",
        "source",
        sample_pct.alias("sample_pct"),
        n_toks.alias("n_toks"),
    )
    per_epoch = base.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(N_EPOCHS))).alias("epoch")
    )
    draw = _bucket100(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("epoch").cast("string"))
    )
    return (
        per_epoch.filter(draw < F.col("sample_pct"))
        .groupBy(F.col("epoch").cast("long").alias("epoch"), "source", "sample_pct")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .orderBy("epoch", "source")
    )


register(
    QuerySpec(
        "x123_epoch_mixture",
        x123_epoch_mixture,
        f"""
        WITH d AS (
          SELECT doc_id, source,
                 ({_sql_bucket100("source")} % 5 + 1) * 20 AS sample_pct,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          FROM documents),
        e AS (SELECT UNNEST(generate_series(1, {N_EPOCHS})) AS epoch)
        SELECT e.epoch AS epoch, d.source AS source,
               CAST(d.sample_pct AS BIGINT) AS sample_pct,
               COUNT(*) AS n_docs,
               CAST(SUM(d.n_toks) AS BIGINT) AS n_tokens
        FROM d, e
        WHERE {_sql_bucket100("CAST(doc_id AS VARCHAR) || '#' || CAST(epoch AS VARCHAR)")}
              < d.sample_pct
        GROUP BY 1, 2, 3
        ORDER BY epoch, source
        """,
        "per-epoch per-source hash-sampled mixture plan (docs + tokens)",
    )
)


# --- x124: shard-rebalance migration audit -----------------------------------
OLD_SHARDS, NEW_SHARDS = 8, 10
_HASH_SPACE = 65_536  # md5 first 4 hex chars


def x124_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much data moves when the shard fleet grows 8 -> 10, under two
    assignment disciplines: hash-mod (old = h%8, new = h%10 — nearly
    everything moves) vs contiguous hash-range (old = floor(h*8/S),
    new = floor(h*10/S) — only boundary slices move).  The measured
    version of the consistent-hashing argument, as a 2-row audit a
    platform team runs before resizing."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    strategies = F.array(
        F.struct(
            F.lit("mod").alias("strategy"),
            (h % OLD_SHARDS).alias("old_shard"),
            (h % NEW_SHARDS).alias("new_shard"),
        ),
        F.struct(
            F.lit("range").alias("strategy"),
            F.floor(h * OLD_SHARDS / _HASH_SPACE).alias("old_shard"),
            F.floor(h * NEW_SHARDS / _HASH_SPACE).alias("new_shard"),
        ),
    )
    return (
        docs.select(F.explode(strategies).alias("s"))
        .select("s.strategy", "s.old_shard", "s.new_shard")
        .groupBy("strategy")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("old_shard") != F.col("new_shard")).cast("long"))
            .cast("long")
            .alias("n_moved"),
        )
        .select(
            "strategy",
            "n_docs",
            "n_moved",
            F.round(F.col("n_moved").cast("double") / F.col("n_docs").cast("double"), 6)
            .alias("moved_frac"),
        )
        .orderBy("strategy")
    )


register(
    QuerySpec(
        "x124_shard_rebalance",
        x124_shard_rebalance,
        f"""
        WITH h AS (
          SELECT CAST(from_hex(substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIT::INT
                      AS BIGINT) AS h
          FROM documents),
        s AS (
          SELECT 'mod' AS strategy, h % {OLD_SHARDS} AS old_shard,
                 h % {NEW_SHARDS} AS new_shard FROM h
          UNION ALL
          SELECT 'range', CAST(FLOOR(h * {OLD_SHARDS} / {_HASH_SPACE}.0) AS BIGINT),
                 CAST(FLOOR(h * {NEW_SHARDS} / {_HASH_SPACE}.0) AS BIGINT) FROM h)
        SELECT strategy, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_moved,
               ROUND(CAST(SUM(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS moved_frac
        FROM s GROUP BY 1 ORDER BY strategy
        """,
        "mod vs range shard-resize migration fractions (8 -> 10 shards)",
    )
)


# --- x125: tf-idf-weighted shingle cosine pairs ------------------------------
X125_W = 3  # shingle width (words)
X125_DF_MIN, X125_DF_MAX = 2, 50  # posting df cap — bounds the self-join
X125_COS_MIN = 0.30


def x125_shingle_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs whose tf-idf-weighted 3-word-shingle vectors have
    cosine >= 0.30 — the weighted companion to x08's unweighted shingle
    jaccard: idf discounts boilerplate shingles, so two documents
    sharing a rare passage outrank two sharing a common template.

    Scale: the only pair-producing step is a posting self-join on
    shingles with DF_MIN <= df <= DF_MAX, so fan-out per shingle is
    bounded by DF_MAX^2 independent of corpus size (never all-pairs —
    plan-guarded by the registry-wide BNLJ sweep).  Weights are
    ROUND(tf*ln(N/df), 6) then decimal-summed (helpers rules 1+3) so
    dot products and norms are bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # tiny scalar; at 100 TB read from table stats
    from .quality import _shingles

    posting = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), X125_W, False)).alias("sh")
    )
    tf = posting.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        tf.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(X125_DF_MIN, X125_DF_MAX))
    )
    w = tf.join(df_, "sh").select(
        "doc_id",
        "sh",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("w"),
    )
    # The weights frame feeds four consumers (both self-join sides + two
    # norm lookups); without persistence the explode→tf→df→join chain
    # re-executes for each.  The frame is df-capped (≪ corpus), so at
    # 100 TB this is a disk-spillable cache of the pruned posting list,
    # not of the corpus.
    w = w.persist()
    norm = w.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(F.round(F.col("w") * F.col("w"), 6).cast("decimal(30,10)")).cast(
                "double"
            )
        ).alias("nrm")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(F.col("a.w") * F.col("b.w"), 6).alias("p"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("p").cast("decimal(30,10)")).cast("double").alias("dot"),
            F.count(F.lit(1)).alias("n_shared"),
        )
    )
    na = norm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("nrm_a"))
    nb = norm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nrm_b"))
    cos = F.round(F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 6)
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", "n_shared", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= X125_COS_MIN)
        .orderBy("doc_a", "doc_b")
    )


def _x125_sql() -> str:
    from .quality import _sql_shingles

    dec_p = SQL_DEC_SUM.format(x="p")
    return f"""
        WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
        tl AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        s AS (SELECT doc_id, unnest({_sql_shingles(X125_W, False)}) AS sh FROM tl),
        tf AS (SELECT doc_id, sh, COUNT(*) AS tf FROM s GROUP BY 1, 2),
        dft AS (SELECT sh, COUNT(*) AS df FROM tf GROUP BY 1
                HAVING COUNT(*) BETWEEN {X125_DF_MIN} AND {X125_DF_MAX}),
        w AS (SELECT tf.doc_id, tf.sh,
                     ROUND(tf.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / dft.df),
                           6) AS w
              FROM tf JOIN dft USING (sh)),
        nm AS (SELECT doc_id,
                      sqrt(CAST(CAST(SUM(CAST(ROUND(w*w, 6) AS DECIMAL(30,10)))
                                AS VARCHAR) AS DOUBLE)) AS nrm
               FROM w GROUP BY 1),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     ROUND(a.w * b.w, 6) AS p
              FROM w a JOIN w b ON a.sh = b.sh AND a.doc_id < b.doc_id),
        d AS (SELECT doc_a, doc_b, {dec_p} AS dot,
                     CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM p GROUP BY 1, 2)
        SELECT doc_a, doc_b, n_shared,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM d
        JOIN nm na ON na.doc_id = d.doc_a
        JOIN nm nb ON nb.doc_id = d.doc_b
        WHERE ROUND(d.dot / (na.nrm * nb.nrm), 6) >= {X125_COS_MIN}
        ORDER BY doc_a, doc_b
    """


register(
    QuerySpec(
        "x125_shingle_cosine_pairs",
        x125_shingle_cosine_pairs,
        _x125_sql(),
        "tf-idf-weighted shingle cosine near-dup pairs (df-capped posting join)",
    )
)


# --- x126: quality-ordered token-budget selection ----------------------------
TOKEN_BUDGET = 3_000  # tokens per language


def x126_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a per-language token budget with the highest-quality
    documents: order each language by lexical-diversity score
    (distinct/total token ratio) descending and keep documents while the
    running token total stays within budget.  Output is the per-language
    selection manifest: how many documents made the cut, the tokens
    actually spent, and the score threshold the cut implies.

    The window form here is the exact oracle; at 100 TB the per-lang
    sort is replaced by a two-scan approx-quantile score threshold
    (find s* with sum(tokens | score >= s*) ~= budget, then filter) —
    same manifest, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_toks"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double"),
            6,
        ).alias("score"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = F.col("cum_toks") <= TOKEN_BUDGET
    return (
        scored.withColumn("cum_toks", F.sum("n_toks").over(w))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(kept.cast("long")).cast("long").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_toks"))).cast("long").alias("tokens_kept"),
            F.min(F.when(kept, F.col("score"))).alias("min_kept_score"),
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "x126_token_budget_select",
        x126_token_budget_select,
        f"""
        WITH scored AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                 ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')), 6) AS score
          FROM documents),
        c AS (
          SELECT *, SUM(n_toks) OVER (
                   PARTITION BY lang ORDER BY score DESC, doc_id ASC
                   ROWS UNBOUNDED PRECEDING) AS cum_toks
          FROM scored)
        SELECT lang, COUNT(*) AS n_candidates,
               CAST(SUM(CASE WHEN cum_toks <= {TOKEN_BUDGET} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN cum_toks <= {TOKEN_BUDGET} THEN n_toks END)
                    AS BIGINT) AS tokens_kept,
               MIN(CASE WHEN cum_toks <= {TOKEN_BUDGET} THEN score END)
                   AS min_kept_score
        FROM c GROUP BY 1 ORDER BY lang
        """,
        "per-language token-budget greedy selection by quality score",
    )
)


# --- x127: deletion-request forget cascade -----------------------------------
FORGET_PCT = 5  # md5 bucket < 5 => ~5% deterministic pseudo-request set


def x127_forget_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a right-to-be-forgotten batch cascades into: for a
    deterministic ~5% request set, count per source the documents,
    tokens, and derived sliding-window chunks (x61's chunk math) that
    must be purged, and how many output shards (x85's hash assignment)
    need rewriting.  Every derived artifact is hash-addressed, so the
    cascade is a pure projection + one aggregate — no joins against the
    derived tables themselves, which is the property that keeps deletion
    tractable at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    forgotten = _bucket100(F.col("doc_id").cast("string")) < FORGET_PCT
    shard = (
        (F.col("doc_id") * F.lit(_SHARD_A) + F.lit(_SHARD_B)) % F.lit(ARITH_P)
    ) % F.lit(N_SHARDS)
    base = docs.select(
        "source",
        forgotten.alias("forgotten"),
        F.size(toks).cast("long").alias("n_toks"),
        F.ceil(F.size(toks) / F.lit(CHUNK_STRIDE)).cast("long").alias("n_chunks"),
        shard.cast("long").alias("shard_id"),
    )
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_total"),
            F.sum(F.col("forgotten").cast("long")).cast("long").alias("docs_forgotten"),
            F.sum(F.when(F.col("forgotten"), F.col("n_toks")))
            .cast("long")
            .alias("tokens_forgotten"),
            F.sum(F.when(F.col("forgotten"), F.col("n_chunks")))
            .cast("long")
            .alias("chunks_forgotten"),
            F.count_distinct(F.when(F.col("forgotten"), F.col("shard_id")))
            .cast("long")
            .alias("shards_touched"),
        )
        .orderBy("source")
    )


register(
    QuerySpec(
        "x127_forget_cascade",
        x127_forget_cascade,
        f"""
        WITH b AS (
          SELECT source,
                 {_sql_bucket100("CAST(doc_id AS VARCHAR)")} < {FORGET_PCT}
                     AS forgotten,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                 CAST(CEIL(len(string_split(text, ' ')) / {CHUNK_STRIDE}.0) AS BIGINT)
                     AS n_chunks,
                 ((doc_id * {_SHARD_A} + {_SHARD_B}) % {ARITH_P}) % {N_SHARDS}
                     AS shard_id
          FROM documents)
        SELECT source, COUNT(*) AS docs_total,
               CAST(SUM(CASE WHEN forgotten THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_forgotten,
               CAST(SUM(CASE WHEN forgotten THEN n_toks END) AS BIGINT)
                   AS tokens_forgotten,
               CAST(SUM(CASE WHEN forgotten THEN n_chunks END) AS BIGINT)
                   AS chunks_forgotten,
               CAST(COUNT(DISTINCT CASE WHEN forgotten THEN shard_id END) AS BIGINT)
                   AS shards_touched
        FROM b GROUP BY 1 ORDER BY source
        """,
        "deletion-request cascade: docs/tokens/chunks/shards to purge per source",
    )
)


# --- x128: budget threshold sweep (x126's scale path) ------------------------
def x128_budget_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalable replacement x126's docstring promises: instead of a
    per-language sort, bin documents by score decile and emit, per
    (lang, decile), the token mass at-or-above that threshold.  Choosing
    the selection threshold is then a lookup in this ≤ langs x 11-row
    table — the histogram-then-choose pattern that turns a 100 TB sort
    into one aggregation plus a window over an already-tiny frame."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = F.round(
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double"), 6
    )
    binned = docs.select(
        "lang",
        F.floor(score * 10).cast("long").alias("score_decile"),
        F.size(toks).cast("long").alias("n_toks"),
    )
    per_bin = binned.groupBy("lang", "score_decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("bin_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("score_decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_bin.withColumn("cum_tokens", F.sum("bin_tokens").over(w).cast("long"))
        .withColumn("fits_budget", F.col("cum_tokens") <= TOKEN_BUDGET)
        .orderBy("lang", F.desc("score_decile"))
    )


register(
    QuerySpec(
        "x128_budget_threshold_sweep",
        x128_budget_threshold_sweep,
        f"""
        WITH b AS (
          SELECT lang,
                 CAST(FLOOR(ROUND(CAST(len(list_distinct(string_split(text, ' ')))
                                       AS DOUBLE)
                                  / len(string_split(text, ' ')), 6) * 10) AS BIGINT)
                     AS score_decile,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          FROM documents),
        p AS (
          SELECT lang, score_decile, COUNT(*) AS n_docs,
                 CAST(SUM(n_toks) AS BIGINT) AS bin_tokens
          FROM b GROUP BY 1, 2)
        SELECT lang, score_decile, n_docs, bin_tokens,
               CAST(SUM(bin_tokens) OVER (
                   PARTITION BY lang ORDER BY score_decile DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
               CAST(SUM(bin_tokens) OVER (
                   PARTITION BY lang ORDER BY score_decile DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) <= {TOKEN_BUDGET}
                   AS fits_budget
        FROM p ORDER BY lang, score_decile DESC
        """,
        "per-language score-decile token-mass sweep (sort-free budget thresholding)",
    )
)


# --- x129: vocabulary-size coverage curve ------------------------------------
VOCAB_SIZES = (1, 2, 4, 8, 16, 32)


def x129_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token coverage as a function of vocabulary size: rank
    tokens by frequency and report, for each candidate vocab size V,
    the fraction of all corpus tokens a top-V vocabulary covers — the
    curve a tokenizer team reads before fixing V.  The corpus-sized
    work is one token-keyed count; the ranking window runs over the
    aggregated VOCAB frame (vocabulary-sized, millions of rows at web
    scale, never the corpus), which is the standard cost of a global
    frequency ranking."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = freq.agg(F.sum("freq").cast("long").alias("total"))
    w = (
        Window.orderBy(F.desc("freq"), F.asc("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = freq.select(
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("token")))
        .cast("long")
        .alias("vocab_size"),
        F.sum("freq").over(w).cast("long").alias("n_tokens_covered"),
    )
    return (
        ranked.filter(F.col("vocab_size").isin(*VOCAB_SIZES))
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_size",
            "n_tokens_covered",
            F.round(
                F.col("n_tokens_covered").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


register(
    QuerySpec(
        "x129_vocab_coverage_curve",
        x129_vocab_coverage_curve,
        f"""
        WITH f AS (
          SELECT token, COUNT(*) AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
          GROUP BY 1),
        t AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM f),
        r AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS BIGINT)
                     AS vocab_size,
                 CAST(SUM(freq) OVER (ORDER BY freq DESC, token ASC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_tokens_covered
          FROM f)
        SELECT vocab_size, n_tokens_covered,
               ROUND(CAST(n_tokens_covered AS DOUBLE)
                     / (SELECT total FROM t), 6) AS coverage
        FROM r WHERE vocab_size IN {VOCAB_SIZES}
        ORDER BY vocab_size
        """,
        "token coverage vs vocabulary size (tokenizer sizing curve)",
    )
)


# --- x130: mergeable-statistics cross-check ----------------------------------
def x130_mergeable_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-count mean/variance computed two ways: directly
    over all documents, and by merging per-half partial aggregates
    (docs split by doc_id parity, standing in for two ingest days).
    Integer sums (n, sum, sum-of-squares) are exactly mergeable, so the
    merged moments must equal the direct ones bit-for-bit — the
    algebraic property an incremental 100 TB pipeline relies on when it
    folds each day's partials into running corpus statistics instead of
    rescanning history.  The equality is part of the output (and
    invariant-tested), not assumed."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        (F.col("doc_id") % 2).alias("half"),
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
    )
    direct = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("s1"),
        F.sum(F.col("n_toks") * F.col("n_toks")).cast("long").alias("s2"),
    )
    partial = base.groupBy("source", "half").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("n_toks").cast("long").alias("ps1"),
        F.sum(F.col("n_toks") * F.col("n_toks")).cast("long").alias("ps2"),
    )
    merged = partial.groupBy("source").agg(
        F.sum("pn").cast("long").alias("mn"),
        F.sum("ps1").cast("long").alias("ms1"),
        F.sum("ps2").cast("long").alias("ms2"),
    )

    def mean_var(n, s1, s2):
        nd = F.col(n).cast("double")
        mean = F.round(F.col(s1).cast("double") / nd, 6)
        var = F.round(
            F.col(s2).cast("double") / nd
            - (F.col(s1).cast("double") / nd) * (F.col(s1).cast("double") / nd),
            6,
        )
        return mean, var

    dm, dv = mean_var("n_docs", "s1", "s2")
    mm, mv = mean_var("mn", "ms1", "ms2")
    return (
        direct.join(merged, "source")
        .select(
            "source",
            "n_docs",
            dm.alias("mean_direct"),
            mm.alias("mean_merged"),
            dv.alias("var_direct"),
            mv.alias("var_merged"),
            (
                (F.col("n_docs") == F.col("mn"))
                & (F.col("s1") == F.col("ms1"))
                & (F.col("s2") == F.col("ms2"))
            ).alias("partials_equal"),
        )
        .orderBy("source")
    )


register(
    QuerySpec(
        "x130_mergeable_stats",
        x130_mergeable_stats,
        """
        WITH b AS (
          SELECT source, doc_id % 2 AS half,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          FROM documents),
        direct AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(n_toks) AS BIGINT) AS s1,
                 CAST(SUM(n_toks * n_toks) AS BIGINT) AS s2
          FROM b GROUP BY 1),
        partial AS (
          SELECT source, half, COUNT(*) AS pn,
                 CAST(SUM(n_toks) AS BIGINT) AS ps1,
                 CAST(SUM(n_toks * n_toks) AS BIGINT) AS ps2
          FROM b GROUP BY 1, 2),
        merged AS (
          SELECT source, CAST(SUM(pn) AS BIGINT) AS mn,
                 CAST(SUM(ps1) AS BIGINT) AS ms1,
                 CAST(SUM(ps2) AS BIGINT) AS ms2
          FROM partial GROUP BY 1)
        SELECT d.source AS source, d.n_docs AS n_docs,
               ROUND(CAST(s1 AS DOUBLE) / d.n_docs, 6) AS mean_direct,
               ROUND(CAST(ms1 AS DOUBLE) / mn, 6) AS mean_merged,
               ROUND(CAST(s2 AS DOUBLE) / d.n_docs
                     - (CAST(s1 AS DOUBLE) / d.n_docs)
                       * (CAST(s1 AS DOUBLE) / d.n_docs), 6) AS var_direct,
               ROUND(CAST(ms2 AS DOUBLE) / mn
                     - (CAST(ms1 AS DOUBLE) / mn)
                       * (CAST(ms1 AS DOUBLE) / mn), 6) AS var_merged,
               (d.n_docs = mn AND s1 = ms1 AND s2 = ms2) AS partials_equal
        FROM direct d JOIN merged m ON d.source = m.source
        ORDER BY source
        """,
        "direct vs merged-partial per-source moments (incremental-stats contract)",
    )
)


# --- x134: token drift top-k (snapshot-over-snapshot trending) ---------------
DRIFT_TOP_K = 10


def x134_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which tokens' corpus share grew most between two snapshots (docs
    split by doc_id parity as stand-ins for consecutive ingest
    versions): Laplace-smoothed log-ratio of per-snapshot token shares,
    top-K risers — the token-level companion to x73's value-distribution
    PSI, the monitor that catches a source starting to flood the corpus
    with new boilerplate.  One token-keyed count per snapshot (same
    shuffle, conditional sums), two 1-row total frames broadcast, and a
    TakeOrderedAndProject top-K — never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2 == 1).alias("is_new"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum((~F.col("is_new")).cast("long")).cast("long").alias("n_old"),
        F.sum(F.col("is_new").cast("long")).cast("long").alias("n_new"),
    )
    totals = counts.agg(
        F.sum("n_old").cast("long").alias("tot_old"),
        F.sum("n_new").cast("long").alias("tot_new"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    share_old = (F.col("n_old") + 1).cast("double") / (
        F.col("tot_old") + F.col("vocab")
    ).cast("double")
    share_new = (F.col("n_new") + 1).cast("double") / (
        F.col("tot_new") + F.col("vocab")
    ).cast("double")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            "n_old",
            "n_new",
            F.round(F.log(share_new / share_old), 6).alias("drift_logratio"),
        )
        .orderBy(F.desc("drift_logratio"), F.asc("token"))
        .limit(DRIFT_TOP_K)
    )


register(
    QuerySpec(
        "x134_token_drift",
        x134_token_drift,
        f"""
        WITH tk AS (
          SELECT doc_id % 2 = 1 AS is_new,
                 unnest(string_split(text, ' ')) AS token
          FROM documents),
        c AS (
          SELECT token,
                 CAST(SUM(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
                 CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new
          FROM tk GROUP BY 1),
        t AS (
          SELECT CAST(SUM(n_old) AS BIGINT) AS tot_old,
                 CAST(SUM(n_new) AS BIGINT) AS tot_new,
                 CAST(COUNT(*) AS BIGINT) AS vocab
          FROM c)
        SELECT token, n_old, n_new,
               ROUND(ln((CAST(n_new + 1 AS DOUBLE) / (tot_new + vocab))
                        / (CAST(n_old + 1 AS DOUBLE) / (tot_old + vocab))), 6)
                   AS drift_logratio
        FROM c, t
        ORDER BY drift_logratio DESC, token ASC
        LIMIT {DRIFT_TOP_K}
        """,
        "top-K rising tokens between corpus snapshots (smoothed log-ratio drift)",
    )
)


# --- x136: k-anonymity audit --------------------------------------------------
K_ANON = 3
QI_CHAR_BUCKET = 100  # n_chars equal-width bucket in the quasi-identifier


def x136_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk audit before releasing a dataset: treat
    (lang, source, n_chars bucket) as the quasi-identifier and report,
    per language, how many QI groups fall below k=3 members and how many
    documents sit in those small groups (the rows a release would have
    to suppress or generalize).  Two aggregations — QI group sizes, then
    the per-language risk rollup — both key-shuffled on bounded-
    cardinality keys; nothing row-granular ever leaves the executors."""
    docs = load_table(spark, sf_dir, "documents")
    qi = docs.select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / QI_CHAR_BUCKET).cast("long").alias("size_bucket"),
    )
    groups = qi.groupBy("lang", "source", "size_bucket").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    below = F.col("group_size") < K_ANON
    return (
        groups.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(below.cast("long")).cast("long").alias("groups_below_k"),
            F.sum(F.when(below, F.col("group_size")).otherwise(F.lit(0)))
            .cast("long")
            .alias("docs_at_risk"),
            F.sum("group_size").cast("long").alias("n_docs"),
        )
        .select(
            "lang",
            "n_groups",
            "groups_below_k",
            "docs_at_risk",
            "n_docs",
            F.round(
                F.col("docs_at_risk").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("risk_frac"),
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "x136_kanon_audit",
        x136_kanon_audit,
        f"""
        WITH g AS (
          SELECT lang, source,
                 CAST(FLOOR(n_chars / {QI_CHAR_BUCKET}.0) AS BIGINT) AS size_bucket,
                 COUNT(*) AS group_size
          FROM documents GROUP BY 1, 2, 3)
        SELECT lang,
               COUNT(*) AS n_groups,
               CAST(SUM(CASE WHEN group_size < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
                   AS groups_below_k,
               CAST(SUM(CASE WHEN group_size < {K_ANON} THEN group_size ELSE 0 END)
                    AS BIGINT) AS docs_at_risk,
               CAST(SUM(group_size) AS BIGINT) AS n_docs,
               ROUND(CAST(SUM(CASE WHEN group_size < {K_ANON} THEN group_size
                                   ELSE 0 END) AS DOUBLE)
                     / SUM(group_size), 6) AS risk_frac
        FROM g GROUP BY 1 ORDER BY lang
        """,
        "k-anonymity release audit over (lang, source, size-bucket) quasi-identifiers",
    )
)


# --- x140: watermark-delay late-data sweep -----------------------------------
WM_JITTER_STEP_US = 30_000_000  # arrival jitter granularity: 30 s per hash step
WM_ARRIVAL_BUCKET_US = 600_000_000  # 10-minute arrival windows
WM_DELAYS_S = (60, 300, 900)


def x140_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much data each candidate watermark delay would drop: replay
    the event log under a deterministic out-of-order arrival model
    (arrival = event time + hash-derived jitter in ±25 min, the
    transport disorder a real feed shows), advance a bucket-granular
    watermark (max event time over all PRIOR 10-minute arrival windows),
    and count events whose timestamp falls more than W behind it — for
    W in {1, 5, 15} minutes.  This is the measurement that turns 'pick
    a watermark' from a guess into a data-loss budget before deploying
    the x67/x81 streaming aggregations (measured at sf0.01: 52%/44%/26%
    of events would drop at 1/5/15 min under this disorder model — the
    curve the delay choice trades against state size).

    Scale: per-window max is one keyed aggregation; the cumulative
    watermark runs over the WINDOW frame (rows = timespan/10 min);
    events join their window's watermark by broadcast and the sweep is a
    3-way explode — no global ordering of the raw log anywhere."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    jitter = (
        _bucket100(F.col("event_id").cast("string")) - 50
    ) * F.lit(WM_JITTER_STEP_US)
    base = ev.select(
        F.floor((ts_us + jitter) / F.lit(WM_ARRIVAL_BUCKET_US))
        .cast("long")
        .alias("bkt"),
        ts_us.alias("ts_us"),
    )
    per_bucket = base.groupBy("bkt").agg(F.max("ts_us").alias("bkt_max"))
    w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    wm = per_bucket.select(
        "bkt", F.max("bkt_max").over(w).alias("wm_us")  # null for first bucket
    )
    joined = base.join(F.broadcast(wm), "bkt").select(
        "ts_us",
        "wm_us",
        F.explode(F.array(*[F.lit(s) for s in WM_DELAYS_S])).alias("w_seconds"),
    )
    late = F.col("wm_us").isNotNull() & (
        F.col("ts_us") < F.col("wm_us") - F.col("w_seconds") * F.lit(1_000_000)
    )
    return (
        joined.groupBy(F.col("w_seconds").cast("long").alias("w_seconds"))
        .agg(
            F.sum(late.cast("long")).cast("long").alias("n_late"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "w_seconds",
            "n_late",
            "n_total",
            F.round(
                F.col("n_late").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("late_frac"),
        )
        .orderBy("w_seconds")
    )


register(
    QuerySpec(
        "x140_watermark_sweep",
        x140_watermark_sweep,
        f"""
        WITH base AS (
          SELECT (epoch_us(ts)
                  + ({_sql_bucket100("CAST(event_id AS VARCHAR)")} - 50)
                    * {WM_JITTER_STEP_US}) // {WM_ARRIVAL_BUCKET_US} AS bkt,
                 epoch_us(ts) AS ts_us
          FROM events),
        pb AS (SELECT bkt, MAX(ts_us) AS bkt_max FROM base GROUP BY 1),
        wm AS (
          SELECT bkt, MAX(bkt_max) OVER (ORDER BY bkt
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_us
          FROM pb),
        j AS (
          SELECT b.ts_us, wm.wm_us, w.w_seconds
          FROM base b
          JOIN wm USING (bkt)
          CROSS JOIN (SELECT UNNEST([{", ".join(str(s) for s in WM_DELAYS_S)}])
                          AS w_seconds) w)
        SELECT CAST(w_seconds AS BIGINT) AS w_seconds,
               CAST(SUM(CASE WHEN wm_us IS NOT NULL
                              AND ts_us < wm_us - w_seconds * 1000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               COUNT(*) AS n_total,
               ROUND(SUM(CASE WHEN wm_us IS NOT NULL
                               AND ts_us < wm_us - w_seconds * 1000000
                              THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS late_frac
        FROM j GROUP BY 1 ORDER BY w_seconds
        """,
        "late-data loss per candidate watermark delay (streaming-config budget)",
    )
)


# --- x142: event-volume anomaly flags (median/MAD on hourly counts) ----------
ANOM_K = 3  # flag hours beyond K MADs from the median


def x142_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-health monitor on VOLUME rather than values (x64's MAD
    flags outlier values; this flags outlier hours): bucket the event
    log into per-(type, hour) counts, take the per-type median and MAD
    of those counts by discrete rank selection (the x135 technique —
    integer selection, no interpolation, cross-engine exact), and count
    hours beyond K MADs — the alert that catches a feed silently
    doubling or going dark.  The corpus-sized work is one keyed count;
    both robust statistics run on the hours-x-types frame."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wt = Window.partitionBy("event_type")
    r1 = hourly.withColumn(
        "rn", F.row_number().over(wt.orderBy("cnt", "h"))
    ).withColumn("n", F.count(F.lit(1)).over(wt))
    med = (
        r1.filter(F.col("rn") == F.ceil(F.col("n") / 2))
        .select("event_type", F.col("cnt").alias("med"))
    )
    dev = r1.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cnt") - F.col("med"))
    )
    r2 = dev.withColumn("rn2", F.row_number().over(wt.orderBy("adev", "h")))
    mad = (
        r2.filter(F.col("rn2") == F.ceil(F.col("n") / 2))
        .select("event_type", F.col("adev").alias("mad"))
    )
    flagged = dev.join(F.broadcast(mad), "event_type").withColumn(
        "anom", F.col("adev") > ANOM_K * F.greatest(F.col("mad"), F.lit(1))
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.min("med").cast("long").alias("median_cnt"),
            F.min("mad").cast("long").alias("mad_cnt"),
            F.sum(F.col("anom").cast("long")).cast("long").alias("n_anomalous"),
        )
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "x142_volume_anomaly",
        x142_volume_anomaly,
        f"""
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS cnt
          FROM events GROUP BY 1, 2),
        r1 AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY cnt, h) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM hourly),
        med AS (
          SELECT event_type, cnt AS med FROM r1 WHERE rn = CEIL(n / 2.0)),
        dev AS (
          SELECT r1.event_type, r1.h, r1.cnt, r1.n, ABS(r1.cnt - med.med) AS adev,
                 med.med
          FROM r1 JOIN med USING (event_type)),
        r2 AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY adev, h) AS rn2
          FROM dev),
        mad AS (
          SELECT event_type, adev AS mad FROM r2 WHERE rn2 = CEIL(n / 2.0))
        SELECT d.event_type AS event_type,
               COUNT(*) AS n_hours,
               CAST(MIN(d.med) AS BIGINT) AS median_cnt,
               CAST(MIN(m.mad) AS BIGINT) AS mad_cnt,
               CAST(SUM(CASE WHEN d.adev > {ANOM_K} * greatest(m.mad, 1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY 1 ORDER BY event_type
        """,
        "hourly event-volume anomaly flags via rank-selected median/MAD",
    )
)


# --- x143: effective dataset size under duplicate weighting ------------------
def x143_effective_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"How big is my dataset really": weight every document by the
    reciprocal of its exact-duplicate multiplicity (the doubled corpus
    guarantees multiplicity 2+) and report, per source, raw vs
    effective document and token counts — the honest denominator for
    epoch math and mixture weights after x01/x02-style dedup decides
    what survives.  One content-keyed count (the dedup shuffle), one
    multiplicity join back, one source rollup; weights are
    ROUND(1/n, 6) then decimal-summed (helpers rules 1+3)."""
    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionAll(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        )
    )
    base = doubled.select(
        "doc_id",
        "source",
        F.md5(F.col("text")).alias("content_key"),
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
    )
    mult = base.groupBy("content_key").agg(F.count(F.lit(1)).alias("n_copies"))
    weighted = base.join(mult, "content_key").select(
        "source",
        "n_toks",
        F.round(F.lit(1.0) / F.col("n_copies"), 6).alias("w"),
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("raw_docs"),
            F.sum(F.col("w").cast("decimal(30,10)")).cast("double").alias(
                "effective_docs"
            ),
            F.sum("n_toks").cast("long").alias("raw_tokens"),
            F.sum((F.col("w") * F.col("n_toks")).cast("decimal(30,10)"))
            .cast("double")
            .alias("effective_tokens"),
        )
        .orderBy("source")
    )


register(
    QuerySpec(
        "x143_effective_size",
        x143_effective_size,
        """
        WITH doubled AS (
          SELECT doc_id, text, source FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text, source FROM documents),
        base AS (
          SELECT doc_id, source, md5(text) AS content_key,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          FROM doubled),
        mult AS (
          SELECT content_key, COUNT(*) AS n_copies FROM base GROUP BY 1),
        weighted AS (
          SELECT b.source, b.n_toks,
                 ROUND(CAST(1.0 AS DOUBLE) / m.n_copies, 6) AS w
          FROM base b JOIN mult m USING (content_key))
        SELECT source, COUNT(*) AS raw_docs,
               CAST(CAST(SUM(CAST(w AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
                   AS effective_docs,
               CAST(SUM(n_toks) AS BIGINT) AS raw_tokens,
               CAST(CAST(SUM(CAST(w * n_toks AS DECIMAL(30,10))) AS VARCHAR)
                    AS DOUBLE) AS effective_tokens
        FROM weighted GROUP BY 1 ORDER BY source
        """,
        "raw vs duplicate-weighted effective dataset size per source",
    )
)


# --- x144: contrastive training-pair construction ----------------------------
NEG_BUCKET_OFFSET = 50  # negative = representative of bucket (b+50) % 100
def x144_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive-learning triplets: for every anchor
    document, a POSITIVE built by augmentation (the first-half token
    crop — the standard "two views of one doc" trick) and a NEGATIVE
    drawn from a different hash bucket of the same language (semantically
    unrelated, topic-matched).  No RNG anywhere: the crop is a pure
    projection and the negative assignment routes through a
    (lang, bucket) lookup frame of at most langs x 100 rows, broadcast —
    so the same triplets regenerate on any cluster, which is what makes
    a contrastive dataset reproducible and resumable.  Output carries
    digests, not text, so the gate compares content identity exactly.

    Coverage is honest, not padded: an anchor whose (lang, bucket+50)
    cell is empty yields no triplet (338/500 anchors at sf0.01) — at
    corpus scale every cell is populated and coverage is total; a
    production variant would fall back to the nearest non-empty
    bucket."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    crop = F.concat_ws(
        " ", F.slice(toks, 1, F.ceil(F.size(toks) / 2).cast("int"))
    )
    base = docs.select(
        "doc_id",
        "lang",
        _bucket100(F.col("doc_id").cast("string")).alias("bkt"),
        F.md5(F.col("text")).alias("anchor_md5"),
        F.md5(crop).alias("pos_md5"),
    )
    reps = (
        base.groupBy("lang", "bkt")
        .agg(F.min("doc_id").alias("neg_id"))
        .select(
            F.col("lang").alias("neg_lang"),
            F.col("bkt").alias("neg_bkt"),
            "neg_id",
        )
    )
    neg_key = (F.col("bkt") + NEG_BUCKET_OFFSET) % 100
    paired = base.join(
        F.broadcast(reps),
        (F.col("lang") == F.col("neg_lang")) & (neg_key == F.col("neg_bkt")),
    ).select(
        "lang",
        F.col("doc_id").alias("anchor_id"),
        "anchor_md5",
        "pos_md5",
        "neg_id",
    )
    negs = base.select(
        F.col("doc_id").alias("neg_id"), F.col("anchor_md5").alias("neg_md5")
    )
    return (
        paired.join(F.broadcast(negs), "neg_id")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "lang", "anchor_md5", "pos_md5", "neg_id", "neg_md5")
        .orderBy("anchor_id")
    )


register(
    QuerySpec(
        "x144_contrastive_pairs",
        x144_contrastive_pairs,
        f"""
        WITH base AS (
          SELECT doc_id, lang,
                 {_sql_bucket100("CAST(doc_id AS VARCHAR)")} AS bkt,
                 md5(text) AS anchor_md5,
                 md5(array_to_string(
                     string_split(text, ' ')[1:CAST(CEIL(len(string_split(text, ' '))
                                                         / 2.0) AS BIGINT)],
                     ' ')) AS pos_md5
          FROM documents),
        reps AS (
          SELECT lang, bkt AS neg_bkt, MIN(doc_id) AS neg_id
          FROM base GROUP BY 1, 2)
        SELECT b.doc_id AS anchor_id, b.lang AS lang, b.anchor_md5, b.pos_md5,
               r.neg_id, n.anchor_md5 AS neg_md5
        FROM base b
        JOIN reps r ON b.lang = r.lang AND (b.bkt + {NEG_BUCKET_OFFSET}) % 100 = r.neg_bkt
        JOIN base n ON n.doc_id = r.neg_id
        WHERE r.neg_id <> b.doc_id
        ORDER BY anchor_id
        """,
        "deterministic contrastive triplets: crop positive + hash-bucket negative",
    )
)


# --- x145: language-profile similarity matrix --------------------------------
LANG_GRAM_W = 3  # character n-gram width, shared with the SQL oracle
def x145_lang_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How close the languages in the corpus are, as data: cosine
    similarity between per-language CHARACTER-trigram count vectors —
    the comparability matrix behind transfer/mixing decisions (and the
    sanity check that the langid field actually separates the corpus).
    Group-level profiles first (corpus-sized work is one
    (lang, gram)-keyed count), then the 5x5 matrix forms on the
    profile frame: gram-keyed self-join bounded by langs² per gram.
    Weights are exact integer counts; only the final cosine divides
    (ROUND-then-decimal-sum per helpers rules 1+3)."""
    docs = load_table(spark, sf_dir, "documents")
    # Guard the gram array for sub-width docs: Spark's descending-default
    # sequence(1, 0) would fabricate windows while DuckDB's
    # generate_series(1, 0) is empty — the ADVICE-r3 x78 divergence class.
    grams_arr = F.when(
        F.length("text") >= LANG_GRAM_W,
        F.transform(
            F.sequence(F.lit(1), F.length("text") - (LANG_GRAM_W - 1)),
            lambda i: F.col("text").substr(i, F.lit(LANG_GRAM_W)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("lang", F.explode(grams_arr).alias("g"))
    prof = grams.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("c"))
    norm = prof.groupBy("lang").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double")).alias("nrm")
    )
    a, b = prof.alias("a"), prof.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g")) & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("dot"))
    )
    na = norm.select(F.col("lang").alias("lang_a"), F.col("nrm").alias("nrm_a"))
    nb = norm.select(F.col("lang").alias("lang_b"), F.col("nrm").alias("nrm_b"))
    return (
        dots.join(F.broadcast(na), "lang_a")
        .join(F.broadcast(nb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "dot",
            F.round(
                F.col("dot").cast("double") / (F.col("nrm_a") * F.col("nrm_b")), 6
            ).alias("cos_sim"),
        )
        .orderBy("lang_a", "lang_b")
    )


register(
    QuerySpec(
        "x145_lang_similarity",
        x145_lang_similarity,
        f"""
        WITH grams AS (
          SELECT lang, unnest([substr(text, i, {LANG_GRAM_W})
                               FOR i IN generate_series(1, strlen(text)
                                                           - {LANG_GRAM_W - 1})]) AS g
          FROM documents),
        prof AS (SELECT lang, g, COUNT(*) AS c FROM grams GROUP BY 1, 2),
        nrm AS (SELECT lang, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nrm
                FROM prof GROUP BY 1),
        dots AS (
          SELECT a.lang AS lang_a, b.lang AS lang_b,
                 CAST(SUM(a.c * b.c) AS BIGINT) AS dot
          FROM prof a JOIN prof b ON a.g = b.g AND a.lang < b.lang
          GROUP BY 1, 2)
        SELECT lang_a, lang_b, dot,
               ROUND(dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM dots
        JOIN nrm na ON na.lang = lang_a
        JOIN nrm nb ON nb.lang = lang_b
        ORDER BY lang_a, lang_b
        """,
        "language-pair cosine similarity over character-trigram profiles",
    )
)


# --- x150: deterministic bootstrap confidence intervals ----------------------
BOOT_REPLICAS = 20
# hash-bucket thresholds approximating Poisson(1) draw counts
# (P(0)≈.37, P(1)≈.37, else 2) — the Poisson bootstrap's per-row weight,
# derandomized so every engine and every rerun draws the same resamples.
BOOT_P0, BOOT_P1 = 37, 74


def x150_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty quantification for corpus metrics without RNG state:
    a Poisson bootstrap of the per-type mean event value, with each
    row's per-replica weight drawn from md5(event_id # replica) buckets
    instead of a random stream.  The replica band (min..max of 20
    replica means) is the error bar a dashboard should print next to
    any sampled metric; derandomizing the draws is what makes the band
    reproducible across engines, reruns, and partitionings — the same
    property the x25 split and x123 epoch plan rely on.

    Scale: one ×B explode + a (type, replica)-keyed aggregate (types×B
    groups) + a type-keyed rollup.  Weighted sums go through decimals
    (helpers rule 1: w·value is row-local IEEE, the SUM is the
    order-sensitive step); replica means ROUND(·,6) before min/max."""
    ev = load_table(spark, sf_dir, "events")
    reps = ev.select(
        "event_id",
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(1), F.lit(BOOT_REPLICAS))).alias("b"),
    )
    draw = _bucket100(
        F.concat_ws("#", F.col("event_id").cast("string"), F.col("b").cast("string"))
    )
    w = (
        F.when(draw < BOOT_P0, F.lit(0))
        .when(draw < BOOT_P1, F.lit(1))
        .otherwise(F.lit(2))
        .cast("long")
    )
    per_rep = (
        reps.select("event_type", "b", w.alias("w"), (w * F.col("value")).alias("wv"))
        .groupBy("event_type", "b")
        .agg(
            F.sum("w").cast("long").alias("n_w"),
            F.sum(F.col("wv").cast("decimal(30,10)")).cast("double").alias("s_wv"),
        )
        .select(
            "event_type",
            F.round(F.col("s_wv") / F.col("n_w").cast("double"), 6).alias("m"),
        )
    )
    full = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_full"),
    )
    band = per_rep.groupBy("event_type").agg(
        F.min("m").alias("ci_lo"),
        F.max("m").alias("ci_hi"),
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
    )
    return (
        full.join(band, "event_type")
        .select("event_type", "n", "mean_full", "ci_lo", "ci_hi", "n_replicas")
        .orderBy("event_type")
    )


register(
    QuerySpec(
        "x150_bootstrap_ci",
        x150_bootstrap_ci,
        f"""
        WITH reps AS (
          SELECT event_id, event_type, value, UNNEST(generate_series(1,
                     {BOOT_REPLICAS})) AS b
          FROM events),
        wts AS (
          SELECT event_type, b, value,
                 CASE WHEN {_sql_bucket100("CAST(event_id AS VARCHAR) || '#' || CAST(b AS VARCHAR)")}
                          < {BOOT_P0} THEN 0
                      WHEN {_sql_bucket100("CAST(event_id AS VARCHAR) || '#' || CAST(b AS VARCHAR)")}
                          < {BOOT_P1} THEN 1
                      ELSE 2 END AS w
          FROM reps),
        per_rep AS (
          SELECT event_type, b,
                 ROUND(CAST(CAST(SUM(CAST(w * value AS DECIMAL(30,10)))
                            AS VARCHAR) AS DOUBLE)
                       / SUM(w), 6) AS m
          FROM wts GROUP BY 1, 2),
        fullm AS (
          SELECT event_type, COUNT(*) AS n,
                 ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS VARCHAR)
                            AS DOUBLE) / COUNT(*), 6) AS mean_full
          FROM events GROUP BY 1)
        SELECT f.event_type AS event_type, f.n, f.mean_full,
               MIN(p.m) AS ci_lo, MAX(p.m) AS ci_hi,
               CAST(COUNT(*) AS BIGINT) AS n_replicas
        FROM fullm f JOIN per_rep p USING (event_type)
        GROUP BY 1, 2, 3 ORDER BY event_type
        """,
        "derandomized Poisson-bootstrap band for per-type mean value",
    )
)


# --- x151: leave-one-source-out influence ------------------------------------
def x151_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which source moves the corpus metric: the jackknife
    leave-one-source-out mean of document token counts, computed purely
    from per-source partials — LOO_mean(s) = (S − S_s) / (N − n_s) —
    so the sensitivity audit costs ONE aggregation, not one rescan per
    source.  The x130 mergeability algebra applied in reverse:
    subtracting a partial is as exact as adding one.  Influence ranks
    tell a curator which source to investigate when the corpus metric
    shifts."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source", F.size(F.split("text", " ")).cast("long").alias("n_toks")
    )
    per_src = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("n_toks").cast("long").alias("s_s"),
    )
    totals = per_src.agg(
        F.sum("n_s").cast("long").alias("n_tot"),
        F.sum("s_s").cast("long").alias("s_tot"),
    )
    full_mean = F.round(F.col("s_tot").cast("double") / F.col("n_tot"), 6)
    loo_mean = F.round(
        (F.col("s_tot") - F.col("s_s")).cast("double")
        / (F.col("n_tot") - F.col("n_s")),
        6,
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_s",
            full_mean.alias("mean_full"),
            loo_mean.alias("mean_loo"),
            F.round(loo_mean - full_mean, 6).alias("influence"),
        )
        .orderBy("source")
    )


register(
    QuerySpec(
        "x151_source_influence",
        x151_source_influence,
        """
        WITH b AS (
          SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
          FROM documents),
        per_src AS (
          SELECT source, COUNT(*) AS n_s, CAST(SUM(n_toks) AS BIGINT) AS s_s
          FROM b GROUP BY 1),
        t AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_tot,
                     CAST(SUM(s_s) AS BIGINT) AS s_tot FROM per_src)
        SELECT source, n_s,
               ROUND(CAST(s_tot AS DOUBLE) / n_tot, 6) AS mean_full,
               ROUND(CAST(s_tot - s_s AS DOUBLE) / (n_tot - n_s), 6) AS mean_loo,
               ROUND(ROUND(CAST(s_tot - s_s AS DOUBLE) / (n_tot - n_s), 6)
                     - ROUND(CAST(s_tot AS DOUBLE) / n_tot, 6), 6) AS influence
        FROM per_src, t ORDER BY source
        """,
        "jackknife leave-one-source-out influence on the corpus token mean",
    )
)


# --- x152: token-weighted median document length -----------------------------
def x152_weighted_median_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where the TOKEN MASS lives, per language: the token-weighted
    median document length — the length L such that half the language's
    tokens come from documents of length ≤ L — alongside the plain
    doc-count median.  Sequence-length planning reads the weighted one
    (batches are built from tokens, not documents); a long-document tail
    moves it far above the count median.  Both are discrete
    rank/threshold selections over cumulative sums in (length, doc_id)
    order (the x135 no-interpolation rule), one lang-keyed window."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("len"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("len", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("lang")
    cum = base.select(
        "lang",
        "len",
        F.sum("len").over(w).alias("cum_toks"),
        F.row_number().over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("rn"),
        F.sum("len").over(wt).alias("tot_toks"),
        F.count(F.lit(1)).over(wt).alias("n_docs"),
    )
    # first row where the cumulative crosses half the mass / half the count
    wmed = (
        cum.filter(F.col("cum_toks") * 2 >= F.col("tot_toks"))
        .groupBy("lang")
        .agg(F.min("len").cast("long").alias("weighted_median_len"))
    )
    cmed = (
        cum.filter(F.col("rn") * 2 >= F.col("n_docs"))
        .groupBy("lang")
        .agg(F.min("len").cast("long").alias("count_median_len"))
    )
    stats = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len").cast("long").alias("total_tokens"),
    )
    return (
        stats.join(cmed, "lang")
        .join(wmed, "lang")
        .select(
            "lang", "n_docs", "total_tokens", "count_median_len", "weighted_median_len"
        )
        .orderBy("lang")
    )


register(
    QuerySpec(
        "x152_weighted_median_len",
        x152_weighted_median_len,
        """
        WITH b AS (
          SELECT lang, doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS len
          FROM documents),
        c AS (
          SELECT lang, len,
                 SUM(len) OVER (PARTITION BY lang ORDER BY len, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_toks,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY len, doc_id) AS rn,
                 SUM(len) OVER (PARTITION BY lang) AS tot_toks,
                 COUNT(*) OVER (PARTITION BY lang) AS n_docs
          FROM b),
        wmed AS (
          SELECT lang, CAST(MIN(len) AS BIGINT) AS weighted_median_len
          FROM c WHERE cum_toks * 2 >= tot_toks GROUP BY 1),
        cmed AS (
          SELECT lang, CAST(MIN(len) AS BIGINT) AS count_median_len
          FROM c WHERE rn * 2 >= n_docs GROUP BY 1),
        s AS (
          SELECT lang, COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS total_tokens
          FROM b GROUP BY 1)
        SELECT s.lang AS lang, s.n_docs, s.total_tokens,
               cmed.count_median_len, wmed.weighted_median_len
        FROM s JOIN cmed USING (lang) JOIN wmed USING (lang)
        ORDER BY lang
        """,
        "token-weighted vs count median document length per language",
    )
)


# --- x153: session entry/exit handoff matrix ---------------------------------
def x153_session_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How journeys begin and end: per user session (q26's 30-minute
    gap rule, shared constant), the (first event type, last event type)
    pair — aggregated into the handoff matrix product analytics reads
    to find entry points that never convert and exits that shouldn't
    happen.  One user-keyed sessionize window (q26's shuffle), one
    (session)-keyed first/last selection via rank, one bounded
    (types x types) rollup — x90's transition matrix looks at adjacent
    events; this looks at whole-session endpoints."""
    from .relational2 import SESSION_GAP_US

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("u"),
        F.sum(is_new).over(run).cast("long").alias("session_id"),
    )
    ws = Window.partitionBy("user_id", "session_id")
    ranked = sess.select(
        "user_id",
        "session_id",
        "event_type",
        F.row_number().over(ws.orderBy("u", "event_id")).alias("rn_a"),
        F.row_number().over(ws.orderBy(F.desc("u"), F.desc("event_id"))).alias(
            "rn_d"
        ),
        F.count(F.lit(1)).over(ws).alias("n_ev"),
    )
    firsts = ranked.filter(F.col("rn_a") == 1).select(
        "user_id",
        "session_id",
        F.col("event_type").alias("first_type"),
        "n_ev",
    )
    lasts = ranked.filter(F.col("rn_d") == 1).select(
        "user_id", "session_id", F.col("event_type").alias("last_type")
    )
    return (
        firsts.join(lasts, ["user_id", "session_id"])
        .groupBy("first_type", "last_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_ev").cast("long").alias("n_events"),
        )
        .orderBy("first_type", "last_type")
    )


def _x153_sql() -> str:
    from .relational2 import SESSION_GAP_US

    return f"""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS u,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events),
        s AS (
          SELECT user_id, event_id, event_type, u,
                 SUM(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_US}
                          THEN 1 ELSE 0 END) OVER (
                     PARTITION BY user_id ORDER BY u, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM e),
        r AS (
          SELECT user_id, session_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                    ORDER BY u, event_id) AS rn_a,
                 ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                    ORDER BY u DESC, event_id DESC) AS rn_d,
                 COUNT(*) OVER (PARTITION BY user_id, session_id) AS n_ev
          FROM s)
        SELECT f.event_type AS first_type, l.event_type AS last_type,
               COUNT(*) AS n_sessions,
               CAST(SUM(f.n_ev) AS BIGINT) AS n_events
        FROM (SELECT * FROM r WHERE rn_a = 1) f
        JOIN (SELECT * FROM r WHERE rn_d = 1) l
          USING (user_id, session_id)
        GROUP BY 1, 2 ORDER BY first_type, last_type
    """


register(
    QuerySpec(
        "x153_session_handoff",
        x153_session_handoff,
        _x153_sql(),
        "session entry/exit event-type handoff matrix (q26 gap rule)",
    )
)


# --- x154: within-session event-type co-occurrence lift ----------------------
def x154_session_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis over sessions: for each event-type pair,
    the lift P(a,b together in a session) / (P(a)·P(b)) — above 1 the
    behaviors cluster, below 1 they repel — the signal behind "users
    who X also Y" features.  Sessionize once (q26's user-keyed window,
    shared gap constant), reduce each session to its DISTINCT type set
    (≤ types rows per session), and the pair join is bounded by types²
    per session regardless of session length.  Counts are exact
    integers; the lift ratio is one rounded row-local division against
    a broadcast 1-row session total."""
    from .relational2 import SESSION_GAP_US

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stypes = (
        ev.select(
            "user_id",
            "event_type",
            F.sum(is_new).over(run).cast("long").alias("session_id"),
        )
        .select("user_id", "session_id", "event_type")
        .distinct()
    )
    totals = stypes.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    per_type = stypes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_a")
    )
    a, b = stypes.alias("a"), stypes.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_id") == F.col("b.session_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = per_type.select(F.col("event_type").alias("type_a"), F.col("n_a").alias("na"))
    tb = per_type.select(F.col("event_type").alias("type_b"), F.col("n_a").alias("nb"))
    lift = F.round(
        F.col("n_both").cast("double")
        * F.col("n_sessions").cast("double")
        / (F.col("na").cast("double") * F.col("nb").cast("double")),
        6,
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(totals))
        .select("type_a", "type_b", "n_both", lift.alias("lift"))
        .orderBy("type_a", "type_b")
    )


def _x154_sql() -> str:
    from .relational2 import SESSION_GAP_US

    return f"""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS u,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events),
        s AS (
          SELECT DISTINCT user_id, event_type,
                 SUM(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_US}
                          THEN 1 ELSE 0 END) OVER (
                     PARTITION BY user_id ORDER BY u, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM e),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
              FROM (SELECT DISTINCT user_id, session_id FROM s)),
        pt AS (SELECT event_type, COUNT(*) AS n_a FROM s GROUP BY 1),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 COUNT(*) AS n_both
          FROM s a JOIN s b
            ON a.user_id = b.user_id AND a.session_id = b.session_id
           AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT type_a, type_b, n_both,
               ROUND(CAST(n_both AS DOUBLE) * t.n_sessions
                     / (ta.n_a * CAST(tb.n_a AS DOUBLE)), 6) AS lift
        FROM pairs
        JOIN pt ta ON ta.event_type = type_a
        JOIN pt tb ON tb.event_type = type_b
        CROSS JOIN t
        ORDER BY type_a, type_b
    """


register(
    QuerySpec(
        "x154_session_lift",
        x154_session_lift,
        _x154_sql(),
        "within-session event-type co-occurrence lift (market-basket over sessions)",
    )
)


# --- x155: content-novelty decay over ingest order ---------------------------
def x155_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is a source still yielding new content?  Per source, the novelty
    rate (fraction of a document's distinct shingles never seen in any
    EARLIER document of that source, doc_id = ingest order) for the
    early vs late half of the source's stream — a dropping rate is the
    crawl-scheduler signal to visit less often.  First-seen attribution
    is one (source, shingle)-keyed MIN(doc_id) aggregate; no
    per-document rescans of history, which is what makes the metric
    computable incrementally at crawl scale."""
    from .quality import _shingles

    docs = load_table(spark, sf_dir, "documents")
    posting = docs.select(
        "source",
        "doc_id",
        F.explode(_shingles(F.col("text"), 3, True)).alias("sh"),
    )
    first = posting.groupBy("source", "sh").agg(
        F.min("doc_id").alias("first_doc")
    )
    per_doc = (
        posting.join(first, ["source", "sh"])
        .groupBy("source", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    half = Window.partitionBy("source")
    ranked = per_doc.withColumn(
        "is_late",
        F.row_number().over(half.orderBy("doc_id")) * 2
        > F.count(F.lit(1)).over(half),
    )
    return (
        ranked.groupBy("source", "is_late")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sh").cast("long").alias("n_shingles"),
            F.sum("n_novel").cast("long").alias("n_novel"),
        )
        .select(
            "source",
            "is_late",
            "n_docs",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("source", "is_late")
    )


def _x155_sql() -> str:
    from .quality import _sql_shingles

    return f"""
        WITH tl AS (SELECT source, doc_id, string_split(text, ' ') AS t
                    FROM documents),
        posting AS (
          SELECT source, doc_id, unnest({_sql_shingles(3, True)}) AS sh FROM tl),
        first AS (
          SELECT source, sh, MIN(doc_id) AS first_doc
          FROM posting GROUP BY 1, 2),
        per_doc AS (
          SELECT p.source, p.doc_id, COUNT(*) AS n_sh,
                 CAST(SUM(CASE WHEN p.doc_id = f.first_doc THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_novel
          FROM posting p JOIN first f USING (source, sh)
          GROUP BY 1, 2),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) * 2
                    > COUNT(*) OVER (PARTITION BY source) AS is_late
          FROM per_doc)
        SELECT source, is_late, COUNT(*) AS n_docs,
               CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
               CAST(SUM(n_novel) AS BIGINT) AS n_novel,
               ROUND(SUM(n_novel) / CAST(SUM(n_sh) AS DOUBLE), 6) AS novelty_rate
        FROM ranked GROUP BY 1, 2 ORDER BY source, is_late
    """


register(
    QuerySpec(
        "x155_novelty_decay",
        x155_novelty_decay,
        _x155_sql(),
        "per-source novelty rate, early vs late ingest half (crawl-revisit signal)",
    )
)


# --- x156: inter-arrival burstiness per user ---------------------------------
def x156_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal behavior classification: per user, the coefficient of
    variation of inter-event gaps (CV = std/mean; ~1 for a memoryless
    Poisson visitor, >1 bursty, <1 regular) — the feature that
    separates schedulers and bots from humans in the event log.  Gaps
    are floored to whole seconds (micro-precision squared gaps would
    overflow BIGINT under ANSI; second resolution is the behavioral
    scale anyway), so both moments are exact BIGINT sums and the CV is
    a fixed IEEE sequence over bit-identical inputs; rounds per rule
    3."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = F.floor((us - F.lag(us).over(w)) / F.lit(1_000_000)).alias("gap")
    gaps = ev.select("user_id", gap).filter(F.col("gap").isNotNull())
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").cast("long").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_gaps")
    var = F.col("s2").cast("double") / F.col("n_gaps") - mean * mean
    return (
        agg.filter(F.col("n_gaps") >= 2)
        .select(
            "user_id",
            "n_gaps",
            F.round(mean, 6).alias("mean_gap_s"),
            F.round(F.sqrt(var) / mean, 6).alias("cv"),
        )
        .orderBy("user_id")
    )


register(
    QuerySpec(
        "x156_user_burstiness",
        x156_user_burstiness,
        """
        WITH g AS (
          SELECT user_id,
                 (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
                     AS gap
          FROM events),
        a AS (
          SELECT user_id, COUNT(*) AS n_gaps,
                 CAST(SUM(gap) AS BIGINT) AS s1,
                 CAST(SUM(gap * gap) AS BIGINT) AS s2
          FROM g WHERE gap IS NOT NULL GROUP BY 1)
        SELECT user_id, n_gaps,
               ROUND(CAST(s1 AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
               ROUND(sqrt(CAST(s2 AS DOUBLE) / n_gaps
                          - (CAST(s1 AS DOUBLE) / n_gaps)
                            * (CAST(s1 AS DOUBLE) / n_gaps))
                     / (CAST(s1 AS DOUBLE) / n_gaps), 6) AS cv
        FROM a WHERE n_gaps >= 2 ORDER BY user_id
        """,
        "per-user inter-arrival burstiness (CV of gaps) from exact integer moments",
    )
)


# --- x157: user-activity concentration (Lorenz points) -----------------------
def x157_activity_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated the event volume is: Lorenz-curve points over
    users ordered by activity — "the busiest X% of users generate Y% of
    events", the skew economics behind capacity planning and abuse
    review (x94 profiles join keys; this profiles the population).
    Built scalably as count-of-counts: one user-keyed count, then a
    count-value histogram (bounded distinct values), with the
    cumulative shares computed on that tiny frame descending — the
    x128/x138 aggregate-then-plan shape again; no global sort of
    users."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    hist = per_user.groupBy("c").agg(F.count(F.lit(1)).alias("n_users"))
    totals = hist.agg(
        F.sum("n_users").cast("long").alias("tot_users"),
        F.sum(F.col("c") * F.col("n_users")).cast("long").alias("tot_events"),
    )
    w = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hist.withColumn("cum_users", F.sum("n_users").over(w).cast("long"))
        .withColumn(
            "cum_events", F.sum(F.col("c") * F.col("n_users")).over(w).cast("long")
        )
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("c").cast("long").alias("events_per_user"),
            F.col("n_users").cast("long").alias("n_users"),
            F.round(
                F.col("cum_users").cast("double") / F.col("tot_users"), 6
            ).alias("cum_user_frac"),
            F.round(
                F.col("cum_events").cast("double") / F.col("tot_events"), 6
            ).alias("cum_event_frac"),
        )
        .orderBy(F.desc("events_per_user"))
    )


register(
    QuerySpec(
        "x157_activity_concentration",
        x157_activity_concentration,
        """
        WITH pu AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
        h AS (SELECT c, COUNT(*) AS n_users FROM pu GROUP BY 1),
        t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tot_users,
                     CAST(SUM(c * n_users) AS BIGINT) AS tot_events FROM h)
        SELECT CAST(c AS BIGINT) AS events_per_user,
               CAST(n_users AS BIGINT) AS n_users,
               ROUND(CAST(SUM(n_users) OVER (ORDER BY c DESC
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / t.tot_users, 6) AS cum_user_frac,
               ROUND(CAST(SUM(c * n_users) OVER (ORDER BY c DESC
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / t.tot_events, 6) AS cum_event_frac
        FROM h, t
        ORDER BY events_per_user DESC
        """,
        "user-activity Lorenz points from count-of-counts (no user sort)",
    )
)
