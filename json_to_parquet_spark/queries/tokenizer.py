"""Tokenizer-training operators — the distributed half of building a BPE
vocabulary over a training corpus, plus temperature-based language
rebalancing of the corpus itself.

The reference (`/root/reference/`) is a schema-driven NDJSON→Parquet
converter with no text surface at all; these operators are part of the
driver-mandated LLM-pipeline extension (repo:BASELINE.json north_star,
SURVEY §2.C X4). x16 counts tokens with a FIXED BPE-ish regex; x46/x47
build and apply a unigram vocab. x101 closes the remaining gap: it
LEARNS merge rules from corpus statistics — the actual BPE training
inner loop (Sennrich et al. 2016), run as unrolled Spark plans.

Cross-engine determinism (`helpers.py` rules): every count is integer,
the argmax tiebreak is total (count desc, then pair lexicographic), and
the pair-merge is plain substring replacement with identical
leftmost-non-overlapping semantics in Java's `String.replace` and
DuckDB's `replace` (verified: ' a  b  a  b ' → ' ab  ab ' in both).

Scale notes (100 TB posture):
- x101 touches the corpus ONCE (word count: one token-keyed shuffle,
  open vocabulary, partial aggregation map-side). Every merge iteration
  then runs over the VOCABULARY frame (distinct words + counts) — for
  web-scale text that is millions of rows where the corpus is billions,
  so the per-iteration pair-count shuffle is vocab-sized, not
  corpus-sized. The chosen pair is a 1-row broadcast into the rewrite.
  This is exactly how production BPE trainers scale (word-count first,
  then iterate on the frequency table).
- x106's per-language stats frame is label-cardinality-sized; the only
  corpus-sized operations are one group-count and one WindowGroupLimit
  selection (top-quota per language retained map-side before the
  shuffle, same shape as x72).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import QuerySpec, register

# --- x101: BPE merge-rule training -------------------------------------------
BPE_MERGES = 3  # unrolled merge iterations (each = one vocab-sized agg)


def _wrapped_chars(word) -> F.Column:
    """Initial BPE symbol string: each character wrapped in single spaces,
    so adjacent symbols are separated by a DOUBLE space —
    'abc' → ' a  b  c '. The wrap makes greedy pair-merge a plain
    substring replace (' a  b ' → ' ab ') that preserves the invariant
    and, crucially, leaves neighbouring symbols' separators intact so
    consecutive occurrences still match (' a  b  a  b ' → ' ab  ab ')."""
    return F.concat(
        F.lit(" "),
        F.array_join(F.regexp_extract_all(word, F.lit("."), 0), "  "),
        F.lit(" "),
    )


def x101_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first BPE_MERGES byte-pair-encoding merge rules from the
    corpus: iteratively find the most frequent adjacent symbol pair
    (weighted by word frequency, ties broken lexicographically) and merge
    it everywhere. Returns one row per learned rule: (iter, w1, w2,
    merged, pair_cnt).

    The corpus is scanned once (word frequencies); all BPE_MERGES
    iterations run over the distinct-word frame. Each iteration is one
    vocab-keyed pair-count aggregation plus a 1-row argmax broadcast into
    a substring-replace rewrite — no corpus re-scan, no collect (the
    argmax stays a DataFrame, joined in as a broadcast)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # (word-frequency, symbol-string) frame the iterations rewrite.
    syms = words.select("cnt", _wrapped_chars(F.col("word")).alias("sym")).persist()

    rule_frames = []
    for it in range(1, BPE_MERGES + 1):
        t = F.split(F.trim(F.col("sym")), "  ")
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
            ),
        )
        # ANSI guard (the x78 lesson): 1-symbol words produce
        # sequence(1, 0) = [1, 0] under the default negative step, whose
        # element_at(t, 0) throws — filter them out first; DuckDB's
        # generate_series(1, 0) is empty so both engines see no pairs.
        pair_counts = (
            syms.filter(F.size(t) >= 2)
            .select("cnt", F.explode(pairs).alias("p"))
            .groupBy("p.w1", "p.w2")
            .agg(F.sum("cnt").alias("pair_cnt"))
        )
        best = pair_counts.orderBy(
            F.desc("pair_cnt"), F.asc("w1"), F.asc("w2")
        ).limit(1)
        rule_frames.append(
            best.select(
                F.lit(it).cast("long").alias("iter"),
                "w1",
                "w2",
                F.concat("w1", "w2").alias("merged"),
                F.col("pair_cnt").cast("long").alias("pair_cnt"),
            )
        )
        if it < BPE_MERGES:
            syms = syms.crossJoin(F.broadcast(best)).select(
                "cnt",
                F.replace(
                    F.col("sym"),
                    F.concat(F.lit(" "), "w1", F.lit("  "), "w2", F.lit(" ")),
                    F.concat(F.lit(" "), "w1", "w2", F.lit(" ")),
                ).alias("sym"),
            )

    out = rule_frames[0]
    for fr in rule_frames[1:]:
        out = out.unionAll(fr)
    return out.orderBy("iter")


def _x101_sql() -> str:
    """Unrolled DuckDB twin: identical word counts, identical pair
    extraction (x78's comprehension idiom), identical argmax tiebreak,
    identical replace-based merge."""

    def pair_cte(src: str, tag: str) -> str:
        return f"""
        t{tag} AS (SELECT cnt, string_split(trim(sym), '  ') AS t FROM {src}),
        p{tag} AS (
          SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS pair_cnt
          FROM (
            SELECT cnt,
                   unnest([{{'w1': t[i], 'w2': t[i+1]}}
                       FOR i IN generate_series(1, len(t)-1)],
                       recursive := true)
            FROM t{tag} WHERE len(t) >= 2)
          GROUP BY w1, w2),
        b{tag} AS (SELECT w1, w2, pair_cnt FROM p{tag}
                   ORDER BY pair_cnt DESC, w1, w2 LIMIT 1)"""

    ctes = ["""
        w0 AS (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                FROM documents)
          WHERE word <> '' GROUP BY word),
        s1 AS (
          SELECT cnt,
                 ' ' || array_to_string(regexp_extract_all(word, '.'), '  ')
                     || ' ' AS sym
          FROM w0)"""]
    for it in range(1, BPE_MERGES + 1):
        ctes.append(pair_cte(f"s{it}", str(it)))
        if it < BPE_MERGES:
            ctes.append(f"""
        s{it + 1} AS (
          SELECT s.cnt,
                 replace(s.sym, ' ' || b.w1 || '  ' || b.w2 || ' ',
                                ' ' || b.w1 || b.w2 || ' ') AS sym
          FROM s{it} s CROSS JOIN b{it} b)""")
    selects = "\n        UNION ALL ".join(
        f"SELECT CAST({it} AS BIGINT) AS iter, w1, w2, w1 || w2 AS merged, "
        f"pair_cnt FROM b{it}"
        for it in range(1, BPE_MERGES + 1)
    )
    return f"""
        WITH {",".join(ctes)}
        SELECT * FROM ({selects}) ORDER BY iter
        """


register(
    QuerySpec(
        "x101_bpe_train",
        x101_bpe_train,
        _x101_sql(),
        "learn the first BPE merge rules from corpus word frequencies",
    )
)


# --- x106: temperature-based language rebalancing ----------------------------
# UNIMAX/mC4-style alpha sampling: languages are drawn with probability
# proportional to n_l^ALPHA (ALPHA < 1 flattens the head, upsamples the
# tail).  Here ALPHA = 0.5, so weight = sqrt(n_l) — IEEE-exact in both
# engines.  The budget is half the corpus.
MIX_BUDGET_FRAC = 2  # budget = n_docs / MIX_BUDGET_FRAC


def x106_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature-resampled corpus manifest: per-language
    quotas ∝ n_l^0.5 over a budget of half the corpus, filled in
    md5-hash order (reproducible across runs/engines/partitionings, no
    RNG). Output: (doc_id, lang, pick, quota) for every selected doc.

    Shapes: one corpus group-count (tiny result), scalar budget and
    weight-sum via 1-row broadcasts, then one WindowGroupLimit selection
    — the per-language top-quota is retained map-side before the final
    shuffle, so the full corpus is never globally sorted."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    stats = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    # weight_l = ROUND(sqrt(n_l), 6): sqrt is exactly rounded (IEEE 754),
    # the ROUND makes the subsequent decimal sum engine-identical.
    weights = stats.select(
        "lang",
        "n_docs",
        F.round(F.sqrt(F.col("n_docs").cast("double")), 6).alias("w"),
    )
    totals = weights.agg(
        F.sum(F.col("w").cast("decimal(30,10)")).cast("double").alias("w_sum"),
        # floor() before the integer cast: DuckDB's double→int cast
        # ROUNDS while Spark's truncates, so an odd corpus count would
        # otherwise diverge by one.
        F.floor(F.sum("n_docs") / F.lit(MIX_BUDGET_FRAC)).cast("long").alias("budget"),
    )
    quotas = weights.crossJoin(F.broadcast(totals)).select(
        "lang",
        F.floor(F.col("w") / F.col("w_sum") * F.col("budget"))
        .cast("long")
        .alias("quota"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat_ws("|", F.col("lang"), F.col("doc_id"))), F.col("doc_id")
    )
    return (
        docs.join(F.broadcast(quotas), "lang")
        .select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("long").alias("pick"),
            "quota",
        )
        .filter(F.col("pick") <= F.col("quota"))
        .orderBy("lang", "pick")
    )


register(
    QuerySpec(
        "x106_temperature_mix",
        x106_temperature_mix,
        f"""
        WITH stats AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY lang),
        weights AS (
          SELECT lang, n_docs,
                 ROUND(sqrt(CAST(n_docs AS DOUBLE)), 6) AS w
          FROM stats),
        totals AS (
          SELECT CAST(CAST(SUM(CAST(w AS DECIMAL(30,10))) AS VARCHAR)
                      AS DOUBLE) AS w_sum,
                 CAST(floor(SUM(n_docs) / {MIX_BUDGET_FRAC}) AS BIGINT) AS budget
          FROM weights),
        quotas AS (
          SELECT lang,
                 CAST(floor(w / w_sum * budget) AS BIGINT) AS quota
          FROM weights CROSS JOIN totals),
        picked AS (
          SELECT d.doc_id, d.lang,
                 CAST(ROW_NUMBER() OVER (
                     PARTITION BY d.lang
                     ORDER BY md5(d.lang || '|' || CAST(d.doc_id AS VARCHAR)),
                              d.doc_id) AS BIGINT) AS pick,
                 q.quota
          FROM documents d JOIN quotas q ON d.lang = q.lang)
        SELECT doc_id, lang, pick, quota FROM picked
        WHERE pick <= quota
        ORDER BY lang, pick
        """,
        "temperature-based (alpha=0.5) per-language corpus rebalancing manifest",
    )
)
