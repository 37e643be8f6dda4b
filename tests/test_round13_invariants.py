"""Round-13 invariants: facts the round-11-builder queries' oracles
cannot express — physical byte-identity of cold lexicon buckets under
the x256 vocabulary swap (the x227 discipline applied to the
tokenizer), ledger/execution coherence for x257, and the no-op swap
path (zero changed words must leave the whole store untouched)."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F


def _file_hashes(root):
    """{relative_path: sha256} over every data file under ``root``,
    excluding marker files (recreated per write)."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith("_") or f.startswith("."):
                continue
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = hashlib.sha256(
                open(p, "rb").read()
            ).hexdigest()
    return out


def _bucket_of(relpath):
    part = relpath.split("/")[0]
    assert part.startswith("bucket=")
    return int(part.split("=", 1)[1])


def test_x256_swap_is_incremental(spark, sf_dir, tmp_path):
    """VERDICT r10 ask #2: after phase 1 (base lexicon) and phase 2
    (hot-bucket migration), every COLD bucket's data files are
    byte-identical to their phase-1 state, every HOT bucket's partition
    was physically replaced, and the merged store holds EXACTLY the
    retrained-rules encoding of every full-corpus word."""
    from json_to_parquet_spark.queries.tokenizer import (
        _lexicon_frame,
        _retok_migrate_hot,
        _retok_write_base,
        _word_bucket,
    )

    dest = str(tmp_path / "lex")
    _retok_write_base(spark, sf_dir, dest)
    before = _file_hashes(dest)

    full = (
        _lexicon_frame(spark, sf_dir, "full")
        .withColumn("bucket", _word_bucket(F.col("word")))
        .collect()
    )
    hot = {r.bucket for r in full if r.changed == 1}
    cold = {r.bucket for r in full} - hot
    assert hot and cold, "fixture must exercise both branches"

    _retok_migrate_hot(spark, sf_dir, dest)
    after = _file_hashes(dest)

    cold_before = {p: h for p, h in before.items() if _bucket_of(p) not in hot}
    cold_after = {p: h for p, h in after.items() if _bucket_of(p) not in hot}
    assert cold_before == cold_after  # cold files byte-untouched
    hot_before = {p for p in before if _bucket_of(p) in hot}
    hot_after = {p for p in after if _bucket_of(p) in hot}
    assert hot_before.isdisjoint(hot_after)  # hot partitions replaced

    # merged store == the full-rules lexicon, word for word
    got = {
        r.word: (r.toks, r.n_toks)
        for r in spark.read.parquet(dest).collect()
    }
    want = {r.word: (r.toks, r.n_toks) for r in full}
    assert got == want


def test_x256_noop_swap_touches_nothing(spark, tmp_path):
    """A retrain whose rules change NO word's encoding (here: an empty
    ingestion slice — no doc_id ≡ 3 mod BPE_CDC_MOD) must leave every
    phase-1 file byte-identical and still drop the migration marker."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from json_to_parquet_spark.queries.tokenizer import (
        BPE_CDC_MOD,
        _retok_migrate_hot,
        _retok_write_base,
    )

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    ids = [i for i in range(40) if i % BPE_CDC_MOD != 3]
    texts = [f"alpha beta gamma doc{i % 5} alpha" for i in ids]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(src, "documents.parquet"),
    )
    dest = str(tmp_path / "lex")
    _retok_write_base(spark, src, dest)
    before = _file_hashes(dest)
    _retok_migrate_hot(spark, src, dest)
    assert os.path.exists(os.path.join(dest, "_RETOK_MIGRATED"))
    assert _file_hashes(dest) == before  # nothing rewritten anywhere


def test_x257_ledger_matches_x256_store(spark, sf_dir):
    """Plan/execution coherence (the x232↔x227 discipline): x257's
    declarative ledger must equal the physical facts of the store x256
    serves — total rows, rows sitting in rewritten (hot) partitions,
    rows preserved in cold partitions."""
    from json_to_parquet_spark.queries.tokenizer import (
        bpe_lexicon_path,
        x257_retok_io_plan,
    )

    ledger = x257_retok_io_plan(spark, sf_dir).collect()[0]
    store = spark.read.parquet(bpe_lexicon_path(spark, sf_dir))
    per_bucket = {
        r.bucket: r.cnt
        for r in store.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert sum(per_bucket.values()) == ledger.n_words
    assert (
        ledger.n_buckets_hot + ledger.n_buckets_cold == len(per_bucket)
    )
    assert ledger.words_rewritten + ledger.words_preserved == ledger.n_words
    assert 0 <= ledger.n_changed <= ledger.words_rewritten
    assert 0 <= ledger.n_docs_retok <= ledger.n_docs
