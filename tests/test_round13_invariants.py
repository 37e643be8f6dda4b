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


def _localized_drift_fixture(dest_dir):
    """Embeddings engineered so the v·GAIN+OFFSET drift moves ONLY a
    radial sub-structure on axis 0 while 14 orthogonal blob cells stay
    put: centroid 0 sits at 20·e0 and centroid 15 at 33·e0 with three
    radial blobs (D@14 anchors the retrained centroid 0 near the
    movers, M@18 is the mover blob, B@28 keeps cell 15 populated and
    the stale layout skewed); orthogonal cells k=1..14 are tight blobs
    at 20·e_k.  Measured on this geometry: PSI≈0.29 (retrain fires),
    retrained max-pop 17 < stale 26 (adoption fires), 13 movers all
    between cells {0, 15}, 14 cells with identical membership."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 16
    rows = []
    for k in range(15):
        c = np.zeros(dim)
        c[k] = 20.0
        rows.append(c)
    c15 = np.zeros(dim)
    c15[0] = 33.0
    rows.append(c15)

    def blob(axis_val, axis, n):
        for _ in range(n):
            v = np.zeros(dim)
            v[axis] = axis_val
            rows.append(v)

    blob(14.0, 0, 4)
    blob(18.0, 0, 12)
    blob(28.0, 0, 12)
    for k in range(1, 15):
        blob(20.0, k, 2)
    arr = np.array(rows, dtype=np.float32)
    os.makedirs(dest_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(rows)), pa.int64()),
                "embedding": pa.array(
                    [r for r in arr], pa.list_(pa.float32())
                ),
                "label": pa.array(
                    (np.arange(len(rows)) % 2).astype(np.int32), pa.int32()
                ),
            }
        ),
        os.path.join(dest_dir, "embeddings.parquet"),
    )
    return dest_dir


def _cell_of(relpath):
    part = relpath.split("/")[0]
    assert part.startswith("cell=")
    return int(part.split("=", 1)[1])


def test_x260_reindex_is_incremental(spark, tmp_path):
    """VERDICT r10 ask #7: under LOCALIZED drift, the adopted re-index
    must rewrite only the cells a mover leaves or enters — every other
    cell's phase-1 data files stay byte-identical — and the migrated
    store's membership must equal the retrained assignment exactly.
    (The emptied-cell branch — a touched cell left with no members —
    shares x227's tested drop-the-directory idiom; this geometry keeps
    both touched cells populated.)"""
    from json_to_parquet_spark.queries.similarity import (
        _drift_new_layout,
        _drift_old_layout,
        _drift_reindex_migrate,
        _drift_reindex_write_base,
        x237_drift_retrain,
    )

    src = _localized_drift_fixture(str(tmp_path / "src"))
    assert (
        x237_drift_retrain(spark, src).collect()[0].adopted == "retrained"
    ), "fixture must trigger adoption"
    dest = str(tmp_path / "idx")
    _drift_reindex_write_base(spark, src, dest)
    before = _file_hashes(dest)

    old = {r.vec_id: r.cell for r in _drift_old_layout(spark, src).collect()}
    new = {r.vec_id: r.cell for r in _drift_new_layout(spark, src).collect()}
    movers = {v for v in old if old[v] != new[v]}
    touched = {old[v] for v in movers} | {new[v] for v in movers}
    untouched = (set(old.values()) | set(new.values())) - touched
    assert movers and untouched, "fixture must exercise both branches"

    _drift_reindex_migrate(spark, src, dest)
    after = _file_hashes(dest)

    cold_before = {p: h for p, h in before.items() if _cell_of(p) not in touched}
    cold_after = {p: h for p, h in after.items() if _cell_of(p) not in touched}
    assert cold_before == cold_after  # untouched cells byte-identical
    hot_before = {p for p in before if _cell_of(p) in touched}
    hot_after = {p for p in after if _cell_of(p) in touched}
    assert hot_before.isdisjoint(hot_after)  # touched partitions replaced

    got = {
        r.vec_id: r.cell for r in spark.read.parquet(dest).collect()
    }
    assert got == new  # migrated membership == the adopted assignment


def test_x261_ledger_matches_x260_store(spark, sf_dir):
    """Plan/execution coherence: x261's declarative ledger must equal
    the physical facts of the layout x260 serves — row totals, and the
    preserved-rows count recomputed from the store against the
    touched-cell set."""
    from json_to_parquet_spark.queries.similarity import (
        _drift_new_layout,
        _drift_old_layout,
        drift_index_path,
        x261_drift_reindex_io,
    )

    ledger = x261_drift_reindex_io(spark, sf_dir).collect()[0]
    store = spark.read.parquet(drift_index_path(spark, sf_dir))
    assert store.count() == ledger.n_vecs
    old = {r.vec_id: r.cell for r in _drift_old_layout(spark, sf_dir).collect()}
    new = {r.vec_id: r.cell for r in _drift_new_layout(spark, sf_dir).collect()}
    movers = {v for v in old if old[v] != new[v]}
    if ledger.adopted == "retrained":
        touched = {old[v] for v in movers} | {new[v] for v in movers}
        preserved = sum(1 for v in new if new[v] not in touched)
        assert ledger.n_movers == len(movers)
        assert ledger.rows_preserved == preserved
        got = {r.vec_id: r.cell for r in store.collect()}
        assert got == new
    else:
        assert ledger.n_movers == 0
        assert ledger.rows_preserved == ledger.n_vecs


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


def test_x262_serves_only_live_rows_with_contiguous_ranks(spark, sf_dir):
    """The tombstone serve's engine-side laws: no served row is a
    tombstoned vector, ranks are contiguous from 1 per query, and the
    result set equals x248's walk re-ranked after dropping dead rows
    (the mark-deleted semantics: the WALK is unchanged, only the
    returned rows are)."""
    from json_to_parquet_spark.queries.graph_ssl import (
        GBS_K,
        _beam_scored,
        x262_graph_tombstone_serve,
    )
    from json_to_parquet_spark.queries.similarity import TOMB_MOD

    rows = x262_graph_tombstone_serve(spark, sf_dir).collect()
    assert rows
    per_q: dict = {}
    for r in rows:
        assert r.vec_id % TOMB_MOD != 2, r
        per_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= GBS_K

    pool = {
        (r.q_id, r.vec_id): r.cos_sim
        for r in _beam_scored(spark, sf_dir).collect()
        if r.vec_id % TOMB_MOD != 2 and r.vec_id != r.q_id
    }
    for q in per_q:
        want = sorted(
            ((cs, v) for (qq, v), cs in pool.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )[: len(per_q[q])]
        got = sorted(
            ((r.cos_sim, r.vec_id) for r in rows if r.q_id == q),
            key=lambda t: (-t[0], t[1]),
        )
        assert got == want, q


def test_x263_compaction_laws(spark, sf_dir):
    """Engine-side laws of the tombstone compaction: both branches
    exercised; every surviving edge has LIVE endpoints; rebuilt cells
    carry dense ranks 1..k; kept edges are a subset of the build-once
    store's edges; and — the claim that makes threshold-compaction
    sound — the rebuilt cells' edges equal the FULL live-corpus
    rebuild's slice of those cells (ring placement is cell-local under
    the frozen quantizer)."""
    from json_to_parquet_spark.queries.graph_ssl import (
        KNNG_K,
        _quantizer_frames,
        _ring_half_pairs,
        _ring_place,
        _route_with_dist,
        _score_pairs,
        _topk_edges,
        knn_edges,
        x263_graph_tombstone_compact,
    )
    from json_to_parquet_spark.queries.similarity import TOMB_MOD

    rows = x263_graph_tombstone_compact(spark, sf_dir).collect()
    provs = {r.provenance for r in rows}
    assert provs == {"rebuilt", "kept"}, provs
    for r in rows:
        assert r.src_id % TOMB_MOD != 2 and r.dst_id % TOMB_MOD != 2, r
    per_src: dict = {}
    for r in rows:
        if r.provenance == "rebuilt":
            per_src.setdefault(r.src_id, []).append(r.rank)
    for s, ranks in per_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), s
        assert len(ranks) <= KNNG_K

    store = {
        (r.src_id, r.dst_id, r.rank)
        for r in knn_edges(spark, sf_dir).collect()
    }
    kept = {
        (r.src_id, r.dst_id, r.rank)
        for r in rows
        if r.provenance == "kept"
    }
    assert kept <= store

    # full live rebuild, sliced to the hot cells
    emb, _sup, _cs = _quantizer_frames(spark, sf_dir)
    routed = _route_with_dist(spark, sf_dir, emb)
    live = routed.filter(F.col("vec_id") % TOMB_MOD != 2)
    placed = _ring_place(live).localCheckpoint()
    half = _score_pairs(_ring_half_pairs(placed), emb).localCheckpoint()
    scored = half.unionAll(
        half.select(
            F.col("dst_id").alias("src_id"),
            F.col("src_id").alias("dst_id"),
            "cos_sim",
        )
    )
    full_live = (
        _topk_edges(scored)
        .join(
            placed.select(F.col("vec_id").alias("src_id"), "cell"),
            "src_id",
        )
        .collect()
    )
    hot_cells = {r.cell for r in rows if r.provenance == "rebuilt"}
    want = {
        (r.src_id, r.dst_id, r.rank, r.cos_sim)
        for r in full_live
        if r.cell in hot_cells
    }
    got = {
        (r.src_id, r.dst_id, r.rank, r.cos_sim)
        for r in rows
        if r.provenance == "rebuilt"
    }
    assert got == want


def test_x265_layout_matches_x170_plan(spark, sf_dir):
    """Plan/execution coherence for the warehouse OPTIMIZE: the
    compacted store holds exactly ONE data file per bin directory,
    each bin's physical row count equals x170's planned n_rows, and
    the rewrite actually shrank the file count (the point of the
    exercise)."""
    import glob

    from json_to_parquet_spark.queries.scale_layout import (
        compacted_events_path,
        events_partitioned_path,
        x170_compaction_plan,
    )

    plan = {
        r.bin: r.n_rows for r in x170_compaction_plan(spark, sf_dir).collect()
    }
    dest = compacted_events_path(spark, sf_dir)
    bins = sorted(glob.glob(os.path.join(dest, "bin=*")))
    assert len(bins) == len(plan)
    n_files_before = len(
        glob.glob(
            os.path.join(
                events_partitioned_path(spark, sf_dir), "d=*", "part-*"
            )
        )
    )
    n_files_after = 0
    for b in bins:
        data_files = [
            f
            for f in os.listdir(b)
            if not f.startswith(("_", "."))
        ]
        assert len(data_files) == 1, b  # one file per bin
        n_files_after += 1
    assert n_files_after < n_files_before  # compaction shrank the layout
    got = {
        r.bin: r.n_rows
        for r in spark.read.parquet(dest)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert got == plan
