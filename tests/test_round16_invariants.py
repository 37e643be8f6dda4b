"""Round-16 invariants: the perceptual-dHash store-dedup policy arrow
(x283 decide + x284 routed serve) exercised on BOTH branches — the
driver's gate corpus is hash-clustered by construction (consecutive
doc_ids collide heavily under dHash), so it always decides 'dedup'; the
hold branch needs a purpose-built corpus of pairwise-distinct-hash
images, assembled here by the same greedy scan a retuned pixel law
would re-run (no hardcoded id list to go stale)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _distinct_hash_ids(n: int) -> list[int]:
    """First n doc_ids (scanning from 0) whose fixture images have
    pairwise-distinct dHashes — reclaimable bytes exactly 0."""
    from json_to_parquet_spark.operators.media import (
        decode_image_pixels,
        dhash_bands,
        make_image,
    )

    seen: set[tuple[int, ...]] = set()
    out: list[int] = []
    d = 0
    while len(out) < n:
        w, h, _c, rgb = decode_image_pixels(make_image(d, "ppm"))
        key = tuple(dhash_bands(w, h, rgb))
        if key not in seen:
            seen.add(key)
            out.append(d)
        d += 1
        assert d < 100_000, "pixel law no longer admits distinct hashes"
    return out


@pytest.fixture(scope="module")
def distinct_docs_src(tmp_path_factory):
    """documents table whose images all hash differently: reclaim_bp is
    exactly 0, so x283 must decide 'hold'."""
    src = str(tmp_path_factory.mktemp("dhash_hold") / "src_r16")
    os.makedirs(src, exist_ok=True)
    ids = _distinct_hash_ids(40)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([f"doc {d}" for d in ids]),
                "source": pa.array(["fixture"] * len(ids)),
                "n_chars": pa.array([6] * len(ids), pa.int64()),
            }
        ),
        os.path.join(src, "documents.parquet"),
    )
    return src


def test_x283_gate_corpus_decides_dedup(spark, sf_dir):
    from json_to_parquet_spark.queries.multimodal import (
        DHASH_RECLAIM_BP,
        x283_media_dedup_policy,
    )

    r = x283_media_dedup_policy(spark, sf_dir).collect()[0]
    assert r.decision == "dedup"
    assert r.reclaim_bp >= DHASH_RECLAIM_BP
    assert r.thr_bp == DHASH_RECLAIM_BP
    assert 0 < r.reclaimable_bytes < r.total_bytes


def test_x283_hold_branch_decides_hold(spark, distinct_docs_src):
    from json_to_parquet_spark.queries.multimodal import (
        x283_media_dedup_policy,
    )

    r = x283_media_dedup_policy(spark, distinct_docs_src).collect()[0]
    assert r.decision == "hold"
    assert r.reclaimable_bytes == 0 and r.reclaim_bp == 0
    assert r.n_objects == 40


def test_x284_hold_branch_stores_everything(spark, distinct_docs_src):
    """Under 'hold' the manifest is the identity store: every logical
    ref is its own stored object, byte-for-byte."""
    from json_to_parquet_spark.queries.multimodal import (
        x284_policy_routed_media_store,
    )

    rows = x284_policy_routed_media_store(
        spark, distinct_docs_src
    ).collect()
    assert rows and all(r.decision == "hold" for r in rows)
    assert all(r.n_objects == r.n_logical_refs for r in rows)
    assert all(r.stored_bytes == r.logical_bytes for r in rows)
    assert sum(r.n_objects for r in rows) == 40


def test_x284_dedup_branch_matches_x281(spark, sf_dir):
    """Under 'dedup' the shard manifest must reconcile exactly with the
    survivor-level execute (x281): same object count, same ref count,
    and the stored/logical gap equals the reclaimed bytes."""
    from json_to_parquet_spark.queries.multimodal import (
        x281_dhash_dedup_survivors,
        x284_policy_routed_media_store,
    )

    manifest = x284_policy_routed_media_store(spark, sf_dir).collect()
    assert manifest and all(r.decision == "dedup" for r in manifest)
    survivors = x281_dhash_dedup_survivors(spark, sf_dir).collect()
    assert sum(r.n_objects for r in manifest) == len(survivors)
    assert sum(r.n_logical_refs for r in manifest) == sum(
        r.n_members for r in survivors
    )
    assert sum(r.logical_bytes - r.stored_bytes for r in manifest) == sum(
        r.bytes_reclaimed for r in survivors
    )


def test_x285_streaming_decision_equals_batch(spark, sf_dir):
    """The drained per-hash partials must compose to exactly the batch
    policy row — decision, basis points, and every byte count."""
    from json_to_parquet_spark.queries.multimodal import (
        x283_media_dedup_policy,
    )
    from json_to_parquet_spark.queries.streaming_gate import (
        x285_stream_media_dedup_policy,
    )

    got = x285_stream_media_dedup_policy(spark, sf_dir).collect()
    want = x283_media_dedup_policy(spark, sf_dir).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_x286_coverage_complete_and_pairs_bounded(spark, sf_dir):
    """On the gate corpus the audit must show full DOC coverage (every
    doc with a true near-dup linked to ≥ 1 candidate partner) while
    PAIR recall stays partial — the capacity cap refusing quadratic
    pair mass is the designed behavior, and candidates are a subset of
    truth by construction."""
    from json_to_parquet_spark.queries.multimodal import (
        x286_dhash_recall_audit,
    )

    r = x286_dhash_recall_audit(spark, sf_dir).collect()[0]
    assert r.doc_coverage_bp == 10000
    assert r.n_covered_docs == r.n_truth_docs > 0
    assert 0 < r.n_cand_pairs <= r.n_truth_pairs
    assert r.pair_recall_bp < 10000
