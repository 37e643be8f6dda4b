"""Clustered embedding fixture — the shape of REAL embedding corpora.

The driver's synthetic embeddings are near-uniform, on which the IVF
family's deterministic first-n-vectors coarse quantizer is naturally
balanced (x217's conservation/balance invariants pass trivially).  Real
embedding corpora are CLUSTERED and SKEWED: a few dominant modes (one
crawl source, one language, one template family) plus a long tail.
VERDICT r8 ask #1: measure the seed quantizer's degradation on that
shape, and the Lloyd refinement's (x228/x229) recovery.

Deterministic throughout (seeded NumPy Philox), schema identical to the
driver's embeddings table (vec_id BIGINT, embedding FLOAT[], label
INTEGER), vec_id a seeded shuffle so the first-n "sample" is ingestion-
order realistic rather than blob-sorted.
"""

from __future__ import annotations

import os

import numpy as np

DIM = 64
# heavily skewed blob weights — one dominant mode + a tail, the
# empirically common corpus shape (power-law-ish source mix)
BLOB_WEIGHTS = (0.50, 0.20, 0.10, 0.08, 0.05, 0.03, 0.02, 0.02)
CENTER_SPREAD = 5.0  # blob centers ~ N(0, 5) per dim: well-separated
WITHIN_STD = 0.5     # tight blobs: 10:1 separation-to-spread


def write_clustered_embeddings(
    dest_dir: str,
    n: int = 2000,
    seed: int = 9,
    concentrate_deletes: bool = False,
) -> str:
    """Write ``<dest_dir>/<params>/embeddings.parquet`` with ``n``
    vectors drawn from skewed Gaussian blobs; returns the params-keyed
    directory.  The key encodes EVERY generation parameter (n, seed,
    dim, and a digest of the blob-shape constants) so a later-round
    change to any of them forces a rebuild instead of silently reusing
    a stale cached parquet (ADVICE r9).

    ``concentrate_deletes`` re-deals the vec_ids so every id matching
    the family's shared delete rule (vec_id % TOMB_MOD == 2) lands in
    the DOMINANT blob — deleting hub-region nodes is exactly what
    bends a greedy walk that keeps dead nodes as waypoints (VERDICT
    r11 ask #4); the dominant blob holds 50% of the corpus, so its
    dead fraction (~2·TOMB rate ≈ 29%) crosses the TOMB_PCT=15
    compaction bar while every tail blob stays at 0%."""
    import hashlib

    shape = repr((DIM, BLOB_WEIGHTS, CENTER_SPREAD, WITHIN_STD))
    token = hashlib.sha256(shape.encode()).hexdigest()[:8]
    tomb = "_tombblob" if concentrate_deletes else ""
    keyed = os.path.join(dest_dir, f"n{n}_seed{seed}_{token}{tomb}")
    path = os.path.join(keyed, "embeddings.parquet")
    if os.path.exists(path):
        return keyed
    os.makedirs(keyed, exist_ok=True)
    rng = np.random.Generator(np.random.Philox(seed))
    k = len(BLOB_WEIGHTS)
    centers = rng.normal(0.0, CENTER_SPREAD, size=(k, DIM))
    counts = rng.multinomial(n, BLOB_WEIGHTS)
    labels = np.repeat(np.arange(k), counts)
    points = centers[labels] + rng.normal(0.0, WITHIN_STD, size=(n, DIM))
    order = rng.permutation(n)  # ingestion shuffle: vec_id ⊥ blob
    points, labels = points[order], labels[order]
    if concentrate_deletes:
        from json_to_parquet_spark.queries.similarity import TOMB_MOD

        dead_ids = [i for i in range(n) if i % TOMB_MOD == 2]
        live_ids = [i for i in range(n) if i % TOMB_MOD != 2]
        dom_rows = [i for i, lb in enumerate(labels) if lb == 0]
        other_rows = [i for i, lb in enumerate(labels) if lb != 0]
        assert len(dead_ids) <= len(dom_rows), "dominant blob too small"
        # deal: dead ids onto dominant-blob rows, live ids onto the rest
        row_order = dom_rows[: len(dead_ids)] + (
            dom_rows[len(dead_ids):] + other_rows
        )
        id_order = dead_ids + live_ids
        inv = np.empty(n, dtype=np.int64)
        inv[np.asarray(id_order)] = np.asarray(row_order)
        points, labels = points[inv], labels[inv]

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row for row in points.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(table, path)
    return keyed
