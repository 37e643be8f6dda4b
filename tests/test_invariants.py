"""Set-level semantic invariants for the non-oracle operators (SURVEY §7d:
fixed seeds, assert properties rather than exact rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_to_parquet_spark.queries import registry
from json_to_parquet_spark.queries.dedup import minhash_signatures
from json_to_parquet_spark.sources.catalog import load_table


def test_minhash_exact_dups_have_identical_signatures(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    shifted = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    sig = minhash_signatures(docs.unionAll(shifted))
    rows = {r.doc_id: tuple(r.sig) for r in sig.collect()}
    for doc_id, s in rows.items():
        if doc_id < 100000 and doc_id + 100000 in rows:
            assert rows[doc_id + 100000] == s


def test_minhash_lsh_finds_all_injected_dups(spark, sf_dir):
    pairs = registry()["x09_minhash_lsh"].spark(spark, sf_dir)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    n_docs = load_table(spark, sf_dir, "documents").count()
    expected = {(i, i + 100000) for i in range(n_docs)}
    missing = expected - found
    assert not missing, f"LSH missed {len(missing)} injected exact dups"
    # exact dups estimate at 1.0
    exact = {(r.id_a, r.id_b): r.est_jaccard for r in pairs.collect()}
    assert all(exact[p] == 1.0 for p in expected)


def test_simhash_exact_dups_identical_and_neighbors_close(spark, sf_dir):
    df = registry()["x18_simhash"].spark(spark, sf_dir)
    rows = {r.doc_id: r.simhash for r in df.collect()}
    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    # fingerprint is 64-bit: some docs must use high bits (incl. sign bit)
    assert any(v < 0 for v in rows.values())


def test_lsh_ann_is_subset_of_exact_scores(spark, sf_dir):
    """Every ANN hit must carry the same cosine the exact path computes,
    and ANN results for a query live in the query's bucket only."""
    exact = {
        (r.q_id, r.vec_id): r.cos_sim
        for r in registry()["x11_cosine_topk"].spark(spark, sf_dir).collect()
    }
    ann = registry()["x20_lsh_ann_topk"].spark(spark, sf_dir).collect()
    assert len(ann) > 0
    for r in ann:
        if (r.q_id, r.vec_id) in exact:
            assert abs(exact[(r.q_id, r.vec_id)] - r.cos_sim) < 1e-9


def test_embedding_near_dup_recovers_injected_copies(spark, sf_dir):
    # sign-blocking must not lose a single injected exact copy: identical
    # vectors share the block by construction, so recall on them is exact
    ids = [
        r.vec_id
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id").collect()
    ]
    pairs = registry()["x19_embedding_near_dup"].spark(spark, sf_dir).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    expected = {(i, i + 10000) for i in ids}
    assert expected <= found
    for r in pairs:
        if (r.id_a, r.id_b) in expected:
            assert r.cos_sim == 1.0

def test_approx_percentile_within_rank_error(spark, sf_dir):
    """q59's sketch values must sit within the Greenwald-Khanna rank
    error (n / accuracy) of the exact percentiles — the property the
    sketch guarantees, checked per group against a full exact sort."""
    from json_to_parquet_spark.queries.relational3 import APPROX_ACC

    approx = {
        r.o_orderpriority: r
        for r in registry()["q59_approx_percentile"].spark(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    for prio, row in approx.items():
        vals = sorted(
            r.o_totalprice
            for r in orders.filter(F.col("o_orderpriority") == prio)
            .select("o_totalprice")
            .collect()
        )
        n = len(vals)
        assert n == row.n
        max_rank_err = max(1, (n + APPROX_ACC - 1) // APPROX_ACC)
        for q, got in ((0.5, row.p50_approx), (0.9, row.p90_approx)):
            target = int(q * (n - 1))
            lo = vals[max(0, target - max_rank_err)]
            hi = vals[min(n - 1, target + max_rank_err)]
            assert lo <= got <= hi, (prio, q, got, lo, hi)
