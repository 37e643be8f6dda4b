"""Semantic invariants for the round-7 fixes (beyond oracle parity).

VERDICT r6 flagged x179's bimodal execution (checkpoint-backed loop
frames re-materializing under a shared session) and asked for the x45
treatment: the fixed-point loop runs driver-side on the collected ≤V²
edge matrix, with the distributed DataFrame iteration retained as an
equality-tested twin. It also asked for a registered production-shape
SemDeDup (x214) and a partial-Gram x103; their structural invariants
live here too.
"""

from __future__ import annotations

import pytest

from json_to_parquet_spark.queries import registry


def test_x179_driver_loop_matches_distributed(spark, sf_dir):
    """The driver-side fixed-point loop (bounded ≤V²-row matrix) must be
    bit-identical to the retained DataFrame-iteration variant."""
    from json_to_parquet_spark.queries.pipeline import (
        TR_TOP,
        textrank_distributed_loop,
    )

    a = sorted(
        map(tuple, registry()["x179_textrank_keywords"].spark(spark, sf_dir).collect())
    )
    b = sorted(map(tuple, textrank_distributed_loop(spark, sf_dir).collect()))
    assert a == b
    assert len(a) == TR_TOP


def test_x214_twin_recall(spark, sf_dir):
    """Every exact re-embed twin must be caught: identical vectors have
    identical centroid distance, hence ADJACENT ranks in the ring order
    (vec_id tie-break), hence the same sub-cell or the overlap band.
    n_dropped == n_dup_pairs == |embeddings| exactly when the corpus has
    no other cos≥T pair (true for the synthetic corpus at test SFs)."""
    import duckdb

    rows = registry()["x214_semdedup_capacity"].spark(spark, sf_dir).collect()
    (n_emb,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    assert sum(r.n_vecs for r in rows) == 2 * n_emb
    assert sum(r.n_dropped for r in rows) >= n_emb  # all twins caught
    assert sum(r.n_kept for r in rows) <= n_emb
    # every sub-cell respects the capacity invariant
    from json_to_parquet_spark.queries.dedup import SEMF_CAP

    for r in rows:
        assert r.n_vecs <= r.n_subcells * SEMF_CAP


def test_x103_gram_partials_match_expression_path(spark, sf_dir):
    """The per-partition partial-Gram pass must produce BIT-IDENTICAL
    int64 micro-unit sums to the row-local expression path it replaced
    (exactness is what makes the partials order-independent — and what
    keeps the DuckDB oracle untouched). Covers the numpy half-up
    rounding vs Spark's ROUND on every product in the corpus."""
    from pyspark.sql import functions as F

    from json_to_parquet_spark.queries.evalsuite2 import (
        FIXED_POINT,
        _x103_gram_partials,
    )
    from json_to_parquet_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    new = (
        emb.select("embedding")
        .mapInPandas(_x103_gram_partials, "i int, j int, s long, c long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
    )
    got_m = {
        (r.i, r.j): r.s for r in new.filter(F.col("j") >= 0).collect()
    }
    got_1 = {
        r.i: (r.s, r.c) for r in new.filter(F.col("j") == -1).collect()
    }

    fx = lambda c: F.round(c * F.lit(float(FIXED_POINT)), 0).cast("long")  # noqa: E731
    xi = emb.select(
        "vec_id", "embedding", F.posexplode("embedding").alias("i", "x_i")
    )
    pairs = xi.select(
        "i",
        F.col("x_i").cast("double").alias("xi"),
        F.posexplode("embedding").alias("j", "x_j"),
    ).select("i", "j", "xi", F.col("x_j").cast("double").alias("xj"))
    want_m = {
        (r.i, r.j): r.k
        for r in pairs.groupBy("i", "j")
        .agg(F.sum(fx(F.col("xi") * F.col("xj"))).alias("k"))
        .collect()
    }
    want_1 = {
        r.i: (r.k, r.n)
        for r in xi.groupBy("i")
        .agg(
            F.sum(fx(F.col("x_i").cast("double"))).alias("k"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got_m == want_m
    assert got_1 == want_1


def test_x103_driver_loop_matches_distributed(spark, sf_dir):
    """The driver-side power iteration (bounded d²-row matrix, decimal-
    exact treaty arithmetic) must be bit-identical to the retained
    DataFrame-iteration variant."""
    from json_to_parquet_spark.queries.evalsuite2 import (
        pca_power_distributed_loop,
    )

    a = sorted(
        map(tuple, registry()["x103_embedding_pca"].spark(spark, sf_dir).collect())
    )
    b = sorted(map(tuple, pca_power_distributed_loop(spark, sf_dir).collect()))
    assert a == b
    assert len(a) == 64
