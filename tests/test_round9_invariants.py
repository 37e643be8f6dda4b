"""Semantic invariants for the round-9 additions (beyond oracle parity).

VERDICT r8 asked to bound the fine-centroid broadcast's growth (ask #3),
to execute a compaction rather than just plan it (ask #4), and to prove
the coarse quantizer on clustered data with an optional Lloyd-refined
variant (ask #1); these tests pin the structural facts the oracles can't
express — the second-hop join shape under the broadcast ceiling, and the
result-preservation law a compaction rewrite must hold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from json_to_parquet_spark.plans import executed_plan
from json_to_parquet_spark.queries import registry
from json_to_parquet_spark.sources.catalog import load_table


def _router_frames(spark, sf_dir):
    from json_to_parquet_spark.queries.similarity import (
        ivf_k0,
        two_level_cent_sup,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sup = emb.filter(F.col("vec_id") < ivf_k0(spark, sf_dir)).select(
        F.col("vec_id").alias("s_id"), F.col("embedding").alias("s_vec")
    )
    return emb, sup, two_level_cent_sup(spark, sf_dir)


def test_route_two_level_broadcasts_below_ceiling(spark, sf_dir):
    """Default second hop (cent_rows = nlist, far below the ceiling at
    test scale): the cent_sup frame is broadcast — the bounded-broadcast
    shape the whole IVF family relies on."""
    from json_to_parquet_spark.queries.similarity import (
        ivf_nlist,
        route_two_level,
    )

    emb, sup, cent_sup = _router_frames(spark, sf_dir)
    out = route_two_level(emb, sup, cent_sup, cent_rows=ivf_nlist(spark, sf_dir))
    plan = executed_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "ShuffledHashJoin" not in plan and "SortMergeJoin" not in plan


def test_route_two_level_shuffles_above_ceiling(spark, sf_dir):
    """cent_rows above TWO_LEVEL_BCAST_MAX_ROWS (the n≈2.5·10¹¹ regime
    where the √n-row cent_sup frame outgrows a sane broadcast): the
    second hop becomes an s_id-keyed shuffle-hash join, and the routing
    OUTPUT is bit-identical to the broadcast shape (join shape only —
    that is why the oracles never change)."""
    from json_to_parquet_spark.queries.similarity import (
        TWO_LEVEL_BCAST_MAX_ROWS,
        ivf_nlist,
        route_two_level,
    )

    emb, sup, cent_sup = _router_frames(spark, sf_dir)
    shuffled = route_two_level(
        emb, sup, cent_sup, cent_rows=TWO_LEVEL_BCAST_MAX_ROWS + 1
    )
    plan = executed_plan(shuffled)
    assert "ShuffledHashJoin" in plan, plan
    bcast = route_two_level(
        emb, sup, cent_sup, cent_rows=ivf_nlist(spark, sf_dir)
    )
    assert sorted(map(tuple, shuffled.collect())) == sorted(
        map(tuple, bcast.collect())
    )
