"""Physical-plan shape assertions — the scale contract, checked in CI.

Correctness says the operators compute the right rows; these tests pin
the *plans* that make them viable at 100 TB: filters reach the parquet
scan, constant-size dims broadcast, global top-k avoids a total sort,
and no query drops into row-at-a-time Python."""

from __future__ import annotations

import re

import pytest

from json_to_parquet_spark.queries import registry

# driver-window profile (pytest.ini): 828 per-query plan builds — release gate runs it via -m ""
pytestmark = pytest.mark.slow



def _plan(spark, sf_dir, name: str) -> str:
    df = registry()[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q02_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_filter_project")
    assert "PushedFilters: [" in plan
    # the shipdate range + quantity predicates reach the parquet reader
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]


def test_q02_column_pruned_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_filter_project")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # 16-column table: the scan must read only the 6 referenced columns
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema
    assert "l_partkey" not in read_schema


def test_q03_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q03_join_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2  # nation & region never shuffle


def test_q18_no_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q18_global_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_x11_big_side_not_shuffled(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x11_cosine_topk")
    # query vectors broadcast; corpus scanned in place
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_x19_no_all_pairs_join(spark, sf_dir):
    # near-dup pairing must be blocked (equi-join on the sign block),
    # never a cartesian/nested-loop over the corpus — the O(n²) shape
    # flagged in round 1
    plan = _plan(spark, sf_dir, "x19_embedding_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q47_interval_join_is_binned_not_nested_loop(spark, sf_dir):
    # the no-equi-key proximity join must run as an equi-join on the time
    # bucket, never a nested-loop/cartesian over purchases × clicks
    plan = _plan(spark, sf_dir, "q47_interval_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x40_exact_profile_distinct_is_parallel(spark, sf_dir):
    # exact-mode profiling must NOT plan distinct counts as Spark's
    # multi-COUNT(DISTINCT) shape (Expand ×k feeding a keyless final
    # aggregate = every value through ONE partition).  The operator's
    # own plan: pair explode → hashpartitioning(col_idx, val) dedup →
    # per-column count.  The only SinglePartition exchange allowed is
    # the scalar min/max/null rollup, which receives one
    # partially-aggregated row per upstream partition.
    import re

    from json_to_parquet_spark.operators.profile import profile
    from json_to_parquet_spark.sources.catalog import load_table

    prof = profile(
        load_table(spark, sf_dir, "lineitem"),
        cols=["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"],
        exact=True,
    )
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert re.search(r"hashpartitioning\(col_idx#\d+, val#\d+", plan), (
        "distinct dedup must shuffle on the (col_idx, val) pair"
    )
    assert plan.count("Exchange SinglePartition") <= 1, (
        "only the partial-aggregated scalar rollup may be keyless"
    )


def test_q49_salt_spreads_join_key(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q49_salted_join")
    assert "__salt" in plan  # the join key really carries the salt
    assert "Generate explode" in plan  # replication is row-local, not a join


def test_x74_fingerprint_keyed_join(spark, sf_dir):
    # incremental dedup must key every exchange on the content
    # fingerprint — base pre-aggregation and the batch join co-locate on
    # fp, so neither side ever shuffles document payloads
    plan = _plan(spark, sf_dir, "x74_incremental_dedup")
    assert re.search(r"hashpartitioning\(fp#\d+", plan), (
        "x74 must shuffle on the content fingerprint"
    )
    assert "CartesianProduct" not in plan


def test_x86_no_global_corpus_window(spark, sf_dir):
    # the corpus-sized row_number must partition by source; the only
    # single-partition exchange allowed is the bounded source-count
    # offsets frame
    plan = _plan(spark, sf_dir, "x86_global_ordinals")
    assert re.search(r"hashpartitioning\(source#\d+", plan), (
        "per-source ranks must shuffle on source, not serialize globally"
    )
    assert plan.count("Exchange SinglePartition") <= 1, (
        "only the source-count offsets frame may be keyless"
    )


@pytest.mark.parametrize("name", sorted(registry()))
def test_no_python_udf_anywhere(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan  # row-at-a-time Python: forbidden


# The only queries allowed a BroadcastNestedLoopJoin — each broadcasts a
# provably tiny side: a 1-row aggregate (q21, q42), a bounded dim×dim
# cross (q36), the query-vector set (x11), the centroid table (x21, x49
# — K rows by construction).
_BNLJ_ALLOWED = {
    "q21_above_avg_orders",
    "q36_cross_join",
    "q42_above_own_avg",
    "x11_cosine_topk",
    "x21_ivf_ann",
    "x49_kmeans",
    "x54_bm25",  # 1-row global-stats frame broadcast against the corpus
    "q64_revenue_share",  # 1-row global-revenue frame broadcast (Q11 HAVING)
    "q71_idle_rich_customers",  # 1-row global-average frame broadcast (Q22)
    "x62_unigram_logprob",  # 1-row corpus-token-total frame broadcast
    "x65_triangle_count",  # three 1-row census aggregates crossed at the end
    "x66_time_decay",  # 1-row global max-timestamp frame broadcast
    "x73_psi_drift",  # 1-row min/max frame + constant 10x2 bin spine crosses
    "x76_ann_recall",  # composes x11 + x21: query-vec and centroid broadcasts
    "x80_ivf_quality",  # K-row centroid table broadcast (the x21 quantizer)
    "x82_pmi_cooccur",  # 1-row corpus-doc-count frame broadcast
    "x85_shard_manifest",  # 1-row corpus-total frame broadcast
    "x92_bloom_membership",  # four 1-row confusion-summary aggregates crossed
    "x102_ann_ndcg",  # composes x11 + x21: query-vec and centroid broadcasts
    "x103_embedding_pca",  # 1-row max-norm frame crossed per power iteration
    "x104_lsh_tradeoff",  # 1-row truth-count frame crossed per config row
    "x106_temperature_mix",  # 1-row weight-sum/budget frame broadcast
    "x114_referential_audit",  # two 1-row count aggregates crossed per edge
    "x119_rerank_stage",  # composes x21: query-vec and centroid broadcasts
    "x121_ivf_partitioned_index",  # centroid/probe-set broadcasts (x21 shapes)
    "x122_pq_adc_search",  # composes x11's exact flags: query-vec broadcast
    "x129_vocab_coverage_curve",  # 1-row corpus-token-total frame broadcast
    "x134_token_drift",  # 1-row snapshot-totals frame broadcast
    "x138_equidepth_histogram",  # 1-row row-count frame broadcast
    "x139_join_cardinality_eval",  # 1-row row-count frame broadcast
    "x151_source_influence",  # 1-row corpus-totals frame broadcast
    "x159_nb_langid",  # label-cardinality lang-constants frame broadcast
    "x160_dsir_select",  # 1-row corpus/target-totals frame broadcast
    "x167_hard_negatives",  # query-vector set broadcast (the x11 shape)
    "x168_crosslingual_margin",  # source-vector set broadcast (x11 shape)
    "x176_label_noise_audit",  # bounded audit-vector set broadcast (x11 shape)
    "x177_rrf_fusion",  # composes x54: 1-row corpus-stats frame broadcast
    "x180_source_overlap_sketch",  # source-cardinality signature frame bcast
    "x185_stats_pruning_planner",  # 3-row predicate-range frame broadcast
    "x154_session_lift",  # 1-row session-count frame broadcast
    "x157_activity_concentration",  # 1-row totals frame broadcast
    "x188_minhash_twin_audit",  # two 1-row audit aggregates crossed
    "x196_ivf_bitext_mine",  # bounded centroid frame broadcast (x21 quantizer)
    "x197_ivfpq_residual",  # bounded centroid frame broadcast (x21 quantizer)
    "x199_semdedup",  # composes x49: K-row centroid frame broadcast per round
    "x204_kneser_ney",  # 1-row bigram-type-count frame broadcast
    "x205_capacity_assign",  # K-row centroid frame broadcast (x21 quantizer)
    "x210_calibration_ece",  # 1-row total-count frame broadcast
    "x213_temperature_fit",  # 1-row total-count frame broadcast
    "x215_filtered_ann",  # query-vec/probe-set broadcasts (the x21 shapes)
    "x216_binary_quant_rescore",  # N_QUERY_VECS-row signature broadcast
    "x217_two_level_router",  # K0/nlist-row frames (the two-level quantizer)
    "x218_filtered_ann_sweep",  # sel-spine/query-vec broadcasts (x215 shapes)
    "x219_nprobe_sweep",  # level-spine/query-vec/exact-truth broadcasts
    "x221_zorder_pruning",  # 16-row predicate-spine broadcasts
    "x224_tombstone_compaction",  # K0/nlist frames (the two-level quantizer)
    "x227_compaction_execute",  # K0/nlist frames + Nq-row query probe
    "x228_refined_quantizer",  # K0/nlist frames + nlist-centroid Lloyd sample scoring
    "x229_refined_quantizer_recall",  # same + Nq-row query/exact-truth broadcasts
    "x230_refined_ivf_search",  # K0/nlist frames + Nq-row query probe (x21 shape over cent_lloyd)
    "x231_quantizer_policy",  # x228's K0/nlist frames + 2-row pivot
    "x232_compaction_io_plan",  # K0/nlist frames (the two-level quantizer)
    "x235_policy_routed_search",  # x231's decision frames + x230's search broadcasts
    "x236_embedding_drift",  # K0/nlist frames + 2-row half-spine cross
    "x237_drift_retrain",  # K0/nlist frames + 1-row psi/max-pop scalar crosses
    "x240_knn_graph_recall",  # GRA_NQ-row audit-vector broadcast (x76 shape)
    "x248_graph_beam_search",  # GBS_NQ-row query-vector broadcast (x240 shape)
    "x262_graph_tombstone_serve",  # GBS_NQ-row query-vector broadcast (x248 shape)
    "x242_stream_drift_monitor",  # x237's monitor shapes: 1-row psi cross
    "x257_retok_io_plan",  # three ≤NBUCKETS/1-row ledger aggregates crossed
    "x260_drift_reindex_execute",  # K0/nlist frames + Nq-row query probe (x227 shape)
    "x261_drift_reindex_io",  # K0/nlist frames + 1-row ledger aggregates crossed
    "x268_locdrift_reindex_execute",  # LOCD_NLIST-row centroid frame broadcast
    "x269_locdrift_reindex_io",  # LOCD_NLIST centroids + 1-row ledger aggregates crossed
    "x274_append_optimize_io",  # date-spine metadata + two 1-row ledger aggregates crossed
    "x286_dhash_recall_audit",  # two 1-row audit aggregates crossed (the x188 shape)
    "x291_ivf_persisted_search",  # bounded centroid/query broadcasts (x21's shapes)
    # r15 lateral sweep: the constant-size config frame (≤5 rows) crossed
    # with the bounded GRA_NQ·K truth table (the x65/x73 constant-spine shape)
    "x247_graph_knob_sweep",
    "x258_graph_config_policy",
}


@pytest.mark.parametrize("name", sorted(registry()))
def test_no_unbounded_join_shapes(spark, sf_dir, name):
    """No query may plan a cartesian product, and nested-loop joins are
    allowed only where the broadcast side is constant-size — the registry-
    wide guard against O(n²) shapes sneaking in with a new operator."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    if name not in _BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan


def test_q82_full_predicate_pushdown(spark, sf_dir):
    # Q6 shape: the three-column range predicate must reach the parquet
    # scan (partition/row-group pruning at scale), and the only exchange
    # is the 1-row final aggregate.
    plan = _plan(spark, sf_dir, "q82_revenue_forecast")
    assert "PushedFilters: [" in plan
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in plan.split("PushedFilters:")[1].split("]")[0], frag
    assert plan.count("Exchange") == 1


def test_q76_dims_broadcast(spark, sf_dir):
    # the Q5-shape five-way join must broadcast the constant-size
    # nation/region dims — a shuffle of either is a planning regression
    plan = _plan(spark, sf_dir, "q76_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_x63_heavy_hitters_distributed_topk(spark, sf_dir):
    # exact top-K must plan TakeOrderedAndProject (per-partition top-K +
    # driver merge of K rows/partition), never a global sort of the
    # vocabulary
    plan = _plan(spark, sf_dir, "x63_heavy_hitters")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [cnt" not in plan


def test_x65_edges_blocked_not_all_pairs(spark, sf_dir):
    # x65 is BNLJ-allowlisted for its 1-row census crosses, so guard the
    # edge build explicitly: pair generation must hash-join on the sign
    # block — a regression to all-pairs cosine would surface as a BNLJ
    # carrying the embedding arrays (vector-typed broadcast input).
    plan = _plan(spark, sf_dir, "x65_triangle_count")
    assert "CartesianProduct" not in plan
    import re

    assert re.search(r"BroadcastHashJoin \[blk#\d+", plan) or re.search(
        r"hashpartitioning\(blk#\d+", plan
    ), "edge generation must key on the sign block"
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        head = frag.split("\n")[0]
        assert "array" not in head, "BNLJ side must never carry embeddings"


def test_x96_partition_pruning(spark, sf_dir):
    """The date predicate must land in PartitionFilters (directory-level
    skip before IO), not just as a data filter — the 100 TB read path
    (VERDICT r3 ask #4)."""
    plan = _plan(spark, sf_dir, "x96_partition_prune")
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters")[1][:300]
    assert "d#" in pf and ("isnotnull" in pf or ">=" in pf)
    # and the filter is not empty brackets
    assert not re.search(r"PartitionFilters: \[\s*\]", plan)


def test_x97_bucketed_join_no_shuffle(spark, sf_dir):
    """With broadcast disabled, the bucketed orders⋈lineitem must be a
    sort-merge join with ZERO exchanges — both scans expose the bucket
    spec, so neither side shuffles (nor re-sorts) on the join key."""
    from pyspark.sql import functions as F  # noqa: F401

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, sf_dir, "x97_bucketed_join")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin")[1]
    # the only exchange allowed is AFTER the join (the groupBy/orderBy);
    # nothing between the scans and the join itself
    pre_join = plan.split("SortMergeJoin")[0]
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, pre_join[:500]
    del join_part


def test_x100_dynamic_partition_pruning(spark, sf_dir):
    """The fact scan's partition filter must be installed at RUNTIME from
    the joined dim (DynamicPruningExpression) — static planning cannot
    know which dates survive the dim's filter."""
    plan = _plan(spark, sf_dir, "x100_dynamic_partition_prune")
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_x105_schema_evolution_merge(spark, sf_dir):
    """The two generations really are schema-heterogeneous on disk (gen-1
    files lack o_orderpriority) and the mergeSchema scan unions them —
    the evolved column must appear in the merged ReadSchema while being
    absent from the old generation's own footer."""
    from json_to_parquet_spark.queries.scale_layout import orders_evolved_path

    path = orders_evolved_path(spark, sf_dir)
    gen1_cols = spark.read.parquet(path + "/gen=1").columns
    assert "o_orderpriority" not in gen1_cols
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "o_orderpriority" in merged.columns
    plan = merged._jdf.queryExecution().executedPlan().toString()
    # plan strings truncate long schemas — match the stable prefix
    assert "o_orderpriorit" in plan.split("ReadSchema")[1][:400]


def test_x113_no_global_corpus_window(spark, sf_dir):
    """The pack stage must keep x27's two-phase prefix-sum shape when
    composed end-to-end: doc cumulative sums partition by pid, and the
    only keyless exchanges are the tiny offsets frame and the final
    bin-count-sized manifest sort."""
    plan = _plan(spark, sf_dir, "x113_tokenize_pack")
    assert re.search(r"hashpartitioning\(pid#\d+", plan), (
        "prefix sums must run per range-partition, not in one task"
    )
    assert plan.count("Exchange SinglePartition") <= 2


def test_x111_batch_joins_on_band_index(spark, sf_dir):
    """The incremental near-dup join must key on (band, bucket) — a
    regression to an un-keyed pair comparison would show up as a
    cartesian/BNLJ carrying signatures."""
    plan = _plan(spark, sf_dir, "x111_incremental_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"\[band#\d+", plan) or re.search(
        r"hashpartitioning\(band#\d+", plan
    ), "candidate join must key on the band"


def test_x109_streaming_plan_is_stateful(spark, sf_dir):
    """The drained run must have executed a real streaming aggregate:
    the memory-sink table exists and carries the top-K schema (rank
    bounded by the configured K)."""
    from json_to_parquet_spark.queries.streaming_gate import STREAM_HH_TOPK

    df = registry()["x109_stream_heavy_hitters"].spark(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= STREAM_HH_TOPK
    assert [f.name for f in df.schema.fields] == ["rank", "tok", "cnt"]


def test_x120_streamed_layout_prunes(spark, sf_dir):
    """The streamed hive layout must serve partition pruning on read-back
    exactly like the batch-written one (x96): the date predicate lands
    in PartitionFilters."""
    plan = _plan(spark, sf_dir, "x120_stream_partitioned_sink")
    assert "PartitionFilters: [" in plan
    assert not re.search(r"PartitionFilters: \[\s*\]", plan)
    assert "d#" in plan.split("PartitionFilters")[1][:300]


def test_x121_probe_is_partition_pruning(spark, sf_dir):
    """The IVF probe must execute as runtime partition pruning on the
    index scan (DynamicPruningExpression from the broadcast probe set) —
    the physical realization of "a query touches only its probes'
    inverted lists"."""
    plan = _plan(spark, sf_dir, "x121_ivf_partitioned_index")
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters: [" in plan


def test_x171_three_way_bucketed_no_shuffle(spark, sf_dir):
    """The 3-way join on the shared bucket layout must run as chained
    sort-merge joins with ZERO exchanges before the joins — all three
    scans expose the bucket spec on the order key (x97's contract,
    extended to the multi-join case)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, sf_dir, "x171_bucketed_three_way")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert plan.count("SortMergeJoin") == 2, plan[:500]
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(r_orderkey" not in plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan


def test_x168_broadcast_side_is_bounded(spark, sf_dir):
    """x168's broadcast side must be the bounded source CHUNK
    (vec_id < MINE_SRC_CHUNK pushed to the scan), never the whole
    label-0 half of the corpus (VERDICT r5: broadcasting half the corpus
    is an OOM at 100 TB, not a plan), and the per-source top-k must run
    as a WindowGroupLimit so only k rows per source survive the shuffle."""
    from json_to_parquet_spark.queries.retrieval import MINE_SRC_CHUNK

    plan = _plan(spark, sf_dir, "x168_crosslingual_margin")
    # the bound reaches the parquet scan of the broadcast side
    assert re.search(rf"LessThan\(vec_id,{MINE_SRC_CHUNK}\)", plan), plan[:800]
    assert "BroadcastExchange" in plan
    # the corpus side is never hash-shuffled on anything but the bounded
    # src_id key (the WindowGroupLimit top-k shuffle)
    keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert keys and set(keys) == {"src_id"}, keys
    assert "WindowGroupLimit" in plan


def test_x187_hot_frame_guard_in_plan(spark, sf_dir):
    """x187's frame_md5 self-join must be preceded by the hot-frame df
    cap (fdf <= FD_MAX_DF) so a corpus-sized frame copy count (black
    frames, silence) cannot make the join quadratic on one key."""
    from json_to_parquet_spark.queries.multimodal import FD_MAX_DF

    plan = _plan(spark, sf_dir, "x187_frame_dedup")
    assert re.search(rf"fdf#\d+L? <= {FD_MAX_DF}", plan), plan[:800]


def test_x214_placement_bounded_broadcast(spark, sf_dir):
    """x214's broadcasts must all be bounded: the K0 = max(4, ⌈n^¼⌉)
    super-cell routing of the corpus and of the K1 = max(16, ⌈√n⌉)
    fine centroids (two nested-loop crosses, both bounds pushed to the
    parquet scan), plus the K1-row cent_sup frame keyed on s_id (a
    BroadcastHashJoin) — never the corpus — and the pair stage must be
    equi-joins on (cell, sub), never a cartesian (VERDICT r6 ask #4:
    no corpus-sized broadcast/crossJoin; r7 ask #1: K1 grows with the
    corpus, two-level so assignment work stays ~n^1.25)."""
    from json_to_parquet_spark.queries.dedup import (
        SEMF_K1_MIN,
        _semf_k0,
        _x214_placement,
    )

    _, placed, k1 = _x214_placement(spark, sf_dir)
    assert k1 >= SEMF_K1_MIN
    import duckdb

    (n,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    k0 = _semf_k0(n)
    plan = placed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin") == 2  # the two K0 crosses
    assert "CartesianProduct" not in plan
    assert re.search(rf"LessThan\(vec_id,{k1}\)", plan), plan[:800]
    assert re.search(rf"LessThan\(vec_id,{k0}\)", plan), plan[:800]


def test_x214_pair_stage_no_cartesian(spark, sf_dir):
    """The materialized full query: pair joins are keyed on (cell, sub)
    — SortMergeJoin/ShuffledHashJoin — with no nested-loop anywhere
    (the placement subtree is checkpointed out of this plan)."""
    plan = _plan(spark, sf_dir, "x214_semdedup_capacity")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x217_bounded_broadcasts_both_levels(spark, sf_dir):
    """The two-level quantizer composition (VERDICT r7 ask #6): every
    nested-loop broadcast must build a bounded side — the K0 = max(4,
    ⌈n^¼⌉) super-cell frame (scan bound pushed) at level 0 and the
    nlist = max(16, ⌈√n⌉) centroid frame at level 1 (a hash join keyed
    on s_id, never a nested loop) — and no cartesian anywhere."""
    import math

    import duckdb

    from json_to_parquet_spark.queries.similarity import ivf_k0

    (n,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    k0 = ivf_k0(spark, sf_dir)
    assert k0 == max(4, math.ceil(math.sqrt(math.sqrt(float(n)))))
    plan = _plan(spark, sf_dir, "x217_two_level_router")
    # exactly the three bounded K0 crosses (routing + the two inside
    # two_level_lists' super-cell assignment), nothing corpus-sized
    assert plan.count("BroadcastNestedLoopJoin") == 3
    assert "CartesianProduct" not in plan
    assert re.search(rf"LessThan\(vec_id,{k0}\)", plan), plan[:800]
