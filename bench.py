"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines on stdout: first the full per-query line
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1, "n_runs": 3}
then, LAST, a <2 KB rollup with the same metric/value/unit/sf shape
(queries = top-20 heaviest, plus entry count and movers vs the committed
medians) — the driver captures only the tail of stdout, and the full
104-entry line overflows that window (VERDICT r12 ask #1; widened 5→20
per VERDICT r14 ask #4 so the driver's round-over-round comparison keeps
n_common ≥ 15).

Each entry is timed N times (SPARK_GRAFT_BENCH_RUNS, default 3) after one
warm-up, and the reported number is the MINIMUM — the least-noise estimate
of the plan's true cost on a box with background load (this machine swings
3-15x run-to-run under load; VERDICT r2).  Per-run raws and medians are
NOT on the stdout line (round 4's driver capture truncated the line once
they inflated it past the tail window — VERDICT r4 ask #1); they go to
stderr and to the side file BENCH_RAWS.json next to this script.

Query execution is measured with the noop sink (full plan executes —
scan, shuffles, projections — nothing written, no driver collect), which
is the closest local stand-in for cluster throughput. The convert
pipeline is benched on a generated 100k-record nested NDJSON.gz — the
reference's own exercised workload size (BASELINE.md) — in three modes:
cold union inference every object (coldinfer), infer-on-first-object
then registry-pinned (the production unpinned feed, reported as
convert_100k_ndjson), and explicit pinned schema (the floor)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from json_to_parquet_spark.operators.convert import convert  # noqa: E402
from json_to_parquet_spark.queries import registry  # noqa: E402
from json_to_parquet_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of the registry: scan+agg, broadcast join chain,
# window top-k, running window, JSON extraction, keyed dedup, similarity
# join, MinHash-LSH, cosine top-k.
HEADLINE = [
    "q01_pricing_summary",
    "q03_join_revenue_by_nation",
    "q07_topk_per_customer",
    "q08_running_window",
    "q17_json_funcs",
    "q25_hourly_rollup",
    "q32_shipping_priority",
    "x02_dedup_keyed",
    "x08_ngram_jaccard",
    "x09_minhash_lsh",
    "x11_cosine_topk",
    "x21_ivf_ann",
    "x24_tfidf",
    # round-2 additions: one-pass profiling, CDC merge, lateral top-k,
    # fixed-point PageRank (iterative loop incl. its edge extraction)
    "x40_profile",
    "x41_cdc_merge",
    "q50_lateral_topk",
    "x45_pagerank",
    # round-3 additions: five-way broadcast star join (Q5 shape),
    # open-vocabulary token-keyed shuffle + join (perplexity proxy)
    "q76_local_supplier_volume",
    "x62_unigram_logprob",
    # round-3 second batch: fingerprint-keyed incremental ingest dedup,
    # bigram-LM scoring (token-keyed model joins), grouped dense-vector
    # centroid aggregation
    "x74_incremental_dedup",
    "x78_bigram_lm",
    "x84_lang_centroids",
    # round-4 additions (VERDICT r3 ask #3): the heaviest shuffle shapes —
    # iterative connected-components dedup clustering, survivor chain,
    # Lloyd's k-means, and the triangle census (the three operators
    # ARCHITECTURE §3 reasons hardest about, previously unmeasured)
    "x26_dedup_clusters",
    "x33_dedup_survivors",
    "x49_kmeans",
    "x65_triangle_count",
    # round-4 second wave: distributed BPE merge training (corpus scan +
    # vocab-sized iterations), one-pass d²-keyed covariance + power
    # iteration, incremental LSH near-dup against the base band index,
    # and the end-to-end tokenize/encode/pack digest chain
    "x101_bpe_train",
    "x103_embedding_pca",
    "x111_incremental_neardup",
    "x113_tokenize_pack",
    # round-4 fifth wave: the heaviest assembly-batch shape — df-capped
    # posting self-join producing weighted shingle-cosine pairs
    "x125_shingle_cosine_pairs",
    # round-5 additions (VERDICT r4 ask #4): the assembly layer's
    # remaining heavy shapes — the declared sort-heavy exact cumulative
    # window (x126), its sort-free histogram scale path (x128, the
    # measured win over x126's shape), and contrastive triplet
    # construction (x144)
    "x126_token_budget_select",
    "x128_budget_threshold_sweep",
    "x144_contrastive_pairs",
    # round-5 second batch: the new model-driven shapes — distributed
    # naive-Bayes training+scoring (language-cardinality fan-out) and
    # the TextRank fixed-point loop over the bounded co-occurrence graph
    # (x180's sketch-overlap certification stays un-benched: its local
    # cost is the same corpus shingling x09/x111 already measure)
    "x159_nb_langid",
    "x179_textrank_keywords",
    # round-6 additions (VERDICT r5 ask #4): the round-5 retrieval/
    # multimodal heavies — broadcast-scored corpus scans (x167, x176),
    # the hot-frame-capped pair join (x187), the bounded-chunk margin
    # miner in its FIXED shape (x168), the streaming near-dup gate drain
    # (x172) — plus the new IVF-composed full-corpus miner (x196) and
    # the residual IVF-PQ search (x197)
    "x167_hard_negatives",
    "x168_crosslingual_margin",
    "x176_label_noise_audit",
    "x187_frame_dedup",
    "x172_stream_neardup",
    "x196_ivf_bitext_mine",
    "x197_ivfpq_residual",
    # round-6 second batch: Kneser-Ney estimation (bigram count +
    # vocab-table joins), capacity-balanced assignment (two centroid
    # passes), k-center coreset (K corpus passes).  x199 SemDeDup stays
    # un-benched by documented choice: its cost is x49's Lloyd loop (a
    # headline entry) + a bounded-slice pair join, measured once at
    # 8.2 s min-of-3 — composition overhead, not a new shape.
    "x204_kneser_ney",
    "x205_capacity_assign",
    "x208_kcenter_coreset",
    # round-7 addition (VERDICT r6 ask #4): the production-shape
    # full-corpus SemDeDup — capacity-capped ring sub-cells
    "x214_semdedup_capacity",
    # round-8 additions (VERDICT r7 asks #4/#5/#6): the filtered-ANN and
    # binary-quantization retrieval shapes (previously un-benched), the
    # two-level quantizer routing audit, and the selectivity sweep
    "x215_filtered_ann",
    "x216_binary_quant_rescore",
    "x217_two_level_router",
    "x218_filtered_ann_sweep",
    "x219_nprobe_sweep",
    "x220_ivf_incremental_maintenance",
    "x221_zorder_pruning",
    "x222_chunk_dedup_rebuild",
    "x225_doremi_mix",
    "x226_incremental_view_maintenance",
    # round-10 additions: the executed-compaction search (two-phase
    # incremental rewrite + probed scan, built once then cached) and the
    # Lloyd-refined production search (x21's shape over cent_lloyd,
    # including the sample-bounded Lloyd training it pays per run)
    "x227_compaction_execute",
    "x230_refined_ivf_search",
    # the capacity-capped bitext miner: x196's linear-pair-volume twin
    "x233_bitext_mine_capped",
    # round-11 additions: the drift-triggered retrain loop (PSI monitor
    # + warm-start Lloyd + verification assignment — the full index-
    # maintenance act), the capacity-capped kNN graph, and frozen label
    # propagation over it (graph build + LP_ROUNDS sweep joins)
    "x237_drift_retrain",
    "x238_knn_graph",
    "x239_label_propagation",
    # the graph-recall audit + one NN-descent round + the streaming
    # drift monitor (4 micro-batch drains; engine overhead amortizes in
    # a continuous stream — the x172/x234 reading)
    "x240_knn_graph_recall",
    "x241_nn_descent",
    "x242_stream_drift_monitor",
    "x243_hubness_audit",
    "x244_centrality_select",
    "x245_graph_add_cdc",
    # round-12 additions: the graph segment merge (add-batch routing +
    # threshold-hot re-ring, cold segments served from the base store),
    # the capacity/placement knob sweep (one shared n_keep=2 routing
    # pass + audit-cell-restricted builds), beam-search serving
    # (bounded per-query walk over the persisted graph), and the
    # multi-probe graph served from its build-once store
    "x246_graph_compaction",
    "x247_graph_knob_sweep",
    "x248_graph_beam_search",
    "x249_multiprobe_graph",
    # the incremental labeler: frozen base-LP state + one CDC-edge vote
    "x250_label_prop_cdc",
    # streaming twin of the graph-add CDC (micro-batch routed partials,
    # one link pass on drain — engine overhead amortizes in a
    # continuous stream, the x172/x242 reading)
    "x251_stream_label_cdc",
    # incremental BPE retrain: slice-only counts + persisted base table,
    # and the swap-impact audit (two rule tables applied to one word set)
    "x252_bpe_incremental",
    "x253_bpe_swap_impact",
    # streaming twin of the BPE retrain (micro-batch count partials)
    "x254_stream_bpe_cdc",
    # the graph-compaction I/O ledger (x246's shapes + one aggregate)
    "x255_graph_compaction_io",
    # round-13 additions: the tokenizer execute arrow (re-tokenize
    # through the migrated lexicon store + its I/O ledger), the
    # graph-config adoption loop (2-config sweep decision + the beam
    # serve routed through the adopted store), and the drift re-index
    # execution (probed search over the migrated lists + its ledger)
    "x256_retok_execute",
    "x257_retok_io_plan",
    "x258_graph_config_policy",
    "x259_policy_routed_graph_serve",
    "x260_drift_reindex_execute",
    "x261_drift_reindex_io",
    # tombstone-aware graph serving (x248's walk + the live-only audit)
    "x262_graph_tombstone_serve",
    # the delete-side graph compaction (hot cells re-rung live-only)
    "x263_graph_tombstone_compact",
    # its streaming twin (micro-batch delete partials, x263's compactor)
    "x264_stream_graph_tombstones",
    # OPTIMIZE executed: content proof over the one-file-per-bin rewrite
    "x265_layout_compact_execute",
    # round-14 additions: the tokenizer decide arrow (integer swap
    # policy + the re-tokenization routed through the adopted lexicon)
    # and the localized-drift re-index (the migration's incremental
    # regime: per-cell content proof + its preservation ledger)
    "x266_retok_swap_policy",
    "x267_policy_routed_retok",
    "x268_locdrift_reindex_execute",
    "x269_locdrift_reindex_io",
    # streaming twin of the swap policy (micro-batch count partials,
    # one drained measure+decide — x254's drain, x266's decision)
    "x270_stream_retok_policy",
    # the warehouse OPTIMIZE decide arrow (metadata-plane decision) and
    # the bin-content serve routed through the adopted layout
    "x271_layout_compact_policy",
    "x272_policy_routed_layout_serve",
    # incremental OPTIMIZE on append (touched-bins-only merge, gated
    # against the full rewrite's oracle) + its I/O ledger
    "x273_append_optimize_execute",
    "x274_append_optimize_io",
    # its streaming twin (drained partition-manifest partials feed
    # x273's phases verbatim into a session-fresh layout)
    "x275_stream_append_optimize",
    # round-15 additions: the REAL image decode paths (dual-format
    # parity, binaryFile ingest, its streaming twin — micro-batch
    # engine overhead amortizes in a continuous feed)
    "x276_bmp_decode_parity",
    "x277_media_binaryfile_source",
    "x278_stream_media_decode",
    # round-16 additions: the perceptual dHash family over real decoded
    # bytes (per-image hash, capacity-capped banded-Hamming near-dup
    # pairs, exact-hash dedup execute, streaming hash twin)
    "x279_image_dhash",
    "x280_dhash_neardup_pairs",
    "x281_dhash_dedup_survivors",
    "x282_stream_media_dhash",
    # the media store-dedup decide arrow + its policy-routed manifest
    "x283_media_dedup_policy",
    "x284_policy_routed_media_store",
    # its streaming twin (drained per-hash partials, x283's decision)
    # and the banding+chunking recall audit (pair recall vs doc
    # coverage against pigeonhole-complete truth on the 1/7 slice)
    "x285_stream_media_dedup_policy",
    "x286_dhash_recall_audit",
    # the audio leg: real PCM WAV chunk-walk decode (stats, silence
    # segmentation vs the LAG oracle, energy fingerprint dedup,
    # binaryFile .wav ingest)
    "x287_audio_decode_stats",
    "x288_audio_silence_segments",
    "x289_audio_fingerprint_dedup",
    "x290_audio_binaryfile_source",
    # the flat-IVF SERVING shape: x21's search over the persisted
    # inverted-list store (assignment paid once, not per call)
    "x291_ivf_persisted_search",
    # the audio streaming twin (binaryFile stream, x290's oracle)
    "x292_stream_audio_decode",
    # image near-dup cluster closure (min-label propagation over the
    # capped pair graph vs recursive-CTE truth)
    "x293_image_neardup_clusters",
    # the video leg: real Y4M parse (stats + scene cuts, every-k-th
    # frame sampling, .y4m binaryFile ingest)
    "x294_video_decode_stats",
    "x295_video_frame_sample",
    "x296_video_binaryfile_source",
    # the multimodal sample manifest (all three real decodes joined)
    "x297_multimodal_sample_manifest",
    # round-17 additions: REAL PNG decode (zlib inflate + five-filter
    # unfilter; PPM parity, RGBA alpha law, binaryFile ingest +
    # streaming twin)
    "x298_png_decode_parity",
    "x299_png_rgba_alpha_stats",
    "x312_png_palette_gray_decode",
    "x306_png_binaryfile_source",
    "x307_stream_png_decode",
    # audio arrow parity: banded-Hamming fingerprint near-dup, store
    # decide, policy-routed shard manifest
    "x300_audio_neardup_pairs",
    "x301_audio_dedup_policy",
    "x302_policy_routed_audio_store",
    # video arrow: scene-fingerprint near-dup, store decide, routed
    # manifest, streaming ingest twin
    "x303_video_neardup_pairs",
    "x308_video_dedup_policy",
    "x309_policy_routed_video_store",
    "x304_stream_video_decode",
    # WebDataset tar shard round-trip (write + binaryFile re-read gate),
    # its streaming ingest twin, and cross-modal sample dedup (all
    # three real decode kernels composed into one sample identity)
    "x305_tar_shard_roundtrip",
    "x311_stream_tar_ingest",
    "x310_crossmodal_sample_dedup",
]

CONVERT_RECORDS = 100_000
CONVERT_CACHE = os.environ.get(
    "SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench"
)
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _convert_fixture(n: int = CONVERT_RECORDS) -> str:
    """n-record nested findings NDJSON.gz, cached across runs."""
    os.makedirs(CONVERT_CACHE, exist_ok=True)
    path = os.path.join(CONVERT_CACHE, f"finding-{n}.ndjson.gz")
    if not os.path.exists(path):
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        from findings_fixture import make_record  # noqa: E402

        import gzip
        import random

        rng = random.Random(11)
        with gzip.open(path, "wt") as f:
            for i in range(n):
                f.write(json.dumps(make_record(i, rng)) + "\n")
    return path


MAX_CONVERGE_RUNS = 3  # extra runs while a cold entry is still warming


def _timed(fn) -> list[float]:
    """One warm-up + N_RUNS timed executions, plus up to
    MAX_CONVERGE_RUNS extra runs while the entry is visibly still
    warming (the last run is the minimum so far AND improved ≥25% on
    the run before it).  Round-12 settlement of the r11 x215/x214/x216
    drift flags: on a box whose page cache was churned, the
    store-backed vector entries keep improving well past one warm-up
    (measured raws 8.98/9.84/5.42/5.16/4.70 for x215 in a cold
    process vs 2.23 in-band once warm), so a fixed min-of-3 reports a
    non-converged cold reading as the plan's cost.  Converged entries
    pay nothing (the guard never fires when run N ≈ run N-1)."""
    fn()  # warm JIT/IO/codegen
    raws = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn()
        raws.append(round(time.perf_counter() - t0, 3))
    extra = 0
    while (
        extra < MAX_CONVERGE_RUNS
        and len(raws) >= 2
        and raws[-1] == min(raws)
        and raws[-1] <= 0.75 * raws[-2]
    ):
        t0 = time.perf_counter()
        fn()
        raws.append(round(time.perf_counter() - t0, 3))
        extra += 1
    return raws


def rollup_line(
    timings: dict,
    medians: dict,
    prev_medians: dict,
    decomp: set,
    total: float,
    sf: float,
    n_runs: int,
) -> dict:
    """The <2 KB driver-tail rollup (VERDICT r12 ask #1): same
    metric/value/unit/sf contract shape as the full line, with queries
    cut to the 20 heaviest entries (widened from 5 — VERDICT r14 ask #4:
    the driver's round-over-round comparison parses only this line, and
    5 entries collapsed its n_common to 3), plus the registered-entry
    count and the biggest movers (>15% either way) vs the previously-
    committed BENCH_RAWS.json medians.  Bounded at 20+5 name/number
    pairs, the serialized line stays under the driver's ~2 KB tail
    window regardless of registry growth (tests/test_bench_rollup.py)."""
    top20 = dict(
        sorted(
            ((k, round(v, 3)) for k, v in timings.items() if k not in decomp),
            key=lambda kv: -kv[1],
        )[:20]
    )
    movers = {}
    for name, med in medians.items():
        prev = prev_medians.get(name)
        if prev and prev > 0 and med > 0 and name not in decomp:
            r = med / prev
            if r > 1.15 or r < 1 / 1.15:
                movers[name] = round(r, 2)
    movers = dict(sorted(movers.items(), key=lambda kv: -abs(kv[1] - 1))[:5])
    return {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": top20,
        "sf": sf,
        "n_runs": n_runs,
        "entries": len([k for k in timings if k not in decomp]),
        "movers_vs_committed_medians": movers,
        "note": (
            "rollup (top-20 heaviest); full per-query line precedes; "
            "raws+medians in BENCH_RAWS.json"
        ),
    }


def main() -> None:
    spark = build_session(app_name="bench")
    reg = registry()
    raw_runs: dict[str, list[float]] = {}

    # Previously-committed medians (for the rollup line's movers list) —
    # read BEFORE this run overwrites BENCH_RAWS.json.
    raws_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_RAWS.json"
    )
    prev_medians: dict[str, float] = {}
    try:
        with open(raws_path) as f:
            prev_medians = json.load(f).get("medians", {})
    except (OSError, ValueError):
        pass

    # Convert is timed FIRST, on a fresh session: the query phase leaves
    # storage/GC pressure behind (persisted intermediates, checkpoint
    # blocks) that inflates convert by 1.5-2x even after an explicit GC.
    src = _convert_fixture()
    warm_src = _convert_fixture(1_000)
    with tempfile.TemporaryDirectory() as td:
        # the small warm-up file compiles the (large) nested rewrite
        # codegen once, so the timed runs measure data work, not one-time
        # Janino compilation
        convert(spark, warm_src, os.path.join(td, "warm"), mode="cluster")

        # Cold union inference every run — the one-shot unpinned shape
        # (reference parity: infer the union schema of THIS object).
        raw_runs["convert_100k_ndjson_coldinfer"] = _timed(
            lambda: convert(spark, src, os.path.join(td, "out_cold"), mode="cluster")
        )

        # Production unpinned feed (SURVEY §7c; VERDICT r3 ask #7): the
        # FIRST object of a feed pays inference and pins the schema into
        # the file-backed registry; every later object of the feed loads
        # the pin and skips inference. The timed number is the steady
        # state a deployment actually sees on object 2..N — the first
        # (inferring) object is the _timed warm-up call.
        from json_to_parquet_spark.sources.schema_registry import (
            load_schema,
            save_schema,
        )

        reg_path = os.path.join(td, "feed_schema.json")

        def convert_feed():
            if os.path.exists(reg_path):
                convert(
                    spark,
                    src,
                    os.path.join(td, "out"),
                    mode="cluster",
                    schema=load_schema(reg_path),
                )
            else:
                res = convert(spark, src, os.path.join(td, "out"), mode="cluster")
                save_schema(res.input_schema, reg_path)

        convert_feed()  # first object: infer + pin (so _timed's warm-up
        # already runs the SAME pinned plan the timed runs execute —
        # VERDICT r3 ask #6, no JIT/inference contamination in run 1)
        raw_runs["convert_100k_ndjson"] = _timed(convert_feed)

        # Pinned-schema fast path: schema known ahead of time (no registry
        # round-trip) — the floor for the convert pipeline proper.
        pinned = load_schema(reg_path)
        convert(spark, warm_src, os.path.join(td, "warm_pinned"), mode="cluster", schema=pinned)
        raw_runs["convert_100k_ndjson_pinned"] = _timed(
            lambda: convert(
                spark, src, os.path.join(td, "out_pinned"), mode="cluster", schema=pinned
            )
        )

    for name in HEADLINE:
        fn = reg[name].spark
        raw_runs[name] = _timed(
            lambda: fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        )

    # x172's wall clock is dominated by gate-harness work (fixture
    # regeneration, base-index build, output re-read) that a real
    # continuous stream pays once, not per batch; report the drain loop
    # and the harness as separate rows (VERDICT r6 ask #6).  The split
    # rows replace nothing: x172_stream_neardup stays the end-to-end
    # number, drain+harness are its decomposition.
    from json_to_parquet_spark.queries.streaming_gate import (
        X172_N_BATCHES,
        X172_SPLIT,
    )

    n172 = len(raw_runs.get("x172_stream_neardup", ()))
    if n172 and len(X172_SPLIT) >= n172:
        # one split entry per timed run, INCLUDING any convergence-guard
        # extras — slice by the actual run count, not N_RUNS
        drains = [round(d, 3) for _, d in X172_SPLIT[-n172:]]
        raw_runs["x172_drain"] = drains
        raw_runs["x172_harness"] = [
            round(total - d, 3)
            for total, d in zip(raw_runs["x172_stream_neardup"], drains)
        ]
        # the marginal cost per arriving micro-batch — what a continuous
        # deployment pays per batch once the base index exists (VERDICT
        # r12 ask #6): drain wall clock / batch count
        raw_runs["x172_drain_per_batch"] = [
            round(d / X172_N_BATCHES, 3) for d in drains
        ]

    # min-of-N: the least-load-noise estimate of each plan's true cost;
    # medians recorded alongside so load sensitivity is visible too.
    timings = {name: min(raws) for name, raws in raw_runs.items()}
    medians = {name: sorted(raws)[len(raws) // 2] for name, raws in raw_runs.items()}
    # the x172 split rows decompose x172_stream_neardup, which is already
    # in the sum — don't double-count them in the headline total
    _decomp = {"x172_drain", "x172_harness", "x172_drain_per_batch"}
    total = round(sum(v for k, v in timings.items() if k not in _decomp), 3)

    # Raw per-run timings + medians: side file + stderr, NEVER the stdout
    # line — the driver's tail capture truncated round 4's line once these
    # were inlined (BENCH_r04 "parsed": null; VERDICT r4 ask #1).
    raws_doc = {
        "runs": raw_runs,
        "medians": medians,
        "n_runs": N_RUNS,
        "sf": _sf_from_dir(SF_DIR),
    }
    with open(raws_path, "w") as f:
        json.dump(raws_doc, f, indent=1, sort_keys=True)
    print(json.dumps(raws_doc), file=sys.stderr)

    # The full per-query line (every entry) — for anyone capturing whole
    # stdout.  NOT last: at 100+ entries it exceeds the driver's ~2 KB
    # tail window (every BENCH_r*.json through r12 has "parsed": null —
    # VERDICT r12 ask #1).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "n_runs": N_RUNS,
            }
        )
    )

    # Compact rollup, LAST on stdout and sized well under 2 KB, so the
    # driver's tail capture parses (VERDICT r12 ask #1).
    print(
        json.dumps(
            rollup_line(
                timings, medians, prev_medians, _decomp, total,
                _sf_from_dir(SF_DIR), N_RUNS,
            )
        )
    )


if __name__ == "__main__":
    main()
