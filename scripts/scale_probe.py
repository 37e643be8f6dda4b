"""sf1-class scaling probe (VERDICT r5 ask #5).

The sf0.001–sf0.1 cross-SF table in ARCHITECTURE §3b is scheduling-
floor-flat, which proves no super-linear blowup but cannot separate
data cost from floor.  This probe builds a ~10× sf0.1 fixture ("sfx1",
sf≈1) by replicating every table with key-offset replicas — referential
integrity preserved (order/cust/supp/part keys offset consistently),
document texts word-ROTATED per replica so shingle/token distributions
stay realistic instead of producing a 10-fold exact-dup corpus — and
runs the heaviest registry entries at sf0.1 and sfx1.

Usage:
    python scripts/scale_probe.py --build          # create /tmp fixture
    python scripts/scale_probe.py [--runs N]       # run probe, print JSON
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEST = os.environ.get("SPARK_GRAFT_SFX1_DIR", "/tmp/spark_graft_sfx1")
FACTOR = 10

# Key spaces: offsets must clear every real key AND the id-offset tricks
# queries play (x09 +100k, x187 +300k, x191 +900k).
KEY_OFFSETS = {
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "c_custkey": 1_000_000,
    "o_custkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_partkey": 1_000_000,
    "ps_partkey": 1_000_000,
    "ps_suppkey": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "session_id": 10_000_000,
}

# One canonical entry per heavy shape; all scale with the corpus (x26 &
# friends are id-bounded by design and excluded).
PROBE = [
    "q01_pricing_summary",       # lineitem scan + agg
    "q76_local_supplier_volume", # 5-way star join
    "x62_unigram_logprob",       # open-vocab token shuffle + join
    "x101_bpe_train",            # iterative corpus-scan training
    "x111_incremental_neardup",  # banded LSH join vs base index
    "x125_shingle_cosine_pairs", # df-capped posting self-join
    "x159_nb_langid",            # distributed NB train + score
    "x179_textrank_keywords",    # bounded-graph fixed point over corpus scan
    "x103_embedding_pca",        # d²-keyed covariance + power iteration
    "x49_kmeans",                # Lloyd iterations
    "x45_pagerank",              # fact joins + driver fixed-point
    "x65_triangle_count",        # blocked similarity graph census
    # round-7 additions (VERDICT r6 ask #5): the round-6 heavies
    "x196_ivf_bitext_mine",      # IVF-composed full-corpus mining
    "x197_ivfpq_residual",       # per-cell ADC over probed lists
    "x204_kneser_ney",           # bigram + continuation-count joins
    "x205_capacity_assign",      # two broadcast-centroid passes
    "x208_kcenter_coreset",      # K serial corpus passes (the risky shape)
    "x212_stream_quality_gate",  # micro-batch drain vs batch oracle
    "x214_semdedup_capacity",    # capacity-capped ring-cell dedup (r7)
    # round-8 additions (VERDICT r7 asks #4/#5): sqrt(n)-cell IVF consumers
    "x21_ivf_ann",               # IVF coarse-quantized ANN (sqrt(n) cells, r8)
    "x215_filtered_ann",         # predicate inside the IVF candidate scan
    "x216_binary_quant_rescore", # packed-sign hamming scan + cosine rescore
    "x217_two_level_router",     # two-level routing rollup (~n^1.25)
    "x218_filtered_ann_sweep",   # 3-selectivity fan over the probed base
    "x219_nprobe_sweep",         # 3-level fan over one probed base
    "x220_ivf_incremental_maintenance",  # index CDC: adds + cell splits
    "x221_zorder_pruning",       # Morton tagging + 64-file stats rollups
    "x222_chunk_dedup_rebuild",  # chunk explode + hash-keyed keep-first
    "x223_stream_index_cdc",     # streaming adds vs the frozen quantizer
    "x224_tombstone_compaction", # assignment + narrow live/dead rollup
    "x225_doremi_mix",           # one corpus agg + bounded driver MWU loop
    "x226_incremental_view_maintenance",  # view + delta aggs, group-keyed merge
    # round-9 additions (VERDICT r8 asks #1/#4): quantizer refinement +
    # compaction execution
    "x227_compaction_execute",   # list rewrite + probed search over it
    "x228_refined_quantizer",    # Lloyd rounds on sample + 2 assignments
    "x229_refined_quantizer_recall",  # 2 searches + shared exact truth
    # round-10 additions (VERDICT r9 asks #1/#4): the refined-quantizer
    # production search, and the capacity-capped bitext miner (x196's
    # linear scale path — x196 itself measured 17.7×/decade at sfx10)
    "x230_refined_ivf_search",
    "x233_bitext_mine_capped",
    "x234_stream_tombstone_cdc",  # streaming deletes vs the frozen layout
    "x236_embedding_drift",      # snapshot PSI over the trained quantizer
    # round-11 additions: the maintenance loop + the graph-SSL family
    "x237_drift_retrain",        # PSI monitor + warm-start Lloyd + verify
    "x238_knn_graph",            # capacity-capped kNN graph build
    "x239_label_propagation",    # graph build + LP_ROUNDS sweep joins
    "x241_nn_descent",           # graph build + K²-fan self-joins
    "x242_stream_drift_monitor", # micro-batch routing partials + PSI
    "x245_graph_add_cdc",        # add-batch routing + capped tail-ring links
]


def build(
    dest: str = DEST,
    factor: int = FACTOR,
    src_dir: str = SRC,
    offset_scale: int = 1,
) -> None:
    """Replicate ``src_dir`` ``factor``× into ``dest``.  When chaining
    decades (building sfx100 FROM sfx10), pass --offset-scale so the
    per-replica key offsets clear the SOURCE fixture's already-offset
    key space (sfx10 spans 100× sf0.1's keys → offset-scale 100)."""
    import duckdb

    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    tables = [
        f[: -len(".parquet")]
        for f in sorted(os.listdir(src_dir))
        if f.endswith(".parquet")
    ]
    for t in tables:
        src = os.path.join(src_dir, f"{t}.parquet")
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        if t in ("region", "nation"):  # fixed dims: never replicated
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dest}/{t}.parquet'")
            continue
        parts = []
        for r in range(factor):
            sel = []
            for c in cols:
                if c in KEY_OFFSETS:
                    sel.append(
                        f"{c} + {r * KEY_OFFSETS[c] * offset_scale} AS {c}"
                    )
                elif t == "documents" and c == "text" and r > 0:
                    # rotate word order by r so replicas are distinct
                    # documents with the same length/vocab statistics
                    sel.append(
                        "array_to_string(list_concat("
                        f"string_split(text, ' ')[{r + 1}:], "
                        f"string_split(text, ' ')[:{r}]), ' ') AS text"
                    )
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM '{src}'")
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dest}/{t}.parquet'"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{dest}/{t}.parquet'").fetchone()[0]
        print(f"built {t}: {n} rows", file=sys.stderr)


def run(
    runs: int,
    only: list[str] | None = None,
    pairs: "list[tuple[str, str]] | None" = None,
    factor: int = FACTOR,
    serve: bool = False,
) -> None:
    """With ``serve=True`` (VERDICT r12 ask #5): one UNTIMED warm-up
    call per (entry, sf) pays any cold store build (GATE_DIR-keyed
    quantizers/graphs/lexicons/layouts — pay-once costs a deployment
    amortizes over every query), and the reported number is the
    min-of-``runs`` over the WARM serve path only.  The warm-up's wall
    clock is still recorded (``cold_first``) so the pay-once cost stays
    visible instead of silently dropped."""
    from json_to_parquet_spark.queries import registry
    from json_to_parquet_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="scale_probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    reg = registry()
    out: dict[str, dict[str, float]] = {}
    cold: dict[str, dict[str, float]] = {}
    probe = [n for n in PROBE if not only or n in only]
    if only:
        # allow probing entries not in the static PROBE list (the
        # serve-only flagships x248/x259/x267/x272 live outside it)
        probe = [n for n in only if n in reg]
    lo, hi = pairs if pairs else [("sf0.1", SRC), ("sfx1", DEST)]
    for sf_name, sf_dir in (lo, hi):
        for name in probe:
            if serve:
                t0 = time.time()
                reg[name].spark(spark, sf_dir).collect()
                cold.setdefault(name, {})[sf_name] = round(
                    time.time() - t0, 3
                )
                print(
                    f"{sf_name} {name}: cold_first "
                    f"{cold[name][sf_name]:.3f}s",
                    file=sys.stderr,
                )
            best = None
            for _ in range(runs):
                t0 = time.time()
                reg[name].spark(spark, sf_dir).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out.setdefault(name, {})[sf_name] = round(best, 3)
            print(f"{sf_name} {name}: {best:.3f}s", file=sys.stderr)
    for name, row in out.items():
        row["ratio"] = round(row[hi[0]] / row[lo[0]], 2)
        if serve:
            row["cold_first"] = cold.get(name, {})
    print(
        json.dumps(
            {
                "factor": factor,
                "runs": runs,
                "serve_only": serve,
                "queries": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of PROBE entries")
    ap.add_argument("--factor", type=int, default=None,
                    help=f"replication factor for --build (default {FACTOR}); "
                         "for --pair runs this is REQUIRED and records the "
                         "actual growth factor between the two fixture dirs")
    ap.add_argument("--dest", type=str, default=DEST,
                    help="fixture directory for --build")
    ap.add_argument("--pair", type=str, default=None,
                    help="run comparison 'loname=lodir,hiname=hidir' "
                         "instead of the default sf0.1-vs-sfx1 "
                         "(e.g. the sfx1-vs-sfx10 second decade)")
    ap.add_argument("--src", type=str, default=SRC,
                    help="source fixture dir for --build (chain decades "
                         "by building sfx100 from sfx10)")
    ap.add_argument("--offset-scale", type=int, default=1,
                    help="multiply KEY_OFFSETS by this for --build so "
                         "replica keys clear an already-offset source "
                         "fixture (sfx10 source → 100)")
    ap.add_argument("--serve", action="store_true",
                    help="serve-only protocol (VERDICT r12 ask #5): one "
                         "untimed warm-up per entry pays cold store "
                         "builds; report warm min-of-N + cold_first")
    args = ap.parse_args()
    if args.build:
        build(args.dest, args.factor or FACTOR, args.src,
              args.offset_scale)
    else:
        pairs = None
        factor = args.factor if args.factor is not None else FACTOR
        if args.pair:
            parts = args.pair.split(",")
            assert len(parts) == 2 and all("=" in p for p in parts), (
                "--pair needs exactly two name=dir items"
            )
            pairs = [tuple(p.split("=", 1)) for p in parts]
            assert args.factor is not None, (
                "--pair runs must pass --factor explicitly: the recorded "
                "provenance is the growth factor between the two dirs, "
                "not the default build factor"
            )
            factor = args.factor
        run(args.runs, args.only.split(",") if args.only else None,
            pairs, factor, args.serve)
