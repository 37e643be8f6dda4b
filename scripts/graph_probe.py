"""Round-11 graph-family scale probe: BUILD vs SERVE, two decades.

The kNN graph is a build-once index (``knn_graph_path``), so the honest
scale story has two parts — the BUILD cost (one pass per source state;
the linear-pair-volume claim lives here) and the SERVE cost of each
consumer over the stored edges.  This script wipes the graph stores,
times one cold build per scale, then times each consumer min-of-N warm,
and prints one JSON line (recorded as GRAPH_PROBE.json at the repo
root).  The drift family (x237/x242) is probed the same way: the
persisted retrain store is wiped so the first x237 run pays the
retrain, then serve runs are timed.

Usage: python scripts/graph_probe.py [--runs 3]
Scales: sf0.1 (/root/testdata/sf0.1), sfx1, sfx10 fixtures if present.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [
    ("sf0.1", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
    ("sfx1", os.environ.get("SPARK_GRAFT_SFX1_DIR", "/tmp/spark_graft_sfx1")),
    ("sfx10", os.environ.get("SPARK_GRAFT_SFX10_DIR", "/tmp/spark_graft_sfx10")),
]

CONSUMERS = [
    "x238_knn_graph",
    "x239_label_propagation",
    "x241_nn_descent",
    "x243_hubness_audit",
    "x244_centrality_select",
    # round-12: beam-search serving (bounded per-query walk over the
    # stored edges), the knob sweep (one shared n_keep=2 routing pass +
    # audit-cell-restricted builds), and the segment merge (add-batch
    # routing + threshold-hot re-ring; its base store is built cold
    # alongside the graph store below)
    "x248_graph_beam_search",
    "x247_graph_knob_sweep",
    "x246_graph_compaction",
    "x249_multiprobe_graph",
    "x250_label_prop_cdc",
]
DRIFT = ["x237_drift_retrain", "x242_stream_drift_monitor"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-drift", action="store_true")
    args = ap.parse_args()

    from json_to_parquet_spark.queries import registry
    from json_to_parquet_spark.queries.convert_gate import GATE_DIR
    from json_to_parquet_spark.queries.graph_ssl import knn_graph_path
    from json_to_parquet_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="graph_probe", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    reg = registry()
    out: dict[str, dict] = {}
    for sf_name, sf_dir in SCALES:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_name}: {sf_dir} missing", file=sys.stderr)
            continue
        for p in (
            glob.glob(os.path.join(GATE_DIR, "knng_*"))
            + glob.glob(os.path.join(GATE_DIR, "knng2_*"))
            + glob.glob(os.path.join(GATE_DIR, "gseg_*"))
            + glob.glob(os.path.join(GATE_DIR, "drift_recent_*"))
            + glob.glob(os.path.join(GATE_DIR, "serve_occ_*"))
        ):
            shutil.rmtree(p, ignore_errors=True)
        t0 = time.time()
        knn_graph_path(spark, sf_dir)  # cold build, timed once
        build_s = round(time.time() - t0, 3)
        out.setdefault("knng_build", {})[sf_name] = build_s
        print(f"{sf_name} knng_build: {build_s}s", file=sys.stderr)
        from json_to_parquet_spark.queries.graph_ssl import (
            base_graph_paths,
            knn2_graph_path,
        )

        t0 = time.time()
        knn2_graph_path(spark, sf_dir)  # cold nplace=2 build, timed once
        build2_s = round(time.time() - t0, 3)
        out.setdefault("knng2_build", {})[sf_name] = build2_s
        print(f"{sf_name} knng2_build: {build2_s}s", file=sys.stderr)
        t0 = time.time()
        base_graph_paths(spark, sf_dir)  # cold base-segment build (x246)
        gseg_s = round(time.time() - t0, 3)
        out.setdefault("gseg_base_build", {})[sf_name] = gseg_s
        print(f"{sf_name} gseg_base_build: {gseg_s}s", file=sys.stderr)
        names = CONSUMERS + ([] if args.skip_drift else DRIFT)
        for name in names:
            best = None
            for _ in range(args.runs):
                t0 = time.time()
                reg[name].spark(spark, sf_dir).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out.setdefault(name, {})[sf_name] = round(best, 3)
            print(f"{sf_name} {name}: {best:.3f}s", file=sys.stderr)
        # x248 decomposed: the serving walk alone, without the
        # broadcast(NQ)×corpus exact-truth audit the gate row carries
        # (the x172 drain/harness decomposition pattern)
        from json_to_parquet_spark.queries.graph_ssl import beam_serve

        best = None
        for _ in range(args.runs):
            t0 = time.time()
            beam_serve(spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out.setdefault("x248_serve_only", {})[sf_name] = round(best, 3)
        print(f"{sf_name} x248_serve_only: {best:.3f}s", file=sys.stderr)
    for name, row in out.items():
        if "sfx1" in row and "sf0.1" in row:
            row["ratio_d1"] = round(row["sfx1"] / row["sf0.1"], 2)
        if "sfx10" in row and "sfx1" in row:
            row["ratio_d2"] = round(row["sfx10"] / row["sfx1"], 2)
    print(json.dumps({"runs": args.runs, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
