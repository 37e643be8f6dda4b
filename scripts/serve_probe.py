"""Third-decade SERVE evidence (VERDICT r12 ask #5): the flagship
serve-path consumers measured at sfx10 vs sfx100 (sf≈10 vs sf≈100 —
the second-vs-third decade above sf0.1), under the serve-only
protocol: one UNTIMED-separately warm-up call per (entry, scale) pays
every cold store build (GATE_DIR-keyed quantizers / graphs / lexicons
/ layouts — pay-once costs a deployment amortizes over every query;
the warm-up wall IS recorded as ``cold_first`` so the pay-once cost
stays visible), then the reported number is the min over the WARM
serve calls only.

Entries (the ask's list): x21/x230 (IVF search), x248 (beam serve —
both the registered gate row with its exact-truth audit AND the
``beam_serve`` serve-only decomposition, the GRAPH_PROBE pattern),
x259 (policy-routed graph serve), x267 (policy-routed re-tokenize),
x272 (policy-routed layout serve).  Ordered cheapest-first so a
partial run still yields usable rows.

Usage:
    python scripts/serve_probe.py [--runs N] [--lo d] [--hi d]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LO = ("sfx10", "/tmp/spark_graft_sfx10")
HI = ("sfx100", "/tmp/spark_graft_sfx100")

ENTRIES = [
    "x272_policy_routed_layout_serve",
    "x267_policy_routed_retok",
    "x248_graph_beam_search",
    "x259_policy_routed_graph_serve",
    "x21_ivf_ann",
    "x230_refined_ivf_search",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--lo", type=str, default=f"{LO[0]}={LO[1]}")
    ap.add_argument("--hi", type=str, default=f"{HI[0]}={HI[1]}")
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()

    from json_to_parquet_spark.queries import registry
    from json_to_parquet_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="serve_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    reg = registry()
    names = args.only.split(",") if args.only else ENTRIES
    out: dict[str, dict] = {}
    pairs = [tuple(args.lo.split("=", 1)), tuple(args.hi.split("=", 1))]
    for sf_name, sf_dir in pairs:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_name}: {sf_dir} missing", file=sys.stderr)
            continue
        for name in names:
            # warm-up: pays every cold store build once; recorded, not
            # folded into the serve number
            t0 = time.time()
            reg[name].spark(spark, sf_dir).collect()
            cold = round(time.time() - t0, 3)
            row = out.setdefault(name, {})
            row.setdefault("cold_first", {})[sf_name] = cold
            print(f"{sf_name} {name}: cold_first {cold}s", file=sys.stderr)
            best = None
            for _ in range(args.runs):
                t0 = time.time()
                reg[name].spark(spark, sf_dir).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row[sf_name] = round(best, 3)
            print(f"{sf_name} {name}: warm {best:.3f}s", file=sys.stderr)
            if name == "x248_graph_beam_search":
                # serve-only decomposition: the walk without the gate
                # row's broadcast(NQ)×corpus exact-truth audit
                from json_to_parquet_spark.queries.graph_ssl import (
                    beam_serve,
                )

                best = None
                for _ in range(max(2, args.runs)):
                    t0 = time.time()
                    beam_serve(spark, sf_dir).collect()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                srow = out.setdefault("x248_serve_only", {})
                srow[sf_name] = round(best, 3)
                print(
                    f"{sf_name} x248_serve_only: {best:.3f}s",
                    file=sys.stderr,
                )
    lo_name, hi_name = pairs[0][0], pairs[1][0]
    for name, row in out.items():
        if lo_name in row and hi_name in row:
            row["ratio_d3"] = round(row[hi_name] / row[lo_name], 2)
    print(
        json.dumps(
            {
                "runs": args.runs,
                "protocol": "serve-only: cold_first recorded, warm min",
                "pair": [lo_name, hi_name],
                "queries": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
