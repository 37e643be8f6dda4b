#!/usr/bin/env python
"""x267 third-decade decomposition (VERDICT r13 ask #3).

x267_policy_routed_retok read 7.91×/decade at sfx10 → sfx100 — below
the 10×/decade linear wall but the closest serve entry to it.  This
probe splits the entry into its phases, the x248 serve-only pattern:

  decision    — x266 (impact measure: trains BOTH rule tables over the
                corpus slice + counts occurrences; corpus-linear scan)
  store_read  — the adopted lexicon store read (vocab-sized, pay-once)
  serve_only  — ``_retok_docs`` over a pre-loaded lexicon: the explode
                + word-keyed join + doc-keyed reassembly, no decision
  full        — the registered x267 (decision + routed serve)

so the ×/decade exponent can be attributed: if serve_only carries it,
the number is the corpus's own 10× growth at flat per-row cost (honest
linear work), not store read amplification or a skewed word bucket.

Protocol: one untimed warm-up per scale pays cold store builds
(recorded as cold_first), then warm min-of-N per phase.

Usage:
    python scripts/retok_probe.py [--runs N] [--lo sfx10=/tmp/...] [--hi ...]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--lo", type=str, default=f"{LO[0]}={LO[1]}")
    ap.add_argument("--hi", type=str, default=f"{HI[0]}={HI[1]}")
    args = ap.parse_args()

    from json_to_parquet_spark.session import build_session
    from json_to_parquet_spark.queries import tokenizer as tok

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="retok_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    def timed(fn, runs: int) -> float:
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    out: dict[str, dict] = {}
    for sf_name, sf_dir in (
        tuple(args.lo.split("=", 1)),
        tuple(args.hi.split("=", 1)),
    ):
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_name}: {sf_dir} missing", file=sys.stderr)
            continue
        row: dict[str, float] = {}
        t0 = time.time()
        tok.x267_policy_routed_retok(spark, sf_dir).collect()
        row["cold_first"] = round(time.time() - t0, 3)
        print(f"{sf_name} cold_first {row['cold_first']}s", file=sys.stderr)

        row["decision"] = timed(
            lambda: tok.x266_retok_swap_policy(spark, sf_dir).collect(),
            args.runs,
        )
        decision = (
            tok.x266_retok_swap_policy(spark, sf_dir).collect()[0].decision
        )
        path = (
            tok.bpe_lexicon_path(spark, sf_dir)
            if decision == "swap"
            else tok.bpe_hold_lexicon_path(spark, sf_dir)
        )
        row["store_read"] = timed(
            lambda: spark.read.parquet(path).count(), args.runs
        )
        lex = spark.read.parquet(path)
        row["serve_only"] = timed(
            lambda: tok._retok_docs(spark, sf_dir, lex).collect(), args.runs
        )
        row["full"] = timed(
            lambda: tok.x267_policy_routed_retok(spark, sf_dir).collect(),
            args.runs,
        )
        row["decision_label"] = decision
        out[sf_name] = row
        print(f"{sf_name}: {row}", file=sys.stderr)

    if len(out) == 2:
        (lo_n, lo), (hi_n, hi) = out.items()
        out["x_per_decade"] = {
            k: round(hi[k] / lo[k], 2)
            for k in ("decision", "store_read", "serve_only", "full")
            if lo.get(k)
        }
    print(json.dumps({"retok_probe": out}))


if __name__ == "__main__":
    main()
