"""Idle-box drift-watch settlement probe (the r7→r8 protocol,
BASELINE.md rows 32-33): min-of-N timings for a named list of
registry entries on a FRESH session, optionally preceded by a
configurable number of "filler" headline entries run in the same JVM
— the A/B that separates a plan regression from bench-session
accumulation (heap/cache pressure after ~90 entries in one JVM).

Usage:
  python scripts/drift_watch.py x215_filtered_ann x214_semdedup_capacity \
      [--runs 5] [--filler 0] [--sf-dir /root/testdata/sf0.1]

With --filler K, the first K entries of bench.py's HEADLINE list are
executed once each (noop sink) BEFORE the watched entries are timed —
reproducing the watched entries' position in a long bench session.
Prints one JSON line per watched entry and a trailing summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_to_parquet_spark.queries import registry  # noqa: E402
from json_to_parquet_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--filler", type=int, default=0)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = build_session(app_name="drift_watch")
    reg = registry()

    if args.filler:
        from bench import HEADLINE  # noqa: E402

        for name in HEADLINE[: args.filler]:
            reg[name].spark(spark, args.sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
        print(
            json.dumps({"filler_entries_run": args.filler}), file=sys.stderr
        )

    results = {}
    for name in args.names:
        fn = reg[name].spark

        def run():
            fn(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()

        run()  # warm-up (store builds, codegen)
        raws = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            run()
            raws.append(round(time.perf_counter() - t0, 3))
        results[name] = {"min": min(raws), "raws": raws}
        print(json.dumps({name: results[name]}))

    print(
        json.dumps(
            {
                "watch": {k: v["min"] for k, v in results.items()},
                "runs": args.runs,
                "filler": args.filler,
                "sf_dir": args.sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
