"""Capture `.explain("formatted")` for named registry entries into
plans/r15/<query>_<tag>.txt (tag = before/after).

Usage: python scripts/capture_plans_r15.py before q01_pricing_summary x261_...

Note: for queries whose fn performs side-effect actions (store builds,
streaming drains), the captured plan is the RETURNED frame's plan — the
part the noop sink times after the fn's internal actions complete.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from json_to_parquet_spark.queries import registry
    from json_to_parquet_spark.session import build_session

    spark = build_session(app_name=f"plans_{tag}")
    reg = registry()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = reg[name].spark(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
