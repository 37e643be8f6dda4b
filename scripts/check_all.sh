#!/usr/bin/env bash
# Full pre-round gate: tests at fixture scale, driver-gate mirror at
# sf0.01, then bench. Exits nonzero on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest FULL suite / release gate (sf0.001 fixtures) =="
python -m pytest tests/ -q -m ""

echo "== oracle parity at driver scale (sf0.01) =="
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 \
  python -m pytest tests/test_oracle_parity.py tests/test_invariants.py -q -m ""

echo "== bench (sf0.1) =="
python bench.py
