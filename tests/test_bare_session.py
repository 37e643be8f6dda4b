"""The correctness driver calls queries with ITS OWN SparkSession (none of
our session.py confs). Every registered query must still run — the catalog
pins the required runtime confs per load. Subprocess because a bare
session can't coexist with the test session in one JVM."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
import os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[4]").appName("bare").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
import pytest

# driver-window profile (pytest.ini): fresh-subprocess Spark sessions — release gate runs it via -m ""
pytestmark = pytest.mark.slow

failed = []
# events-dependent queries are the regression surface (nanos timestamps,
# TZ-dependent rendering); one non-events query guards the general path
for name in ["q06_event_stats", "q08_running_window", "q23_asof_last_click",
             "q25_hourly_rollup", "q26_sessionize", "q38_string_agg",
             "q01_pricing_summary"]:
    try:
        e.queries()[name](spark, "/root/testdata/sf0.001").collect()
    except Exception as ex:
        failed.append((name, str(ex).splitlines()[0]))
assert not failed, failed
assert len(e.entry(spark).collect()) > 0
print("BARE_SESSION_OK")
"""


def test_all_queries_run_on_bare_driver_session():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=400,
    )
    assert "BARE_SESSION_OK" in out.stdout, out.stderr[-2000:]