"""q00 — the reference's flagship convert pipeline as a gate query.

The reference's entire end-to-end surface (scan gzipped NDJSON → infer
schema → recursive ``_dt`` rewrite → global sort → tuned Parquet sink;
/root/reference/pyarrow/main.py:94-169) was pytest-only evidence in
round 1. This module runs the REAL pipeline — ``operators.convert`` on a
deterministic gzipped NDJSON fixture with ``_dt`` sites at all three
nesting shapes (top level, struct, list<struct>) — and exposes the
written Parquet through the correctness gate, compared against a DuckDB
``read_json`` + ``strptime`` oracle over the same fixture file.

The fixture is generated on demand at a fixed path with fully
deterministic content (no randomness, atomic rename), so the Spark side
and the DuckDB oracle always read identical bytes regardless of which
engine the driver runs first.
"""

from __future__ import annotations

import datetime
import gzip
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, register

GATE_DIR = os.path.join(tempfile.gettempdir(), "spark_graft_gate")
FIXTURE_PATH = os.path.join(GATE_DIR, "convert_gate.ndjson.gz")
OUTPUT_PATH = os.path.join(GATE_DIR, "out_q00")

_N_ROWS = 400
_BASE_EPOCH = 1735689600  # 2025-01-01T00:00:00Z, whole seconds
_ISO = "%Y-%m-%dT%H:%M:%SZ"


def _iso(epoch_s: int) -> str:
    return datetime.datetime.fromtimestamp(epoch_s, datetime.timezone.utc).strftime(
        _ISO
    )


def _record(i: int) -> dict:
    t = _BASE_EPOCH + i
    return {
        "id": i,
        "time": t * 1000,  # epoch millis, like the reference generator
        "time_dt": _iso(t),
        "meta": {"name": f"prod{i % 5}", "my_dt": _iso(t + 7)},
        "items": [
            {"uid": f"u{i:04d}a", "created_time_dt": _iso(t - 86400)},
            {"uid": f"u{i:04d}b", "created_time_dt": _iso(t - 3600)},
        ],
    }


def ensure_convert_fixture(path: str = FIXTURE_PATH) -> str:
    """Write the deterministic gate fixture if absent (atomic rename, so a
    concurrent Spark/DuckDB reader never sees a partial file). Rows are
    written in a fixed non-monotonic permutation (stride 7 mod 400) so the
    convert pipeline's sort actually has work to do."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with gzip.open(tmp, "wt") as f:
        for j in range(_N_ROWS):
            f.write(json.dumps(_record((j * 7) % _N_ROWS)) + "\n")
    os.replace(tmp, path)
    return path


def q00_convert_dt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full convert pipeline (inference + ``_dt`` rewrite + global
    sort + tuned Parquet write) and return the written output, projected to
    driver-sortable scalars (timestamps → epoch micros, helpers.py rule 4)."""
    from ..operators.convert import convert

    src = ensure_convert_fixture()
    convert(spark, src, OUTPUT_PATH, sort_column="time", mode="global")
    out = spark.read.parquet(OUTPUT_PATH)
    return out.select(
        "id",
        "time",
        F.unix_micros("time_dt").alias("time_dt_us"),
        F.col("meta.name").alias("meta_name"),
        F.unix_micros(F.col("meta.my_dt")).alias("my_dt_us"),
        F.unix_micros(F.col("items")[0]["created_time_dt"]).alias("item1_dt_us"),
        F.unix_micros(F.col("items")[1]["created_time_dt"]).alias("item2_dt_us"),
    )


register(
    QuerySpec(
        "q00_convert_dt",
        q00_convert_dt,
        f"""
        SELECT id, time,
               epoch_us(strptime(time_dt, '%Y-%m-%dT%H:%M:%SZ')) AS time_dt_us,
               meta.name AS meta_name,
               epoch_us(strptime(meta.my_dt, '%Y-%m-%dT%H:%M:%SZ')) AS my_dt_us,
               epoch_us(strptime(items[1].created_time_dt,
                                 '%Y-%m-%dT%H:%M:%SZ')) AS item1_dt_us,
               epoch_us(strptime(items[2].created_time_dt,
                                 '%Y-%m-%dT%H:%M:%SZ')) AS item2_dt_us
        FROM read_json('{FIXTURE_PATH}', format='newline_delimited',
                       columns={{'id': 'BIGINT', 'time': 'BIGINT',
                                 'time_dt': 'VARCHAR',
                                 'meta': 'STRUCT(name VARCHAR, my_dt VARCHAR)',
                                 'items': 'STRUCT(uid VARCHAR, created_time_dt VARCHAR)[]'}})
        """,
        "flagship convert pipeline (scan→infer→_dt rewrite→sort→parquet) vs read_json oracle",
    )
)
