"""Differential harness mirroring the driver's correctness gate: run every
registered query in Spark AND its DuckDB oracle on the same parquet, then
compare row count, column names, and an order-insensitive value
representation. Runs at sf0.001 for speed (the driver uses sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

from json_to_parquet_spark.queries import registry
from json_to_parquet_spark.sources.catalog import TABLES

# driver-window profile (pytest.ini): the driver's CORRECTNESS gate re-proves this ground every round — release gate runs it via -m ""
pytestmark = pytest.mark.slow



def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — mismatch in any bit is a failure
    if isinstance(v, bool):
        return f"b:{v}"
    return repr(v)


def _rowset(rows, columns):
    return sorted("|".join(_canon(v) for v in row) for row in rows)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


ORACLE_SPECS = [s for s in registry().values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in registry().values() if s.oracle is None]


def _norm_dtype(dt) -> str:
    s = str(dt)
    return {
        "int32": "int64",
        "Int64": "int64",
        "Int32": "int64",
        "uint64": "int64",
        "Float64": "float64",
        "string": "object",
    }.get(s, s)


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_match(spark, sf_dir, duck, spec):
    sdf = spec.spark(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), "column names differ"
    assert len(spark_rows) == len(duck_rows), "row counts differ"

    # The DRIVER compares through pandas frames, where a type the repr
    # check can't see (e.g. DuckDB HUGEINT from SUM(BIGINT) → object
    # dtype) breaks its canonicalization — assert pandas dtype parity
    # too (the x46 lesson).
    s_dtypes = {c: _norm_dtype(t) for c, t in sdf.toPandas().dtypes.items()}
    d_dtypes = {
        c: _norm_dtype(t) for c, t in duck.execute(spec.oracle).df().dtypes.items()
    }
    if len(spark_rows):  # empty frames carry engine-default dtypes
        assert s_dtypes == d_dtypes, "pandas dtypes differ"

    # align column order by name before hashing values
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    didx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_set = _rowset([[r[i] for i in sidx] for r in spark_rows], spark_cols)
    d_set = _rowset([[r[i] for i in didx] for r in duck_rows], duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spark, sf_dir, spec):
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
