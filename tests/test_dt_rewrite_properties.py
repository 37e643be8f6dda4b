"""Hypothesis property tests for the ``_dt`` rewriter (SURVEY §5b):
random nested schemas/data → rewrite is idempotent, converts exactly the
string ``*_dt`` sites, and leaves every other value untouched."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from json_to_parquet_spark.functions.dt_rewrite import (
    dt_rewrite_paths,
    rewrite_dt_fields,
)

UTC = datetime.timezone.utc

field_names = st.sampled_from(
    ["alpha", "beta", "gamma_dt", "delta_dt", "epsilon", "zeta"]
)


def leaf_types():
    return st.sampled_from(
        [T.StringType(), T.LongType(), T.DoubleType(), T.BooleanType()]
    )


def schema_trees(depth: int):
    if depth == 0:
        return leaf_types()
    sub = schema_trees(depth - 1)
    return st.one_of(
        leaf_types(),
        st.builds(T.ArrayType, sub),
        st.lists(
            st.builds(lambda n, t: T.StructField(n, t), field_names, sub),
            min_size=1,
            max_size=3,
            unique_by=lambda f: f.name,
        ).map(T.StructType),
    )


schemas = st.lists(
    st.builds(lambda n, t: T.StructField(n, t), field_names, schema_trees(2)),
    min_size=1,
    max_size=4,
    unique_by=lambda f: f.name,
).map(T.StructType)


ISO = "2025-04-05T06:07:08Z"
PARSED = datetime.datetime(2025, 4, 5, 6, 7, 8)


def value_for(dtype: T.DataType, name: str):
    if isinstance(dtype, T.StringType):
        return ISO if name.endswith("_dt") else "plain"
    if isinstance(dtype, T.LongType):
        return 42
    if isinstance(dtype, T.DoubleType):
        return 1.5
    if isinstance(dtype, T.BooleanType):
        return True
    if isinstance(dtype, T.ArrayType):
        return [value_for(dtype.elementType, name)]
    if isinstance(dtype, T.StructType):
        return {f.name: value_for(f.dataType, f.name) for f in dtype.fields}
    raise AssertionError(dtype)


def expect(dtype: T.DataType, name: str, value):
    """What the rewritten value must look like."""
    if isinstance(dtype, T.StringType) and name.endswith("_dt"):
        return PARSED
    if isinstance(dtype, T.ArrayType):
        # elements are anonymous: an array field named '*_dt' does NOT
        # convert its string elements (reference list-path semantics)
        return [expect(dtype.elementType, "", v) for v in value]
    if isinstance(dtype, T.StructType):
        return {
            f.name: expect(f.dataType, f.name, value[f.name]) for f in dtype.fields
        }
    return value


def normalize(value):
    """Row → plain python (Rows → dicts) for comparison."""
    if hasattr(value, "asDict"):
        return {k: normalize(v) for k, v in value.asDict().items()}
    if isinstance(value, list):
        return [normalize(v) for v in value]
    if isinstance(value, dict):
        return {k: normalize(v) for k, v in value.items()}
    return value


@given(schema=schemas)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rewrite_properties(spark, schema):
    row = {f.name: value_for(f.dataType, f.name) for f in schema.fields}
    df = spark.createDataFrame([row], schema)
    out = rewrite_dt_fields(df)

    # 1. after one pass, no string *_dt site remains
    assert dt_rewrite_paths(out.schema) == []
    # 2. idempotent: second pass is a no-op object-wise
    assert rewrite_dt_fields(out) is out
    # 3. every value matches the expected rewrite (non-_dt untouched,
    #    _dt strings parsed to the exact timestamp)
    got = normalize(out.collect()[0])
    want = {
        f.name: expect(f.dataType, f.name, row[f.name]) for f in schema.fields
    }
    assert got == want