"""Column profiling operator: exact counts, null accounting, uniform
string min/max, and the approx (HLL, no-Expand) mode."""

from __future__ import annotations

from json_to_parquet_spark.operators.profile import profile


def test_profile_exact(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (None, "a")],
        "k long, s string",
    )
    rows = {r.col_name: r for r in profile(df).collect()}
    assert set(rows) == {"k", "s"}
    k, s = rows["k"], rows["s"]
    assert (k.n_rows, k.n_nulls, k.n_distinct, k.min_val, k.max_val) == (4, 1, 2, "1", "2")
    assert (s.n_rows, s.n_nulls, s.n_distinct, s.min_val, s.max_val) == (4, 1, 2, "a", "b")


def test_profile_approx_no_expand(spark):
    df = spark.range(1000).selectExpr("id", "id % 7 AS m")
    prof = profile(df, exact=False)
    # HLL on tiny cardinalities is exact; the point is the plan has no Expand
    rows = {r.col_name: r for r in prof.collect()}
    assert rows["m"].n_distinct == 7
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_profile_subset_and_empty(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    assert [r.col_name for r in profile(df, cols=["s"]).collect()] == ["s"]
    empty = df.filter("k < 0")
    r = profile(empty, cols=["k"]).collect()[0]
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (0, 0, 0)
    assert r.min_val is None and r.max_val is None
