"""CDC merge operator: latest-wins versioning, delete-wins, upsert on
absent/present keys, untouched pass-through — and the plan contract (the
changes-side window exchange is reused by the join)."""

from __future__ import annotations

from json_to_parquet_spark.operators.cdc import apply_changes


def _merge(spark, base_rows, change_rows):
    base = spark.createDataFrame(base_rows, "k long, val string")
    changes = spark.createDataFrame(
        change_rows, "k long, val string, op string, version long"
    )
    out = apply_changes(base, changes, keys=["k"])
    return {r.k: r.val for r in out.collect()}


def test_update_delete_insert(spark):
    got = _merge(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        [
            (1, "a1", "U", 1),
            (1, "a2", "U", 2),  # latest wins
            (2, None, "D", 1),  # delete drops the key
            (9, "new", "I", 1),  # insert new key
        ],
    )
    assert got == {1: "a2", 3: "c", 9: "new"}


def test_delete_then_reinsert_and_upsert_semantics(spark):
    got = _merge(
        spark,
        [(1, "a"), (2, "b")],
        [
            (1, None, "D", 1),
            (1, "back", "I", 2),  # later insert revives the key
            (2, "b2", "I", 1),  # I on existing key upserts
            (5, "u", "U", 1),  # U on absent key inserts
        ],
    )
    assert got == {1: "back", 2: "b2", 5: "u"}


def test_single_shuffle_per_side(spark):
    base = spark.createDataFrame([(1, "a")], "k long, val string")
    changes = spark.createDataFrame(
        [(1, "a1", "U", 1)], "k long, val string, op string, version long"
    )
    plan = (
        apply_changes(base, changes, keys=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # window exchange on the changes side is reused by the join: exactly
    # one hashpartitioning exchange per side, none stacked
    assert plan.count("Exchange hashpartitioning") <= 2
