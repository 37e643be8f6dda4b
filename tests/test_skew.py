from __future__ import annotations

from pyspark.sql import functions as F

from json_to_parquet_spark.operators.skew import salted_join
from json_to_parquet_spark.sources.catalog import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # a small dim keyed by suppkey (skew stand-in: few keys, many rows each)
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = li.join(supp, "l_suppkey").groupBy("s_name").count()
    salted = salted_join(li, supp, "l_suppkey", salts=8, spread_by="l_orderkey")
    salted_agg = salted.groupBy("s_name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted_agg.collect())
    )


def test_salted_join_spreads_hot_key(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    salted = salted_join(li, supp, "l_suppkey", salts=8, spread_by="l_orderkey")
    # deterministic: same call twice -> identical rows
    a = sorted(map(tuple, salted.limit(50).collect()))
    b = sorted(map(tuple, salted_join(li, supp, "l_suppkey", 8, "l_orderkey").limit(50).collect()))
    assert a == b