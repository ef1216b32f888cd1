"""Bucketed co-located join: correctness + the plan property that matters
(no shuffle Exchange on either side of the fact-fact join)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_spark.sources import bucketing
from map_reduce_framework_spark.sources.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke, tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("bucket_wh"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{warehouse}'")
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    bucketing.write_bucketed(orders, "bdb.orders_b", "o_orderkey", 8)
    bucketing.write_bucketed(lineitem, "bdb.lineitem_b", "o_orderkey", 8)
    yield "bdb.orders_b", "bdb.lineitem_b", orders, lineitem
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt, _, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.cobucketed_join(spark, lt, rt, "o_orderkey")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    # The whole point: bucket layout replaces the shuffle.
    assert "Exchange hashpartitioning" not in plan


def test_cobucketed_join_matches_plain(spark, bucketed_tables):
    lt, rt, orders, lineitem = bucketed_tables
    got = (
        bucketing.cobucketed_join(spark, lt, rt, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    want = (
        orders.join(lineitem, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
