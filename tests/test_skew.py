"""Skew-mitigation equivalence: the salted two-phase rewrites must produce
exactly the plain aggregation/join results (they are pure physical
rewrites), including on a deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_spark.operators import skew


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _skewed_df(spark):
    # 90% of rows share one key -- the hot-reducer shape.
    return spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


def test_salted_count_equals_plain(spark):
    df = _skewed_df(spark)
    got = _rows(skew.salted_count(df, ["k"]))
    want = _rows(df.groupBy("k").agg(F.count("*").alias("n")))
    assert got == want


def test_salted_aggregate_multi_fn(spark):
    df = _skewed_df(spark)
    got = _rows(
        skew.salted_aggregate(
            df,
            ["k"],
            partials=[
                F.sum("v").alias("s"),
                F.max("v").alias("m"),
                F.count("*").alias("c"),
            ],
            merges=[
                F.sum("s").alias("total"),
                F.max("m").alias("vmax"),
                F.sum("c").alias("n"),
            ],
        )
    )
    want = _rows(
        df.groupBy("k").agg(
            F.sum("v").alias("total"),
            F.max("v").alias("vmax"),
            F.count("*").alias("n"),
        )
    )
    assert got == want


def test_hot_key_split_join_equals_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k42", "K42")], "k string, label string"
    )
    hot = skew.top_keys_by_frequency(fact, "k", top_n=1)
    assert [r["k"] for r in hot.collect()] == ["hot"]
    got = _rows(skew.broadcast_hot_keys_join(fact, dim, "k", hot))
    want = _rows(fact.join(dim, "k", "inner"))
    assert got == want


def _star_lineitem(spark):
    """Power-law co-purchase fixture: every one of 300 orders contains
    part 0 (the hub) plus two parts from a long tail -- the contribution
    groupBy(dst=0) receives ~600 in-edges while tail nodes get a few."""
    return spark.range(0, 300).select(
        F.col("id").alias("l_orderkey"),
        F.explode(
            F.array(
                F.lit(0),
                (F.col("id") % 40 + 1).cast("long"),
                (F.col("id") % 53 + 41).cast("long"),
            )
        ).alias("l_partkey"),
    )


def test_salted_pagerank_equals_plain_on_hub_graph(spark):
    """The salted contribution aggregate is a pure physical rewrite:
    bit-identical ranks on a deliberately hub-skewed graph (exact BIGINT
    contribution sums make this equality, not approximation)."""
    from map_reduce_framework_spark.operators.graph import (
        part_pagerank,
        part_pagerank_salted,
    )

    li = _star_lineitem(spark)
    got = _rows(part_pagerank_salted(li, n_salt=8))
    want = _rows(part_pagerank(li))
    assert got == want
