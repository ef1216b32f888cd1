"""Sketch aggregates: HLL relative-error bound vs the exact answer, and
the DataSketches merge identity (per-half sketches unioned == whole-corpus
sketch) that makes incremental reach correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_spark.operators.sketch import (
    merged_reach,
    user_reach_exact,
    user_reach_hll,
    user_reach_sketch,
)
from map_reduce_framework_spark.sources.io import load_table


def test_hll_within_relative_error(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    exact = {r["event_type"]: r["reach"] for r in user_reach_exact(events).collect()}
    approx = {
        r["event_type"]: r["reach_approx"]
        for r in user_reach_hll(events, rsd=0.05).collect()
    }
    assert set(exact) == set(approx)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(3, 0.15 * n), (t, n, approx[t])


def test_sketch_merge_identity(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    whole = {
        r["event_type"]: r["reach_sketch"]
        for r in user_reach_sketch(events).collect()
    }
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    merged = {
        r["event_type"]: r["reach_sketch"]
        for r in merged_reach(half_a, half_b).collect()
    }
    # sketch union is lossless over the sketch state: merging per-half
    # sketches must reproduce the whole-corpus estimate exactly
    assert merged == whole


def test_sketch_close_to_exact(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    exact = {r["event_type"]: r["reach"] for r in user_reach_exact(events).collect()}
    sk = {
        r["event_type"]: r["reach_sketch"]
        for r in user_reach_sketch(events).collect()
    }
    for t, n in exact.items():
        assert abs(sk[t] - n) <= max(3, 0.1 * n), (t, n, sk[t])
