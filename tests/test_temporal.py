"""As-of join tests: differential against pandas merge_asof (an
independent implementation of backward-inclusive as-of semantics) plus
edge cases the window formulation must get right."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from map_reduce_framework_spark.operators.temporal import asof_join


def _spark_asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows, "user_id long, ts long, l_val string"
    )
    right = spark.createDataFrame(
        right_rows, "user_id long, ts long, r_val string"
    )
    return {
        (r["user_id"], r["ts"], r["l_val"]): (r["r_val"], r["matched_ts"])
        for r in asof_join(left, right, ts="ts", by=["user_id"]).collect()
    }


def test_asof_matches_pandas_merge_asof(spark):
    rng = random.Random(7)
    left_rows = [
        (rng.randrange(5), rng.randrange(100), f"l{i}") for i in range(200)
    ]
    right_rows = []
    seen = set()
    for i in range(150):
        key = (rng.randrange(5), rng.randrange(100))
        if key in seen:  # right must be unique per (key, ts)
            continue
        seen.add(key)
        right_rows.append((*key, f"r{i}"))

    got = _spark_asof(spark, left_rows, right_rows)

    lp = pd.DataFrame(left_rows, columns=["user_id", "ts", "l_val"]).sort_values(
        "ts", kind="stable"
    )
    rp = pd.DataFrame(right_rows, columns=["user_id", "ts", "r_val"]).sort_values(
        "ts", kind="stable"
    )
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward"
    )
    assert len(got) == len(left_rows) == len(want_df)
    for row in want_df.itertuples():
        r_val, m_ts = got[(row.user_id, row.ts, row.l_val)]
        assert r_val == (None if pd.isna(row.r_val) else row.r_val)
        if r_val is None:
            assert m_ts is None


def test_asof_edges(spark):
    got = _spark_asof(
        spark,
        [(1, 5, "before_any"), (1, 10, "exact"), (1, 20, "after"), (2, 50, "other_key")],
        [(1, 10, "a"), (1, 15, "b"), (3, 1, "c")],
    )
    assert got[(1, 5, "before_any")] == (None, None)
    assert got[(1, 10, "exact")] == ("a", 10)  # inclusive backward
    assert got[(1, 20, "after")] == ("b", 15)
    assert got[(2, 50, "other_key")] == (None, None)


def test_asof_rejects_overlapping_columns(spark):
    df = spark.createDataFrame([(1, 1, "x")], "user_id long, ts long, v string")
    with pytest.raises(ValueError):
        asof_join(df, df, ts="ts", by=["user_id"])


def test_asof_plan_is_single_shuffle(spark):
    """The plan must be window-shaped: one hash exchange on the key, no
    join operator at all (the naive theta-join formulation would show
    BroadcastNestedLoopJoin/CartesianProduct)."""
    left = spark.createDataFrame([(1, 1, "x")], "user_id long, ts long, l string")
    right = spark.createDataFrame([(1, 1, "y")], "user_id long, ts long, r string")
    plan = asof_join(left, right, ts="ts", by=["user_id"])._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(") == 1


def test_gapfill_daily_matches_pandas(spark):
    """Differential: pandas groupby-resample('D')-ffill is an independent
    implementation of dense-grid + last-observation-carried-forward."""
    import datetime

    from map_reduce_framework_spark.operators.temporal import gapfill_daily

    rng = random.Random(11)
    rows = []
    seen = set()
    for i in range(300):
        key = (rng.randrange(6), rng.randrange(60 * 86400))
        if key in seen:
            continue
        seen.add(key)
        u, off = key
        rows.append(
            (
                u,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=off),
                float(rng.randrange(1000)),
            )
        )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["day"]): (r["n_events"], r["value_ffill"])
        for r in gapfill_daily(df).collect()
    }

    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    want = {}
    for u, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        daily = g.set_index("ts").resample("D").agg(
            n=("value", "size"), last=("value", "last")
        )
        daily["last"] = daily["last"].ffill()
        for day, r in daily.iterrows():
            want[(u, day.date())] = (int(r["n"]), float(r["last"]))
    assert got == want
    # the fixture actually has gaps (filled rows with n_events == 0)
    assert any(n == 0 for n, _ in got.values())


def test_gapfill_plan_has_no_cartesian(spark):
    import datetime

    from map_reduce_framework_spark.operators.temporal import gapfill_daily

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    plan = gapfill_daily(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
