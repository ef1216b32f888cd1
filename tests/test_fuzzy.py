"""SymSpell-blocked edit-distance join: blocking completeness against the
naive all-pairs answer, variant-generation unit checks, and plan shape
(the join must be an equi-join on the variant, never a theta join)."""

from __future__ import annotations

import itertools
import random
import string

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_spark.operators.fuzzy import (
    deletion_variants,
    edit_distance_pairs,
)


def _py_deletions(s: str, k: int) -> set[str]:
    out = {s}
    frontier = {s}
    for _ in range(k):
        frontier = {
            v[:i] + v[i + 1 :] for v in frontier for i in range(len(v))
        }
        out |= frontier
    return out


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("k", [1, 2])
def test_deletion_variants_match_python(spark, k):
    words = ["", "a", "ab", "abc", "banana", "mississippi"]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", deletion_variants(F.col("w"), k).alias("v")
    )
    got = {r["w"]: set(r["v"]) for r in df.collect()}
    for w in words:
        assert got[w] == _py_deletions(w, k), w


def test_blocked_pairs_equal_naive_all_pairs(spark):
    rng = random.Random(42)
    base = ["".join(rng.choices(string.ascii_lowercase[:6], k=rng.randrange(3, 9))) for _ in range(60)]
    # seed guaranteed near-pairs: mutations of base words
    mutated = []
    for w in base[:20]:
        i = rng.randrange(len(w))
        mutated.append(w[:i] + rng.choice("xyz") + w[i + 1 :])  # substitution
        mutated.append(w[:i] + w[i + 1 :])  # deletion
    vocab = sorted(set(base + mutated))
    df = spark.createDataFrame([(w,) for w in vocab], "name string")
    got = {
        (r["a_name"], r["b_name"], r["dist"])
        for r in edit_distance_pairs(df, "name", k=2).collect()
    }
    want = {
        (a, b, _levenshtein(a, b))
        for a, b in itertools.combinations(vocab, 2)
        if _levenshtein(a, b) <= 2
    }
    assert got == want
    assert len(want) > 20  # the fixture actually exercises matching


def test_plan_is_equi_join_on_variant(spark, sf_smoke):
    from map_reduce_framework_spark.sources.io import load_table

    df = edit_distance_pairs(load_table(spark, sf_smoke, "part"), "p_name", 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
