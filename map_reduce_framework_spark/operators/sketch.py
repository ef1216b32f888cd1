"""Approximate / mergeable sketch aggregates.

The reference's only aggregate is exact group-by-key counting
(go-map-reduce-framework/mrapps/wc.go:39-42); at 100 TB, exact
COUNT(DISTINCT) over a high-cardinality column is a full shuffle of every
distinct value. The sketch path trades bounded error for a
constant-size, MERGEABLE partial state: each partition builds a sketch,
partials merge associatively map-side, and only KB-sized states cross
the network -- the same contract the reference's combinerless shuffle
lacks entirely.

Two tiers, both JVM-native (no Python in the hot path):

- ``approx_count_distinct`` -- Spark's built-in HyperLogLog++ (Heule et
  al., EDBT'13) aggregate; relative error configurable (default 5%).
- ``hll_sketch_agg`` / ``hll_sketch_estimate`` -- Apache DataSketches
  HLL (Spark 3.5+): the sketch itself is a first-class binary value, so
  partial sketches can be PERSISTED (e.g. per-day) and re-merged later
  with ``hll_union_agg`` -- incremental reach over rolling windows
  without re-reading history. That persist-and-remerge property is the
  100 TB design point; the demo query and test exercise exactly it.

Correctness protocol: approximate answers cannot hash-match a DuckDB
oracle (different hash functions => different estimates), so the exact
twin (``user_reach``) carries the oracle, the sketch queries register as
rows-only, and pytest pins the relative error and the merge identity
(union of per-half sketches == whole-corpus sketch, bit-for-bit
estimate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_reach_exact(events: DataFrame) -> DataFrame:
    """Exact distinct users per event type -- the oracle-carrying twin."""
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("reach")
    )


def user_reach_hll(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct users per event type (rsd = target relative
    standard deviation). Deterministic for a given input (hash-based, no
    RNG), so the rows-only driver check is stable run-to-run."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("reach_approx")
    )


def user_reach_sketch(events: DataFrame) -> DataFrame:
    """DataSketches HLL reach per event type, built as a mergeable binary
    sketch then estimated -- the persistable variant (the sketch column
    could be written per-day and re-unioned with ``hll_union_agg``)."""
    sk = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    return sk.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("reach_sketch"),
    )


def merged_reach(events_a: DataFrame, events_b: DataFrame) -> DataFrame:
    """Union two per-split sketch sets into one estimate per event type --
    the incremental-aggregation identity the tests pin: building sketches
    on two disjoint halves and merging them must equal the whole-corpus
    sketch estimate exactly (sketch union is lossless w.r.t. the sketch
    state, unlike averaging estimates)."""
    halves = [
        df.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sketch"))
        for df in (events_a, events_b)
    ]
    return (
        halves[0]
        .unionByName(halves[1])
        .groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .select(
            "event_type", F.hll_sketch_estimate("sketch").alias("reach_sketch")
        )
    )


ORACLE_SQL: dict[str, str] = {
    "user_reach": """
        SELECT event_type, count(DISTINCT user_id) AS reach
        FROM events GROUP BY event_type
    """,
}
