"""Skew mitigation primitives.

AQE's skew-join splitting handles most cases at runtime
(session.py enables it), but two situations still need explicit salting at
100 TB: a groupBy whose hot key overwhelms one reducer even after AQE
(aggregation skew is not AQE-split), and a shuffle join against a table too
large to broadcast where one key dominates. Both are two-phase
rewrites -- the classic MapReduce combiner trick the reference never had
(its wc ships every ``(word, "1")`` to one reducer per word,
mrapps/wc.go:29-32; a hot word serializes there).

Correctness requirement: the aggregate must be decomposable into
partial + merge (sum/count/min/max/collect...). The API takes both pieces
explicitly rather than guessing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partials: Sequence[Column],
    merges: Sequence[Column],
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase skew-proof aggregation:

      phase 1: groupBy(keys + salt) computing ``partials`` -- the hot key's
               rows spread over ``n_salt`` reducers;
      phase 2: groupBy(keys) computing ``merges`` over the n_salt partial
               rows per key -- trivially small.

    ``partials`` must alias columns that ``merges`` reference, e.g.::

        salted_aggregate(
            df, ["word"],
            partials=[F.count("*").alias("c")],
            merges=[F.sum("c").alias("n")],
        )

    The salt is a deterministic hash of the full row spread via
    monotonically-increasing row position? No -- it must not depend on row
    identity at all: ``spark_partition_id()`` is free (no extra column
    state, stable within a task, uniform across input splits), which is
    exactly the granularity partial aggregation wants.
    """
    salted = df.withColumn("__salt", F.spark_partition_id() % n_salt)
    phase1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*merges)


def salted_count(df: DataFrame, keys: Sequence[str], n_salt: int = DEFAULT_SALT) -> DataFrame:
    """Skew-proof count per key (the hot-word wordcount fix)."""
    return salted_aggregate(
        df,
        keys,
        partials=[F.count("*").alias("__partial")],
        merges=[F.sum("__partial").alias("n")],
    )


def broadcast_hot_keys_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Skew-join split without AQE: route rows with hot keys through a
    broadcast join (the hot dim slice is by definition small enough) and
    the long tail through the normal shuffle join; union the halves.
    ``hot_keys``: single-column DataFrame of the skewed key values
    (produce it with ``top_keys_by_frequency``).

    Inner/left only: the split is partitioned on the FACT side, so with
    right/full-outer semantics a hot-key dim row unmatched by fact_cold
    would be null-extended by the cold branch and emitted again by the
    hot branch -- duplicated/corrupted outer rows."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"broadcast_hot_keys_join supports inner/left joins only, got {how!r}"
        )
    hot = hot_keys.withColumnRenamed(hot_keys.columns[0], key)
    fact_hot = fact.join(F.broadcast(hot), key, "left_semi")
    fact_cold = fact.join(F.broadcast(hot), key, "left_anti")
    dim_hot = dim.join(F.broadcast(hot), key, "left_semi")
    joined_hot = fact_hot.join(F.broadcast(dim_hot), key, how)
    joined_cold = fact_cold.join(dim, key, how)
    return joined_hot.unionByName(joined_cold)


def top_keys_by_frequency(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """The hot-key census (run on a sample at 100 TB)."""
    return (
        df.groupBy(key)
        .count()
        .orderBy(F.col("count").desc(), F.col(key))
        .limit(top_n)
        .select(key)
    )
