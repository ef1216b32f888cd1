"""Bucketed tables: co-located fact-fact joins without a shuffle.

At 100 TB the lineitem<->orders join is the one shuffle AQE cannot remove
(both sides too big to broadcast). Bucketing both tables by the join key at
WRITE time moves that shuffle off the query path entirely: each bucket pair
joins locally, every query against the pair reuses the layout. This is the
Spark-native replacement for the reference's static hash partitioning
(ihash(key) % NReduce, mr/worker.go:25-29) -- same idea, but persisted and
planner-visible.

Bucketed writes go through ``saveAsTable`` (the bucket metadata lives in
the catalog; a bare parquet write drops it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and per-bucket sorted) by ``bucket_col``.
    Sorting makes the downstream join a zero-sort merge as well."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With equal bucket
    counts the planner emits NO Exchange on either side (asserted in
    tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
