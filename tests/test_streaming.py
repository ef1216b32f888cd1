"""Structured Streaming surface tests: stream/batch parity on the bounded
events table, and a genuine multi-microbatch incremental run (the property
that matters at scale: the same plan produces the same answer regardless of
how the data is chopped into arrivals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_framework_spark.streaming import ops


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_batch_parity_hourly(spark, sf_oracle):
    streamed = ops.q_events_hourly_stream(spark, sf_oracle)
    batch = ops.batch_equivalent_hourly(spark, sf_oracle)
    assert _rows(streamed) == _rows(batch)


def test_stream_distinct_types(spark, sf_oracle):
    streamed = ops.q_events_distinct_types_stream(spark, sf_oracle)
    batch = (
        spark.read.parquet(f"{sf_oracle}/events.parquet")
        .select("event_type")
        .distinct()
    )
    assert _rows(streamed) == _rows(batch)


def test_stream_stream_interval_join(spark, sf_oracle):
    """The watermarked stream-stream interval join on a bounded run must
    emit exactly the batch inner-join answer."""
    from map_reduce_framework_spark.sources.io import load_table

    streamed = ops.q_purchase_view_join_stream(spark, sf_oracle)
    ev = load_table(spark, sf_oracle, "events")
    batch = ops.purchases_with_recent_views(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    )
    rows = _rows(streamed)
    assert rows == _rows(batch)
    assert len(rows) > 0


def test_incremental_microbatches(spark, sf_oracle, tmp_path):
    """Split events into 4 files, force one file per micro-batch, and check
    the complete-mode aggregate converges to the batch answer across >=4
    incremental state updates."""
    src = str(tmp_path / "arrivals")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_oracle}/events.parquet")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    query = (
        stream.writeStream.format("memory")
        .queryName("mrfs_incremental_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    n_batches = len([p for p in query.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"

    got = _rows(spark.table("mrfs_incremental_test"))
    want = _rows(events.groupBy("user_id").agg(F.count("*").alias("n_events")))
    assert got == want
