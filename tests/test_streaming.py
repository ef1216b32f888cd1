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


def test_stream_static_enrichment_parity(spark, sf_oracle):
    """The stream-static broadcast lookup join on a bounded run must
    equal the batch join+aggregate exactly."""
    from map_reduce_framework_spark.sources.io import load_table

    streamed = ops.q_events_enriched_stream(spark, sf_oracle)
    batch = ops.enriched_segment_totals(
        load_table(spark, sf_oracle, "events"),
        load_table(spark, sf_oracle, "customer"),
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


def test_foreachbatch_idempotent_sink_replay(spark, sf_oracle, tmp_path):
    """Exactly-once with foreachBatch = checkpointed offsets + an
    IDEMPOTENT sink keyed by batchId: replaying a batch (what Spark does
    after a sink-side failure) must leave the output byte-identical.
    Each batch overwrites its own batchId-keyed directory -- the same
    tmp+rename task commit the reference uses (mr/worker.go:139-157),
    lifted to batch granularity."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_oracle}/events.parquet")
    events.limit(2000).repartition(4).write.parquet(src)

    seen: list[int] = []
    slices: dict[int, list] = {}

    def write_batch(df, batch_id: int) -> None:
        if batch_id not in slices:
            seen.append(batch_id)
            slices[batch_id] = df.collect()
        (
            df.groupBy("event_type")
            .count()
            .write.mode("overwrite")
            .parquet(f"{out}/batch={batch_id}")
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"
    assert len(seen) >= 4  # one batch per file

    def snapshot(batch_id: int) -> dict[str, int]:
        return {
            r.event_type: r["count"]
            for r in spark.read.parquet(f"{out}/batch={batch_id}").collect()
        }

    # simulate the post-failure replay of every batch: Spark re-runs
    # foreachBatch with the SAME batch_id and source slice; the
    # overwrite-by-batchId sink must converge to the identical output
    before = {b: snapshot(b) for b in seen}
    for b in seen:
        write_batch(
            spark.createDataFrame(slices[b], schema=events.schema), b
        )
    after = {b: snapshot(b) for b in seen}
    assert after == before
    # and the union of per-batch outputs equals the batch answer
    total: dict[str, int] = {}
    for counts in after.values():
        for k, v in counts.items():
            total[k] = total.get(k, 0) + v
    want = {
        r.event_type: r["count"]
        for r in spark.read.parquet(src).groupBy("event_type").count().collect()
    }
    assert total == want
