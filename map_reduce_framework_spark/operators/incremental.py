"""Incremental aggregate maintenance: merge a late-arriving delta batch
into a previously materialized daily aggregate without a full recompute.

The reference has no incremental surface at all -- every mr job rescans
every input file (mr/coordinator.go:157-163 builds one map task per file
on every run). At 100 TB a daily pipeline cannot afford that: the
standard warehouse pattern is to keep the aggregate as a
date-partitioned table and, when a late batch lands, recompute ONLY the
(day, key) groups the delta touches:

  1. aggregate the delta batch alone (it is small -- one day-ish of data);
  2. anti-select: state rows whose day is untouched by the delta pass
     through with zero IO beyond the partition-pruned state scan
     (`day IN (delta days)` prunes at the parquet/Delta partition level);
  3. touched days: FULL OUTER merge of state partials with delta
     partials, summing counts/sums (every aggregate here is decomposable
     into partial + merge -- the same requirement as
     operators/skew.py:salted_aggregate).

Equivalence to a full recompute is exactly what the registered query
proves: ``incremental_daily_agg`` materializes the pre-cutoff state,
merges the post-cutoff delta, and the DuckDB oracle is the plain
one-shot GROUP BY over all events. Shuffle accounting: one groupBy for
the state (amortized -- in production it is already on disk), one
groupBy over the small delta, one merge join on (day, event_type) where
the state side is pruned to the delta's days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import dsum

#: Fixed late-data boundary: events at/after this instant are "the late
#: batch"; everything before is the already-materialized state. The
#: driver's synthetic events span 2024-01-01..2024-01-30 at every sf
#: (seed=42), so the literal splits ~77% state / ~23% delta at any
#: scale. A literal (not max(ts)-derived) keeps the plan free of a
#: data-dependent scalar subquery.
CUTOFF = "2024-01-24 00:00:00"


def _daily_partials(events: DataFrame) -> DataFrame:
    """The decomposable partial: per (day, event_type) count / decimal
    value-sum / max. count_distinct is deliberately NOT here -- distinct
    counts are not mergeable partials; an incremental pipeline carries an
    HLL sketch instead (operators/sketch.py)."""
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value", 2).alias("sum_value"),
        F.max("value").alias("max_value"),
    )


def incremental_daily_agg(events: DataFrame, cutoff: str = CUTOFF) -> DataFrame:
    """Materialized daily state (ts < cutoff) merged with the late delta
    (ts >= cutoff); result provably equals the full recompute.

    The merge is a FULL OUTER join on (day, event_type): rows only in
    the state pass through, rows only in the delta insert, collisions
    sum. At scale the state side is partition-pruned to the delta's days
    before the join; here both sides are in-plan so Catalyst sees the
    disjoint filters instead."""
    cut = F.lit(cutoff).cast("timestamp_ntz")
    state = _daily_partials(events.filter(F.col("ts") < cut))
    delta = _daily_partials(events.filter(F.col("ts") >= cut))
    s = state.alias("s")
    d = delta.alias("d")
    merged = s.join(
        d,
        (F.col("s.day") == F.col("d.day"))
        & (F.col("s.event_type") == F.col("d.event_type")),
        "full_outer",
    )
    z = F.lit(0).cast("bigint")
    return merged.select(
        F.coalesce(F.col("s.day"), F.col("d.day")).alias("day"),
        F.coalesce(F.col("s.event_type"), F.col("d.event_type")).alias(
            "event_type"
        ),
        (
            F.coalesce(F.col("s.n_events"), z)
            + F.coalesce(F.col("d.n_events"), z)
        ).alias("n_events"),
        (
            F.coalesce(F.col("s.sum_value").cast("decimal(18,2)"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("d.sum_value").cast("decimal(18,2)"), F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("sum_value"),
        F.greatest(
            F.coalesce(F.col("s.max_value"), F.col("d.max_value")),
            F.coalesce(F.col("d.max_value"), F.col("s.max_value")),
        ).alias("max_value"),
    )


def materialize_daily_state(
    events: DataFrame, out_dir: str, cutoff: str = CUTOFF
) -> None:
    """Write the pre-cutoff daily aggregate as a day-partitioned parquet
    table -- the persisted form the incremental pipeline actually keeps.
    ``day_key`` (yyyy-MM-dd) is the partition directory key."""
    cut = F.lit(cutoff).cast("timestamp_ntz")
    state = _daily_partials(events.filter(F.col("ts") < cut)).withColumn(
        "day_key", F.date_format("day", "yyyy-MM-dd")
    )
    state.write.mode("overwrite").partitionBy("day_key").parquet(out_dir)


def _merge_parts(spark, state_dir: str, delta: DataFrame):
    """(untouched state rows, merged touched-day rows) -- shared core of
    the side-effect-free merge and the in-place partition upsert."""
    d = _daily_partials(delta)
    delta_days = d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day_key")
    ).distinct()
    state = spark.read.parquet(state_dir)
    # Broadcast the tiny delta-day list into the scan as a partition
    # filter: a dynamic-partition-pruning subquery join. The untouched
    # partitions never leave disk for the merge path.
    touched = state.join(F.broadcast(delta_days), "day_key")
    untouched = state.join(F.broadcast(delta_days), "day_key", "left_anti")
    t = touched.alias("s")
    dd = d.alias("d")
    merged = t.join(
        dd,
        (F.col("s.day") == F.col("d.day"))
        & (F.col("s.event_type") == F.col("d.event_type")),
        "full_outer",
    )
    z = F.lit(0).cast("bigint")
    merged_rows = merged.select(
        F.coalesce(F.col("s.day"), F.col("d.day")).alias("day"),
        F.coalesce(F.col("s.event_type"), F.col("d.event_type")).alias(
            "event_type"
        ),
        (
            F.coalesce(F.col("s.n_events"), z)
            + F.coalesce(F.col("d.n_events"), z)
        ).alias("n_events"),
        (
            F.coalesce(
                F.col("s.sum_value").cast("decimal(18,2)"),
                F.lit(0).cast("decimal(18,2)"),
            )
            + F.coalesce(
                F.col("d.sum_value").cast("decimal(18,2)"),
                F.lit(0).cast("decimal(18,2)"),
            )
        )
        .cast("double")
        .alias("sum_value"),
        F.greatest(
            F.coalesce(F.col("s.max_value"), F.col("d.max_value")),
            F.coalesce(F.col("d.max_value"), F.col("s.max_value")),
        ).alias("max_value"),
    )
    return untouched, merged_rows


def merge_delta_into_state(
    spark, state_dir: str, delta: DataFrame
) -> DataFrame:
    """The production merge: aggregate the delta, read back ONLY the
    state partitions for days the delta touches (partition pruning via
    the day_key IN (...) filter -- tests assert PartitionFilters on the
    scan), merge, and pass every other state day through untouched.

    Returns the new full aggregate (in production the merged days are
    rewritten in place with dynamic partition overwrite -- that path is
    ``apply_delta_in_place``; returning the union keeps this one
    side-effect-free for the oracle)."""
    untouched, merged_rows = _merge_parts(spark, state_dir, delta)
    return untouched.select(
        "day", "event_type", "n_events", "sum_value", "max_value"
    ).unionByName(merged_rows)


def apply_delta_in_place(spark, state_dir: str, delta: DataFrame) -> None:
    """Rewrite ONLY the touched day partitions of the persisted state
    (dynamic partition overwrite) -- the write half of the incremental
    pipeline, and the body of a streaming ``foreachBatch`` upserter:
    each micro-batch merges its partials into the state table without
    touching any other partition. New days insert (full-outer merge +
    dynamic overwrite creates their directories)."""
    _, merged_rows = _merge_parts(spark, state_dir, delta)
    # The merge READS state_dir and the overwrite WRITES it: materialize
    # the merged rows (eager localCheckpoint, executor-side) before the
    # write job so it no longer depends on the files it replaces.
    out = merged_rows.withColumn(
        "day_key", F.date_format("day", "yyyy-MM-dd")
    ).localCheckpoint()
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("day_key").parquet(state_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


ORACLE_SQL: dict[str, str] = {
    # The oracle is the FULL recompute -- the whole point: state + delta
    # merge must be indistinguishable from rebuilding from scratch.
    "incremental_daily_agg": """
        -- date_trunc('day', ..) yields DATE in DuckDB; cast back so the
        -- driver's pandas canon sees datetime64 on both sides
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS day,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
}
