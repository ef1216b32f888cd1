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

import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed late-data boundary: events at/after this instant are "the late
#: batch"; everything before is the already-materialized state. The
#: driver's synthetic events span 2024-01-01..2024-01-30 at every sf
#: (seed=42), so the literal splits ~77% state / ~23% delta at any
#: scale. A literal (not max(ts)-derived) keeps the plan free of a
#: data-dependent scalar subquery.
CUTOFF = "2024-01-24 00:00:00"


#: Partial-state decimal type: wide enough that a 100 TB day-sum never
#: overflows (1e26 headroom at scale 2), and FIXED so repeated merges
#: don't ratchet the precision (Spark decimal addition widens by one
#: digit per add; pinning the cast keeps the persisted state schema
#: stable across any number of upserts).
STATE_DEC = "decimal(28,2)"


def _daily_partials(events: DataFrame) -> DataFrame:
    """The decomposable partial: per (day, event_type) count / decimal
    value-sum / max. The sum stays RAW DECIMAL here -- the partial must
    never round-trip through double, or a state+delta merge can drift
    0.01 from the full-recompute oracle once |sum|*100 > 2^53; the
    single cast-to-double happens in ``_finalize`` only, matching the
    oracle's single-cast shape. count_distinct is deliberately NOT
    here -- distinct counts are not mergeable partials; an incremental
    pipeline carries an HLL sketch instead (operators/sketch.py)."""
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast(STATE_DEC)
        .alias("sum_value"),
        F.max("value").alias("max_value"),
    )


def _finalize(partials: DataFrame) -> DataFrame:
    """Query-facing projection: the one and only decimal->double cast."""
    return partials.select(
        "day",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "max_value",
    )


def _merge_partials(state: DataFrame, delta: DataFrame) -> DataFrame:
    """FULL OUTER merge of two partial sets on (day, event_type): rows
    only in the state pass through, rows only in the delta insert,
    collisions merge (count-add, exact decimal sum-add, max). Output is
    still a partial (decimal sum pinned back to STATE_DEC), so merges
    compose associatively -- N streaming upserts stay bit-exact."""
    s = state.alias("s")
    d = delta.alias("d")
    merged = s.join(
        d,
        (F.col("s.day") == F.col("d.day"))
        & (F.col("s.event_type") == F.col("d.event_type")),
        "full_outer",
    )
    z = F.lit(0).cast("bigint")
    zdec = F.lit(0).cast(STATE_DEC)
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
            F.coalesce(F.col("s.sum_value").cast(STATE_DEC), zdec)
            + F.coalesce(F.col("d.sum_value").cast(STATE_DEC), zdec)
        )
        .cast(STATE_DEC)
        .alias("sum_value"),
        F.greatest(
            F.coalesce(F.col("s.max_value"), F.col("d.max_value")),
            F.coalesce(F.col("d.max_value"), F.col("s.max_value")),
        ).alias("max_value"),
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
    return _finalize(_merge_partials(state, delta))


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
    merged_rows = _merge_partials(
        touched.select("day", "event_type", "n_events", "sum_value", "max_value"),
        d,
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
    return _finalize(
        untouched.select(
            "day", "event_type", "n_events", "sum_value", "max_value"
        ).unionByName(merged_rows)
    )


def apply_delta_in_place(spark, state_dir: str, delta: DataFrame) -> None:
    """Rewrite ONLY the touched day partitions of the persisted state
    (dynamic partition overwrite) -- the write half of the incremental
    pipeline, and the body of a streaming ``foreachBatch`` upserter:
    each micro-batch merges its partials into the state table without
    touching any other partition. New days insert (full-outer merge +
    dynamic overwrite creates their directories).

    Durability: the merge READS state_dir and the overwrite WRITES it,
    so the merged rows are staged to a DURABLE sibling directory first
    (a full parquet write through the committer), and only then does the
    dynamic partition overwrite delete/replace the touched partitions --
    reading from the staged copy, not from the files being replaced. A
    localCheckpoint is NOT enough here: its blocks live in unreplicated
    executor-local storage, so losing an executor between checkpoint and
    write would destroy the only copy of the merged state mid-overwrite.

    Crash-safety scope (narrowed deliberately): a crash BEFORE the
    overwrite starts leaves the state untouched (the orphaned staging
    dir is garbage, not corruption) and a plain re-run is safe. A crash
    DURING the overwrite's job commit is NOT all-or-nothing on a
    filesystem table -- FileOutputCommitter replaces partition
    directories sequentially, so some touched days may hold merged rows
    and others old rows, and re-running the merge would double-count
    the delta into the already-replaced days. This bare function
    therefore does NOT promise re-runnability across a crash; use
    ``exactly_once_upsert`` (which brackets the overwrite with an
    intent marker pointing at the staged copy, so a replay first REDOES
    the overwrite from the staging dir -- idempotent, since the staged
    rows are the final content of every touched partition -- before the
    batch ledger decides whether to merge at all), or a transactional
    table format (Delta/Iceberg) whose snapshot commit is atomic."""
    _, merged_rows = _merge_parts(spark, state_dir, delta)
    out = merged_rows.withColumn(
        "day_key", F.date_format("day", "yyyy-MM-dd")
    )
    _staged_dynamic_overwrite(spark, out, state_dir)


def _staged_dynamic_overwrite(
    spark, rows: DataFrame, state_dir: str, batch_id: int | None = None
) -> None:
    """Durably stage ``rows`` (full parquet write beside the table),
    then dynamic-partition-overwrite ``state_dir`` from the staged copy.
    Breaks every read-then-overwrite cycle on the state table without
    relying on unreplicated executor-local checkpoint blocks.

    With ``batch_id`` set, the overwrite is bracketed by a write-ahead
    INTENT marker (``<state>/_upsert_intents/<batch_id>``, pointing at
    the staging dir): written after staging succeeds, cleared only
    after the overwrite commits AND the applied-batch ledger records
    the id. A crash anywhere between leaves the intent + staged copy
    behind, and ``recover_torn_upserts`` REDOES the overwrite from the
    staged copy -- idempotent, because the staged rows are the final
    content of every touched partition, so redoing heals a torn
    sequential partition-directory commit regardless of which
    partitions it had already replaced. Without ``batch_id`` the
    caller accepts the narrower guarantee documented on
    ``apply_delta_in_place`` (or, as in ``compact_state_table``, the
    rewrite is content-identical so a torn commit is harmless)."""
    import json
    import os

    staging = f"{state_dir.rstrip('/')}.staging-{uuid.uuid4().hex}"
    intent_published = False
    committed = False
    try:
        rows.write.mode("overwrite").parquet(staging)
        intent_path = None
        if batch_id is not None:
            intents = os.path.join(state_dir, "_upsert_intents")
            os.makedirs(intents, exist_ok=True)
            intent_path = os.path.join(intents, str(batch_id))
            tmp = intent_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump({"staging": staging, "batch_id": batch_id}, fh)
            os.replace(tmp, intent_path)  # atomic publish of the intent
            intent_published = True
        _overwrite_from_staging(spark, staging, state_dir)
        if batch_id is not None:
            _record_applied(state_dir, batch_id)
            os.remove(intent_path)
        committed = True
    finally:
        # The staged copy IS the redo log once the intent is published:
        # if the overwrite raises after that point (e.g. a Spark job
        # abort mid partition-commit leaves a torn state), the staging
        # dir must survive so recover_torn_upserts can redo from it.
        # Delete it only on success, or on failure BEFORE the intent
        # exists (orphaned staging is garbage, not a redo log).
        if committed or not intent_published:
            shutil.rmtree(staging, ignore_errors=True)


def _overwrite_from_staging(spark, staging: str, state_dir: str) -> None:
    """The overwrite half: dynamic-partition-overwrite the touched
    day_key partitions of ``state_dir`` from the durable staged copy."""
    staged = spark.read.parquet(staging)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # one writer task per day_key -> exactly one file of output
        # per rewritten partition
        staged.repartition("day_key").write.mode("overwrite").partitionBy(
            "day_key"
        ).parquet(state_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def recover_torn_upserts(spark, state_dir: str) -> list[int]:
    """Redo-log recovery for upserts that crashed between intent and
    commit: for every pending intent whose staging dir survives, replay
    the dynamic partition overwrite from the staged copy (idempotent --
    staged rows are the FINAL content of the touched partitions, so a
    torn sequential commit heals no matter which directories it had
    already replaced), record the batch id in the applied ledger, and
    clear the intent + staging. Returns the recovered batch ids.

    Run before processing any batch (``exactly_once_upsert`` calls it
    first); recovery itself crashing mid-redo just leaves the intent in
    place for the next attempt -- the staged copy IS the redo log."""
    import json
    import os

    intents = os.path.join(state_dir, "_upsert_intents")
    if not os.path.isdir(intents):
        _sweep_orphan_staging(state_dir, referenced=set())
        return []
    recovered: list[int] = []
    # Replay in BATCH order, not lexicographic filename order ('10'
    # sorts before '9' as a string): if several pending intents touch
    # the same day partitions, the newest staged content must win.
    pending = sorted(
        os.listdir(intents),
        key=lambda n: (int(n.split(".")[0]) if n.split(".")[0].isdigit() else -1, n),
    )
    for name in pending:
        path = os.path.join(intents, name)
        if name.endswith(".tmp"):  # unpublished intent: overwrite never began
            os.remove(path)
            continue
        with open(path) as fh:
            intent = json.load(fh)
        staging = intent["staging"]
        if os.path.isdir(staging):
            _overwrite_from_staging(spark, staging, state_dir)
            _record_applied(state_dir, intent["batch_id"])
            recovered.append(intent["batch_id"])
            os.remove(path)
            shutil.rmtree(staging, ignore_errors=True)
        elif intent["batch_id"] in applied_batch_ids(state_dir):
            # Commit sequence finished its overwrite+ledger steps and
            # died before intent removal: safe to clear the intent.
            os.remove(path)
        else:
            # Intent present, staging gone, batch NOT in the applied
            # ledger: the redo log was destroyed before the commit was
            # known good (a bug or manual deletion). Silently removing
            # the intent would let the foreachBatch replay re-merge the
            # delta onto a possibly-torn state and double-count the
            # already-replaced partitions -- fail loudly instead.
            raise RuntimeError(
                f"torn upsert for batch {intent['batch_id']}: intent "
                f"{path} points at missing staging dir {staging} and "
                "the batch is not in the applied ledger; state may be "
                "torn and cannot be healed automatically"
            )
    _sweep_orphan_staging(state_dir, referenced=set())
    return recovered


def _sweep_orphan_staging(state_dir: str, referenced: set[str]) -> None:
    """Garbage-collect intent-less ``<state>.staging-*`` dirs: a crash
    between intent-file removal and the staging rmtree (both in
    ``exactly_once_upsert``'s commit path and in recovery's redo path)
    leaves a staged copy with no intent pointing at it -- committed
    content, pure disk garbage, that no later run would otherwise ever
    delete (round-6 ADVICE). Safe under the module's single-writer
    contract (recovery runs BEFORE any new batch starts staging);
    ``referenced`` carries staging paths of still-pending intents and
    is empty when the loop above drained them all."""
    import os

    parent = os.path.dirname(os.path.abspath(state_dir.rstrip("/"))) or "."
    prefix = os.path.basename(state_dir.rstrip("/")) + ".staging-"
    if not os.path.isdir(parent):
        return
    for name in os.listdir(parent):
        full = os.path.join(parent, name)
        if (
            name.startswith(prefix)
            and os.path.isdir(full)
            and full not in referenced
        ):
            shutil.rmtree(full, ignore_errors=True)


def _record_applied(state_dir: str, batch_id: int) -> None:
    """Idempotently add ``batch_id`` to the applied-batch ledger."""
    import os

    ledger = os.path.join(state_dir, "_applied_batches")
    os.makedirs(ledger, exist_ok=True)
    with open(os.path.join(ledger, str(batch_id)), "w"):
        pass


def applied_batch_ids(state_dir: str) -> set[int]:
    """Batch-id ledger of the exactly-once upsert: marker files under
    ``<state>/_applied_batches/`` (underscore-prefixed paths are hidden
    from Spark's file listing, so the ledger never pollutes scans)."""
    import os

    ledger = os.path.join(state_dir, "_applied_batches")
    if not os.path.isdir(ledger):
        return set()
    return {int(f) for f in os.listdir(ledger) if f.isdigit()}


def exactly_once_upsert(
    spark, state_dir: str, batch_df: DataFrame, batch_id: int
) -> bool:
    """foreachBatch body with exactly-once effect on the state table.

    foreachBatch is at-least-once: after a crash, the last UNCOMMITTED
    micro-batch is re-delivered with the SAME batch_id, and a bare
    ``apply_delta_in_place`` would sum that delta into the state twice.
    Two mechanisms close this:

    * the applied-batch LEDGER: a batch_id already recorded is a no-op
      (returns False), otherwise merge-then-record (returns True);
    * the write-ahead INTENT marker around the partition overwrite
      (``_staged_dynamic_overwrite`` with batch_id): FileOutputCommitter
      replaces partition directories SEQUENTIALLY, so a crash mid-commit
      is not all-or-nothing -- re-merging onto that torn state would
      double-count the already-replaced days. ``recover_torn_upserts``
      (run first, every call) redoes any pending overwrite from its
      durable staged copy -- idempotent, because the staged rows are the
      final content of every touched partition -- then records the
      ledger entry, so the subsequent duplicate check sees the batch as
      applied and the replayed delta is never re-merged.

    Crash window accounting: before intent -> state untouched, replay
    merges fresh; intent..ledger -> recovery redoes from staging and
    records; ledger..intent-removal -> recovery redo is a no-op rewrite
    and clears the marker; after intent removal -> at most an orphaned
    staging dir (garbage, not corruption). On a transactional format
    (Delta/Iceberg) the snapshot commit subsumes all of this; this
    function is exactly the txn body you'd hand it.
    """
    recover_torn_upserts(spark, state_dir)
    if batch_id in applied_batch_ids(state_dir):
        return False
    _, merged_rows = _merge_parts(spark, state_dir, batch_df)
    out = merged_rows.withColumn(
        "day_key", F.date_format("day", "yyyy-MM-dd")
    )
    _staged_dynamic_overwrite(spark, out, state_dir, batch_id=batch_id)
    return True


def state_table_file_census(state_dir: str) -> dict[str, int]:
    """Data-file count per day partition (driver-side listing; on a
    cluster this comes from the table manifest/catalog, not a walk)."""
    import os

    counts: dict[str, int] = {}
    for d in sorted(os.listdir(state_dir)):
        if not d.startswith("day_key="):
            continue
        p = os.path.join(state_dir, d)
        counts[d.split("=", 1)[1]] = sum(
            1 for f in os.listdir(p) if f.endswith(".parquet")
        )
    return counts


def compact_state_table(
    spark, state_dir: str, max_files_per_partition: int = 4
) -> list[str]:
    """Small-file compaction for the persisted day-partitioned state:
    every ``merge_delta_into_state``/``apply_delta_in_place`` upsert
    leaves one more file in each touched partition; unchecked, a year of
    hourly micro-batches is ~9k files per hot day and the scan goes
    metadata-bound. Rewrite ONLY partitions whose file count exceeds the
    threshold, one output file each (repartition by day_key -> one
    writer task per day), through the same durable staging + dynamic
    partition overwrite as the upsert path -- cold partitions are never
    touched, query results are bit-identical (pure rewrite, no
    re-aggregation). Returns the compacted day_keys."""
    census = state_table_file_census(state_dir)
    hot = sorted(
        k for k, n in census.items() if n > max_files_per_partition
    )
    if not hot:
        return []
    state = spark.read.parquet(state_dir)
    rows = state.filter(
        F.col("day_key").cast("string").isin(hot)
    ).withColumn("day_key", F.col("day_key").cast("string"))
    _staged_dynamic_overwrite(spark, rows, state_dir)
    return hot


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


#: Join-IVM cutoff: splits both orders (by o_orderdate) and lineitem (by
#: l_shipdate) into materialized/delta halves with real rows on each side
#: at every sf (TPC-H dates span 1992-1998).
JOIN_CUTOFF = "1996-01-01"


def incremental_join_maintenance(
    orders: DataFrame, lineitem: DataFrame, cutoff: str = JOIN_CUTOFF
) -> DataFrame:
    """Incremental JOIN maintenance -- the other half of the IVM story
    (incremental_daily_agg covers aggregates). The delta-join identity:

        J(A + dA, B + dB) = J(A,B) + J(dA,B) + J(A,dB) + J(dA,dB)

    where A/B are the materialized pre-cutoff orders/lineitem and dA/dB
    the late-arriving rows. A warehouse maintaining a materialized join
    view computes only the three delta terms when a late batch lands --
    each joins a SMALL delta against one big table (runtime-filter/DPP
    prunes the big side's scan to matching keys) -- instead of re-joining
    100 TB x 100 TB. The registered query computes all four terms and
    aggregates to a compact per-month (n_rows, revenue) report; the
    DuckDB oracle is the plain one-shot join, so the identity is proven
    by hash, not asserted.

    Shuffle accounting: the A ⋈ B term is amortized (it IS the
    materialized view in production); each delta term shuffles
    |delta| + matching-key rows only."""
    cut = F.lit(cutoff).cast("timestamp_ntz")
    a = orders.filter(F.col("o_orderdate") < cut)
    da = orders.filter(F.col("o_orderdate") >= cut)
    b = lineitem.filter(F.col("l_shipdate") < cut)
    db = lineitem.filter(F.col("l_shipdate") >= cut)
    terms = [
        a.join(b, a["o_orderkey"] == b["l_orderkey"]),
        da.join(b, da["o_orderkey"] == b["l_orderkey"]),
        a.join(db, a["o_orderkey"] == db["l_orderkey"]),
        da.join(db, da["o_orderkey"] == db["l_orderkey"]),
    ]
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    monthly = [
        t.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            revenue.alias("rev"),
        )
        for t in terms
    ]
    unioned = monthly[0]
    for m in monthly[1:]:
        unioned = unioned.unionByName(m)
    return unioned.groupBy("order_month").agg(
        F.count("*").alias("n_rows"),
        # scale 6, not 2: the engines' double->decimal half-way rounding
        # can disagree at coarse scales (same reason relational.dsum
        # defaults to 6)
        F.sum(F.col("rev").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
    )


ORACLE_SQL["incremental_join_maintenance"] = """
    SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS order_month,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
"""
