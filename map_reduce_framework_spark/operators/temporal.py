"""Temporal operators Spark lacks natively: the as-of join.

An as-of (backward) join matches each left row to the single latest right
row with ``right.ts <= left.ts`` in the same key group -- the canonical
"state at event time" lookup (pandas ``merge_asof``, kdb+ ``aj``, DuckDB
``ASOF JOIN``). Spark has no built-in; the naive formulation (theta-join
on ``ts >=`` then argmax) explodes to O(|L| * |R|) per key.

Spark-first plan: the UNION + running-window trick. Tag left rows side=1
and right rows side=0, union them, and take, per key in (ts, side) order,
the running ``last(right_value ignore nulls)`` over an unbounded-preceding
window. Each left row then carries exactly the latest right row at-or-
before its timestamp. Cost: ONE shuffle on the key (the window partition),
a linear per-partition sort-scan, zero join explosion -- at 100 TB this is
the same shape as any windowed aggregation, and skew follows the key's
event distribution (salt or split hot keys as usual).

Determinism: ties in ``ts`` order right rows (side 0) before left rows
(side 1), so an equal-timestamp right row IS matched (inclusive backward,
like merge_asof and DuckDB's ``>=`` ASOF). Callers must ensure the right
side is unique per (key, ts) -- otherwise "the" matched row is undefined
in every engine; pass ``tiebreak`` to make Spark's pick deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str = "ts",
    by: list[str] | None = None,
    matched_ts: str = "matched_ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join (left outer): every left row, plus the
    value columns of the latest right row with ``right.ts <= left.ts`` in
    the same ``by`` group (NULLs when no such row).

    ``left`` and ``right`` must share the ``ts`` and ``by`` column names;
    their remaining column names must be disjoint. The matched right row's
    timestamp is returned as ``matched_ts``.
    """
    by = list(by or [])
    lcols = [c for c in left.columns if c not in by and c != ts]
    rcols = [c for c in right.columns if c not in by and c != ts]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"value columns must be disjoint, both have {overlap}")
    ltypes = dict(zip(left.schema.names, left.schema.fields))
    rtypes = dict(zip(right.schema.names, right.schema.fields))

    l = left.select(
        *by,
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *lcols,
        *[F.lit(None).cast(rtypes[c].dataType).alias(c) for c in rcols],
        F.lit(None).cast(rtypes[ts].dataType).alias("__rts"),
    )
    r = right.select(
        *by,
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c].dataType).alias(c) for c in lcols],
        *rcols,
        F.col(ts).alias("__rts"),
    )
    order = [F.col("__ts"), F.col("__side")]
    if tiebreak is not None:
        # right rows sharing (key, ts): latest tiebreak wins, deterministic
        order.append(F.when(F.col("__side") == 0, F.col(tiebreak)))
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in rcols]
    return (
        l.unionByName(r)
        .select(
            *by,
            F.col("__ts").alias(ts),
            F.col("__side"),
            *lcols,
            *carried,
            F.last("__rts", ignorenulls=True).over(w).alias(matched_ts),
        )
        .filter(F.col("__side") == 1)
        .drop("__side")
    )


def events_asof_prior_view(events: DataFrame) -> DataFrame:
    """Registered as-of query: each purchase event joined to the same
    user's latest at-or-before view event. (user_id, ts) is unique in the
    events table, so the match is well-defined; DuckDB's native ASOF LEFT
    JOIN is the oracle."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    out = asof_join(purchases, views, ts="ts", by=["user_id"], matched_ts="view_ts")
    return out.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "purchase_value",
        "view_id",
        "view_value",
        "view_ts",
    )


def interval_overlap_pairs(
    events: DataFrame, window_sec: int = 300
) -> DataFrame:
    """Pairs of same-user events within ``window_sec`` of each other -- a
    large-large self range join.

    The naive plan is a per-user theta join (O(n_u^2) per user, a
    scale-killer for hot users). Binned plan: bucket time into
    window-sized bins, expand the LEFT side to buckets {b-1, b, b+1},
    keep the right side at its own bucket, and equi-join on
    (user_id, bucket). Any pair within the window differs by at most one
    bucket, so coverage is exact; the right side owns exactly one bucket,
    so each qualifying pair matches exactly ONCE (no dedup pass). Cost:
    one 3x row expansion + one equi-join shuffle -- the same shape at
    100 TB, with skew following (user, bucket) instead of user alone.

    Output pairs are oriented a < b by event_id; gap_sec is the exact
    integer microsecond gap floored to seconds.
    """
    w_us = window_sec * 1_000_000
    base = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
    )
    bkt = F.floor(F.col("tsu") / F.lit(w_us))
    left = base.select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_id"),
        F.col("tsu").alias("a_tsu"),
        F.explode(F.array(bkt - 1, bkt, bkt + 1)).alias("bucket"),
    )
    right = base.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("tsu").alias("b_tsu"),
        bkt.alias("b_bucket"),
    )
    return (
        left.join(
            right,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("bucket") == F.col("b_bucket")),
        )
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_tsu") - F.col("b_tsu")) <= w_us)
        )
        .select(
            F.col("a_user").alias("user_id"),
            "a_id",
            "b_id",
            F.floor(F.abs(F.col("a_tsu") - F.col("b_tsu")) / F.lit(1_000_000))
            .cast("long")
            .alias("gap_sec"),
        )
    )


def gapfill_daily(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Regularize an event stream to a dense per-key daily grid with
    forward-fill -- the time-series resample + last-observation-carried-
    forward pattern (no reference analog; standard telemetry/feature-store
    prep the reference's KV surface cannot express).

    Plan, Spark-first: (1) one groupBy (key, day) taking the day's last
    observation (max-ts row via struct-max, deterministic) and the day's
    event count; (2) per-key min/max day from the SAME aggregate (a second
    tiny groupBy over the daily rows, not the raw events); (3)
    ``sequence(min_day, max_day)`` + explode builds the dense grid --
    executor-side generation, zero driver involvement; (4) left join grid
    to daily rows on (key, day): both sides are already keyed, AQE
    broadcast-picks the small side per partition; (5) running
    ``last(value ignore nulls)`` window per key in day order fills gaps.
    Cost at 100 TB: two key-shuffles (agg + window), grid rows bounded by
    key_count * day_span -- the explode never amplifies beyond the output
    size itself.
    """
    day = F.col(ts).cast("timestamp").cast("date")
    daily = events.groupBy(F.col(key), day.alias("day")).agg(
        F.max(F.struct(F.col(ts).cast("timestamp").alias("__t"), F.col(value)))[
            value
        ].alias("day_last"),
        F.count(F.lit(1)).alias("n_events"),
    )
    spans = daily.groupBy(key).agg(
        F.min("day").alias("__mn"), F.max("day").alias("__mx")
    )
    grid = spans.select(
        key, F.explode(F.sequence("__mn", "__mx")).alias("day")
    )
    w = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, [key, "day"], "left")
        .select(
            key,
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_last", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )


def user_rolling_features(events: DataFrame) -> DataFrame:
    """Trailing-window feature engineering (the per-entity rolling
    aggregates a training pipeline attaches to every interaction row):
    for each event, the count and sum of ``value`` over that user's
    trailing 7 days (inclusive), and the gap to the previous event.

    Plan: one shuffle on user_id; both windows share the partition. The
    7-day window is a RANGE frame over epoch-micros (Spark's range frames
    are numeric-typed; micros keep it exact and oracle-identical). The
    gap uses a (ts, event_id) ordering so equal timestamps are
    deterministic; the RANGE frame is peers-inclusive so ties need no
    tiebreak there. Sum goes through DECIMAL(18,6) (order-independent).
    """
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w7 = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    wlag = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    gap = F.expr(
        "(_ts_us - lag(_ts_us) over "
        "(partition by user_id order by _ts_us, event_id)) div 1000000"
    )
    return (
        events.withColumn("_ts_us", ts_us)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.count("*").over(w7).alias("n_7d"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(w7)
            .cast("double")
            .alias("sum_7d"),
            gap.alias("gap_sec"),
        )
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention -- the standard product-analytics matrix: users
    are cohorted by their first-activity week; each (cohort, week-offset)
    cell counts how many of that cohort were active that week and the
    retained fraction. Three aggregates over user-keyed shuffles: first
    week per user, distinct (user, week) activity, then the cohort cell
    counts joined to cohort sizes. At 100 TB every shuffle carries
    (user, week) keys -- never events -- and the output is
    |cohorts| x |weeks| rows regardless of event volume.

    Retention is one exact int/int division to double, so the report is
    hash-exact cross-engine."""
    wk = F.date_trunc("week", F.col("ts"))
    firsts = events.groupBy("user_id").agg(
        F.min(wk).alias("cohort_week")
    )
    active = events.select(
        "user_id", wk.alias("week")
    ).distinct()
    base = firsts.groupBy("cohort_week").agg(
        F.count("*").alias("n_cohort")
    )
    ret = (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return ret.join(base, "cohort_week").select(
        "cohort_week",
        "week_offset",
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("n_cohort").cast("bigint").alias("n_cohort"),
        (F.col("n_active") / F.col("n_cohort"))
        .cast("double")
        .alias("retention"),
    )


ORACLE_SQL: dict[str, str] = {
    "cohort_retention": """
        WITH firsts AS (
            SELECT user_id,
                   min(date_trunc('week', CAST(ts AS TIMESTAMP)))
                       AS cohort_week
            FROM events GROUP BY 1
        ),
        active AS (
            SELECT DISTINCT user_id,
                   date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
            FROM events
        ),
        base AS (
            SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
            FROM firsts GROUP BY 1
        ),
        ret AS (
            SELECT f.cohort_week,
                   CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT)
                       AS week_offset,
                   CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
            FROM active a JOIN firsts f USING (user_id)
            GROUP BY 1, 2
        )
        SELECT CAST(r.cohort_week AS TIMESTAMP) AS cohort_week,
               r.week_offset, r.n_active, b.n_cohort,
               CAST(r.n_active AS DOUBLE) / b.n_cohort AS retention
        FROM ret r JOIN base b USING (cohort_week)
    """,
    # DuckDB's native ASOF JOIN is a genuinely independent implementation
    # of the same semantics -- a stronger oracle than mirroring our window
    # formulation in SQL.
    "events_asof_join": """
        WITH p AS (
            SELECT event_id AS purchase_id, user_id,
                   CAST(ts AS TIMESTAMP) AS purchase_ts,
                   value AS purchase_value
            FROM events WHERE event_type = 'purchase'
        ),
        v AS (
            SELECT event_id AS view_id, user_id,
                   CAST(ts AS TIMESTAMP) AS vts,
                   value AS view_value
            FROM events WHERE event_type = 'view'
        )
        SELECT p.purchase_id, p.user_id, p.purchase_ts, p.purchase_value,
               v.view_id, v.view_value, v.vts AS view_ts
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.purchase_ts >= v.vts
    """,
    # Naive theta self-join: an independent formulation of the binned
    # plan's semantics (fine at oracle scale, the thing the binned plan
    # exists to avoid at 100 TB).
    "events_overlap_pairs": """
        SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
               abs(epoch_us(CAST(a.ts AS TIMESTAMP))
                   - epoch_us(CAST(b.ts AS TIMESTAMP))) // 1000000 AS gap_sec
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND abs(epoch_us(CAST(a.ts AS TIMESTAMP))
                 - epoch_us(CAST(b.ts AS TIMESTAMP))) <= 300 * 1000000
    """,
    # Independent formulation: generate_series grid + last_value IGNORE
    # NULLS (DuckDB's own gap-fill idiom), vs Spark's sequence+explode+
    # running-last plan. Struct-max day_last mirrors Spark's
    # max(struct(ts, value)) lexicographic tie-break exactly.
    "user_daily_fill": """
        WITH daily AS (
            SELECT user_id,
                   CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   (max({'t': CAST(ts AS TIMESTAMP), 'v': value}))['v'] AS day_last,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        spans AS (
            SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1
        ),
        grid AS (
            SELECT user_id,
                   CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
            FROM spans
        )
        SELECT g.user_id, g.day,
               COALESCE(d.n_events, 0) AS n_events,
               last_value(d.day_last IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_ffill
        FROM grid g LEFT JOIN daily d
          ON g.user_id = d.user_id AND g.day = d.day
    """,
    "user_rolling_features": """
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               count(*) OVER w7 AS n_7d,
               CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w7 AS DOUBLE)
                   AS sum_7d,
               (epoch_us(CAST(ts AS TIMESTAMP))
                - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                      PARTITION BY user_id
                      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                  )) // 1000000 AS gap_sec
        FROM events
        WINDOW w7 AS (
            PARTITION BY user_id
            ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
            RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
        )
    """,
}
