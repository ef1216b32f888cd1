"""Reshaping operators: pivot, unpivot (melt), and a non-equi band join.

The reference has no analog for any of these (SURVEY.md §2.E: no pivot,
no set-reshaping); they exist because a complete analytics surface needs
them, and each has an exact DuckDB oracle.

Scale notes:

* ``events_pivot`` pins the pivot value list explicitly -- Spark's
  two-pass pivot (collect distinct values to the driver, then plan)
  is a driver-side collect over an unbounded domain at 100 TB; a pinned
  list keeps it one hash aggregate with a CASE projection.
* ``lineitem_unpivot`` is a narrow 1->k row generate (no shuffle).
* ``price_band_join`` joins a fact to an irregular-boundary band
  dimension. With a small band table the right plan IS the broadcast
  range join Spark picks (BroadcastNestedLoopJoin over k bands ==
  a k-way CASE, linear in the fact). For band tables too large to
  broadcast, pre-bin both sides to equi-keys first (same trick as
  temporal.interval_overlap_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import dsum

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

#: Irregular price-band boundaries [lo, hi) -- deliberately NOT uniform so
#: the band join cannot degenerate to a single floor-divide bucket map.
PRICE_BANDS: list[tuple[int, float, float]] = [
    (0, 0.0, 1_000.0),
    (1, 1_000.0, 5_000.0),
    (2, 5_000.0, 20_000.0),
    (3, 20_000.0, 50_000.0),
    (4, 50_000.0, 100_000.0),
    (5, 100_000.0, 200_000.0),
    (6, 200_000.0, 350_000.0),
    (7, 350_000.0, 1_000_000_000.0),
]


def events_pivot(events: DataFrame) -> DataFrame:
    """Per-user event-type matrix: one row per user, one count column per
    (pinned) event type. One hash aggregate; missing cells are 0."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


def lineitem_unpivot(lineitem: DataFrame) -> DataFrame:
    """Melt one month of lineitem measures into (metric, value) rows --
    the long form feeding generic per-metric aggregation/plotting. Narrow
    1->4 generate, zero shuffles, filter pushed to the scan."""
    sel = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    )
    return sel.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )


def price_band_join(spark: SparkSession, orders: DataFrame) -> DataFrame:
    """Order stats per irregular price band: a broadcast non-equi (band)
    join ``lo <= o_totalprice < hi`` followed by one aggregate."""
    bands = spark.createDataFrame(PRICE_BANDS, "band_id int, lo double, hi double")
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band_id", "lo", "hi")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", 2).alias("revenue"),
        )
    )


_BAND_VALUES = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in PRICE_BANDS)

ORACLE_SQL: dict[str, str] = {
    "events_pivot": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events
        GROUP BY user_id
    """,
    "lineitem_unpivot": """
        SELECT l_orderkey, l_linenumber, metric, value
        FROM (
            SELECT l_orderkey, l_linenumber,
                   l_quantity, l_extendedprice, l_discount, l_tax
            FROM lineitem
            WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
              AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1996-02-01'
        )
        UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
    """,
    "price_band_join": f"""
        SELECT band_id, lo, hi,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN (
            SELECT band_id, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi
            FROM (VALUES {_BAND_VALUES}) AS v(band_id, lo, hi)
        ) AS bands
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band_id, lo, hi
    """,
}


def events_anomaly_days(events: DataFrame, z_threshold: float = 2.0) -> DataFrame:
    """Volume-anomaly screen -- the monitoring query a pipeline owner
    runs before trusting a day's data: per-day event counts scored
    against the corpus mean/std, flagging |z| > threshold days.

    Exactness: daily counts are BIGINTs but sum-of-squares is
    accumulated as decimal(38,0) (at ~1e10 events/day the squares are
    ~1e20 >> 2^63, which would silently wrap in non-ANSI BIGINT
    arithmetic -- same trap embedding_dim_stats avoids).  The exact
    decimal totals convert once to double, then mean = s/n and
    var = s2/n - mean^2 are evaluated in the same order in both
    engines, sqrt is correctly rounded, and the z comparison is on
    identical doubles -- the whole report hash-matches despite being
    'statistics'.  Degenerate inputs (one day, or all daily counts
    equal) have var = 0; both engines pin zscore = 0.0 and
    is_anomaly = false there instead of dividing by sqrt(0).

    Plan: one day-grain aggregate (map-side combined), one 1-row stats
    aggregate broadcast back -- two shuffles total, output |days| rows
    regardless of event volume."""
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n_events"))
    nd = F.col("n_events").cast("decimal(38,0)")
    stats = daily.agg(
        F.count("*").alias("n_days"),
        F.sum(nd).alias("s"),
        F.sum(nd * nd).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    var = F.col("s2").cast("double") / F.col("n_days") - mean * mean
    z = F.when(var <= F.lit(0.0), F.lit(0.0)).otherwise(
        (F.col("n_events") - mean) / F.sqrt(var)
    )
    return daily.join(F.broadcast(stats)).select(
        "day",
        "n_events",
        z.alias("zscore"),
        (F.abs(z) > F.lit(z_threshold)).alias("is_anomaly"),
    )


ORACLE_SQL["events_anomaly_days"] = """
    WITH daily AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    -- HUGEINT accumulators (DuckDB's exact-int128 analog of Spark's
    -- decimal(38,0)): squares of ~1e10-scale daily counts exceed 2^63.
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CAST(n_events AS HUGEINT)) AS DOUBLE) AS s,
               CAST(sum(CAST(n_events AS HUGEINT) * n_events) AS DOUBLE)
                   AS s2
        FROM daily
    ),
    mv AS (
        SELECT n_days, s / n_days AS mean,
               s2 / n_days - (s / n_days) * (s / n_days) AS var
        FROM stats
    )
    SELECT d.day, d.n_events,
           CASE WHEN m.var <= 0 THEN 0.0
                ELSE (d.n_events - m.mean) / sqrt(m.var) END AS zscore,
           abs(CASE WHEN m.var <= 0 THEN 0.0
                    ELSE (d.n_events - m.mean) / sqrt(m.var) END) > 2.0
               AS is_anomaly
    FROM daily d, mv m
"""
