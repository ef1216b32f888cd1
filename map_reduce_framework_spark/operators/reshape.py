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
