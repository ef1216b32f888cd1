"""Relational query suite over the driver's TPC-H-ish star schema.

The reference implements no joins, windows, or set ops (SURVEY.md §2.E);
these exist because the engine must serve the full query surface a Spark
user expects, oracle-checked against DuckDB. Patterns chosen for 100 TB:

* Dimension joins (region/nation/supplier/customer) are explicitly
  ``broadcast()`` -- at production scale lineitem/orders are the only
  tables that shuffle, and AQE handles skew on the fact-fact join.
* Filters are applied before joins so Catalyst pushes them into the
  parquet scan (verified in tests/test_plans.py).
* Float determinism across engines: every SUM over doubles goes through
  DECIMAL(18,6) and is cast back to DOUBLE, making the result bit-exact
  in both Spark and DuckDB regardless of partial-aggregation order.
  (A plain double sum over 60k rows differs by ~1e-9 relative between
  engines -- enough to break a value-hash.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent double sum: exact DECIMAL accumulation, DOUBLE out.

    DuckDB mirror: CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1: pricing summary report. One shuffle (4-bucket groupBy)
    with map-side partial aggregation; the shipdate filter pushes down."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_top_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 adapted (no shippriority column): top-10 open orders by
    revenue for one market segment. customer is broadcast; the
    orders<->lineitem join shuffles on orderkey only."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_region_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5: revenue by nation for one region/year where the supplier
    and customer share a nation. All dimensions broadcast; only
    orders<->lineitem shuffles."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
    )


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: order count per priority where at least one lineitem
    shipped after the order date -- a left-semi join (EXISTS)."""
    late = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
        )
        .join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no order since 2001-01-01.
    (Unscoped, every customer in the testdata has orders -- the date scope
    keeps the anti join's output non-trivial.)"""
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return customer.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def top_customers_per_segment(customer: DataFrame, orders: DataFrame, k: int = 5) -> DataFrame:
    """Window rank: top-k customers by order revenue within each market
    segment. Ties broken by custkey for determinism."""
    revenue = (
        orders.groupBy("o_custkey").agg(dsum("o_totalprice").alias("revenue"))
    )
    joined = customer.join(revenue, F.col("c_custkey") == F.col("o_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("revenue").desc(), F.col("c_custkey")
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("c_mktsegment", "c_custkey", "c_name", "revenue", "rnk")
    )


def customer_running_totals(orders: DataFrame) -> DataFrame:
    """Running window aggregate: cumulative spend per customer in order-date
    order. Exact DECIMAL accumulation keeps the running doubles identical
    across engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("cum_spend"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).alias("order_seq"),
    )


def nation_set_ops(customer: DataFrame, supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Set operations: nations with customers vs nations with suppliers --
    INTERSECT / EXCEPT / (symmetric) tagged into one result."""
    cust_nations = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name")
        .distinct()
    )
    supp_nations = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name")
        .distinct()
    )
    both = cust_nations.intersect(supp_nations).withColumn("tag", F.lit("both"))
    cust_only = cust_nations.exceptAll(supp_nations).withColumn("tag", F.lit("customer_only"))
    supp_only = supp_nations.exceptAll(cust_nations).withColumn("tag", F.lit("supplier_only"))
    return both.unionByName(cust_only).unionByName(supp_only)


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling-window aggregate in batch form: hourly event counts, value
    sums and distinct users. (Streaming twin in streaming/jobs.py.)"""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", 2).alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def events_json_metrics(events: DataFrame) -> DataFrame:
    """JSON scalar extraction: pull props.k out of the JSON payload and
    aggregate per event type."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("n"),
        )
    )


def events_variant_metrics(events: DataFrame) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: parse_json once
    into the binary variant encoding, then typed variant_get extraction --
    the shredded-at-scan path engines now prefer over per-access JSON
    string parsing (get_json_object re-parses the string per call; a
    variant column parses once and serves every field access). Same
    aggregate shape as events_json_metrics so the two are comparable."""
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count_distinct("k").alias("n_distinct_k"),
            (F.sum("k") / F.count("*")).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: a session ends after a ``gap_minutes`` silence.
    Classic lag + cumulative-flag window; per-user partitioning keeps it
    embarrassingly parallel at scale."""
    # Microsecond epochs on both engines (DuckDB: epoch_us) -- second-level
    # casts truncate differently between Spark and DuckDB.
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    base = events.select("user_id", "event_id", tsu.alias("tsu"))
    gap = F.col("tsu") - F.lag("tsu").over(w)
    flagged = base.select(
        "user_id",
        "tsu",
        "event_id",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_session = sessioned.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.expr("(max(tsu) - min(tsu)) div 1000000").alias("duration_sec"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("duration_sec").alias("max_session_sec"),
    )


_DSUM = "CAST(sum(CAST({x} AS DECIMAL(18,6))) AS DOUBLE)"

def session_table(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """The per-session row table behind ``user_sessions`` (gaps-and-
    islands sessionization materialized instead of aggregated away):
    one row per (user, session) with bounds, duration, and event count.
    Same single user-partitioned window stack -- embarrassingly parallel."""
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    base = events.select("user_id", "event_id", tsu.alias("tsu"))
    gap = F.col("tsu") - F.lag("tsu").over(w)
    flagged = base.select(
        "user_id",
        "tsu",
        "event_id",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.timestamp_micros(F.min("tsu"))
        .cast("timestamp_ntz")
        .alias("session_start"),
        F.timestamp_micros(F.max("tsu"))
        .cast("timestamp_ntz")
        .alias("session_end"),
        F.expr("(max(tsu) - min(tsu)) div 1000000").alias("duration_sec"),
    )


def user_recent_events(events: DataFrame, n: int = 5) -> DataFrame:
    """Feature-store "last N interactions" aggregate: each user's most
    recent ``n`` event ids, most-recent first. Window rank caps the rows
    BEFORE the collect (collect_list alone is unbounded per-key state --
    the thing to never do on a 100 TB log); descending struct sort makes
    the array order deterministic under equal timestamps. The id list is
    serialized to a comma-joined string so the output schema is atomic
    (hashable by any downstream comparator / feature store)."""
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("tsu").desc(), F.col("event_id").desc()
    )
    recent = (
        events.select("user_id", "event_id", tsu.alias("tsu"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
    )
    packed = F.sort_array(
        F.collect_list(F.struct("tsu", "event_id")), asc=False
    )
    return recent.groupBy("user_id").agg(
        F.array_join(
            F.transform(packed, lambda s: s["event_id"].cast("string")), ","
        ).alias("recent_ids"),
        F.count("*").alias("n_recent"),
    )


def revenue_rollup(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """ROLLUP (nation, segment): per-(nation, segment) revenue plus nation
    subtotals plus a grand total in ONE aggregation pass -- Spark executes
    grouping sets with a single Expand+shuffle, no multi-scan unions.
    grouping_id disambiguates subtotal rows from genuine NULL keys."""
    joined = (
        orders.select("o_custkey", "o_totalprice")
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            dsum("o_totalprice", 2).alias("revenue"),
            F.count("*").alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .select("n_name", "c_mktsegment", "revenue", "n_orders", "gid")
    )


def order_priority_cube(orders: DataFrame) -> DataFrame:
    """CUBE (priority, status): all four grouping sets in one pass."""
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), F.grouping_id().alias("gid"))
        .select("o_orderpriority", "o_orderstatus", "n_orders", "gid")
    )


def customers_with_big_orders(spark, customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Correlated EXISTS through the engine's SQL surface (Catalyst rewrites
    it to a left-semi join -- same physical shape as the DataFrame API)."""
    customer.createOrReplaceTempView("mrfs_customer")
    orders.createOrReplaceTempView("mrfs_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_mktsegment
        FROM mrfs_customer
        WHERE EXISTS (
            SELECT 1 FROM mrfs_orders
            WHERE o_custkey = c_custkey AND o_totalprice > 300000
        )
        """
    )


def orders_vs_customer_avg(spark, orders: DataFrame) -> DataFrame:
    """Correlated scalar subquery: orders above their customer's average
    (Catalyst decorrelates to an aggregate + join; the window-function
    formulation would shuffle identically)."""
    orders.createOrReplaceTempView("mrfs_orders2")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        FROM mrfs_orders2 o
        WHERE o.o_totalprice > 1.5 * (
            SELECT avg(CAST(i.o_totalprice AS DECIMAL(18,2)))
            FROM mrfs_orders2 i WHERE i.o_custkey = o.o_custkey
        )
        """
    )


def scalar_function_suite(orders: DataFrame) -> DataFrame:
    """Scalar-function breadth in one projection: date extraction and
    arithmetic, string ops, conditional/null handling, integer math --
    every expression chosen to be bit-exact across engines (no round():
    Spark rounds half-up, DuckDB half-even)."""
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.quarter(d).alias("o_quarter"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date")).alias(
            "days_to_eoy"
        ),
        F.upper(F.col("o_orderpriority")).alias("prio_upper"),
        F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
        F.length(F.col("o_orderpriority")).alias("prio_len"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_floor"),
        F.ceil(F.col("o_totalprice")).cast("bigint").alias("price_ceil"),
        (F.col("o_orderkey") % 97).alias("key_mod"),
        F.abs(F.col("o_custkey") - 500).alias("cust_abs"),
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6: pure filter + single aggregate -- the pushdown showcase
    (all three predicates reach the parquet scan; no shuffle at all until
    the 1-row final agg)."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 10)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def part_revenue_by_brand(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Revenue and volume per part brand (part is the broadcast dim; the
    lineitem side aggregates by l_partkey BEFORE the join at real scale --
    here the broadcast join first is fine and Catalyst picks it)."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.select("l_partkey", "l_quantity", rev.alias("rev"))
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            dsum("rev").alias("revenue"),
            dsum("l_quantity").alias("total_qty"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_lines"),
        )
    )


def events_value_percentiles(events: DataFrame) -> DataFrame:
    """Exact percentiles per event type (Spark's percentile == DuckDB's
    quantile_cont bit-for-bit: both linearly interpolate over the sorted
    values). At 100 TB swap in approx_percentile and accept the sketch
    error -- exact percentile requires a per-group sort."""
    return events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.count("*").alias("n"),
    )


def events_value_percentiles_approx(
    events: DataFrame, accuracy: int = 1000
) -> DataFrame:
    """The 100 TB twin of ``events_value_percentiles``: Greenwald-Khanna
    approximate percentiles (``approx_percentile``) -- mergeable
    bounded-size partial state instead of the per-group sort the exact
    form needs. accuracy=1000 bounds the rank error at n/1000 per group.
    Registered rows-only (the GK summary's merge order is partition-
    dependent, so estimates cannot hash-match an oracle); the rank-error
    envelope vs the exact form is pinned in tests."""
    return events.groupBy("event_type").agg(
        F.expr(f"approx_percentile(value, 0.5, {accuracy})").alias("p50"),
        F.expr(f"approx_percentile(value, 0.9, {accuracy})").alias("p90"),
        F.expr(f"approx_percentile(value, 0.99, {accuracy})").alias("p99"),
        F.count("*").alias("n"),
    )


def revenue_grouping_sets(
    orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Explicit GROUPING SETS (the general form of cube/rollup, already
    covered by revenue_rollup/order_priority_cube): revenue at
    (segment, priority), (segment), (priority), and grand total in ONE
    pass -- Catalyst plans a single Expand + one aggregate, vs four
    scans for four separate groupBys. ``gid`` is the explicit
    ``grouping(a)*2 + grouping(b)`` bitmask, identical across engines."""
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == customer["c_custkey"],
    )
    gid = (
        F.grouping("c_mktsegment") * 2 + F.grouping("o_orderpriority")
    ).cast("int")
    return (
        j.groupingSets(
            [
                ["c_mktsegment", "o_orderpriority"],
                ["c_mktsegment"],
                ["o_orderpriority"],
                [],
            ],
            "c_mktsegment",
            "o_orderpriority",
        )
        .agg(
            dsum("o_totalprice").alias("revenue"),
            F.count("*").alias("n_orders"),
            gid.alias("gid"),
        )
    )


def events_value_histogram(events: DataFrame) -> DataFrame:
    """Equi-width histogram of event value per type: bucket index by
    integer arithmetic (floor(value/50), capped at 9 -- values span
    [0, 500)). One groupBy, map-side combinable; the histogram of a
    100 TB table costs one shuffle of n_types*10 partial rows."""
    bucket = F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9))
    return (
        events.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .withColumn("lo", (F.col("bucket") * 50).cast("int"))
    )


def customer_value_tiles(orders: DataFrame) -> DataFrame:
    """Distribution-rank window functions over per-customer spend:
    ntile(10) decile, percent_rank, cume_dist. Ordering includes the key
    (spend, custkey) so ntile's arbitrary-split-of-ties is pinned to one
    deterministic answer in every engine. One groupBy + one global-order
    window; at scale the single-partition window is the bottleneck --
    the standard fix is range-partitioned ranking (orderBy().window per
    range, offsets merged), which Spark's global sort already applies to
    the underlying exchange."""
    spend = orders.groupBy("o_custkey").agg(
        dsum("o_totalprice").alias("spend")
    )
    w = Window.orderBy(F.col("spend").desc(), F.col("o_custkey"))
    return spend.select(
        "o_custkey",
        "spend",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """Arg-max aggregation: each user's latest event row in ONE groupBy
    via max(struct(ts, event_id, ...)) -- no window, no self-join, and
    the struct's lexicographic order makes equal-timestamp ties
    deterministic (max_by/arg_max leave ties undefined in both engines).
    Map-side combinable: at 100 TB this shuffles one struct per
    (user, partition), not the event stream."""
    packed = F.max(
        F.struct("ts", "event_id", "event_type", "value")
    ).alias("m")
    return (
        events.groupBy("user_id")
        .agg(packed)
        .select(
            "user_id",
            F.col("m.ts").alias("ts"),
            F.col("m.event_id").alias("event_id"),
            F.col("m.event_type").alias("event_type"),
            F.col("m.value").alias("value"),
        )
    )


def daily_revenue_trend(orders: DataFrame) -> DataFrame:
    """Daily revenue with a 7-row trailing moving average, day-over-day
    delta, and share-of-total -- the ROWS-frame / lag / ratio-to-report
    window trio. Aggregates to |days| rows FIRST, so the global-ordered
    windows run over ~2.4k rows regardless of fact size (group-first is
    what makes a single-partition window acceptable here).

    Window sums go through DECIMAL: engines associate sliding-window
    sums differently (Spark iterates the frame, DuckDB segment-trees
    it), so double accumulation would drift; decimal is
    association-free."""
    day = F.col("o_orderdate").cast("date").alias("day")
    daily = orders.groupBy(day).agg(dsum("o_totalprice").alias("revenue"))
    dec = F.col("revenue").cast("decimal(18,6)")
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    wall = Window.orderBy("day").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wlag = Window.orderBy("day")
    return daily.select(
        "day",
        "revenue",
        (F.sum(dec).over(w7).cast("double") / F.count("*").over(w7)).alias(
            "ma7"
        ),
        (F.col("revenue") - F.lag("revenue").over(wlag)).alias("delta"),
        (
            F.col("revenue") / F.sum(dec).over(wall).cast("double")
        ).alias("share_of_total"),
    )


def orders_profile(orders: DataFrame) -> DataFrame:
    """Column-profiling (ANALYZE TABLE-style data quality report): one
    row per column with null count, distinct count, and min/max rendered
    as strings. Single pass: all per-column aggregates compute in ONE
    map-side-combinable aggregate, then unpivot to long form -- the
    profile of a 100 TB table costs one scan, not one scan per column."""
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")


def user_tier_scd2(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from an event log: each
    user's spend tier over time as validity intervals. Tier is derived
    per event (value bands); consecutive same-tier events merge into one
    interval (gaps-and-islands: change-flag via lag, running sum names
    the island); valid_to = next interval's start, NULL while current --
    the standard warehouse dimension a MERGE-based CDC pipeline
    maintains, built here in one pass.

    Scale shape: two windows and one aggregate, all partitioned by
    user_id -- ONE shuffle total (Catalyst reuses the hash partitioning
    across the lag window, the island sum, the groupBy, and the lead
    window)."""
    tier = (
        F.when(F.col("value") < 20.0, "low")
        .when(F.col("value") < 60.0, "mid")
        .when(F.col("value") < 150.0, "high")
        .otherwise("vip")
    )
    wo = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    base = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
        tier.alias("tier"),
    )
    flagged = base.withColumn(
        "chg",
        F.when(
            F.lag("tier").over(wo).isNull()
            | (F.lag("tier").over(wo) != F.col("tier")),
            1,
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("chg").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = flagged.groupBy("user_id", "island").agg(
        # every row in an island carries the same tier by construction
        F.min("tier").alias("tier"),
        F.min("tsu").alias("from_us"),
        F.count("*").alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("island")
    return intervals.select(
        "user_id",
        "tier",
        F.timestamp_micros(F.col("from_us"))
        .cast("timestamp_ntz")
        .alias("valid_from"),
        F.timestamp_micros(F.lead("from_us").over(wl))
        .cast("timestamp_ntz")
        .alias("valid_to"),
        (F.lead("from_us").over(wl).isNull()).alias("is_current"),
        "n_events",
    )


def orders_profile_approx(orders: DataFrame) -> DataFrame:
    """``orders_profile`` with ``approx_count_distinct`` (HLL++): the
    100 TB form of the profiling report. The exact multi-distinct plan
    Expands the scan ~7x (one replica per distinct aggregate) before
    partial aggregation -- correct, single-scan, but the suite's slowest
    row at 3.1 s; HLL sketches merge map-side with no Expand, so the
    profile costs one true scan. Sketch estimates are engine-specific,
    so this registers with a rows-only check (like the HLL reach
    sketches); the exact twin stays the hash-gated oracle."""
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct_approx"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")


AFFINITY_MIN_PAIR = 3
AFFINITY_TOP_K = 100


def part_affinity_rules(
    lineitem: DataFrame,
    min_pair: int = AFFINITY_MIN_PAIR,
    k: int = AFFINITY_TOP_K,
) -> DataFrame:
    """Pairwise association rules over the order baskets (the pairwise
    core of Apriori/FP-growth, Agrawal & Srikant VLDB'94): for each part
    pair co-occurring in >= ``min_pair`` orders, support, confidence and
    lift; top-``k`` by lift. The recommender bootstrap next to
    part_pagerank/part_triangle_counts.

    Exactness: support/confidence/lift are single int-over-int double
    divisions (lift's numerator and denominator are exact BIGINT
    products first), so the scores hash-match DuckDB. Plan: the basket
    self-join keyed on the order (balanced -- fan-out bounded by basket
    size), one (a,b) groupBy, two broadcast-sized joins for the per-part
    counts, global top-k. At 100 TB min_pair is the frequency floor that
    keeps the pair relation near-linear (the Apriori downward-closure
    argument)."""
    po = lineitem.select("l_orderkey", "l_partkey").distinct()
    n_orders = po.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    per_part = po.groupBy("l_partkey").agg(F.count("*").alias("n_part"))
    pairs = (
        po.alias("x")
        .join(po.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair)
    )
    enriched = (
        pairs.join(
            per_part.select(
                F.col("l_partkey").alias("part_a"),
                F.col("n_part").alias("n_a"),
            ),
            "part_a",
        )
        .join(
            per_part.select(
                F.col("l_partkey").alias("part_b"),
                F.col("n_part").alias("n_b"),
            ),
            "part_b",
        )
        .join(F.broadcast(n_orders))
    )
    return (
        enriched.select(
            "part_a",
            "part_b",
            "pair_n",
            "n_a",
            "n_b",
            (F.col("pair_n") / F.col("n_orders")).alias("support"),
            (F.col("pair_n") / F.col("n_a")).alias("confidence_a_to_b"),
            (
                (F.col("pair_n") * F.col("n_orders"))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(k)
    )


def fk_integrity_audit(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Referential-integrity / domain audit in one report: the DQ checks
    an ingest pipeline runs before promoting a batch. One row per check:
    (check, n_violations).

    * orphan lineitems (l_orderkey not in orders) and orphan orders
      (o_custkey not in customer) -- LEFT ANTI joins, the fact side
      streams, the key side is the join build;
    * domain checks (non-positive quantity, negative price, discount
      outside [0,1]) -- single-scan conditional counts.

    At 100 TB the anti-joins are the only shuffles (on the FK), and the
    domain counts ride the same scan as any other partial aggregate. On
    clean synthetic data every count is an honest zero -- the planted-
    violation test proves detection (same protocol as the PII audit)."""
    orphan_li = (
        lineitem.select("l_orderkey")
        .join(orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("orphan_lineitem_orderkey").alias("check"), F.col("n"))
    )
    orphan_o = (
        orders.select("o_custkey")
        .join(customer.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("orphan_order_custkey").alias("check"), F.col("n"))
    )
    domain = lineitem.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias(
            "nonpositive_quantity"
        ),
        F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0)).alias(
            "negative_price"
        ),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
            ).otherwise(0)
        ).alias("discount_out_of_range"),
    )
    domain_rows = domain.selectExpr(
        "stack(3, 'nonpositive_quantity', nonpositive_quantity, "
        "'negative_price', negative_price, "
        "'discount_out_of_range', discount_out_of_range) AS (check, n)"
    )
    return orphan_li.unionByName(orphan_o).unionByName(domain_rows)


def lineitem_checksum(lineitem: DataFrame) -> DataFrame:
    """Order-independent whole-table fingerprint: n_rows plus the sum of
    a 60-bit md5 over each row's canonical serialization -- the
    cross-replica / cross-engine consistency check a 100 TB migration
    runs instead of row-by-row diffing (compare two checksums, not two
    tables). Sum (not xor) so duplicate-row multiplicity is visible;
    BIGINT sum of 60-bit terms overflows at ~2^63/2^60 = 8 rows, so the
    terms accumulate as DECIMAL(38,0) (same discipline as
    embedding_dim_stats). One scan, one 1-row aggregate, shuffle-free
    partial merge."""
    # doubles stringify differently across engines ("1.0" vs "1"); route
    # them through a fixed-scale DECIMAL so the canonical form is shared
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_quantity").cast("decimal(12,2)").cast("string"),
    )
    term = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    return lineitem.agg(
        F.count("*").alias("n_rows"),
        F.sum(term).cast("string").alias("checksum"),
    )


def daily_revenue_reconciliation(
    orders: DataFrame, events: DataFrame
) -> DataFrame:
    """FULL OUTER reconciliation of two independent daily revenue
    ledgers: order totals by order date vs purchase-event values by event
    date. Days present in only one source surface with a NULL on the
    other side -- the standard cross-system consistency report. Both
    sides pre-aggregate to one row per day BEFORE the full join, so the
    join input is |days|, not |rows|."""
    o = (
        orders.groupBy(
            F.col("o_orderdate").cast("date").alias("day")
        )
        .agg(dsum("o_totalprice").alias("order_revenue"),
             F.count("*").alias("n_orders"))
    )
    e = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(dsum("value").alias("purchase_value"),
             F.count("*").alias("n_purchases"))
    )
    return (
        o.join(e, "day", "full_outer")
        .select(
            "day",
            "order_revenue",
            "n_orders",
            "purchase_value",
            "n_purchases",
        )
    )


def value_gini_per_type(events: DataFrame) -> DataFrame:
    """Gini coefficient of event value per type -- the inequality metric
    a spend/engagement pipeline reports -- via the rank formula
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over ascending-sorted values.

    Exactness: values carry exactly 2 decimals, so cents are exact
    BIGINTs; sum(i*x_i) is tie-invariant (permuting equal values does not
    change it), so the rank window needs no tiebreak. One window + one
    groupBy, both keyed on event_type. The integer sums stay under 2^53
    through sf0.1; at much larger n, keep the sums integral (they stay
    exact in int64/int128 far longer) and accept last-ulp fp in the final
    division, or shard the rank-sum per partition range."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("cents")
    ranked = events.select(
        "event_type", cents.alias("cents")
    ).withColumn("i", F.row_number().over(w).cast("bigint"))
    n = F.count("*")
    sw = F.sum("cents")
    swi = F.sum(F.col("i") * F.col("cents"))
    return ranked.groupBy("event_type").agg(
        n.alias("n"),
        (sw / (n * F.lit(100.0))).alias("mean_value"),
        (
            F.lit(2.0) * swi / (n * sw) - (n + F.lit(1.0)) / n
        ).alias("gini"),
    )


def value_k_correlation(events: DataFrame) -> DataFrame:
    """Pearson correlation between event value and the JSON props.k per
    event type, from exact integer moments: cents (values have 2
    decimals) and k are BIGINTs, so n*sxy - sx*sy etc. are exact integer
    expressions in both engines (int64 here, int128 in DuckDB -- same
    values at these scales); the only roundings are the final int->double
    casts (correctly rounded in both) and IEEE sqrt/divide. Spark's
    built-in corr() is a running double accumulation whose result depends
    on partition order -- unusable under a value-hash oracle; the moment
    form is also the map-side-combinable one (5 partial sums per
    partition, nothing re-scanned)."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    t = events.select("event_type", cents.alias("x"), k.alias("y"))
    n = F.count("*")
    sx, sy = F.sum("x"), F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    sxy = F.sum(F.col("x") * F.col("y"))
    num = (n * sxy - sx * sy).cast("double")
    den = F.sqrt((n * sxx - sx * sx).cast("double")) * F.sqrt(
        (n * syy - sy * sy).cast("double")
    )
    return t.groupBy("event_type").agg(
        n.alias("n"), (num / den).alias("corr_value_k")
    )


def value_robust_stats(events: DataFrame) -> DataFrame:
    """Robust per-type statistics: median, MAD (median absolute
    deviation), IQR, and the |x - med| > 3*MAD outlier count -- the
    clipping thresholds an ingestion pipeline derives before
    normalization. Spark's percentile() interpolates identically to
    DuckDB's quantile_cont (proven by events_value_percentiles), so the
    whole composition stays hash-exact. Two grouped passes: medians,
    then deviations against the broadcast medians."""
    pct = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"),
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.75)").alias("p75"),
    )
    dev = events.join(F.broadcast(pct), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            (F.min("p75") - F.min("p25")).alias("iqr"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * F.col("mad")
                ).cast("bigint")
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


def weekly_retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-active week; for each
    (cohort_week, k) the count of cohort users active k weeks later.
    Two user-keyed aggregates + one |users·weeks| self-join on user_id --
    the product-analytics staple. Weeks via date_trunc (ISO Monday in
    both engines); k from an exact day difference // 7."""
    week = F.date_trunc("week", F.col("ts").cast("timestamp")).cast("date")
    active = events.select("user_id", week.alias("week")).distinct()
    cohort = active.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        active.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("k"),
            "user_id",
        )
        .groupBy("cohort_week", "k")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over each user's event-type
    sequence (lag window keyed on user + one pair groupBy), with the
    per-source transition probability as an exact bigint/bigint division.
    The per-user sequences shard the lag; the final matrix is
    |types|^2 rows regardless of log size."""
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    pairs = (
        events.select("user_id", "event_id", "event_type", tsu.alias("tsu"))
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wsrc = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") / F.sum("n").over(wsrc)).alias("p"),
    )


def event_funnel(events: DataFrame) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per user, each stage
    counts only events strictly after the user's entry into the previous
    stage. Three chained per-user min-aggregates + semi-join-shaped
    filters -- every shuffle keys on user_id, so the funnel over a 100 TB
    event log costs three user-partitioned aggregations, no windows over
    the raw stream. Output: one row per stage with the surviving-user
    count (monotone non-increasing)."""
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stages = [
        ("1_view", v),
        ("2_view_then_click", c),
        ("3_click_then_purchase", p),
    ]
    out = None
    for name, df in stages:
        row = df.agg(
            F.lit(name).alias("stage"),
            F.count("*").alias("n_users"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def q7_volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year -- the
    supplier's nation and the (order's) customer's nation, in either
    direction. Both nation joins broadcast under distinct aliases; only
    lineitem<->orders shuffles."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(rev).alias("revenue"))
    )


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returned items in
    one quarter. The returnflag filter pushes to the lineitem scan;
    customer and nation broadcast."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q13_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count -- a left outer
    join (customers with zero orders count as 0) feeding a double
    aggregation. Two shuffles total; the second groupBy is tiny."""
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q14_promo_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month -- conditional
    aggregation over a broadcast part join; single-row result."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / dsum(rev)
            ).alias("promo_revenue_pct")
        )
    )


def top_supplier_revenue(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter -- an aggregate compared against a scalar subquery of the same
    aggregate. The max is a 1-row broadcast; equality on doubles is safe
    because both sides run the identical decimal-accumulated sum."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revs = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(rev).alias("total_revenue"))
    )
    mx = revs.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revs.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q2 shape (correlated-min subquery -> window argmin): for
    each qualifying part, the EUROPE supplier offering it at minimum
    unit cost. The testdata has no partsupp table, so the part-supplier
    catalog derives from lineitem: supplycost := min observed unit price
    (l_extendedprice / l_quantity) per (part, supplier) -- exact in both
    engines (one IEEE division, then min).

    Plan shape: the correlated `cost = (SELECT min ...)` becomes a window
    min over p_partkey -- one pass, no self-join; all dimensions
    broadcast, so the only shuffle is the ps groupBy on (part, supp)."""
    euro_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(
                region.filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supplycost"
            )
        )
    )
    target = part.filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(F.broadcast(target), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q11_important_parts(
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q11 shape (HAVING against a global scalar aggregate): parts
    whose traded value through ASIA's suppliers exceeds a fixed fraction
    of that region's total traded value. partsupp adaptation: value :=
    revenue (extendedprice net of discount) per part; the nation filter
    widens to a region so the query is non-degenerate at every test SF
    (sf0.001 has 10 suppliers across 25 nations).

    Determinism note: the global total is NOT a double sum of per-part
    doubles (order-dependent) -- it re-aggregates the same decimal
    partials in one exact pass and broadcasts the 1-row result."""
    n7 = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = lineitem.join(
        F.broadcast(n7), F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = base.groupBy("l_partkey").agg(dsum(rev).alias("part_value"))
    # Scale-free threshold (TPC-H's is 0.0001/SF -- SF-dependent): a part
    # is "important" above 1.5x the mean part value, which keeps the
    # result non-degenerate from sf0.001 to 100 TB.
    total = base.agg(
        dsum(rev).alias("total_value"),
        F.count_distinct("l_partkey").alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("part_value")
            > F.col("total_value") / F.col("n_parts") * 1.5
        )
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q20_excess_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q20 shape (semi-join chain over a nested aggregate):
    AFRICA suppliers whose 1995 shipments of small-class parts exceed
    15% of their all-time shipments of those parts -- the "who held
    excess stock" audit. availqty adaptation: both sides of the
    comparison derive from lineitem, as conditional aggregates in ONE
    groupBy (single scan, no self-join).

    The part filter is a broadcast semi-join; the only shuffle is the
    (suppkey)-keyed aggregate."""
    small_parts = part.filter(F.col("p_name").startswith("small")).select(
        "p_partkey"
    )
    in_1995 = (
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    agg = (
        lineitem.join(
            F.broadcast(small_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(
            dsum(F.when(in_1995, F.col("l_quantity")).otherwise(0.0)).alias(
                "qty_1995"
            ),
            dsum("l_quantity").alias("qty_total"),
        )
        .filter(F.col("qty_1995") > F.col("qty_total") * 0.15)
    )
    african = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).join(
        F.broadcast(region.filter(F.col("r_name") == "AFRICA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return (
        agg.join(F.broadcast(african), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "s_acctbal", "qty_1995", "qty_total")
        .orderBy("s_name")
    )


def q18_large_volume_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q18: customers with any order whose total quantity exceeds a
    threshold -- an aggregate-HAVING subquery joined back to orders. The
    heavy groupBy is on l_orderkey (high cardinality, well-distributed);
    everything after the HAVING filter is tiny."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q8_market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q8 (adapted: p_type here is a single word): yearly market
    share of NATION_3-based suppliers within the ECONOMY-part volume sold
    to ASIA customers. All dimension sides (part filter, customer-region
    semi-set, supplier nation) broadcast; only lineitem<->orders shuffles.
    The share division runs over two decimal-accumulated sums, so the
    double result is order-independent."""
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia_cust = (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nat = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_nationkey"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_nationkey"),
    ).select("s_suppkey", "supp_nation")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / dsum(vol)
            ).alias("mkt_share")
        )
    )


def q9_product_profit(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table, so supply cost is
    proxied as half the part's retail price per unit): profit by supplier
    nation and order year for parts whose name contains 'widget'. part and
    supplier->nation broadcast; lineitem<->orders is the only shuffle."""
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    supp_nat = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_nationkey"),
                F.col("n_name").alias("nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_nationkey"),
    ).select("s_suppkey", "nation")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").contains("widget"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("nation", "o_year")
        .agg(dsum(amount).alias("sum_profit"))
    )


def q12_shipping_delay(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode/commitdate/receiptdate
    columns, so lines are classified by ship delay instead of ship mode):
    for one order year, count high- vs low-priority lineitems per delay
    bucket. One equi-join shuffle, then a 3-group CASE aggregation."""
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "fast").when(delay <= 90, "medium").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(bucket.alias("ship_speed"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q16_supplier_part_variety(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier set per part comes from lineitem
    rather than the absent partsupp table): distinct supplier count per
    (brand, type, size) for a size subset, excluding one brand. The
    count(DISTINCT) runs as a two-phase partial-distinct aggregate keyed
    by the high-cardinality (brand,type,size,suppkey) first."""
    sel = part.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(sel), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_quantity_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders for
    one brand/size band were not taken. The correlated scalar subquery
    (per-part 20%-of-average-quantity threshold) becomes a per-part
    aggregate over the already-part-filtered lineitems joined back --
    both joins broadcast the tiny filtered part side, so the fact table
    is scanned once and never self-shuffles."""
    sel = part.filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)
    ).select("p_partkey")
    li_sel = lineitem.join(
        F.broadcast(sel), F.col("l_partkey") == F.col("p_partkey")
    )
    thr = li_sel.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * (dsum("l_quantity") / F.count("*"))).alias("qty_thr")
    )
    return (
        li_sel.join(F.broadcast(thr), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


def q19_disjunctive_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR-ed brand/size/quantity
    bands. The disjunction stays a post-join filter on one broadcast
    equi-join on partkey -- Catalyst extracts the common join key instead
    of falling back to a cross product, and pushes the quantity bounds
    (common to no branch) down to the scan only where shared."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(dsum(rev).alias("revenue"), F.count("*").alias("n_lines"))
    )


def q21_waiting_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q21 shape (adapted: late = shipped >60 days after the order
    date, since commit/receipt dates don't exist here): suppliers in one
    region who were the ONLY late supplier on a multi-supplier finalized
    order. EXISTS -> left_semi, NOT EXISTS -> left_anti; every self-join
    is an equi-join on l_orderkey so the plan is three hash joins on the
    same key -- one shuffle partitioning reused, no cross products."""
    li = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60).alias("late"),
    )
    l1 = li.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = l1.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    cand = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    euro_supp = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        cand.join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q22_sales_opportunity(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape (adapted: the country code comes from the customer
    name's digit tail, standing in for the absent phone column): customers
    from a code set with above-average positive balance and no recent
    orders (every customer here has SOME order, so the anti-join is
    date-scoped to stay non-trivial, as in customers_without_orders).
    The scalar average is a broadcast cross join; the no-recent-orders
    test is a left_anti join on custkey."""
    code = F.substring("c_name", 17, 2)
    sel = customer.withColumn("cntrycode", code).filter(
        code.isin("10", "13", "17", "18", "23", "29", "30", "31")
    )
    avg_bal = sel.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal", 2) / F.count("*")).alias("avg_bal")
    )
    return (
        sel.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp_ntz")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )


ORACLE_SQL: dict[str, str] = {
    "q8_market_share": f"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               {_DSUM.format(x="CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")}
               / {_DSUM.format(x='l_extendedprice*(1-l_discount)')} AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY'
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,

    "q9_product_profit": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               {_DSUM.format(x='l_extendedprice*(1-l_discount) - 0.5*p_retailprice*l_quantity')}
                   AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,

    "q12_shipping_delay": """
        SELECT CASE
                 WHEN date_diff('day', o_orderdate, CAST(l_shipdate AS TIMESTAMP)) <= 30 THEN 'fast'
                 WHEN date_diff('day', o_orderdate, CAST(l_shipdate AS TIMESTAMP)) <= 90 THEN 'medium'
                 ELSE 'slow'
               END AS ship_speed,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,

    "q16_supplier_part_variety": """
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
        GROUP BY p_brand, p_type, p_size
    """,

    "q17_small_quantity_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
                   AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23' AND p_size < 15
          AND l_quantity < (
              SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*))
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
    """,

    "q19_disjunctive_revenue": f"""
        SELECT {_DSUM.format(x='l_extendedprice*(1-l_discount)')} AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,

    "q21_waiting_suppliers": """
        WITH li AS (
            SELECT l_orderkey, l_suppkey,
                   date_diff('day', o_orderdate, CAST(l_shipdate AS TIMESTAMP)) > 60 AS late
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM li l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND l1.late
          AND EXISTS (
              SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM li l3
              WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                AND l3.late
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,

    "q22_sales_opportunity": """
        WITH sel AS (
            SELECT substring(c_name, 17, 2) AS cntrycode, c_custkey, c_acctbal
            FROM customer
            WHERE substring(c_name, 17, 2) IN ('10','13','17','18','23','29','30','31')
        )
        SELECT cntrycode,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM sel
        WHERE c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
            FROM sel WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-07-01'
        )
        GROUP BY cntrycode
    """,

    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM CAST(l_shipdate AS TIMESTAMP)) AS INT)
                   AS l_year,
               {_DSUM.format(x='l_extendedprice*(1-l_discount)')} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
          AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,

    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {_DSUM.format(x='l_extendedprice*(1-l_discount)')} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,

    "q13_order_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,

    "q14_promo_revenue": f"""
        SELECT 100.0
               * {_DSUM.format(x="CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")}
               / {_DSUM.format(x='l_extendedprice*(1-l_discount)')}
                   AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1997-09-01'
          AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1997-10-01'
    """,

    "top_supplier_revenue": f"""
        WITH revs AS (
            SELECT l_suppkey,
                   {_DSUM.format(x='l_extendedprice*(1-l_discount)')}
                       AS total_revenue
            FROM lineitem
            WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
              AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revs JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revs)
    """,

    "q2_min_cost_supplier": """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS supplycost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        euro AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        cand AS (
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost,
                   min(supplycost) OVER (PARTITION BY p_partkey) AS min_cost
            FROM ps
            JOIN part ON l_partkey = p_partkey
            JOIN euro ON l_suppkey = s_suppkey
            WHERE p_size <= 15 AND p_type = 'LARGE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
        FROM cand WHERE supplycost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,

    "q11_important_parts": f"""
        WITH base AS (
            SELECT l_partkey, l_extendedprice, l_discount
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        ),
        per_part AS (
            SELECT l_partkey,
                   {_DSUM.format(x='l_extendedprice*(1-l_discount)')}
                       AS part_value
            FROM base GROUP BY l_partkey
        ),
        total AS (
            SELECT {_DSUM.format(x='l_extendedprice*(1-l_discount)')}
                       AS total_value,
                   count(DISTINCT l_partkey) AS n_parts
            FROM base
        )
        SELECT l_partkey, part_value
        FROM per_part, total
        WHERE part_value > total_value / n_parts * 1.5
        ORDER BY part_value DESC, l_partkey
    """,

    "q20_excess_suppliers": f"""
        WITH agg AS (
            SELECT l_suppkey,
                   {_DSUM.format(
                       x="CASE WHEN CAST(l_shipdate AS TIMESTAMP)"
                         " >= TIMESTAMP '1995-01-01'"
                         " AND CAST(l_shipdate AS TIMESTAMP)"
                         " < TIMESTAMP '1996-01-01'"
                         " THEN l_quantity ELSE 0.0 END")} AS qty_1995,
                   {_DSUM.format(x='l_quantity')} AS qty_total
            FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
            )
            GROUP BY l_suppkey
        )
        SELECT s_name, s_acctbal, qty_1995, qty_total
        FROM agg
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'AFRICA' AND qty_1995 > qty_total * 0.15
        ORDER BY s_name
    """,

    "q18_large_volume_customers": f"""
        WITH big AS (
            SELECT l_orderkey, {_DSUM.format(x='l_quantity')} AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING {_DSUM.format(x='l_quantity')} > 300.0
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        FROM big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,

    "events_variant_metrics": """
        WITH k AS (
            SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events
        )
        SELECT event_type,
               count(DISTINCT k) AS n_distinct_k,
               CAST(sum(k) AS BIGINT) / count(*) AS avg_k,
               min(k) AS min_k,
               max(k) AS max_k
        FROM k GROUP BY event_type
    """,
    "daily_revenue_trend": f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   {_DSUM.format(x='o_totalprice')} AS revenue
            FROM orders GROUP BY 1
        )
        SELECT day, revenue,
               CAST(sum(CAST(revenue AS DECIMAL(18,6))) OVER w7 AS DOUBLE)
                   / count(*) OVER w7 AS ma7,
               revenue - lag(revenue) OVER (ORDER BY day) AS delta,
               revenue / CAST(sum(CAST(revenue AS DECIMAL(18,6))) OVER ()
                              AS DOUBLE) AS share_of_total
        FROM daily
        WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    "orders_profile": """
        WITH a AS (SELECT * FROM orders)
        """
    + " UNION ALL ".join(
        f"""
        SELECT '{c}' AS column, count(*) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_str,
               CAST(max({c}) AS VARCHAR) AS max_str
        FROM a
        """
        for c in [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ]
    ),
    "daily_revenue_reconciliation": f"""
        WITH o AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   {_DSUM.format(x='o_totalprice')} AS order_revenue,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        ),
        e AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   {_DSUM.format(x='value')} AS purchase_value,
                   count(*) AS n_purchases
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT day, order_revenue, n_orders, purchase_value, n_purchases
        FROM o FULL OUTER JOIN e USING (day)
    """,
    "value_gini_per_type": """
        WITH ranked AS (
            SELECT event_type,
                   CAST(floor(value*100 + 0.5) AS BIGINT) AS cents,
                   CAST(row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(floor(value*100 + 0.5) AS BIGINT)
                   ) AS BIGINT) AS i
            FROM events
        )
        SELECT event_type,
               count(*) AS n,
               CAST(sum(cents) AS BIGINT) / (count(*) * 100.0) AS mean_value,
               2.0 * CAST(sum(i*cents) AS BIGINT)
                   / (count(*) * CAST(sum(cents) AS BIGINT))
                   - (count(*) + 1.0) / count(*) AS gini
        FROM ranked GROUP BY event_type
    """,
    "value_k_correlation": """
        WITH t AS (
            SELECT event_type,
                   CAST(floor(value*100 + 0.5) AS BIGINT) AS x,
                   CAST(props->>'k' AS BIGINT) AS y
            FROM events
        )
        SELECT event_type, count(*) AS n,
               CAST(count(*)*CAST(sum(x*y) AS BIGINT)
                    - CAST(sum(x) AS BIGINT)*CAST(sum(y) AS BIGINT)
                    AS DOUBLE)
               / (sqrt(CAST(count(*)*CAST(sum(x*x) AS BIGINT)
                            - CAST(sum(x) AS BIGINT)*CAST(sum(x) AS BIGINT)
                            AS DOUBLE))
                  * sqrt(CAST(count(*)*CAST(sum(y*y) AS BIGINT)
                              - CAST(sum(y) AS BIGINT)*CAST(sum(y) AS BIGINT)
                              AS DOUBLE))) AS corr_value_k
        FROM t GROUP BY event_type
    """,
    "value_robust_stats": """
        WITH pct AS (
            SELECT event_type,
                   quantile_cont(value, 0.5) AS med,
                   quantile_cont(value, 0.25) AS p25,
                   quantile_cont(value, 0.75) AS p75
            FROM events GROUP BY event_type
        ),
        mad AS (
            SELECT e.event_type,
                   quantile_cont(abs(e.value - p.med), 0.5) AS mad
            FROM events e JOIN pct p USING (event_type)
            GROUP BY e.event_type
        )
        SELECT e.event_type,
               min(p.med) AS med,
               min(m.mad) AS mad,
               min(p.p75) - min(p.p25) AS iqr,
               CAST(sum(CASE WHEN abs(e.value - p.med) > 3 * m.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               count(*) AS n
        FROM events e
        JOIN pct p USING (event_type)
        JOIN mad m USING (event_type)
        GROUP BY e.event_type
    """,
    "weekly_retention_cohorts": """
        WITH active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS week
            FROM events
        ),
        cohort AS (
            SELECT user_id, min(week) AS cohort_week
            FROM active GROUP BY user_id
        )
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS k,
               count(DISTINCT user_id) AS n_users
        FROM active JOIN cohort USING (user_id)
        GROUP BY 1, 2
    """,
    "event_transition_matrix": """
        WITH pairs AS (
            SELECT prev_type AS from_type, event_type AS to_type,
                   count(*) AS n
            FROM (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                       ) AS prev_type
                FROM events
            )
            WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               n / (CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)) AS p
        FROM pairs
    """,
    "event_funnel": """
        WITH v AS (
            SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase'
              AND CAST(e.ts AS TIMESTAMP) > c.t_click
            GROUP BY e.user_id
        )
        SELECT '1_view' AS stage, count(*) AS n_users FROM v
        UNION ALL
        SELECT '2_view_then_click', count(*) FROM c
        UNION ALL
        SELECT '3_click_then_purchase', count(*) FROM p
    """,
    "customer_value_tiles": f"""
        WITH spend AS (
            SELECT o_custkey, {_DSUM.format(x='o_totalprice')} AS spend
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, spend,
               CAST(ntile(10) OVER w AS BIGINT) AS decile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM spend
        WINDOW w AS (ORDER BY spend DESC, o_custkey)
    """,
    "latest_event_per_user": """
        SELECT user_id,
               m['ts'] AS ts,
               m['event_id'] AS event_id,
               m['event_type'] AS event_type,
               m['value'] AS value
        FROM (
            SELECT user_id,
                   max({'ts': CAST(ts AS TIMESTAMP), 'event_id': event_id,
                        'event_type': event_type, 'value': value}) AS m
            FROM events GROUP BY user_id
        )
    """,
    "revenue_grouping_sets": f"""
        SELECT c_mktsegment, o_orderpriority,
               {_DSUM.format(x='o_totalprice')} AS revenue,
               count(*) AS n_orders,
               CAST(GROUPING(c_mktsegment)*2 + GROUPING(o_orderpriority)
                    AS INT) AS gid
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS (
            (c_mktsegment, o_orderpriority),
            (c_mktsegment), (o_orderpriority), ()
        )
    """,
    "events_value_histogram": f"""
        SELECT event_type,
               least(CAST(floor(value/50) AS INT), 9) AS bucket,
               count(*) AS n,
               {_DSUM.format(x='value')} AS sum_value,
               CAST(least(CAST(floor(value/50) AS INT), 9) * 50 AS INT) AS lo
        FROM events
        GROUP BY 1, 2
    """,
    "events_value_percentiles": """
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99,
               count(*) AS n
        FROM events GROUP BY event_type
    """,

    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
          AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 10
    """,
    "part_revenue_by_brand": """
        SELECT p_brand,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                   AS revenue,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
               count(DISTINCT l_partkey) AS n_parts,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,

    "revenue_rollup": """
        SELECT n_name, c_mktsegment,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n_orders,
               CAST(grouping(n_name) * 2 + grouping(c_mktsegment) AS BIGINT) AS gid
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
    "order_priority_cube": """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    "customers_with_big_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 300000
        )
    """,
    "orders_vs_customer_avg": """
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders o
        WHERE o.o_totalprice > 1.5 * (
            SELECT avg(CAST(i.o_totalprice AS DECIMAL(18,2)))
            FROM orders i WHERE i.o_custkey = o.o_custkey
        )
    """,
    "scalar_function_suite": """
        SELECT o_orderkey,
               CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS o_year,
               CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS o_month,
               CAST(day(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS o_day,
               CAST(quarter(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS o_quarter,
               strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS year_month,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
                   AS days_to_eoy,
               upper(o_orderpriority) AS prio_upper,
               substring(o_orderpriority, 1, 1) AS prio_code,
               CAST(length(o_orderpriority) AS INT) AS prio_len,
               concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio,
               coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
               CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
               CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
               o_orderkey % 97 AS key_mod,
               abs(o_custkey - 500) AS cust_abs
        FROM orders
    """,

    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_DSUM.format(x='l_quantity')} AS sum_qty,
               {_DSUM.format(x='l_extendedprice')} AS sum_base_price,
               {_DSUM.format(x='l_extendedprice*(1-l_discount)')} AS sum_disc_price,
               {_DSUM.format(x='l_extendedprice*(1-l_discount)*(1+l_tax)')} AS sum_charge,
               {_DSUM.format(x='l_quantity')} / count(*) AS avg_qty,
               {_DSUM.format(x='l_extendedprice')} / count(*) AS avg_price,
               {_DSUM.format(x='l_discount')} / count(*) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_top_orders": f"""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               {_DSUM.format(x='l_extendedprice*(1-l_discount)')} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND l_shipdate > TIMESTAMP '1998-03-15'
          AND o_orderdate < TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q5_region_revenue": f"""
        SELECT n_name,
               {_DSUM.format(x='l_extendedprice*(1-l_discount)')} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01'
        )
    """,
    "top_customers_per_segment": """
        WITH revenue AS (
            SELECT o_custkey,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT c_mktsegment, c_custkey, c_name, revenue,
                   CAST(row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY revenue DESC, c_custkey
                   ) AS INT) AS rnk
            FROM customer JOIN revenue ON c_custkey = o_custkey
        )
        SELECT * FROM ranked WHERE rnk <= 5
    """,
    "customer_running_totals": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS cum_spend,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS INT) AS order_seq
        FROM orders
    """,
    "nation_set_ops": """
        WITH cn AS (
            SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        ),
        sn AS (
            SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        )
        SELECT n_name, 'both' AS tag FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
        UNION ALL
        SELECT n_name, 'customer_only' FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn)
        UNION ALL
        SELECT n_name, 'supplier_only' FROM (SELECT n_name FROM sn EXCEPT SELECT n_name FROM cn)
    """,
    "events_hourly": """
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
    "events_json_metrics": """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type
    """,
    "session_table": """
        WITH base AS (
            SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
            FROM events
        ),
        flagged AS (
            SELECT user_id, tsu, event_id,
                   CASE WHEN lag(tsu) OVER w IS NULL
                          OR tsu - lag(tsu) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        ),
        sessioned AS (
            SELECT user_id, tsu, event_id,
                   sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               make_timestamp(min(tsu)) AS session_start,
               make_timestamp(max(tsu)) AS session_end,
               (max(tsu) - min(tsu)) // 1000000 AS duration_sec
        FROM sessioned GROUP BY user_id, session_id
    """,
    "user_tier_scd2": """
        WITH base AS (
            SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
                   CASE WHEN value < 20.0 THEN 'low'
                        WHEN value < 60.0 THEN 'mid'
                        WHEN value < 150.0 THEN 'high'
                        ELSE 'vip' END AS tier
            FROM events
        ),
        flagged AS (
            SELECT user_id, event_id, tsu, tier,
                   CASE WHEN lag(tier) OVER w IS NULL
                          OR lag(tier) OVER w <> tier
                        THEN 1 ELSE 0 END AS chg
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        ),
        islands AS (
            SELECT user_id, tsu, tier,
                   sum(chg) OVER (
                       PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island
            FROM flagged
        ),
        intervals AS (
            SELECT user_id, island, min(tier) AS tier,
                   min(tsu) AS from_us,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM islands GROUP BY user_id, island
        )
        SELECT user_id, tier,
               make_timestamp(from_us) AS valid_from,
               make_timestamp(lead(from_us) OVER wl) AS valid_to,
               (lead(from_us) OVER wl IS NULL) AS is_current,
               n_events
        FROM intervals
        WINDOW wl AS (PARTITION BY user_id ORDER BY island)
    """,
    "user_recent_events": """
        WITH base AS (
            SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC,
                                event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT user_id,
               array_to_string(
                   list(event_id ORDER BY tsu DESC, event_id DESC), ','
               ) AS recent_ids,
               CAST(count(*) AS BIGINT) AS n_recent
        FROM base WHERE rn <= 5 GROUP BY user_id
    """,
    "user_sessions": """
        WITH base AS (
            SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
            FROM events
        ),
        flagged AS (
            SELECT user_id, tsu, event_id,
                   CASE WHEN lag(tsu) OVER w IS NULL
                          OR tsu - lag(tsu) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        ),
        sessioned AS (
            SELECT user_id, tsu, event_id,
                   sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   (max(tsu) - min(tsu)) // 1000000 AS duration_sec
            FROM sessioned GROUP BY user_id, session_id
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(max(duration_sec) AS BIGINT) AS max_session_sec
        FROM per_session GROUP BY user_id
    """,
}

ORACLE_SQL["fk_integrity_audit"] = """
    SELECT 'orphan_lineitem_orderkey' AS "check",
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orphan_order_custkey',
           CAST(count(*) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'nonpositive_quantity',
           CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'negative_price',
           CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'discount_out_of_range',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
"""

ORACLE_SQL["lineitem_checksum"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(CAST(concat('0x', substr(md5(concat_ws('|',
                    CAST(l_orderkey AS VARCHAR),
                    CAST(l_partkey AS VARCHAR),
                    CAST(l_suppkey AS VARCHAR),
                    CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR))),
                    1, 15)) AS BIGINT)
                    AS HUGEINT)) AS VARCHAR) AS checksum
    FROM lineitem
"""

ORACLE_SQL["part_affinity_rules"] = f"""
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM po
    ),
    per_part AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part
        FROM po GROUP BY l_partkey
    ),
    pairs AS (
        SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS pair_n
        FROM po x JOIN po y ON x.l_orderkey = y.l_orderkey
        WHERE x.l_partkey < y.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {AFFINITY_MIN_PAIR}
    )
    SELECT part_a, part_b, pair_n,
           a.n_part AS n_a, b.n_part AS n_b,
           pair_n / n.n_orders AS support,
           pair_n / a.n_part AS confidence_a_to_b,
           (pair_n * n.n_orders) / (a.n_part * b.n_part) AS lift
    FROM pairs
    JOIN per_part a ON a.l_partkey = part_a
    JOIN per_part b ON b.l_partkey = part_b, n_orders n
    ORDER BY lift DESC, part_a, part_b
    LIMIT {AFFINITY_TOP_K}
"""
