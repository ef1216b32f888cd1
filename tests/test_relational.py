"""Differential tests for the relational suite (joins, windows, set ops,
JSON, sessionization) against the DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from map_reduce_framework_spark.registry import REGISTRY

from .oracle_util import compare_to_oracle, duckdb_conn

RELATIONAL_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q4_order_priority",
    "q7_volume_shipping",
    "q10_returned_items",
    "q13_order_distribution",
    "q14_promo_revenue",
    "top_supplier_revenue",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q20_excess_suppliers",
    "q18_large_volume_customers",
    "q8_market_share",
    "q9_product_profit",
    "q12_shipping_delay",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    "customers_without_orders",
    "top_customers_per_segment",
    "customer_running_totals",
    "nation_set_ops",
    "events_asof_join",
    "events_overlap_pairs",
    "events_pivot",
    "lineitem_unpivot",
    "price_band_join",
    "events_hourly",
    "events_json_metrics",
    "user_sessions",
    "revenue_grouping_sets",
    "events_value_histogram",
    "user_rolling_features",
    "customer_value_tiles",
    "latest_event_per_user",
    "event_funnel",
    "events_variant_metrics",
    "value_gini_per_type",
    "value_k_correlation",
    "orders_profile",
    "daily_revenue_reconciliation",
    "daily_revenue_trend",
    "session_table",
    "user_tier_scd2",
    "user_recent_events",
    "event_transition_matrix",
    "weekly_retention_cohorts",
    "value_robust_stats",
]


@pytest.fixture(scope="module")
def con(sf_oracle):
    return duckdb_conn(sf_oracle)


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_relational_matches_oracle(spark, sf_oracle, con, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_oracle)
    compare_to_oracle(df, con, q.oracle)
