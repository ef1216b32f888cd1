"""t2-style differential tests: every registered app query must hash-match
its DuckDB oracle at sf0.01 (SURVEY.md §5.3)."""

from __future__ import annotations

import pytest

from map_reduce_framework_spark.registry import REGISTRY

from .oracle_util import compare_to_oracle, duckdb_conn

APP_QUERIES = [
    "wc",
    "wc_ws",
    "inverted_index",
    "crash_payload",
    "per_doc_count",
    "parallelism_probe",
]


@pytest.fixture(scope="module")
def con(sf_oracle):
    return duckdb_conn(sf_oracle)


@pytest.mark.parametrize("name", APP_QUERIES)
def test_app_matches_oracle(spark, sf_oracle, con, name):
    q = REGISTRY[name]
    assert q.oracle is not None
    df = q.fn(spark, sf_oracle)
    compare_to_oracle(df, con, q.oracle)


def test_wc_smoke_nonempty(spark, sf_smoke):
    df = REGISTRY["wc"].fn(spark, sf_smoke)
    assert df.count() > 0
