"""Full-suite soak loop (reference tests/test-mr-many.sh:15-22 analog):
the reference reruns its whole test battery N times hunting flakes --
races that pass once and fail on the 7th run. The pytest analog loops the
two nondeterminism-exposed surfaces:

* the chaos suite (concurrent task kills across a real shuffle), and
* the full registry-vs-DuckDB oracle sweep (shuffle-order / partition
  nondeterminism would show up as a hash flake).

Excluded from default CI by the ``soak`` marker (pytest.ini addopts);
run once per round before handoff: ``pytest -m soak -q``.
"""

from __future__ import annotations

import pytest

from map_reduce_framework_spark.registry import REGISTRY

from .oracle_util import compare_to_oracle, duckdb_conn

SOAK_ROUNDS = 3


@pytest.mark.soak
@pytest.mark.parametrize("iteration", range(SOAK_ROUNDS))
def test_soak_chaos(iteration):
    """Each iteration re-runs the 3-round concurrent-failure chaos test
    in a fresh subprocess JVM (9 chaos rounds total across the soak)."""
    from .test_fault_tolerance import (
        test_chaos_soak_repeated_concurrent_failures,
    )

    test_chaos_soak_repeated_concurrent_failures()


@pytest.mark.soak
@pytest.mark.parametrize("iteration", range(SOAK_ROUNDS))
def test_soak_oracle_sweep(spark, sf_oracle, iteration):
    """Every registered query vs its DuckDB oracle, repeated: a query
    whose result depends on shuffle/partition order would hash-flake
    across iterations even though a single run looks green."""
    con = duckdb_conn(sf_oracle)
    failures = []
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        try:
            df = q.fn(spark, sf_oracle)
            if q.oracle is None:
                assert df.count() >= 0
            else:
                compare_to_oracle(df, con, q.oracle)
        except Exception as exc:  # collect all, report once
            failures.append(f"{name}: {exc}")
    assert not failures, "\n".join(failures)
