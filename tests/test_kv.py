"""KV semantics: distributed fold vs DuckDB recursive-CTE oracle, plus
unit/property tests of the Put/Get/version rules, the clerk ErrMaybe
model, and spin-lock mutual exclusion (reference srv/kvsrv_test.go,
srv/lock/lock_test.go behavior)."""

from __future__ import annotations

import random

import pytest

from map_reduce_framework_spark.operators.kv import (
    ERR_MAYBE,
    ERR_NO_KEY,
    ERR_VERSION,
    OK,
    Clerk,
    KVStore,
    SpinLock,
)
from map_reduce_framework_spark.registry import REGISTRY

from .oracle_util import compare_to_oracle, duckdb_conn


@pytest.fixture(scope="module")
def con(sf_oracle):
    return duckdb_conn(sf_oracle)


@pytest.mark.parametrize("name", ["kv_fold", "kv_final_state"])
def test_kv_matches_oracle(spark, sf_oracle, con, name):
    q = REGISTRY[name]
    compare_to_oracle(q.fn(spark, sf_oracle), con, q.oracle)


def test_kv_fold_has_all_outcomes(spark, sf_oracle):
    df = REGISTRY["kv_fold"].fn(spark, sf_oracle)
    errs = {r["err"] for r in df.select("err").distinct().collect()}
    assert {OK, ERR_NO_KEY, ERR_VERSION} <= errs


# -- srv/kvsrv_test.go:14-47 sequential semantics ---------------------------


def test_kvstore_basic_semantics():
    s = KVStore()
    assert s.get("k") == (None, 0, ERR_NO_KEY)
    assert s.put("k", "v1", 1) == ERR_NO_KEY  # absent, version != 0
    assert s.put("k", "v1", 0) == OK
    assert s.get("k") == ("v1", 1, OK)
    assert s.put("k", "v2", 0) == ERR_VERSION  # present, stale version
    assert s.put("k", "v2", 2) == ERR_VERSION
    assert s.put("k", "v2", 1) == OK
    assert s.get("k") == ("v2", 2, OK)


def test_clerk_errmaybe_on_lost_reply():
    """A resent put whose first reply was lost must answer ErrMaybe, never
    a bare ErrVersion (models/kv.go:51-69)."""
    s = KVStore()
    s.put("k", "v1", 0)
    drops = iter([True])  # first put applies but its reply is lost
    clerk = Clerk(s, drop_reply=lambda: next(drops, False))
    assert clerk.put("k", "v2", 1) == ERR_MAYBE
    # the put actually applied on the first try:
    assert s.get("k") == ("v2", 2, OK)


def test_spinlock_mutual_exclusion():
    """Interleaved acquire attempts: never two concurrent holders
    (srv/lock/lock_test.go:21-62)."""
    rng = random.Random(42)
    store = KVStore()
    locks = [SpinLock(store, "lock", f"owner{i}") for i in range(4)]
    holder = None
    critical = 0
    for _ in range(2000):
        i = rng.randrange(4)
        if holder == i and rng.random() < 0.5:
            locks[i].release()
            holder = None
        elif locks[i].try_acquire():
            assert holder in (None, i), "two concurrent lock holders"
            holder = i
            critical += 1
    assert critical > 0


def test_spinlock_reentrant_owner():
    store = KVStore()
    lock = SpinLock(store, "l", "me")
    assert lock.try_acquire()
    assert lock.try_acquire()  # owner re-acquire is a no-op success
    lock.release()
    other = SpinLock(store, "l", "you")
    assert other.try_acquire()


def test_kv_memory_bounded_many_clients():
    """Resource-bound analog of srv/kvsrv_test.go:71-122 (TestMemPut /
    many-clients memory tests): server state must be O(live keys), never
    O(clients) or O(operations) -- the server keeps no duplicate table or
    per-client state (ErrMaybe pushes dedup ambiguity to the clerk).

    Phase 1: 50k one-shot clerks overwrite ONE shared 10 KB value; the
    store must retain exactly one key holding only the last value.
    Phase 2: 1k clerks write 1k distinct keys; state grows linearly in
    keys, independent of the (lossy, retrying) client count."""
    import sys

    store = KVStore()
    val = "x" * 10_000
    n_ops = 50_000
    for i in range(n_ops):
        ck = Clerk(store)  # fresh client each op: no per-client residue
        _, ver, err = ck.get("shared")
        assert ck.put("shared", f"{i}:{val}", ver) == OK
    assert len(store._data) == 1
    got, ver, err = store.get("shared")
    assert (ver, err) == (n_ops, OK)
    assert got == f"{n_ops - 1}:{val}"
    # the retained payload is one value, not an op/client history
    assert sys.getsizeof(got) < 2 * len(val)

    store2 = KVStore()
    flaky = random.Random(3)
    for i in range(1_000):
        ck = Clerk(store2, drop_reply=lambda: flaky.random() < 0.3)
        err = ck.put(f"k{i}", "v" * 100, 0)
        assert err in (OK, ERR_MAYBE)
    assert len(store2._data) == 1_000
    total = sum(
        sys.getsizeof(k) + sys.getsizeof(v) for k, (v, _) in store2._data.items()
    )
    assert total < 1_000 * 1_000  # ~ keys * (key+value), no hidden growth
