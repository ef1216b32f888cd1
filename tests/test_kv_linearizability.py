"""Concurrent-client linearizability of the KV surface (reference
srv/kvsrv_test.go:50-68 TestPutConcurrentReliable, :127-162
TestUnreliableNet, srv/kvtest OneClientPut/CheckPutConcurrent).

Threads race real ``Clerk``s against one mutex-guarded ``KVStore`` (the
reference server is a mutex per RPC) through a lossy reply channel;
every clerk-level call is recorded with monotonic invoke/return stamps
and the combined history is checked with the WGL-style checker in
control/linearize.py. The reliability invariants from CheckPutConcurrent
are asserted too: reliable -> final version == sum(Nok); lossy ->
Nok <= final version <= Nok + Nmaybe (no version ever double-applies).
"""

from __future__ import annotations

import random
import threading
import time

import pytest

from map_reduce_framework_spark.control.linearize import (
    INIT_STATE,
    Op,
    check_history,
    kv_step,
)
from map_reduce_framework_spark.operators.kv import (
    ERR_MAYBE,
    ERR_NO_KEY,
    ERR_VERSION,
    OK,
    Clerk,
    KVStore,
    SpinLock,
)

NCLNT = 10
NROUNDS = 12


class LockedStore:
    """The reference server: every RPC body runs under one mutex
    (srv/server.go Get/Put lock at entry)."""

    def __init__(self) -> None:
        self._store = KVStore()
        self._mu = threading.Lock()

    def get(self, key):
        with self._mu:
            return self._store.get(key)

    def put(self, key, value, version):
        with self._mu:
            return self._store.put(key, value, version)


class RecordingClerk:
    """Stamps invoke/return around whole clerk calls (retries included),
    mirroring where the reference's porcupine log hooks (kvtest.go)."""

    def __init__(self, client_id: int, server, drop_reply=None,
                 drop_request=None, delay=None):
        self._id = client_id
        self._clerk = Clerk(server, drop_reply=drop_reply,
                            drop_request=drop_request, delay=delay)
        self.history: list[Op] = []

    def get(self, key):
        t0 = time.monotonic_ns()
        value, version, err = self._clerk.get(key)
        t1 = time.monotonic_ns()
        self.history.append(
            Op(self._id, t0, t1, "get", key,
               out_value=value, out_version=version, err=err)
        )
        return value, version, err

    def put(self, key, value, version):
        t0 = time.monotonic_ns()
        err = self._clerk.put(key, value, version)
        t1 = time.monotonic_ns()
        self.history.append(
            Op(self._id, t0, t1, "put", key,
               value=value, version_arg=version, err=err)
        )
        return err


def _one_client_put(me: int, ck: RecordingClerk, keys: list[str], rng) -> tuple[int, int]:
    """kvtest.go OneClientPut/OnePut: keep a per-key version guess, put,
    then get to relearn the version; OK/ErrMaybe ends a round."""
    ver = {k: 0 for k in keys}
    nok = nmaybe = 0
    for _ in range(NROUNDS):
        k = rng.choice(keys)
        while True:
            err = ck.put(k, f"c{me}.v{ver[k]}", ver[k])
            assert err in (OK, ERR_VERSION, ERR_MAYBE), err
            _, ver[k], gerr = ck.get(k)
            assert gerr == OK
            if err == OK:
                nok += 1
                break
            if err == ERR_MAYBE:
                nmaybe += 1
                break
    return nok, nmaybe


def _race_clients(keys: list[str], drop_prob: float, seed: int,
                  drop_req_prob: float = 0.0, delay_s: float = 0.0):
    server = LockedStore()

    def _net(me: int):
        """Per-clerk lossy channel: independent RNG streams for each of
        the three labrpc behaviors (reply loss, request loss, delay)."""
        r_rep = random.Random(seed + me)
        r_req = random.Random(7919 * seed + me)
        r_del = random.Random(104729 * seed + me)
        return dict(
            drop_reply=(lambda: r_rep.random() < drop_prob) if drop_prob else None,
            drop_request=(
                (lambda: r_req.random() < drop_req_prob) if drop_req_prob else None
            ),
            delay=(
                (lambda: time.sleep(r_del.random() * delay_s)) if delay_s else None
            ),
        )

    clerks = [RecordingClerk(me, server, **_net(me)) for me in range(NCLNT)]
    results: list[tuple[int, int]] = [None] * NCLNT  # type: ignore[list-item]

    def run(me: int) -> None:
        results[me] = _one_client_put(
            me, clerks[me], keys, random.Random(1000 * seed + me)
        )

    threads = [threading.Thread(target=run, args=(me,)) for me in range(NCLNT)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    history = [op for ck in clerks for op in ck.history]
    nok = sum(r[0] for r in results)
    nmaybe = sum(r[1] for r in results)
    return server, history, nok, nmaybe


def test_put_concurrent_reliable():
    """10 clients race puts on one key over a reliable net: every round
    ends OK, the final version equals the number of successful puts, and
    the full history linearizes."""
    server, history, nok, nmaybe = _race_clients(["k"], drop_prob=0.0, seed=7)
    assert nmaybe == 0
    _, version, err = server.get("k")
    assert err == OK and version == nok
    assert check_history(history)


def test_put_concurrent_unreliable():
    """10 clients over a lossy net: ErrMaybe must actually occur, a
    version may apply at most once (server version <= Nok + Nmaybe and
    >= Nok), and the ambiguous history still linearizes."""
    server, history, nok, nmaybe = _race_clients(["k"], drop_prob=0.25, seed=11)
    assert nmaybe > 0, "lossy net never produced ErrMaybe"
    _, version, err = server.get("k")
    assert err == OK
    assert nok <= version <= nok + nmaybe
    assert check_history(history)


def test_put_concurrent_unreliable_multikey():
    """Same race across several keys -- exercises the per-key partition
    of the checker (models/kv.go Partition)."""
    keys = ["a", "b", "c"]
    server, history, nok, nmaybe = _race_clients(keys, drop_prob=0.2, seed=23)
    total = 0
    for k in keys:
        _, version, err = server.get(k)
        assert err == OK
        total += version
    assert nok <= total <= nok + nmaybe
    assert check_history(history)


def test_put_concurrent_lossy_both_directions():
    """labrpc drops RPCs in BOTH directions (srv/labrpc/labrpc.go:1-50).
    Request-side loss is semantically different from reply-side loss: the
    op never applies at all -- but the clerk sees only a timeout, so
    ErrMaybe must cover it too. With delays injected between apply and
    reply (observational reordering), the combined history must still
    linearize and no version may double-apply."""
    server, history, nok, nmaybe = _race_clients(
        ["k"], drop_prob=0.2, seed=31, drop_req_prob=0.2, delay_s=0.0003
    )
    assert nmaybe > 0, "two-sided lossy net never produced ErrMaybe"
    _, version, err = server.get("k")
    assert err == OK
    assert nok <= version <= nok + nmaybe
    assert check_history(history)


def test_request_loss_alone_never_applies():
    """A dropped REQUEST means no server apply at all -- distinguishable
    from a dropped reply by the server's state. With a single client and
    ONLY request-side loss, every resend carries a still-correct version
    argument, so each round ends OK, the version advances exactly once
    per round, and ErrMaybe never fires (nothing ever half-applied)."""
    server = LockedStore()
    rng = random.Random(5)
    dropped = [0]

    def drop_request():
        d = rng.random() < 0.4
        dropped[0] += d
        return d

    ck = RecordingClerk(0, server, drop_request=drop_request)
    for trial in range(60):
        err = ck.put("k", f"t{trial}", trial)
        assert err == OK, f"pure request loss must stay unambiguous: {err}"
        value, version, gerr = ck.get("k")
        assert gerr == OK and version == trial + 1 and value == f"t{trial}"
    assert dropped[0] > 0, "drop_request(0.4) never dropped"
    assert check_history(ck.history)


def test_unreliable_single_client_never_double_applies():
    """TestUnreliableNet twin (srv/kvsrv_test.go:127-162): with one
    client, an ErrMaybe put HAS happened -- the retry must answer
    ErrVersion, and each round advances the version exactly once."""
    server = LockedStore()
    rng = random.Random(3)
    ck = RecordingClerk(0, server, drop_reply=lambda: rng.random() < 0.4)
    retried = False
    for trial in range(60):
        i = 0
        while True:
            err = ck.put("k", f"t{trial}", trial)
            if err != ERR_MAYBE:
                if i > 0:
                    assert err == ERR_VERSION, (
                        f"put applied more than once: {err}"
                    )
                break
            retried = True
            i += 1
        value, version, err = ck.get("k")
        assert err == OK and version == trial + 1
        assert value == f"t{trial}"
    assert retried, "drop_prob=0.4 never produced ErrMaybe"
    assert check_history(ck.history)


def test_checker_rejects_non_linearizable_histories():
    """A checker that cannot say 'no' proves nothing. Three hand-built
    violations, each sequential in real time so no ordering can save it."""
    # stale read: get returns the pre-put value after the put completed
    h1 = [
        Op(0, 0, 1, "put", "k", value="v1", version_arg=0, err=OK),
        Op(0, 2, 3, "get", "k", err=ERR_NO_KEY),
    ]
    assert not check_history(h1)
    # version goes backwards between two sequential gets
    h2 = [
        Op(0, 0, 1, "put", "k", value="v1", version_arg=0, err=OK),
        Op(0, 2, 3, "put", "k", value="v2", version_arg=1, err=OK),
        Op(0, 4, 5, "get", "k", out_value="v2", out_version=2, err=OK),
        Op(0, 6, 7, "get", "k", out_value="v1", out_version=1, err=OK),
    ]
    assert not check_history(h2)
    # double-apply: two OK puts with the same version argument
    h3 = [
        Op(0, 0, 1, "put", "k", value="a", version_arg=0, err=OK),
        Op(1, 2, 3, "put", "k", value="b", version_arg=0, err=OK),
    ]
    assert not check_history(h3)


def test_checker_accepts_concurrent_reordering():
    """Overlapping ops may linearize in either order: a get overlapping a
    put may see the old or new state."""
    base = [
        Op(0, 0, 10, "put", "k", value="v1", version_arg=0, err=OK),
        Op(1, 5, 15, "get", "k", err=ERR_NO_KEY),  # linearizes before the put
    ]
    assert check_history(base)
    after = [
        Op(0, 0, 10, "put", "k", value="v1", version_arg=0, err=OK),
        Op(1, 5, 15, "get", "k", out_value="v1", out_version=1, err=OK),
    ]
    assert check_history(after)


def test_kv_step_spec_table():
    """Pointwise spec checks (models/kv.go Step truth table)."""
    s0 = INIT_STATE
    assert kv_step(s0, Op(0, 0, 1, "get", "k", err=ERR_NO_KEY)) == s0
    assert kv_step(s0, Op(0, 0, 1, "get", "k", out_value="x", out_version=1, err=OK)) is None
    s1 = kv_step(s0, Op(0, 0, 1, "put", "k", value="a", version_arg=0, err=OK))
    assert s1 == ("a", 1)
    # ErrMaybe at a matching version advances; elsewhere it is a no-op
    assert kv_step(s1, Op(0, 0, 1, "put", "k", value="b", version_arg=1, err=ERR_MAYBE)) == ("b", 2)
    assert kv_step(s1, Op(0, 0, 1, "put", "k", value="b", version_arg=9, err=ERR_MAYBE)) == s1
    # wrong-version puts must have reported ErrVersion (or ErrNoKey when absent)
    assert kv_step(s1, Op(0, 0, 1, "put", "k", value="b", version_arg=0, err=ERR_VERSION)) == s1
    assert kv_step(s1, Op(0, 0, 1, "put", "k", value="b", version_arg=0, err=OK)) is None
    assert kv_step(s0, Op(0, 0, 1, "put", "k", value="b", version_arg=3, err=ERR_NO_KEY)) == s0


def test_spinlock_mutual_exclusion_under_lossy_net():
    """Threaded spin-lock torture over a lossy clerk: the ErrMaybe
    ambiguity (acquired-or-not) must never yield two holders. This is
    the scenario the advisor flagged: a lost first CAS racing a
    competing client."""
    server = LockedStore()
    holders = [0]
    violations = []
    n_threads, rounds = 6, 25

    def worker(me: int) -> None:
        rng = random.Random(100 + me)
        clerk = Clerk(server, drop_reply=lambda: rng.random() < 0.3)
        lock = SpinLock(clerk, "lock", f"owner{me}")
        for _ in range(rounds):
            lock.acquire()
            holders[0] += 1
            if holders[0] != 1:
                violations.append(holders[0])
            time.sleep(rng.random() * 0.0005)
            if holders[0] != 1:
                violations.append(holders[0])
            holders[0] -= 1
            lock.release()

    threads = [threading.Thread(target=worker, args=(me,)) for me in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not violations, f"two concurrent lock holders observed: {violations}"


def test_kv_memory_bounded_many_clients():
    """srv/kvsrv_test.go:71-122 analog: 100k clerks each overwrite the
    same key; server state must stay O(1) -- bounded per-client growth."""
    import gc
    import tracemalloc

    NCLIENT = 100_000
    server = LockedStore()
    clerks = [Clerk(server) for _ in range(NCLIENT)]
    # force first contact (reference: a failing version-probe put)
    assert clerks[0].put("k", "", 1) == ERR_NO_KEY
    value = "x" * 1000
    gc.collect()
    tracemalloc.start()
    base, _ = tracemalloc.get_traced_memory()
    for i, ck in enumerate(clerks):
        assert ck.put("k", value, i) == OK
    gc.collect()
    cur, _ = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert cur - base < NCLIENT * 200, (
        f"server grew {cur - base} bytes over {NCLIENT} clients"
    )
