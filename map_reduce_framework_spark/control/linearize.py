"""Linearizability checking for the versioned-KV surface (C3 hardening).

The reference checks concurrent clerk histories with porcupine
(models/kv.go:28-69 defines the single-key model; srv/kvsrv_test.go:50-68
races 10 clients and calls CheckPorcupine). This module is the same
machinery re-implemented from the published algorithm -- Wing & Gong's
linearizability search (ACM TOPLAS 1993) with the P-compositionality
partition-by-key + memoization refinements popularized by Lowe (2017) and
the porcupine/knossos checkers:

* ``Op`` -- one clerk-level operation with real-time invoke/return stamps.
* ``kv_step`` -- the sequential-spec transition, mirroring models/kv.go:
  a put linearized where versions match must have answered OK/ErrMaybe
  (and advances state); linearized elsewhere it must have answered
  ErrVersion/ErrNoKey/ErrMaybe (state unchanged). ErrMaybe is accepted in
  both branches -- that IS the at-least-once ambiguity -- but the state
  advance is decided by the version comparison, so a double-apply still
  has no valid linearization.
* ``check_history`` -- partition by key (keys are independent, exactly
  why the kv_fold dataflow distributes), then memoized DFS over
  linearization orders; candidates at each step are the remaining ops
  not strictly real-time-preceded by another remaining op.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..operators.kv import ERR_MAYBE, ERR_NO_KEY, ERR_VERSION, OK


@dataclass(frozen=True)
class Op:
    """One completed clerk operation. ``invoke``/``ret`` are monotonic
    nanosecond stamps taken around the WHOLE clerk call (retries
    included), like the reference records at the IKVClerk boundary."""

    client: int
    invoke: int
    ret: int
    op: str  # "get" | "put"
    key: str
    value: str | None = None  # put payload
    version_arg: int = 0  # put version argument
    out_value: str | None = None  # get result value
    out_version: int = 0  # get result version
    err: str = OK


State = tuple[str | None, int]  # (value, version); absent == (None, 0)

INIT_STATE: State = (None, 0)


def kv_step(state: State, op: Op) -> State | None:
    """Sequential KV spec: returns the post-state if linearizing ``op``
    at ``state`` is consistent with its recorded output, else None."""
    value, version = state
    if op.op == "get":
        if version == 0:
            return state if op.err == ERR_NO_KEY else None
        ok = op.err == OK and op.out_value == value and op.out_version == version
        return state if ok else None
    # put
    if op.version_arg == version:
        if op.err in (OK, ERR_MAYBE):
            return (op.value, version + 1)
        return None
    if op.err == ERR_MAYBE:
        return state
    if version == 0:
        return state if op.err == ERR_NO_KEY else None
    return state if op.err == ERR_VERSION else None


def _check_one_key(ops: list[Op]) -> bool:
    """Wing-Gong DFS with memoization over (remaining-set, state).

    Candidate rule: op X may be linearized next iff no other remaining op
    returned before X was invoked (real-time order must be respected)."""
    n = len(ops)
    if n == 0:
        return True
    full_mask = (1 << n) - 1
    seen: set[tuple[int, State]] = set()

    def dfs(remaining: int, state: State) -> bool:
        if remaining == 0:
            return True
        if (remaining, state) in seen:
            return False
        # min return time among remaining ops bounds the candidates
        min_ret = min(ops[i].ret for i in range(n) if remaining >> i & 1)
        for i in range(n):
            if not (remaining >> i & 1):
                continue
            if ops[i].invoke > min_ret:
                continue  # some remaining op wholly precedes this one
            nxt = kv_step(state, ops[i])
            if nxt is not None and dfs(remaining & ~(1 << i), nxt):
                return True
        seen.add((remaining, state))
        return False

    return dfs(full_mask, INIT_STATE)


def check_history(history: list[Op]) -> bool:
    """True iff the history is linearizable w.r.t. the versioned-KV spec.
    Partitioned per key (models/kv.go Partition): keys never interact."""
    by_key: dict[str, list[Op]] = {}
    for op in history:
        by_key.setdefault(op.key, []).append(op)
    return all(_check_one_key(ops) for ops in by_key.values())
