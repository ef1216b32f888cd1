"""Gossip-based decentralized health monitoring (Tier 4).

Behavioral reproduction of the reference's research payload
(go-map-reduce-framework/mr/gossip.go, paper README.md:100-239): each worker
keeps a health table over its peers, pushes it to k=3 random neighbors every
``gossip_interval``, merges incoming tables (last-writer-wins by LastUpdate,
suspicion-count max with Alive->Suspect escalation, mr/gossip.go:81-104), and
every ``suspicion_timeout`` declares any peer with suspicion >= 3 Dead and
reports it (mr/gossip.go:243-267).

Spark does not need this for data correctness -- executor heartbeats,
lineage-based recompute, and excludeOnFailure subsume worker failure
detection (SURVEY.md §2.D6) -- so this is a standalone, pure-python library
plus a deterministic simulator reproducing the paper's failure-detection
latency experiment (README.md:344-347). The reference's own worker-to-worker
RPC is a stub returning false (mr/gossip.go:269-271), so an injectable
transport is *more* faithful than a socket implementation, and it makes the
protocol unit-testable without wall-clock sleeps.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field, replace
from enum import IntEnum
from typing import Callable


class HealthStatus(IntEnum):
    """mr/gossip.go:9-15 -- Alive -> Suspect -> Dead escalation ladder."""

    ALIVE = 0
    SUSPECT = 1
    DEAD = 2


@dataclass
class HealthEntry:
    """mr/gossip.go:17-22 (~32 bytes/worker, docs/ARCHITECTURE.md:29-33)."""

    status: HealthStatus = HealthStatus.ALIVE
    last_seen: float = 0.0
    suspicion_count: int = 0
    last_update: float = 0.0


class HealthTable:
    """Per-worker view of cluster health (mr/gossip.go:24-104).

    ``now`` is passed explicitly everywhere: the reference stamps merges with
    ``time.Now()``; a parameter keeps the logic identical and deterministic.
    """

    def __init__(self) -> None:
        self._table: dict[int, HealthEntry] = {}

    def update(self, worker_id: int, entry: HealthEntry) -> None:
        self._table[worker_id] = entry

    def get(self, worker_id: int) -> HealthEntry | None:
        return self._table.get(worker_id)

    def get_all(self) -> dict[int, HealthEntry]:
        # Deep copy, like GetAll (mr/gossip.go:63-77): callers must not be
        # able to mutate our entries through the snapshot.
        return {wid: replace(e) for wid, e in self._table.items()}

    def merge(self, other: dict[int, HealthEntry], now: float) -> None:
        """mr/gossip.go:81-104: last-writer-wins by last_update (restamped to
        local ``now``); on stale-but-more-suspicious entries take the max
        suspicion count and escalate Alive->Suspect."""
        for worker_id, other_entry in other.items():
            if worker_id == 0:  # coordinator is never gossiped about
                continue
            existing = self._table.get(worker_id)
            if existing is None or other_entry.last_update > existing.last_update:
                self._table[worker_id] = replace(other_entry, last_update=now)
            elif other_entry.suspicion_count > existing.suspicion_count:
                existing.suspicion_count = other_entry.suspicion_count
                if (
                    other_entry.status == HealthStatus.SUSPECT
                    and existing.status == HealthStatus.ALIVE
                ):
                    existing.status = HealthStatus.SUSPECT

    def size_bytes(self) -> int:
        """Paper's overhead metric: ~32 B/worker (docs/ARCHITECTURE.md:29-33)."""
        return 32 * len(self._table)


@dataclass
class GossipMessage:
    """mr/gossip.go:29-33."""

    worker_id: int
    health_table: dict[int, HealthEntry]
    timestamp: float


# transport(neighbor_id, message) -> reply table, or None if unreachable.
Transport = Callable[[int, GossipMessage], "dict[int, HealthEntry] | None"]


@dataclass
class GossipProtocol:
    """One worker's gossip agent (mr/gossip.go:106-267).

    Defaults match the reference exactly: interval 100 ms, consensus
    threshold 3, suspicion check every 300 ms (mr/gossip.go:110-112).
    Event-driven rather than goroutine-driven: the simulator (or a test)
    calls ``tick_gossip`` / ``tick_health_check`` at the configured cadence.
    """

    worker_id: int
    all_workers: list[int]
    transport: Transport
    on_failure: Callable[[int], None] | None = None
    gossip_interval: float = 0.100
    consensus_threshold: int = 3
    suspicion_timeout: float = 0.300
    k_neighbors: int = 3
    rng: random.Random = field(default_factory=lambda: random.Random(0))

    def __post_init__(self) -> None:
        self.health_table = HealthTable()
        for w in self.all_workers:
            if w != self.worker_id:
                self.health_table.update(w, HealthEntry())
        self.neighbors = self._select_neighbors()

    def _select_neighbors(self) -> list[int]:
        """k=3 random fixed neighbors (mr/gossip.go:132-154)."""
        k = min(self.k_neighbors, len(self.all_workers) - 1)
        peers = [w for w in self.all_workers if w != self.worker_id]
        return self.rng.sample(peers, k) if k > 0 else []

    # -- gossip loop body (mr/gossip.go:165-226) ---------------------------
    def tick_gossip(self, now: float) -> None:
        msg = GossipMessage(self.worker_id, self.health_table.get_all(), now)
        for neighbor_id in self.neighbors:
            reply = self.transport(neighbor_id, msg)
            if reply is not None:
                # Successful exchange: merge their view, mark them alive.
                self.health_table.merge(reply, now)
                self.health_table.update(
                    neighbor_id,
                    HealthEntry(HealthStatus.ALIVE, now, 0, now),
                )
            else:
                entry = self.health_table.get(neighbor_id)
                if entry is None:
                    continue
                if entry.status == HealthStatus.ALIVE:
                    entry.status = HealthStatus.SUSPECT
                    entry.suspicion_count = 1
                else:
                    entry.suspicion_count += 1
                entry.last_update = now

    def handle_gossip(self, msg: GossipMessage, now: float) -> dict[int, HealthEntry]:
        """Receiver side (mr/worker_gossip.go:34-46): merge sender's table,
        mark sender alive, reply with our table."""
        self.health_table.merge(msg.health_table, now)
        self.health_table.update(
            msg.worker_id, HealthEntry(HealthStatus.ALIVE, now, 0, now)
        )
        return self.health_table.get_all()

    # -- suspicion loop body (mr/gossip.go:229-267) ------------------------
    def tick_health_check(self, now: float) -> list[int]:
        """Declare Dead any suspect at/over the consensus threshold; report
        each newly-dead worker once. Returns the newly declared dead."""
        newly_dead: list[int] = []
        for worker_id, entry in self.health_table.get_all().items():
            if entry.status not in (HealthStatus.SUSPECT, HealthStatus.DEAD):
                continue
            if entry.suspicion_count >= self.consensus_threshold:
                live = self.health_table.get(worker_id)
                if live is not None and live.status != HealthStatus.DEAD:
                    live.status = HealthStatus.DEAD
                    live.last_update = now
                    newly_dead.append(worker_id)
                    if self.on_failure is not None:
                        self.on_failure(worker_id)
        return newly_dead


class SimulatedCluster:
    """Deterministic discrete-time cluster for the paper's experiments
    (README.md:344-347: detection latency vs consensus threshold).

    Workers exchange gossip through an in-memory transport; killing a worker
    makes its transport unreachable. ``run_until_detected`` advances simulated
    time in gossip-interval steps and returns the failure-detection latency.
    """

    def __init__(
        self,
        n_workers: int,
        *,
        consensus_threshold: int = 3,
        gossip_interval: float = 0.100,
        suspicion_timeout: float = 0.300,
        seed: int = 0,
    ) -> None:
        ids = list(range(1, n_workers + 1))
        self.now = 0.0
        self.gossip_interval = gossip_interval
        self.suspicion_timeout = suspicion_timeout
        self.dead: set[int] = set()
        self.reported: dict[int, float] = {}  # worker -> first report time
        self.protocols: dict[int, GossipProtocol] = {}
        for wid in ids:
            self.protocols[wid] = GossipProtocol(
                worker_id=wid,
                all_workers=ids,
                transport=self._transport,
                on_failure=lambda failed, _t=self: _t.reported.setdefault(
                    failed, _t.now
                ),
                gossip_interval=gossip_interval,
                consensus_threshold=consensus_threshold,
                suspicion_timeout=suspicion_timeout,
                rng=random.Random(seed + wid),
            )

    def _transport(self, neighbor_id: int, msg: GossipMessage):
        if neighbor_id in self.dead:
            return None
        return self.protocols[neighbor_id].handle_gossip(msg, self.now)

    def kill(self, worker_id: int) -> float:
        self.dead.add(worker_id)
        return self.now

    def step(self) -> None:
        self.now += self.gossip_interval
        for wid, proto in self.protocols.items():
            if wid not in self.dead:
                proto.tick_gossip(self.now)
        # Suspicion checks run on their own (coarser) cadence.
        if round(self.now / self.gossip_interval) % max(
            1, round(self.suspicion_timeout / self.gossip_interval)
        ) == 0:
            for wid, proto in self.protocols.items():
                if wid not in self.dead:
                    proto.tick_health_check(self.now)

    def run_until_detected(self, victim: int, max_time: float = 30.0) -> float | None:
        """Advance time until some live worker reports ``victim`` dead;
        return detection latency in seconds (None if never detected)."""
        t_kill = self.kill(victim)
        while self.now < max_time:
            self.step()
            if victim in self.reported:
                return self.reported[victim] - t_kill
        return None
