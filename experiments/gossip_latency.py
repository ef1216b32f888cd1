#!/usr/bin/env python
"""Reproduce the reference's failure-detection experiment table
(README.md:344-347 / experiments/run_experiments.go:59-64) with REAL
simulated-protocol measurements instead of the reference's hardcoded
prints: kill one worker, measure time until any live worker declares it
dead, across cluster sizes and consensus thresholds.

Also reports the health-table size row (docs/ARCHITECTURE.md:29-33,
~32 B/worker) and the centralized-lease baseline the paper compares
against (10 s timeout => detection ~ lease + half a heartbeat).

Writes experiments/gossip_results.json and prints a markdown table.
Deterministic: seeded RNG per (config, trial).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from map_reduce_framework_spark.control.gossip import (  # noqa: E402
    HealthEntry,
    HealthTable,
    SimulatedCluster,
)

WORKER_COUNTS = [10, 20, 30, 50]
CONSENSUS = [3, 5]
TRIALS = 20
CENTRALIZED_LEASE_S = 10.0  # mr/coordinator.go:14


def run() -> dict:
    results = {"detection_latency": [], "health_table_bytes": {}}
    for n in WORKER_COUNTS:
        ht = HealthTable()
        for w in range(1, n + 1):
            ht.update(w, HealthEntry())
        results["health_table_bytes"][n] = ht.size_bytes()
        for c in CONSENSUS:
            lats = []
            for trial in range(TRIALS):
                cluster = SimulatedCluster(
                    n, consensus_threshold=c, seed=1000 * n + 10 * c + trial
                )
                victim = 1 + (trial % n)
                lat = cluster.run_until_detected(victim)
                if lat is not None:
                    lats.append(lat)
            lats.sort()
            results["detection_latency"].append(
                {
                    "workers": n,
                    "consensus": c,
                    "trials": TRIALS,
                    "detected": len(lats),
                    "avg_s": round(statistics.mean(lats), 3) if lats else None,
                    "p50_s": round(lats[len(lats) // 2], 3) if lats else None,
                    "p95_s": round(lats[int(len(lats) * 0.95) - 1], 3)
                    if lats
                    else None,
                }
            )
    results["centralized_baseline_s"] = CENTRALIZED_LEASE_S
    return results


def main() -> None:
    results = run()
    out = os.path.join(os.path.dirname(__file__), "gossip_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print("| workers | C | detected | avg (s) | p50 | p95 |")
    print("|---|---|---|---|---|---|")
    for row in results["detection_latency"]:
        print(
            f"| {row['workers']} | {row['consensus']} | "
            f"{row['detected']}/{row['trials']} | {row['avg_s']} | "
            f"{row['p50_s']} | {row['p95_s']} |"
        )
    print(
        f"\ncentralized lease baseline: {results['centralized_baseline_s']} s "
        f"(mr/coordinator.go:14)"
    )
    print("health table bytes:", results["health_table_bytes"])
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
