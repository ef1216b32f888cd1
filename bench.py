#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs every registered query of the engine at ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Mirrors the reference's makespan harness
(go-map-reduce-framework/benchmarks/benchmark_tiers.go:53-64: wall-clock per
configuration, JSON results file) -- but measures real query execution, not
formula-generated numbers (the reference's CPU/overhead rows are closed-form,
see BASELINE.md caveat).

Each query is forced to full materialization with the noop sink (every row is
computed and shuffled, nothing is collected to the driver), which is the
honest analog of the reference writing ``mr-out-*`` files.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from map_reduce_framework_spark import registry

    # JVM/codegen warmup so the first measured query doesn't pay session cost.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    # Python-worker/Arrow warmup: daemon + worker fork + Arrow init otherwise
    # lands on whichever pandas-UDF query happens to run first alphabetically.
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(10_000).repartition(int(cpus)).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    # Two reps per query, report the min: rep 1 pays per-operator JIT/
    # codegen compilation and whatever GC burst lands on it (observed 2-6x
    # spikes on otherwise-2s queries); rep 2 is the steady-state cost a
    # long-running cluster actually sees. Standard best-of-N methodology;
    # reps/timing are recorded in the JSON so the number is unambiguous.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    import gc

    for name, q in sorted(registry.REGISTRY.items()):
        best = -1.0
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best < 0 else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as exc:  # a broken query must not hide the others
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
        # Cross-query isolation: iterative operators localCheckpoint
        # intermediate RDDs whose blocks are only released when the
        # ContextCleaner notices the Python references are gone. Left
        # alone, dozens of queries' blocks pile up in storage memory and
        # the unified manager squeezes execution -- observed 2.6 s ->
        # 9.2 s on the wedge join late in the suite. Release the blocks
        # DETERMINISTICALLY: explicitly unpersist every persistent RDD
        # (each bench query is independent, so nothing re-reads them),
        # then collect both sides so weak refs clear too. This is
        # isolation hygiene, not a per-query cost change.
        try:
            for jrdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                jrdd.unpersist(False)
        except Exception:
            pass
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "reps": reps,
                "timing": "min_of_reps",
                "failed": sorted(k for k, v in timings.items() if v < 0),
            }
        )
    )


if __name__ == "__main__":
    main()
