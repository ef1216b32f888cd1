"""Fault-tolerance behavioral parity (SURVEY.md §2.D, §5.3).

The reference proves its tiers with chaos apps: ``crash.go`` (tasks randomly
die; output must still equal the no-crash oracle, tests/test-mr.sh:284-330),
``jobcount.go`` (tasks run exactly once without failures), ``wc_long.go``
(stragglers; speculation bounds makespan). Spark's scheduler provides the
mechanisms (task retry, speculation), so these tests assert the *behavior*
through Spark, not a reimplementation:

* crash parity  -> a partition that raises on its first attempt; with
  ``local[N, maxFailures]`` the job must still produce the exact expected
  result (retry is transparent to output -- D2).
* jobcount      -> accumulator-counted task invocations == partitions when
  nothing fails (no spurious re-execution).
* speculation   -> Tier-2 conf mapping (spark.speculation, quantile 0.8)
  is applied by get_spark(speculation=True).

Retry tests run in a subprocess: task retries require a ``local[N, F]``
master, and a JVM only gets one SparkContext.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap


def _run_py(code: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


def test_task_retry_output_unchanged():
    """crash.go analog: first attempt of one partition dies; retried attempt
    succeeds; the aggregate equals the failure-free answer exactly."""
    out = _run_py(
        """
        import os
        from pyspark.sql import SparkSession
        from pyspark import TaskContext

        spark = (
            SparkSession.builder.master("local[4, 4]")  # 4 attempts/task (D2)
            .appName("retry-chaos").config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        sc = spark.sparkContext
        sc.setLogLevel("ERROR")

        def flaky(it):
            tc = TaskContext.get()
            if tc.partitionId() == 2 and tc.attemptNumber() == 0:
                raise RuntimeError("injected crash (mrapps/crash.go analog)")
            return it

        total = (
            sc.parallelize(range(1000), 4)
            .mapPartitions(flaky)
            .map(lambda x: x * 2)
            .sum()
        )
        print("TOTAL", int(total))
        """
    )
    assert "TOTAL 999000" in out


def test_jobcount_no_spurious_reexecution():
    """jobcount.go analog: without failures each task body runs exactly once
    (at-most-once dispatch per partition; mrapps/jobcount.go:24-48)."""
    out = _run_py(
        """
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("jobcount").config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        sc = spark.sparkContext
        sc.setLogLevel("ERROR")
        runs = sc.accumulator(0)

        def counting(it):
            runs.add(1)
            return it

        n = sc.parallelize(range(80), 8).mapPartitions(counting).count()
        print("ROWS", n, "RUNS", runs.value)
        """
    )
    assert "ROWS 80 RUNS 8" in out


def test_speculation_conf_mapping():
    """Tier-2 mapping (config/config.go:13-19 -> spark.speculation*)."""
    out = _run_py(
        """
        from map_reduce_framework_spark.session import get_spark

        spark = get_spark("spec-demo", speculation=True)
        print("SPEC", spark.conf.get("spark.speculation"))
        print("QUANT", spark.conf.get("spark.speculation.quantile"))
        n = spark.range(100).count()
        print("N", n)
        """
    )
    assert "SPEC true" in out
    assert "QUANT 0.8" in out
    assert "N 100" in out
