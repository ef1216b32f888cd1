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


def test_chaos_soak_repeated_concurrent_failures():
    """test-mr-many.sh / test-mr.sh:296-317 analog: keep killing tasks
    while the job keeps running, for several full rounds. Each round
    crashes THREE map-side partitions (one of them twice -- two failed
    attempts) and two reduce-side partitions concurrently, across a real
    shuffle; every round's aggregate and per-key results must equal the
    failure-free answers exactly, with zero double-counting."""
    import tempfile

    # Accumulator updates from FAILED tasks are discarded by design, so
    # the crash evidence is an O_APPEND side-channel file instead.
    with tempfile.NamedTemporaryFile(mode="r", suffix=".chaoslog") as log:
        out = _run_py(
            f"""
        import random
        from operator import add
        from pyspark.sql import SparkSession
        from pyspark import TaskContext

        CHAOS_LOG = {log.name!r}

        spark = (
            SparkSession.builder.master("local[4, 4]")  # 4 attempts/task
            .appName("chaos-soak").config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        sc = spark.sparkContext
        sc.setLogLevel("ERROR")

        N, PARTS, ROUNDS = 4000, 8, 3
        want_total = sum(range(N)) * 2
        want_group = {{k: sum(x for x in range(N) if x % 10 == k) for k in range(10)}}

        rng = random.Random(42)
        for rnd in range(ROUNDS):
            # map-side: 3 partitions fail; the first of them fails twice
            map_victims = rng.sample(range(PARTS), 3)
            map_plan = {{map_victims[0]: 2, map_victims[1]: 1, map_victims[2]: 1}}
            red_plan = {{p: 1 for p in rng.sample(range(PARTS), 2)}}
            bc_map = sc.broadcast(map_plan)
            bc_red = sc.broadcast(red_plan)

            def chaos(it, plan_bc):
                tc = TaskContext.get()
                if tc.attemptNumber() < plan_bc.value.get(tc.partitionId(), 0):
                    with open(CHAOS_LOG, "a") as fh:
                        fh.write(f"p{{tc.partitionId()}} a{{tc.attemptNumber()}}\\n")
                    raise RuntimeError(
                        f"chaos p{{tc.partitionId()}} a{{tc.attemptNumber()}}"
                    )
                return it

            data = sc.parallelize(range(N), PARTS).mapPartitions(
                lambda it, b=bc_map: chaos(it, b)
            )
            total = data.map(lambda x: x * 2).sum()
            grouped = dict(
                data.map(lambda x: (x % 10, x))
                .reduceByKey(add, PARTS)
                .mapPartitions(lambda it, b=bc_red: chaos(it, b))
                .collect()
            )
            ok = int(total) == want_total and grouped == want_group
            print(f"ROUND {{rnd}} OK {{ok}}")
        """
        )
        for rnd in range(3):
            assert f"ROUND {rnd} OK True" in out
        # every planned crash fires on each action that runs its stage:
        # 3 rounds x (map plan twice: sum + shuffle input; reduce plan once)
        crashes = log.read().splitlines()
        assert len(crashes) >= 20, f"chaos injection barely fired: {crashes}"


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


def test_segmented_fold_survives_task_kills():
    """D2 coverage for the round-4 multi-round cogroup pipeline: inject a
    first-attempt failure into the Arrow fold stage of kv_fold_segmented
    (a Python worker dying mid-cogroup) and assert the retried run's
    output is row-identical to an undisturbed run -- the crash.go
    protocol applied to driver-chained stateful rounds."""
    out = _run_py(
        """
        import os
        from pyspark.sql import SparkSession
        from pyspark import TaskContext

        spark = (
            SparkSession.builder.master("local[4, 4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .appName("chaos-segfold")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        from map_reduce_framework_spark.operators import kv
        from map_reduce_framework_spark.sources.io import load_table

        ops = kv.kv_ops_from_events(
            load_table(spark, "/root/testdata/sf0.001", "events")
        )
        want = sorted(
            tuple(r) for r in kv.kv_fold_segmented(ops, segment_size=16).collect()
        )

        marker_dir = "/tmp/chaos-segfold-markers"
        os.makedirs(marker_dir, exist_ok=True)
        for f in os.listdir(marker_dir):
            os.remove(os.path.join(marker_dir, f))

        orig = kv._fold_segment

        def chaotic(state_pdf, ops_pdf):
            ctx = TaskContext.get()
            if ctx is not None and ctx.attemptNumber() == 0:
                marker = os.path.join(
                    marker_dir, f"p{ctx.partitionId()}-s{ctx.stageId()}"
                )
                if not os.path.exists(marker):
                    open(marker, "w").close()
                    raise RuntimeError("chaos: killed first attempt")
            return orig(state_pdf, ops_pdf)

        kv._fold_segment = chaotic
        got = sorted(
            tuple(r) for r in kv.kv_fold_segmented(ops, segment_size=16).collect()
        )
        assert got == want, "retried fold diverged from undisturbed run"
        n_kills = len(os.listdir(marker_dir))
        assert n_kills > 0, "chaos never fired"
        print("OK kills:", n_kills)
        """
    )
    assert "OK kills:" in out
