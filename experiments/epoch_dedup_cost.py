"""Measure per-wave cost of the epochal ingest with cross-epoch dedup
(VERDICT r9 ask #2's "per-wave cost measured bounded by wave size").

Drops W equal-size waves of documents into a growing source directory
and runs stream_ingest_epoch after each drop. If the dedup probe were
rescanning the corpus, wave-wall would grow ~linearly with the
accumulated index; because the wave computes only ITS OWN signatures
and probes the persisted index with a banded equi-join, the wall
should stay ~flat (the index side is a parquet scan that grows, but
at these sizes it is noise -- the assertion is "no blow-up", recorded
as the growth factor of the last wave over the first).

Usage: python experiments/epoch_dedup_cost.py
Writes experiments/epoch_dedup_cost.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVES = 6


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("epoch-dedup-cost")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = docs.count()

    from map_reduce_framework_spark.streaming.ops import stream_ingest_epoch

    scratch = tempfile.mkdtemp(prefix="epoch-cost-")
    source = os.path.join(scratch, "source")
    work = os.path.join(scratch, "work")
    # warmup (Arrow workers + streaming machinery) on a throwaway dir
    warm = tempfile.mkdtemp(prefix="epoch-warm-")
    docs.limit(50).coalesce(1).write.mode("append").parquet(
        os.path.join(warm, "src")
    )
    stream_ingest_epoch(spark, os.path.join(warm, "src"), os.path.join(warm, "w"))

    waves = []
    for wv in range(WAVES):
        docs.filter(f"doc_id % {WAVES} = {wv}").coalesce(1).write.mode(
            "append"
        ).parquet(source)
        t0 = time.perf_counter()
        d = stream_ingest_epoch(spark, source, work)
        wall = round(time.perf_counter() - t0, 3)
        n_in = (
            spark.read.parquet(os.path.join(d, "input")).count() if d else 0
        )
        waves.append({"wave": wv, "wall_sec": wall, "n_docs_committed": n_in})
        print(waves[-1], flush=True)

    out = {
        "sf": 0.1,
        "total_docs": n,
        "waves": waves,
        "last_over_first": round(
            waves[-1]["wall_sec"] / waves[0]["wall_sec"], 2
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "epoch_dedup_cost.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
