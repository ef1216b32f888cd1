"""mrtext connector: write/read roundtrip, per-file split parallelism,
atomic-commit layout, and loading the reference's own golden output."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_spark.sources.mr_datasource import register

REF_TMP = "/root/reference/go-map-reduce-framework/main/mr-tmp"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def test_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "mrout")
    df = spark.createDataFrame(
        [("apple", "3"), ("banana", "1"), ("cherry", "2 x y")],
        "key string, value string",
    ).repartition(2)
    df.write.format("mrtext").mode("append").option("path", out).save()
    back = spark.read.format("mrtext").load(out)
    # key is the first space-delimited token (reference keys never contain
    # spaces); the value keeps any embedded spaces
    assert {tuple(r) for r in back.collect()} == {
        ("apple", "3"),
        ("banana", "1"),
        ("cherry", "2 x y"),
    }


def test_roundtrip_wc_output(spark, tmp_path, sf_smoke):
    from map_reduce_framework_spark.operators.apps import word_count
    from map_reduce_framework_spark.sources.io import load_table

    out = str(tmp_path / "wc_mrout")
    counts = word_count(load_table(spark, sf_smoke, "documents")).select(
        F.col("word").alias("key"), F.col("cnt").cast("string").alias("value")
    )
    counts.write.format("mrtext").mode("append").option("path", out).save()
    back = spark.read.format("mrtext").load(out)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in counts.collect()
    }
    # one mr-out-<pid> file per partition, no leftover temps (atomic commit)
    files = sorted(os.path.basename(p) for p in glob.glob(out + "/*"))
    assert files and all(f.startswith("mr-out-") for f in files)


def test_reader_splits_per_file(spark, tmp_path):
    out = str(tmp_path / "many")
    os.makedirs(out)
    for i in range(5):
        with open(os.path.join(out, f"mr-out-{i}"), "w") as f:
            f.write(f"k{i} {i}\n")
    df = spark.read.format("mrtext").load(out)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 5


@pytest.mark.skipif(
    not os.path.isdir(REF_TMP), reason="reference golden outputs not present"
)
def test_reads_reference_golden_output(spark):
    """The connector loads the reference's actual mr-out files unchanged --
    a reference user points Spark at their existing output tree."""
    golden = sorted(glob.glob(os.path.join(REF_TMP, "mr-out-*")))
    if not golden:
        pytest.skip("no mr-out files in reference tree")
    df = spark.read.format("mrtext").load(os.path.join(REF_TMP, "mr-out-*"))
    n_lines = sum(
        1
        for p in golden
        for line in open(p, encoding="utf-8")
        if line.strip()
    )
    assert df.count() == n_lines
    assert df.schema.simpleString() == "struct<key:string,value:string>"
