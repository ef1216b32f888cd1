"""Source/sink round-trips (SURVEY.md §2.E scans/sources/sinks row):
parquet is the native format; JSONL mirrors the reference's intermediate
wire format (mr/worker.go:75-81); CSV is the interchange lowest common
denominator. Typed round-trips must be lossless given an explicit schema."""

from __future__ import annotations

from map_reduce_framework_spark.sources import io


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jsonl_roundtrip(spark, sf_smoke, tmp_path):
    nation = io.load_table(spark, sf_smoke, "nation")
    out = str(tmp_path / "nation_jsonl")
    io.write_jsonl(nation, out)
    back = io.read_jsonl(spark, out, schema=nation.schema)
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_csv_roundtrip(spark, sf_smoke, tmp_path):
    nation = io.load_table(spark, sf_smoke, "nation")
    out = str(tmp_path / "nation_csv")
    io.write_csv(nation, out)
    back = io.read_csv(spark, out, schema=nation.schema)
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_wholetext_matches_file_granularity(spark, tmp_path):
    """A1 parity: one row per whole file, key = path (the reference's map
    input contract, one map task per file)."""
    for i, content in enumerate(["alpha beta\ngamma", "delta"]):
        (tmp_path / f"f{i}.txt").write_text(content)
    df = io.read_wholetext(spark, str(tmp_path))
    rows = {r["path"].rsplit("/", 1)[-1]: r["text"] for r in df.collect()}
    assert rows == {"f0.txt": "alpha beta\ngamma", "f1.txt": "delta"}


def test_orc_roundtrip(spark, sf_smoke, tmp_path):
    nation = io.load_table(spark, sf_smoke, "nation")
    out = str(tmp_path / "nation_orc")
    nation.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_partition_pruning_reaches_scan(spark, sf_smoke, tmp_path):
    """Hive-style partitioned layout: a filter on the partition column must
    become a PartitionFilter (directories skipped at planning time), not a
    data filter -- the difference between scanning 1/5 and 5/5 of 100 TB."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "events_by_type")
    events = io.load_table(spark, sf_smoke, "events")
    events.write.partitionBy("event_type").mode("overwrite").parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "event_type" in pf.group(1), plan[:2000]
    want = events.filter(F.col("event_type") == "click").count()
    assert df.count() == want > 0
