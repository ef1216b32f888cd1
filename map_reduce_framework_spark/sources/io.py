"""Sources and sinks.

Reference surface (SURVEY.md §2.A):
  A1 whole-file text scan  (mr/worker.go:57-62)   -> read_wholetext()
  A9 '"%v %v\n"' text sink (mr/worker.go:139-157) -> write_mr_text()
plus the parquet star schema the driver provides (TESTDATA.md).

Scale notes: parquet scans go through Spark's vectorized reader with
predicate pushdown + column pruning; callers should always select the
columns they need *before* wide transforms so pruning reaches the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver generates at /root/testdata/sf*/ (TESTDATA.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as either parquet TIMESTAMP(NANOS) (which
        # Spark's vectorized reader rejects -- read the raw int64 nanos and
        # truncate to micros, exactly what DuckDB's CAST(ts AS TIMESTAMP)
        # does) or plain TIMESTAMP(MICROS). Handle both so the engine is
        # agnostic to the generator's parquet writer version.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            ts = F.timestamp_micros(F.expr("ts div 1000"))
        else:
            ts = F.col("ts")
        return df.withColumn("ts", ts.cast("timestamp_ntz"))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_wholetext(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """A1: one row per whole input file -- the reference's map-task
    granularity (one map task per file, mr/coordinator.go:157-163).

    Returns DataFrame[path: string, text: string].
    """
    df = spark.read.text(paths, wholetext=True)
    return df.select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )


def write_jsonl(df: DataFrame, out_dir: str) -> None:
    """JSON-lines sink (the reference's intermediate wire format is JSON
    lines, mr/worker.go:75-81 -- here it's a first-class interchange
    format)."""
    df.write.mode("overwrite").json(out_dir)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source. Pass the writer's schema to skip inference (at
    100 TB schema inference is a full extra scan)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv(df: DataFrame, out_dir: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(out_dir)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_partitioned(
    df: DataFrame, out_dir: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned parquet writer -- the layout that makes
    partition pruning possible at 100 TB. A date-partitioned fact table
    turns ``WHERE month = X`` into a directory-listing filter: Spark plans
    it as ``PartitionFilters`` on the scan and never opens the other
    months' files (vs parquet row-group statistics, which still list and
    footer-read every file).

    Partition columns should be low-cardinality (date buckets, region,
    source); high-cardinality partitioning produces the classic
    many-tiny-files failure mode.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_dir)


def orders_partitioned_by_month(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> DataFrame:
    """Materialize ``orders`` partitioned by order month and return the
    pruning-capable re-read. ``o_month`` becomes a directory key
    (``o_month=1995-03/``), so ``result.filter(o_month == '1995-03')``
    reads exactly one partition directory -- the pattern a 100 TB fact
    table ships with. tests/test_plans.py asserts the plan's
    ``PartitionFilters`` is non-empty and the row counts match the
    unpartitioned scan."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    write_partitioned(orders, out_dir, ["o_month"])
    return spark.read.parquet(out_dir)


def write_mr_text(df: DataFrame, key_col: str, value_col: str, out_dir: str) -> None:
    """A9: the reference's text sink -- lines '"<key> <value>"', key-sorted
    within each output partition (mr/worker.go:133-148). Spark's task-commit
    protocol supplies the reference's atomic tmp+rename (A4) for free.
    """
    (
        df.select(
            F.format_string("%s %s", F.col(key_col), F.col(value_col)).alias("value")
        )
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .text(out_dir)
    )
