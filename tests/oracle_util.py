"""Differential-oracle comparison harness, mirroring the driver's check:
row count + schema + order-insensitive value comparison with columns
sorted by name (the reference's own `sort mr-out* | cmp golden` idea,
go-map-reduce-framework/tests/test-mr.sh:103-111, with DuckDB playing
mrsequential's oracle role).
"""

from __future__ import annotations

import math

import duckdb

from map_reduce_framework_spark.sources.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip double precision; bit-identical values stringify equal
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_to_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    from map_reduce_framework_spark.registry import materialize_ctes

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    # same CTE-materialization hint the registry applies for the driver
    # (pure evaluation-strategy change; r13 -- see registry.py)
    rel = con.sql(materialize_ctes(sql))
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    s = _normalize(spark_cols, spark_rows)
    d = _normalize(duck_cols, duck_rows)
    for i, (a, b) in enumerate(zip(s, d)):
        assert a == b, f"row {i} mismatch:\n  spark : {a}\n  duckdb: {b}"
