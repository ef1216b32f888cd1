#!/usr/bin/env python
"""Empirical row-group-skipping evidence for the Z-order layout
(operators/layout.py): write the orders table three ways -- natural
order, single-column sort (custkey), Z-order (custkey, day) -- with
small row groups, then read every row group's parquet footer min/max
stats with pyarrow and compute how many row groups a 2-D box predicate
(custkey range AND date range) could skip under standard stats pruning.

This is the mechanism a 100 TB scan lives on: the scanner never opens a
row group whose [min,max] interval misses the predicate. A single-column
sort gives tight intervals for ONE column (the other's span per row
group stays corpus-wide); Morton interleaving tightens BOTH, so the
2-D skip fraction is the product-like win the docstring promises --
measured here, not asserted.

Writes experiments/zorder_results.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS_PER_GROUP = 1000

#: 2-D box predicate: a 1/8 slice of each dimension.
CUST_LO, CUST_HI = 1000, 2875
DAY_LO, DAY_HI = 200, 365


def _skippable(path: str) -> dict:
    """Skippable/total row groups under (a) the 2-D box predicate and
    (b) a day-only predicate, judged by footer min/max exactly as a
    stats-pruning scanner would. The day-only case is where a
    single-column custkey sort shows its blind spot."""
    import pyarrow.parquet as pq

    box = day_only = total = 0
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            total += 1
            c = g.column(names["custkey"]).statistics
            d = g.column(names["day_idx"]).statistics
            miss_c = c.max < CUST_LO or c.min > CUST_HI
            miss_d = d.max < DAY_LO or d.min > DAY_HI
            if miss_c or miss_d:
                box += 1
            if miss_d:
                day_only += 1
    return {"box": box, "day_only": day_only, "total": total}


def main() -> None:
    from pyspark.sql import functions as F

    from map_reduce_framework_spark.operators.layout import orders_zorder_keys
    from map_reduce_framework_spark.session import get_spark
    from map_reduce_framework_spark.sources.io import load_table

    spark = get_spark("zorder-pruning")
    keyed = orders_zorder_keys(load_table(spark, SF, "orders")).select(
        "o_orderkey", "custkey", "day_idx", "zkey"
    )
    base = tempfile.mkdtemp(prefix="zorder-exp-")
    layouts = {
        "natural": keyed,
        "sort_custkey": keyed.repartitionByRange(8, "custkey").sortWithinPartitions(
            "custkey"
        ),
        "zorder": keyed.repartitionByRange(8, "zkey").sortWithinPartitions(
            "zkey"
        ),
    }
    results: dict[str, dict] = {}
    try:
        for name, df in layouts.items():
            out = os.path.join(base, name)
            (
                df.write.option("parquet.block.size", 64 * 1024)
                .option("spark.sql.files.maxRecordsPerFile", 0)
                .option("maxRecordsPerFile", 0)
                .mode("overwrite")
                .parquet(out)
            )
            # rewrite with bounded row groups via pyarrow for a stable
            # group size across layouts (Spark's block.size is bytes)
            import pyarrow.parquet as pq

            files = [
                os.path.join(out, f)
                for f in os.listdir(out)
                if f.endswith(".parquet")
            ]
            for f in files:
                t = pq.read_table(f)
                pq.write_table(t, f, row_group_size=ROWS_PER_GROUP)
            c = _skippable(out)
            results[name] = {
                "total_row_groups": c["total"],
                "box_skip_fraction": round(c["box"] / c["total"], 4),
                "day_only_skip_fraction": round(
                    c["day_only"] / c["total"], 4
                ),
            }
            print(name, results[name], flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    out_json = os.path.join(os.path.dirname(__file__), "zorder_results.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_json)
    spark.stop()


if __name__ == "__main__":
    main()
