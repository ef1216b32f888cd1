"""Storage-layout operators: Z-order (Morton) keys for multi-dimension
data skipping.

At 100 TB the dominant cost of a selective query is how many files its
filters let the scanner SKIP. Hive partitioning prunes on one column
hierarchy; Z-ordering interleaves the bits of several columns into one
sort key so that a range-write clusters ALL of them at once -- every
file's min/max footer stats become tight for every Z-ordered column,
and predicate pushdown on any of them prunes files (the technique
behind Delta/Iceberg OPTIMIZE ZORDER, from Morton 1966).

The key computation is pure integer bit arithmetic (JVM expressions, no
UDF) and therefore oracle-checkable; the layout win is demonstrated in
tests/test_layout.py by comparing per-file min/max spans of a
Z-ordered write vs a single-column sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16


def zorder_key(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    BIGINT columns: result bit 2i is bit i of ``a``, bit 2i+1 is bit i
    of ``b``. Built as a sum of shifted masks -- 2*bits JVM expressions,
    whole-stage-codegen friendly, no Python."""
    a = a.cast("bigint")
    b = b.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def orders_zorder_keys(orders: DataFrame) -> DataFrame:
    """Z-order key for the orders table over (customer, order day) --
    the two columns analytic queries actually filter on. Day index is
    days since 1995-01-01 (the corpus epoch); both dimensions use their
    low 16 bits. Output is the (orderkey, dims, zkey) relation a
    layout-optimizing writer sorts by; `repartitionByRange(zkey)` +
    write produces the clustered files."""
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    ).cast("bigint")
    cust = F.col("o_custkey").cast("bigint")
    return orders.select(
        "o_orderkey",
        cust.alias("custkey"),
        day.alias("day_idx"),
        zorder_key(cust, day).alias("zkey"),
    )


def _zorder_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


ORACLE_SQL: dict[str, str] = {
    "orders_zorder_keys": f"""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(o_custkey AS BIGINT) AS custkey,
                   CAST(datediff('day', DATE '1995-01-01',
                                 CAST(o_orderdate AS DATE)) AS BIGINT)
                       AS day_idx
            FROM orders
        )
        SELECT o_orderkey, custkey, day_idx,
               {_zorder_sql('custkey', 'day_idx')} AS zkey
        FROM base
    """,
}
