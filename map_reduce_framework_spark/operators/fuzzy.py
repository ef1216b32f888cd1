"""Fuzzy (edit-distance) string matching as a blocked equi-join.

The reference has no string-similarity surface at all; a training-data
pipeline needs one for key reconciliation (near-identical titles, OCR'd
names, user-typed join keys). The naive plan -- theta self-join on
``levenshtein(a, b) <= k`` -- is O(n^2) comparisons and unshuffleable
(no equi-key), a scale-killer long before 100 TB.

Blocked plan: **symmetric deletion neighborhoods** (the SymSpell scheme,
Garbe 2012; the Mor-Fraenkel 1982 single-deletion dictionary generalized
to depth k). If ``levenshtein(a, b) <= k`` then deleting at most k chars
from each along an optimal alignment (substitution: drop from both;
insert/delete: drop from one side) yields a COMMON string, so the depth-k
deletion neighborhoods of a and b intersect -- the blocking is complete,
never misses a pair. Each string expands to O(L^k / k!) variants
(all-JVM expressions: nested ``transform`` over ``sequence``, no Python),
candidates come from ONE equi-join on the variant string, and the exact
``levenshtein`` verify runs only on candidates. At scale this is the same
shape as the MinHash band join in ``dedup.py``: linear expansion, one
shuffle, verify bounded by true-ish pairs.

Scope: short join keys (names, titles, codes). For k=2 and L=40 the
expansion is ~800 variants/string -- fine; for long free text use the
MinHash/SimHash paths instead (``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: F.Column, k: int = 2) -> F.Column:
    """All strings obtainable from ``col`` by deleting at most ``k``
    characters (k in {1, 2}), as a distinct array -- pure JVM expressions,
    stays inside whole-stage codegen.
    """
    if k not in (1, 2):
        raise ValueError(f"k must be 1 or 2, got {k}")
    s = col
    n = F.length(s)
    # delete position i (0-based): prefix [1..i] + suffix [i+2..]
    del1 = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat(s.substr(F.lit(1), i), s.substr(i + 2, n)),
    )
    empty = F.array().cast("array<string>")
    parts = [F.array(s), F.when(n >= 1, del1).otherwise(empty)]
    if k == 2:
        # delete positions i < j: [1..i] + [i+2..j] + [j+2..]
        del2 = F.flatten(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.transform(
                    F.sequence(i + 1, n - 1),
                    lambda j: F.concat(
                        s.substr(F.lit(1), i),
                        s.substr(i + 2, j - i - 1),
                        s.substr(j + 2, n),
                    ),
                ),
            )
        )
        parts.append(F.when(n >= 2, del2).otherwise(empty))
    return F.array_distinct(F.concat(*parts))


def edit_distance_pairs(
    df: DataFrame, name_col: str, k: int = 2
) -> DataFrame:
    """Distinct pairs of ``name_col`` values with ``levenshtein <= k``,
    oriented ``a_name < b_name``, via the complete SymSpell blocking.

    One distinct (dedup names), one explode (bounded expansion), one
    equi-join on the variant, one distinct (a candidate pair can share
    several variants), then the exact verify on candidates only.
    """
    names = df.select(F.col(name_col).alias("name")).distinct()
    variants = names.select(
        "name", F.explode(deletion_variants(F.col("name"), k)).alias("__v")
    )
    a = variants.select(F.col("name").alias("a_name"), "__v")
    b = variants.select(F.col("name").alias("b_name"), "__v")
    cand = (
        a.join(b, "__v")
        .filter(F.col("a_name") < F.col("b_name"))
        .select("a_name", "b_name")
        .distinct()
    )
    return cand.select(
        "a_name",
        "b_name",
        F.levenshtein("a_name", "b_name").alias("dist"),
    ).filter(F.col("dist") <= k)


def part_name_pairs(part: DataFrame, k: int = 2) -> DataFrame:
    """Registered query: near-identical part names (levenshtein <= 2)
    over the distinct ``p_name`` vocabulary."""
    return edit_distance_pairs(part, "p_name", k)


ORACLE_SQL: dict[str, str] = {
    # Naive theta self-join with DuckDB's independent levenshtein -- the
    # O(n^2) formulation the blocked plan exists to avoid; also re-checks
    # blocking completeness (a missed pair = a missing row = hash fail).
    "fuzzy_part_pairs": """
        WITH names AS (SELECT DISTINCT p_name AS name FROM part)
        SELECT a.name AS a_name, b.name AS b_name,
               CAST(levenshtein(a.name, b.name) AS INT) AS dist
        FROM names a JOIN names b ON a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 2
    """,
}
