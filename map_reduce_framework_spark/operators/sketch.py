"""Approximate / mergeable sketch aggregates.

The reference's only aggregate is exact group-by-key counting
(go-map-reduce-framework/mrapps/wc.go:39-42); at 100 TB, exact
COUNT(DISTINCT) over a high-cardinality column is a full shuffle of every
distinct value. The sketch path trades bounded error for a
constant-size, MERGEABLE partial state: each partition builds a sketch,
partials merge associatively map-side, and only KB-sized states cross
the network -- the same contract the reference's combinerless shuffle
lacks entirely.

Two tiers, both JVM-native (no Python in the hot path):

- ``approx_count_distinct`` -- Spark's built-in HyperLogLog++ (Heule et
  al., EDBT'13) aggregate; relative error configurable (default 5%).
- ``hll_sketch_agg`` / ``hll_sketch_estimate`` -- Apache DataSketches
  HLL (Spark 3.5+): the sketch itself is a first-class binary value, so
  partial sketches can be PERSISTED (e.g. per-day) and re-merged later
  with ``hll_union_agg`` -- incremental reach over rolling windows
  without re-reading history. That persist-and-remerge property is the
  100 TB design point; the demo query and test exercise exactly it.

Correctness protocol: approximate answers cannot hash-match a DuckDB
oracle (different hash functions => different estimates), so the exact
twin (``user_reach``) carries the oracle, the sketch queries register as
rows-only, and pytest pins the relative error and the merge identity
(union of per-half sketches == whole-corpus sketch, bit-for-bit
estimate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_reach_exact(events: DataFrame) -> DataFrame:
    """Exact distinct users per event type -- the oracle-carrying twin."""
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("reach")
    )


def user_reach_hll(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct users per event type (rsd = target relative
    standard deviation). Deterministic for a given input (hash-based, no
    RNG), so the rows-only driver check is stable run-to-run."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("reach_approx")
    )


def user_reach_sketch(events: DataFrame) -> DataFrame:
    """DataSketches HLL reach per event type, built as a mergeable binary
    sketch then estimated -- the persistable variant (the sketch column
    could be written per-day and re-unioned with ``hll_union_agg``)."""
    sk = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    return sk.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("reach_sketch"),
    )


def merged_reach(events_a: DataFrame, events_b: DataFrame) -> DataFrame:
    """Union two per-split sketch sets into one estimate per event type --
    the incremental-aggregation identity the tests pin: building sketches
    on two disjoint halves and merging them must equal the whole-corpus
    sketch estimate exactly (sketch union is lossless w.r.t. the sketch
    state, unlike averaging estimates)."""
    halves = [
        df.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sketch"))
        for df in (events_a, events_b)
    ]
    return (
        halves[0]
        .unionByName(halves[1])
        .groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .select(
            "event_type", F.hll_sketch_estimate("sketch").alias("reach_sketch")
        )
    )


ORACLE_SQL: dict[str, str] = {
    "user_reach": """
        SELECT event_type, count(DISTINCT user_id) AS reach
        FROM events GROUP BY event_type
    """,
}


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, J.Algorithms 2005)
# ---------------------------------------------------------------------------
#: Sketch geometry: D independent hash rows x W counters. W=64 is sized
#: for the test corpus (vocab ~groups of dozens); a 100 TB run uses
#: W=2^11..2^15 -- the plan is geometry-independent (the sketch is always
#: D*W rows, the point-query join is always a broadcast).
CMS_D = 4
CMS_W = 64
#: Heavy-hitter threshold: report words with estimated count
#: >= n_tokens / CMS_HH_FRACTION.
CMS_HH_FRACTION = 200


def _word_counts(documents: DataFrame) -> DataFrame:
    from ..functions.text import tokenize_ws

    return (
        documents.select(F.explode(tokenize_ws("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _cms_coords(word_col, d: int, w: int):
    """Array of D bucket columns: h_j(word) = md5_long(j || ':' || word)
    mod W. md5-derived (functions/hashing.py) so the sketch is
    bit-identical in DuckDB -- unlike HLL, a CMS built from a fixed hash
    family is fully deterministic, which is why these queries carry an
    EXACT oracle while the HLL ones are rows-only."""
    from ..functions.hashing import md5_long

    return F.array(
        *[(md5_long(word_col, seed=j) % w).cast("int") for j in range(d)]
    )


def word_cms(documents: DataFrame, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """The sketch relation itself: (row_idx, col_idx, cms_count), one row
    per non-empty cell -- cms[j][h_j(word)] summed over all words.

    Scale shape: the word-count aggregate is the only corpus-sized
    shuffle (map-side combined); folding counts into D*W cells is a
    second tiny groupBy (<= D*W rows out). The sketch is MERGEABLE by
    construction: cell-wise sum of two corpora's sketches equals the
    sketch of their union (it is a linear projection of the count
    vector), so per-day sketches re-merge without re-reading history --
    same persist-and-remerge design point as the HLL path, but with a
    point-query estimate instead of a cardinality."""
    counts = _word_counts(documents)
    cells = counts.select(
        F.posexplode(_cms_coords(F.col("word"), d, w)).alias(
            "row_idx", "col_idx"
        ),
        "cnt",
    )
    return cells.groupBy("row_idx", "col_idx").agg(
        F.sum("cnt").alias("cms_count")
    )


def cms_heavy_hitters(
    documents: DataFrame,
    d: int = CMS_D,
    w: int = CMS_W,
    frac: int = CMS_HH_FRACTION,
) -> DataFrame:
    """Heavy hitters via CMS point queries: estimate(word) = min over the
    D rows of the word's cells; report words with estimate >=
    n_tokens/frac. One-sided error: estimate >= true count always
    (collisions only add), so no true heavy hitter is missed; collision
    inflation can only add false positives, bounded by e*N/W per row
    w.h.p. (Cormode-Muthukrishnan Thm 1) -- tests/test_round3_ops.py pins
    the >= side and the min-over-rows improvement.

    The candidate set here is the vocabulary relation (at 100 TB: the
    stream of words seen in the current batch); the sketch side is D*W
    rows and BROADCASTS -- the point-query join never shuffles the
    corpus."""
    sk = word_cms(documents, d, w)
    cand = _word_counts(documents).select("word")
    coords = cand.select(
        "word",
        F.posexplode(_cms_coords(F.col("word"), d, w)).alias(
            "row_idx", "col_idx"
        ),
    )
    est = (
        coords.join(F.broadcast(sk), ["row_idx", "col_idx"])
        .groupBy("word")
        .agg(F.min("cms_count").alias("est_count"))
    )
    from ..functions.text import tokenize_ws

    totals = documents.agg(
        F.sum(F.size(tokenize_ws("text")).cast("bigint")).alias("n_tokens")
    )
    return (
        est.join(F.broadcast(totals))
        .filter(F.col("est_count") * frac >= F.col("n_tokens"))
        .select("word", "est_count")
    )


_CMS_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"

_CMS_CTE = f"""
    wcounts AS (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({_CMS_TOKS}) AS word FROM documents)
        GROUP BY word
    ),
    wcells AS (
        SELECT w.word, t.j AS row_idx,
               CAST(CAST(concat('0x', substr(md5(concat(t.j, ':', w.word)), 1, 15))
                    AS BIGINT) % {CMS_W} AS INT) AS col_idx,
               w.cnt
        FROM wcounts w, unnest([{", ".join(str(j) for j in range(CMS_D))}]) AS t(j)
    ),
    cms AS (
        SELECT row_idx, col_idx, CAST(sum(cnt) AS BIGINT) AS cms_count
        FROM wcells GROUP BY row_idx, col_idx
    )
"""

ORACLE_SQL["word_cms"] = f"""
    WITH {_CMS_CTE}
    SELECT row_idx, col_idx, cms_count FROM cms
"""

ORACLE_SQL["cms_heavy_hitters"] = f"""
    WITH {_CMS_CTE},
    est AS (
        SELECT c.word, min(s.cms_count) AS est_count
        FROM wcells c JOIN cms s USING (row_idx, col_idx)
        GROUP BY c.word
    ),
    tot AS (
        SELECT CAST(sum(len({_CMS_TOKS})) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT word, est_count
    FROM est, tot
    WHERE est_count * {CMS_HH_FRACTION} >= n_tokens
"""
