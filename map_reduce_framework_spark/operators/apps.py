"""Native-DataFrame fast paths for the reference's MapReduce applications
(SURVEY.md §2.B), run over the driver's ``documents`` table (one row = one
input file; doc_id plays the filename role, FIXTURES.md §1).

Each query is a pure Catalyst plan: tokenize (split/explode), hash
aggregate, sort -- what the reference does with per-file map tasks, an
FNV-32a shuffle and per-key reduce (mr/worker.go), Spark does with a
partial-aggregated exchange. At 100 TB the only shuffle in any of these is
the groupBy on the token/key column, with map-side combine built in (the
reference ships one record per word *occurrence*; we ship one per distinct
word per partition).

Every function has an exact DuckDB oracle in ORACLE_SQL (same column
names/types -- aggregates cast through DECIMAL where float determinism
matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize_letters, tokenize_ws


def word_count(documents: DataFrame) -> DataFrame:
    """B1 ``wc``: Unicode-letter tokenizer word count (mrapps/wc.go:21-42)."""
    return (
        documents.select(F.explode(tokenize_letters("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def word_count_salted(documents: DataFrame) -> DataFrame:
    """B1 word count through the two-phase salted aggregation
    (operators/skew.py): phase 1 groups on (word, salt) so a hot word's
    rows spread across n_salt reducers, phase 2 merges the partials.
    Output is bit-identical to ``word_count`` (counts are decomposable),
    so it shares the wc oracle -- the registered proof that the skew
    rewrite preserves semantics. This is exactly the combiner the
    reference lacks (mrapps/wc.go:29-32 ships every (word,"1") pair to
    one reducer per word; a hot word serializes there)."""
    from .skew import salted_aggregate

    words = documents.select(
        F.explode(tokenize_letters("text")).alias("word")
    )
    return salted_aggregate(
        words,
        ["word"],
        partials=[F.count("*").alias("c")],
        merges=[F.sum("c").alias("cnt")],
    )


def word_count_ws(documents: DataFrame) -> DataFrame:
    """B3 ``wc_long`` tokenization: whitespace split (mrapps/wc_long.go:9-22).
    The reference's reduce comma-joins "1"s; the information content is the
    occurrence count, which is what we emit (plus the join-string length
    equivalence len = 2*cnt-1 holds trivially)."""
    return (
        documents.select(F.explode(tokenize_ws("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def inverted_index(documents: DataFrame) -> DataFrame:
    """B2 ``indexer``: word -> (#docs, comma-joined sorted doc list)
    (mrapps/indexer.go:21-40; per-doc distinct at 22-27, sort+join at 38-39).
    """
    pairs = (
        documents.select(
            F.col("doc_id").cast("string").alias("doc"),
            F.explode(tokenize_letters("text")).alias("word"),
        )
        .distinct()
    )
    return pairs.groupBy("word").agg(
        F.count("*").alias("n_docs"),
        F.array_join(F.sort_array(F.collect_set("doc")), ",").alias("docs"),
    )


def crash_payload(documents: DataFrame) -> DataFrame:
    """B7/B8 ``crash``/``nocrash`` payload (mrapps/crash.go:37-57): per input
    file emit (a, name), (b, len(name)), (c, len(contents)), (d, 'xyzzy');
    reduce = sort values, space-join. The *crash* behavior itself is Spark
    task retry (spark.task.maxFailures), exercised in tests, not here."""
    doc_name = F.col("doc_id").cast("string")
    rows = documents.select(
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("key"), doc_name.alias("value")),
                F.struct(
                    F.lit("b").alias("key"),
                    F.length(doc_name).cast("string").alias("value"),
                ),
                F.struct(
                    F.lit("c").alias("key"),
                    F.length("text").cast("string").alias("value"),
                ),
                F.struct(F.lit("d").alias("key"), F.lit("xyzzy").alias("value")),
            )
        ).alias("kv")
    ).select("kv.key", "kv.value")
    return rows.groupBy("key").agg(
        F.array_join(F.sort_array(F.collect_list("value")), " ").alias("joined")
    )


def per_doc_count(documents: DataFrame) -> DataFrame:
    """B9 ``early_exit`` payload (mrapps/early_exit.go:18-35): one record per
    input file, reduce counts them -> (doc, 1). The interesting property in
    the reference (output stable after first worker exits) is Spark's
    job-completion barrier, asserted in tests."""
    return (
        documents.select(F.col("doc_id").cast("string").alias("doc"))
        .groupBy("doc")
        .agg(F.count("*").alias("cnt"))
    )


def parallelism_probe(events: DataFrame) -> DataFrame:
    """B5/B6 ``mtiming``/``rtiming`` reformulated as a data query: the probes
    assert >=2 concurrently-live workers via time-interval overlap
    (mrapps/mtiming.go:21-81). Over the events table: treat each event as a
    [ts, ts+60s) interval per user and compute the max number of concurrently
    open intervals per event_type -- the classic running-sum-over-boundaries
    window query."""
    bounds = events.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
                F.struct(
                    (F.col("ts") + F.expr("INTERVAL 60 SECONDS")).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("b"),
    ).select("event_type", "b.t", "b.delta")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("t"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = bounds.withColumn("open", F.sum("delta").over(w))
    return running.groupBy("event_type").agg(
        F.max("open").cast("bigint").alias("max_concurrent")
    )


ORACLE_SQL: dict[str, str] = {
    "wc": r"""
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (
            SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    """,
    "wc_ws": r"""
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (
            SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    """,
    "inverted_index": r"""
        WITH pairs AS (
            SELECT DISTINCT doc, word FROM (
                SELECT CAST(doc_id AS VARCHAR) AS doc,
                       unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
                FROM documents
            ) WHERE word <> ''
        )
        SELECT word,
               CAST(count(*) AS BIGINT) AS n_docs,
               string_agg(doc, ',' ORDER BY doc) AS docs
        FROM pairs
        GROUP BY word
    """,
    "crash_payload": r"""
        WITH kv AS (
            SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
            UNION ALL
            SELECT 'b', CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
            UNION ALL
            SELECT 'c', CAST(length(text) AS VARCHAR) FROM documents
            UNION ALL
            SELECT 'd', 'xyzzy' FROM documents
        )
        SELECT key, string_agg(value, ' ' ORDER BY value) AS joined
        FROM kv GROUP BY key
    """,
    "per_doc_count": r"""
        SELECT CAST(doc_id AS VARCHAR) AS doc, CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY doc_id
    """,
    "parallelism_probe": r"""
        WITH bounds AS (
            SELECT event_type, CAST(ts AS TIMESTAMP) AS t, 1 AS delta FROM events
            UNION ALL
            SELECT event_type, CAST(ts AS TIMESTAMP) + INTERVAL 60 SECOND, -1 FROM events
        ),
        running AS (
            SELECT event_type,
                   sum(delta) OVER (
                       PARTITION BY event_type
                       ORDER BY t, delta DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS open
            FROM bounds
        )
        SELECT event_type, CAST(max(open) AS BIGINT) AS max_concurrent
        FROM running GROUP BY event_type
    """,
}
