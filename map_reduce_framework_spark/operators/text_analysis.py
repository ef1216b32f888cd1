"""Text-analysis operators for training-data pipelines (north-star
surface): language ID, quality scoring, token statistics, document
fingerprinting. Pure Catalyst expressions (one narrow projection or one
groupBy each, ratios as exact int/int double divisions, bit-identical
across engines) -- except ``doc_fingerprints``, whose per-shingle md5 runs
interpreted as a lambda HOF and is therefore Arrow-vectorized per SCALE.md
policy, with the JVM expression form kept as the parity reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprints_arrow, tokenize_ws, word_shingles

#: Tiny deterministic stopword profiles for the n-gram/stopword language
#: heuristic. Real pipelines plug in fastText-style models via the same
#: shape (token join + argmax); the heuristic keeps the operator
#: self-contained and oracle-checkable.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "de", "et", "un"],
    "es": ["el", "la", "de", "y", "un"],
    "de": ["der", "die", "das", "und", "ein"],
    "zh": ["de", "le", "shi", "he", "zai"],
}

#: BPE-ish pretokenizer: letter runs, digit runs, single punctuation.
BPE_ISH_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n]"


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token accounting: whitespace tokens, BPE-ish tokens,
    distinct tokens, type/token ratio."""
    toks = tokenize_ws("text")
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens_ws"),
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_RE)).alias("n_tokens_bpe"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("type_token_ratio"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality signals (Gopher/C4-style rules): length, mean
    token length, stopword ratio, digit/punct character ratios, and a
    boolean keep/drop verdict."""
    toks = tokenize_ws("text")
    n_tok = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, b: a + b
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"]))
    )
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    punct = F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 \\t\\n]", ""))
    return documents.select(
        "doc_id",
        F.col("n_chars").alias("n_chars"),
        n_tok.alias("n_tokens"),
        (sum_len / n_tok).alias("mean_token_len"),
        (stop_hits / n_tok).alias("stopword_ratio"),
        (digits / F.col("n_chars")).alias("digit_ratio"),
        (punct / F.col("n_chars")).alias("punct_ratio"),
        (
            (n_tok >= 10)
            & (sum_len / n_tok >= 2.0)
            & (digits / F.col("n_chars") < 0.3)
        ).alias("keep"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-profile language ID: score = distinct-token overlap with
    each language profile; argmax with lexicographic tie-break. Join-free:
    the profiles are tiny and inlined as array literals."""
    toks = F.array_distinct(tokenize_ws("text"))
    scores = [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).alias(f"score_{lang}")
        for lang, words in sorted(LANG_PROFILES.items())
    ]
    scored = documents.select("doc_id", F.col("lang").alias("labeled_lang"), *scores)
    # argmax via greatest + chained when (ties -> lexicographically first)
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return scored.select(
        "doc_id",
        "labeled_lang",
        best.cast("int").alias("best_score"),
        pred.alias("pred_lang"),
    )


def _default_parallelism(df: DataFrame) -> int:
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return 32


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Two content fingerprints per doc: the canonical token-set hash
    (order-insensitive) and the minimum 3-gram-shingle hash (winnowing-
    style, order-sensitive).

    Production path: one Arrow-vectorized pass per batch
    (``fingerprints_arrow``) -- the expression form runs interpreted
    ``transform(md5)`` per shingle and was the slowest bench row (7.8 s at
    sf0.1). ``doc_fingerprints_expr`` keeps the pure-JVM form; a parity
    test pins the two equal row-for-row.
    """
    fp = fingerprints_arrow(3)(F.col("text"))
    # repartition: the single-file scan would otherwise hash every shingle
    # of every doc in ONE task. Session shuffle parallelism; AQE coalesces.
    return documents.repartition(_default_parallelism(documents)).select(
        "doc_id",
        fp["set_fingerprint"].alias("set_fingerprint"),
        fp["min_shingle_fingerprint"].alias("min_shingle_fingerprint"),
    )


def doc_fingerprints_expr(documents: DataFrame) -> DataFrame:
    """Pure-JVM expression form of ``doc_fingerprints`` -- the shape the
    DuckDB oracle mirrors; kept as the parity reference for the Arrow
    production path."""
    toks = tokenize_ws("text")
    canon = F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
    sh = word_shingles(toks, 3)
    min_shingle = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return documents.repartition(_default_parallelism(documents)).select(
        "doc_id",
        canon.alias("set_fingerprint"),
        min_shingle.alias("min_shingle_fingerprint"),
    )


_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"
_DTOKS = f"list_distinct({_TOKS})"

_PROFILE_SQL = {
    lang: "[" + ",".join(f"'{w}'" for w in words) + "]"
    for lang, words in sorted(LANG_PROFILES.items())
}

ORACLE_SQL: dict[str, str] = {
    "token_stats": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS INT) AS n_tokens_ws,
               CAST(len(regexp_extract_all(text, '{BPE_ISH_RE.replace(chr(92) + 't', chr(9)).replace(chr(92) + 'n', chr(10))}')) AS INT) AS n_tokens_bpe,
               CAST(len({_DTOKS}) AS INT) AS n_distinct,
               len({_DTOKS}) / len({_TOKS}) AS type_token_ratio
        FROM documents
    """,
    "quality_score": f"""
        WITH t AS (
            SELECT doc_id, n_chars, text, {_TOKS} AS toks FROM documents
        ),
        m AS (
            SELECT doc_id, n_chars,
                   CAST(len(toks) AS INT) AS n_tokens,
                   list_sum(list_transform(toks, t -> length(t))) AS sum_len,
                   CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to'))) AS INT) AS stop_hits,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
                   length(regexp_replace(text, '[a-zA-Z0-9 \t\n]', '', 'g')) AS punct
            FROM t
        )
        SELECT doc_id, n_chars, n_tokens,
               sum_len / n_tokens AS mean_token_len,
               stop_hits / n_tokens AS stopword_ratio,
               digits / n_chars AS digit_ratio,
               punct / n_chars AS punct_ratio,
               (n_tokens >= 10 AND sum_len / n_tokens >= 2.0
                AND digits / n_chars < 0.3) AS keep
        FROM m
    """,
    "lang_id": f"""
        WITH scored AS (
            SELECT doc_id, lang AS labeled_lang,
                   {', '.join(
                       f"CAST(len(list_intersect({_DTOKS}, {_PROFILE_SQL[lang]})) AS BIGINT) AS score_{lang}"
                       for lang in sorted(LANG_PROFILES)
                   )}
            FROM documents
        )
        SELECT doc_id, labeled_lang,
               CAST(greatest({', '.join(f'score_{lang}' for lang in sorted(LANG_PROFILES))}) AS INT) AS best_score,
               CASE
                   {' '.join(
                       f"WHEN score_{lang} = greatest({', '.join(f'score_{l2}' for l2 in sorted(LANG_PROFILES))}) THEN '{lang}'"
                       for lang in sorted(LANG_PROFILES)
                   )}
               END AS pred_lang
        FROM scored
    """,
    "doc_fingerprints": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS w FROM documents
        )
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS set_fingerprint,
               list_min(list_transform(
                   list_transform(
                       range(1, greatest(len(w) - 2, 0) + 1),
                       i -> array_to_string(w[i:i+2], ' ')
                   ),
                   s -> md5(s)
               )) AS min_shingle_fingerprint
        FROM t
    """,
}
