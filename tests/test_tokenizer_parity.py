"""Tokenizer parity on REAL text (SURVEY.md §7.4 calls this the subtlest
golden-output trap): the reference's wc splits on non-letter runes with Go's
unicode.IsLetter (mrapps/wc.go:21-27). Our engine uses Java regex
``[^\\p{L}]+``. Both mean Unicode category L*, but only a differential run
over messy real text (Gutenberg: curly quotes, accented characters, em
dashes) proves the tables agree where it matters.

Oracle: a pure-python reimplementation of the Go map/reduce pair --
``str.isalpha()`` is also Unicode L* -- executed sequentially like
main/mrsequential.go, then compared exactly (every word, every count)."""

from __future__ import annotations

import glob
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_spark.sources.io import read_wholetext

REF_MAIN = "/root/reference/go-map-reduce-framework/main"


def _python_wc(paths):
    """mrsequential + mrapps/wc.go in python: FieldsFunc(not letter)."""
    counts: Counter[str] = Counter()
    for p in paths:
        text = open(p, encoding="utf-8").read()
        word = []
        for ch in text:
            if ch.isalpha():
                word.append(ch)
            elif word:
                counts["".join(word)] += 1
                word = []
        if word:
            counts["".join(word)] += 1
    return counts


@pytest.mark.skipif(
    not os.path.isdir(REF_MAIN), reason="reference corpus not present"
)
def test_unicode_letter_tokenizer_matches_go_semantics(spark):
    paths = sorted(glob.glob(os.path.join(REF_MAIN, "pg-*.txt")))
    assert len(paths) == 8
    want = _python_wc(paths)

    df = read_wholetext(spark, paths)
    got = {
        r["w"]: r["n"]
        for r in (
            df.select(F.explode(F.split("text", r"[^\p{L}]+")).alias("w"))
            .filter(F.length("w") > 0)
            .groupBy("w")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    # Exact multiset equality -- any Unicode-table divergence shows up as a
    # word-level diff, reported here explicitly.
    missing = {w for w in want if w not in got}
    extra = {w for w in got if w not in want}
    assert not missing and not extra, (sorted(missing)[:20], sorted(extra)[:20])
    diff = {w: (want[w], got[w]) for w in want if want[w] != got[w]}
    assert not diff, dict(list(diff.items())[:20])
    assert sum(want.values()) == sum(got.values())


def test_fingerprints_arrow_matches_jvm_expression(spark, sf_smoke):
    """The Arrow-vectorized doc_fingerprints production path must equal the
    pure-JVM expression form row-for-row: same tokenization (Java vs Python
    \\s on the ASCII corpus), same sort order (array_sort vs sorted), same
    md5 (UTF-8 bytes both sides), same NULL for <3-token docs."""
    from map_reduce_framework_spark.operators.text_analysis import (
        doc_fingerprints,
        doc_fingerprints_expr,
    )
    from map_reduce_framework_spark.sources.io import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (9001, ""),
            (9002, "   "),
            (9003, "one"),
            (9004, "one two"),
            (9005, "one two three"),
            (9006, "b a b a b a"),
            (9007, "tab\tand\nnewline   runs"),
        ],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    got = {r["doc_id"]: (r[1], r[2]) for r in doc_fingerprints(docs).collect()}
    want = {
        r["doc_id"]: (r[1], r[2]) for r in doc_fingerprints_expr(docs).collect()
    }
    assert got == want and len(got) > 500


def test_dsir_feature_buckets_arrow_matches_jvm_expression(spark, sf_smoke):
    """The Arrow DSIR feature extractor must produce exactly the same
    (doc_id, bucket) multiset as the pure-JVM expression form it
    replaces (hashlib.md5 == Spark md5 over UTF-8; first-8-hex-chars
    int == conv(substr(..), 16, 10); Python zip bigrams ==
    word_shingles(toks, 2))."""
    from collections import Counter

    from map_reduce_framework_spark.operators.text_analysis import (
        _dsir_features,
        _dsir_features_expr,
    )
    from map_reduce_framework_spark.sources.io import load_table

    docs = load_table(spark, sf_smoke, "documents")
    edge = spark.createDataFrame(
        [
            (9001, "", "en", "srcX", 0),
            (9002, "   ", "en", "srcX", 3),
            (9003, "one", "fr", "srcX", 3),
            (9004, "one two", "en", "srcX", 7),
            (9005, "tab\tand\nnewline   runs", "de", "srcX", 22),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs = docs.unionByName(edge.select(docs.columns))
    got = Counter(
        (r.doc_id, r.bucket) for r in _dsir_features(docs).collect()
    )
    want = Counter(
        (r.doc_id, r.bucket) for r in _dsir_features_expr(docs).collect()
    )
    assert got == want and len(got) > 1000
