"""Tokenizer / text column expressions.

The reference has exactly two tokenizers and their difference is the
subtlest golden-output trap (SURVEY.md §7.4):

* letter tokenizer: split on runs of non-Unicode-letters
  (unicode.IsLetter FieldsFunc, mrapps/wc.go:21-26)
* whitespace tokenizer: strings.Fields (mrapps/wc_long.go:11)

Both are pure Catalyst expressions (JVM-side, whole-stage codegen).

The shingle builders come in two equivalent forms: ``word_shingles`` is the
pure-JVM expression (the form the DuckDB oracles mirror), and
``distinct_word_shingles_arrow`` is the Arrow-vectorized production path --
lambda higher-order functions (``transform``/``filter``) run *interpreted*
in Spark (no whole-stage codegen), which makes the expression form the
dominant cost of every shingle-based dedup plan. A test pins the two forms
equal row-for-row.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

#: Runs of non-letters (Unicode letter class), mrapps/wc.go:23.
LETTER_SPLIT_RE = r"[^\p{L}]+"
#: Whitespace runs, mrapps/wc_long.go:11 (strings.Fields).
WS_SPLIT_RE = r"\s+"


def tokenize(col: Column | str, pattern: str = LETTER_SPLIT_RE) -> Column:
    """Split ``col`` on ``pattern`` and drop empty tokens (split keeps a
    leading '' when the string starts with a delimiter)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(col, pattern), lambda t: t != F.lit(""))


def tokenize_letters(col: Column | str) -> Column:
    return tokenize(col, LETTER_SPLIT_RE)


def tokenize_ws(col: Column | str) -> Column:
    return tokenize(col, WS_SPLIT_RE)


def word_shingles(tokens: Column, n: int = 3, sep: str = " ") -> Column:
    """Consecutive n-gram shingles over a token array, order-preserving.

    array<string> of size(tokens)-n+1 (empty if fewer than n tokens).
    Implemented with transform(sequence(...)) -- stays in codegen.
    """
    k = F.size(tokens) - F.lit(n - 1)
    # sequence(1, 0) would generate a DESCENDING [1, 0] -- guard short docs.
    return F.when(k < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(tokens, i, n), sep),
        )
    )


_WS_RE = re.compile(WS_SPLIT_RE)


def fingerprints_arrow(n: int = 3, sep: str = " "):
    """Arrow-vectorized twin of the ``doc_fingerprints`` expression pair:
    per document, the md5 of the sorted distinct whitespace tokens and the
    minimum md5 over all consecutive ``n``-gram shingles.

    Same interpreted-HOF rationale as ``distinct_word_shingles_arrow``
    (SCALE.md): the expression form runs ``transform(md5)`` interpreted per
    shingle per row and dominated the bench (7.8 s, slowest query at
    sf0.1); one Python pass per Arrow batch computes both fingerprints in
    a single traversal. Value parity with the JVM expression form is
    pinned by tests/test_tokenizer_parity.py (Python ``sorted`` == Spark
    ``array_sort`` and ``min`` == ``array_min`` on ASCII/hex strings;
    ``hashlib.md5`` over UTF-8 == Spark ``md5``), and the DuckDB oracle
    hash-compare would catch any divergence.

    Returns a struct<set_fingerprint string, min_shingle_fingerprint
    string> column; ``min_shingle_fingerprint`` is NULL for docs with
    fewer than ``n`` tokens (matching ``array_min`` over an empty array).
    """
    from hashlib import md5

    def _fp(text: pd.Series) -> pd.DataFrame:
        canon, minsh = [], []
        for t in text:
            toks = [w for w in _WS_RE.split(t or "") if w]
            canon.append(
                md5(sep.join(sorted(set(toks))).encode("utf-8")).hexdigest()
            )
            if len(toks) >= n:
                minsh.append(
                    min(
                        md5(sep.join(toks[i : i + n]).encode("utf-8")).hexdigest()
                        for i in range(len(toks) - n + 1)
                    )
                )
            else:
                minsh.append(None)
        return pd.DataFrame(
            {"set_fingerprint": canon, "min_shingle_fingerprint": minsh}
        )

    return F.pandas_udf(
        _fp, "set_fingerprint string, min_shingle_fingerprint string"
    )


def distinct_word_shingles_arrow(n: int = 3, sep: str = " "):
    """Arrow-vectorized ``array_distinct(word_shingles(tokenize_ws(text)))``.

    One Python pass per Arrow batch instead of four nested interpreted
    HOFs per row (split -> filter -> transform(slice+join) -> distinct):
    measured 6s -> <0.3s for the 5000-doc / 260k-shingle shingle stage at
    sf0.1, and the gap grows with document length. ``dict.fromkeys``
    preserves first-occurrence order exactly like ``array_distinct``.

    Regex parity: Java and Python ``\\s`` agree on ASCII whitespace, and
    the corpus is pure ASCII (TESTDATA.md); the oracle hash-compare would
    catch any divergence.
    """

    def _shingles(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = [w for w in _WS_RE.split(t or "") if w]
            out.append(
                list(
                    dict.fromkeys(
                        sep.join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    )
                )
            )
        return pd.Series(out)

    return F.pandas_udf(_shingles, ArrayType(StringType()))


def dsir_feature_buckets_arrow(n_buckets: int):
    """Arrow-vectorized DSIR feature extractor: per document, the hashed
    bucket of every unigram AND bigram occurrence (order-preserving,
    duplicates kept -- the bag-of-hashed-n-grams of Xie et al. 2023).

    Same interpreted-HOF rationale as ``distinct_word_shingles_arrow``:
    the expression form (``concat(tokens, word_shingles(tokens, 2))``
    + per-element md5/conv) runs interpreted per row and dominated the
    DSIR bench rows (~2.7 s of a 3.2 s feature stage at sf0.1); one
    Python pass per Arrow batch does split + zip + hash. Bucket parity
    with the JVM form (``conv(substr(md5(feat), 1, 8), 16, 10) %
    n_buckets``) is exact: ``hashlib.md5`` over UTF-8 == Spark ``md5``,
    and both take the first 8 hex chars as an integer. Pinned by
    tests/test_tokenizer_parity.py.

    Returns array<long> (empty for tokenless docs)."""
    from hashlib import md5

    def _buckets(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = [w for w in _WS_RE.split(t or "") if w]
            feats = toks + [
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            ]
            out.append(
                [
                    int(md5(f.encode("utf-8")).hexdigest()[:8], 16)
                    % n_buckets
                    for f in feats
                ]
            )
        return pd.Series(out)

    return F.pandas_udf(_buckets, ArrayType(LongType()))
