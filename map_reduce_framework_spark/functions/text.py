"""Tokenizer / text column expressions.

The reference has exactly two tokenizers and their difference is the
subtlest golden-output trap (SURVEY.md §7.4):

* letter tokenizer: split on runs of non-Unicode-letters
  (unicode.IsLetter FieldsFunc, mrapps/wc.go:21-26)
* whitespace tokenizer: strings.Fields (mrapps/wc_long.go:11)

Both are pure Catalyst expressions (JVM-side, whole-stage codegen) --
no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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
