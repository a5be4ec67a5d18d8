"""Text column expressions — tokenization, shingling, token counting.

The reference's only text op is the word-count example's map UDF
(reference: server/views.go:53-55) over pre-split words. Here tokenization
is a reusable Column expression so every text operator (word count, inverted
index, dedup shingles, text stats) shares one definition and stays inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of lowercased ``text``, empties removed.

    array<string>; equivalent DuckDB:
    ``list_filter(string_split(lower(text), ' '), t -> t <> '')``.
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Number of whitespace tokens (the 'token counting' text-analysis op)."""
    return F.size(tokens(text))


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Contiguous word ``k``-grams of a token array, space-joined.

    ``slice`` is 1-based; a doc shorter than ``k`` tokens yields its full
    token string as its single shingle so no document drops out of dedup.
    """
    ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return ngrams


def distinct_shingles_arrow(toks: Column, k: int = 3) -> Column:
    """Arrow-vectorized distinct word-``k``-gram set of a token array.

    Same value set as ``array_distinct(word_shingles(toks, k))`` (asserted in
    tests/test_functions.py) but computed per Arrow batch in Python instead
    of an interpreted per-position Catalyst ``transform``+``slice`` — HOFs
    are CodegenFallback, and the slice-per-position copy made shingling the
    single hottest expression in the dedup family (~0.5 ms/doc at sf0.1).
    Map-side, no shuffle; parallel across partitions like any projection.

    Tokenization stays in the JVM (``tokens()``) so lower/split semantics are
    engine-exact; only the slicing/joining — pure ASCII-safe string
    mechanics — moves to Python.
    """

    @F.pandas_udf("array<string>")
    def shingle(batch: pd.Series) -> pd.Series:
        out = []
        for tk in batch:
            if tk is None:
                # NULL token array (null text) → NULL shingles, like the
                # Column formulation this kernel is value-identical to
                out.append(None)
                continue
            n = len(tk)
            if n > k - 1:
                seen = dict.fromkeys(
                    " ".join(tk[i : i + k]) for i in range(n - (k - 1))
                )
            else:
                seen = {" ".join(tk): None}
            out.append(list(seen))
        return pd.Series(out)

    return shingle(toks)


def shingle_counts_arrow(toks: Column, k: int = 8) -> Column:
    """Word-``k``-gram multiplicities of a token array as
    ``map<string,bigint>`` (gram → occurrence count within the document).

    The multiplicity-preserving sibling of :func:`distinct_shingles_arrow`,
    for operators where REPEATED windows matter (exact-substring duplicate
    spans count every window position, not the distinct gram set). Same
    Arrow-batch discipline: tokenization stays JVM-side, only the pure
    string slicing/counting runs in Python, map-side with no shuffle.

    A document shorter than ``k`` tokens yields NULL (it has no length-``k``
    window) — callers filter ``size(tokens) >= k`` first, mirroring the
    oracle's ``len(tk) >= k`` guard.
    """

    @F.pandas_udf("map<string,bigint>")
    def counts(batch: pd.Series) -> pd.Series:
        out = []
        for tk in batch:
            if tk is None or len(tk) < k:
                out.append(None)
                continue
            d: dict[str, int] = {}
            for i in range(len(tk) - (k - 1)):
                g = " ".join(tk[i : i + k])
                d[g] = d.get(g, 0) + 1
            out.append(d)
        return pd.Series(out)

    return counts(toks)
