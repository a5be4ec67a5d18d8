"""Text column expressions — tokenization, shingling, token counting.

The reference's only text op is the word-count example's map UDF
(reference: server/views.go:53-55) over pre-split words. Here tokenization
is a reusable Column expression so every text operator (word count, inverted
index, dedup shingles, text stats) shares one definition and stays inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

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
