"""Exact-substring duplicate spans (q_substring_dedup) — planted fixtures.

The operator reports, per document, how many of its length-k token windows
occur >= 2 times corpus-wide (ExactSubstr signal, Lee et al. 2022). These
tests plant known duplications so every count is derivable by hand.
"""

from __future__ import annotations

from go_web_mapreduce_spark.operators.dedup import duplicate_span_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_cross_document_duplicate_span_counted(spark):
    # k=4: doc 1 and doc 2 share the window "a b c d"; every other window
    # is unique. doc 1 has 4 tokens -> 1 window (duplicated); doc 2 has
    # 6 tokens -> 3 windows, of which exactly one ("a b c d") repeats.
    rows = [
        (1, "s", "a b c d"),
        (2, "s", "x a b c d y"),
    ]
    got = {
        r["doc_id"]: r
        for r in duplicate_span_stats(_docs(spark, rows), k=4).collect()
    }
    assert got[1]["n_windows"] == 1 and got[1]["n_dup_windows"] == 1
    assert got[2]["n_windows"] == 3 and got[2]["n_dup_windows"] == 1


def test_within_document_repeat_is_a_duplicate(spark):
    # "p q r s p q r s": windows of k=4 at positions 1..5; position 1
    # ("p q r s") and position 5 ("p q r s") are the same gram (local
    # multiplicity 2 -> global >= 2), the middle three are unique.
    rows = [(1, "s", "p q r s p q r s")]
    (r,) = duplicate_span_stats(_docs(spark, rows), k=4).collect()
    assert r["n_windows"] == 5
    assert r["n_dup_windows"] == 2


def test_short_documents_are_excluded(spark):
    # a doc with fewer than k tokens has no length-k window at all —
    # it must not appear in the output (mirrors the oracle's len >= k)
    rows = [(1, "s", "too short"), (2, "s", "a b c d e")]
    got = duplicate_span_stats(_docs(spark, rows), k=4).collect()
    assert {r["doc_id"] for r in got} == {2}
    assert got[0]["n_dup_windows"] == 0  # nothing repeats


def test_no_duplicates_yields_zero_fraction(spark):
    rows = [
        (1, "s", "one two three four five"),
        (2, "s", "six seven eight nine ten"),
    ]
    for r in duplicate_span_stats(_docs(spark, rows), k=4).collect():
        assert r["n_dup_windows"] == 0


def test_registered_query_runs_on_testdata(spark, sf_dir):
    from go_web_mapreduce_spark.operators.dedup import q_substring_dedup

    rows = q_substring_dedup(spark, sf_dir).collect()
    assert rows, "documents corpus must yield per-source span stats"
    for r in rows:
        assert 0 <= r["dup_windows"] <= r["windows"]
        assert 0.0 <= r["dup_frac"] <= 1.0
        assert 0.0 <= r["max_doc_dup_frac"] <= 1.0
