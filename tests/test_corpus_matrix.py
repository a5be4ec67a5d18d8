"""Planted fixtures for q_ngram_diversity and q_source_overlap."""

from __future__ import annotations

from go_web_mapreduce_spark.operators.dedup import q_source_overlap
from go_web_mapreduce_spark.operators.text_analysis import q_ngram_diversity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _write(spark, tmp_path, rows):
    # the registered queries take sf_dir — materialize a tiny documents table
    d = str(tmp_path)
    _docs(spark, rows).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_diversity_repetitive_source_scores_lower(spark, tmp_path):
    rows = [
        # src_rep: one phrase repeated -> low trigram diversity
        (1, "src_rep", "the cat sat the cat sat the cat sat"),
        # src_div: every trigram unique
        (2, "src_div", "alpha beta gamma delta epsilon zeta eta theta iota"),
    ]
    got = {
        r["source"]: r
        for r in q_ngram_diversity(spark, _write(spark, tmp_path, rows)).collect()
    }
    rep, div = got["src_rep"], got["src_div"]
    # src_rep: 9 tokens, 3 distinct; 7 trigram windows, 3 distinct
    assert rep["n_tokens"] == 9 and rep["n_distinct_tokens"] == 3
    assert rep["n_trigrams"] == 7 and rep["n_distinct_trigrams"] == 3
    # src_div: all distinct at both granularities
    assert div["unigram_ttr"] == 1.0 and div["trigram_ttr"] == 1.0
    assert rep["trigram_ttr"] < div["trigram_ttr"]


def test_source_overlap_counts_shared_grams(spark, tmp_path):
    shared = "one two three four five"  # exactly one 5-gram
    rows = [
        (1, "sa", shared + " alpha beta gamma delta epsilon"),
        (2, "sb", shared + " zeta eta theta iota kappa"),
        (3, "sc", "totally different words in this document here"),
    ]
    got = q_source_overlap(spark, _write(spark, tmp_path, rows)).collect()
    pairs = {(r["src_a"], r["src_b"]): r for r in got}
    # sa and sb share the grams of the common prefix sliding into their
    # suffixes only at the prefix itself: windows fully inside `shared`
    # = 1; windows straddling prefix+suffix differ between sa and sb
    assert ("sa", "sb") in pairs
    assert pairs[("sa", "sb")]["n_shared"] == 1
    # each doc has 6 distinct 5-grams (10 tokens -> 6 windows, all distinct)
    assert pairs[("sa", "sb")]["containment"] == 1.0 / 6.0
    # sc shares nothing -> no row with sc at all
    assert not any("sc" in p for p in pairs)


def test_source_overlap_is_symmetric_ordered(spark, tmp_path):
    rows = [
        (1, "zz", "one two three four five six"),
        (2, "aa", "one two three four five seven"),
    ]
    got = q_source_overlap(spark, _write(spark, tmp_path, rows)).collect()
    assert len(got) == 1
    (r,) = got
    # pair is emitted once, lexicographically ordered
    assert (r["src_a"], r["src_b"]) == ("aa", "zz")
    assert r["n_shared"] == 1  # "one two three four five"
