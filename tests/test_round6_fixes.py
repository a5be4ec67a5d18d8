"""Round-6 changes:

1. The IVF/PQ family's training became engine-portable (md5 sample key,
   first-k init) so the four previously rows-only ANN queries now carry
   FULL DuckDB oracles — pinned here structurally (registry has SQL) and
   behaviorally (training layout-insensitive; knn scores fold-exact).
2. knn_graph_ivf gained index_shards (bounds packed-row size at scale)
   which must not change results.
3. registry: variant_of must resolve to a registered query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_web_mapreduce_spark.sources.tables import load_table


def test_ann_family_has_full_oracles():
    from go_web_mapreduce_spark.queries import REGISTRY

    for name in (
        "q_similarity_ivf",
        "q_similarity_pq",
        "q_similarity_ivfpq",
        "q_knn_graph_ivf",
    ):
        spec = REGISTRY[name]
        assert spec.oracle is not None, f"{name} regressed to rows-only"
        assert "md5(CAST(id AS VARCHAR))" in spec.oracle  # replayed training


def test_ivf_assign_is_layout_insensitive(spark, sf_dir):
    """Centroids are a pure function of content: any partitioning of the
    same rows must train the identical quantizer (the pq_train discipline,
    now via the engine-portable md5 sample key)."""
    from go_web_mapreduce_spark.operators.similarity import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    _, a = ivf_assign(emb, train_sample_cap=200)
    _, b = ivf_assign(emb.repartition(13), train_sample_cap=200)
    assert a == b


def test_knn_graph_ivf_sharding_is_result_invariant(spark, sf_dir):
    """index_shards only bounds packed-row size; the graph must be
    identical for any shard count (each neighbor still arises from exactly
    one (list, shard) block)."""
    from go_web_mapreduce_spark.operators.similarity import knn_graph_ivf

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 300
    )
    base = sorted(tuple(r) for r in knn_graph_ivf(emb).collect())
    sharded = sorted(
        tuple(r) for r in knn_graph_ivf(emb, index_shards=4).collect()
    )
    assert sharded == base


def test_variant_of_must_resolve():
    import importlib

    from go_web_mapreduce_spark import queries as q
    from go_web_mapreduce_spark.registry import REGISTRY, QuerySpec

    bad = QuerySpec(
        name="q___bogus_variant",
        fn=lambda spark, sf_dir: None,
        oracle=None,
        description="test fixture",
        variant_of="q___no_such_query",
    )
    REGISTRY[bad.name] = bad
    try:
        with pytest.raises(ValueError, match="does not resolve"):
            importlib.reload(q)
    finally:
        del REGISTRY[bad.name]
        importlib.reload(q)


def test_simhash_wide_finds_verbatim_and_is_complete(spark):
    """The 120-bit variant's design point: every verbatim duplicate is
    found at dist 0, and banding loses nothing vs a brute-force hamming
    check over the same wide fingerprints (pigeonhole completeness)."""
    from go_web_mapreduce_spark.functions.hashing import (
        simhash_wide_from_tokens_arrow,
    )
    from go_web_mapreduce_spark.functions.text import tokens
    from go_web_mapreduce_spark.operators.dedup import (
        SIMHASH_MAX_DIST,
        simhash_pairs_wide,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # verbatim dup of 1
        (3, "alpha beta gamma delta epsilon zeta"),   # and another
        (4, "totally different words entirely here now"),
        (5, "unrelated content again quite different text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["dist"]
        for r in simhash_pairs_wide(docs).collect()
    }
    assert got[(1, 2)] == 0 and got[(1, 3)] == 0 and got[(2, 3)] == 0

    # brute-force over the same wide fingerprints == the banded result
    sig = {
        r["doc_id"]: (r["sw"]["lo"], r["sw"]["hi"])
        for r in docs.select(
            "doc_id", simhash_wide_from_tokens_arrow(tokens("text")).alias("sw")
        ).collect()
    }
    brute = {}
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(sig[a][0] ^ sig[b][0]).count("1") + bin(
                sig[a][1] ^ sig[b][1]
            ).count("1")
            if d <= SIMHASH_MAX_DIST:
                brute[(a, b)] = d
    assert got == brute


def test_simhash_wide_registered_as_variant():
    from go_web_mapreduce_spark.queries import REGISTRY

    spec = REGISTRY["q_dedup_simhash_wide"]
    assert spec.variant_of == "q_dedup_simhash"
    assert spec.oracle is not None


def test_rank_fusion_is_self_consistent(spark, sf_dir):
    """RRF invariants: every fused score is exactly the reciprocal-rank sum
    of the ranks the row itself reports; ranks are within leg depth; output
    is descending; and an item retrieved by BOTH legs outranks one with the
    same single-leg rank (the fusion actually fuses)."""
    from go_web_mapreduce_spark.operators.similarity import (
        RRF_K,
        RRF_LEG_N,
        RRF_TOP,
        q_rank_fusion,
    )

    rows = q_rank_fusion(spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOP
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    both = 0
    for r in rows:
        lex, vec = r["lex_rank"], r["vec_rank"]
        assert 0 <= lex <= RRF_LEG_N and 0 <= vec <= RRF_LEG_N
        assert lex > 0 or vec > 0
        want = (1.0 / (RRF_K + lex) if lex else 0.0) + (
            1.0 / (RRF_K + vec) if vec else 0.0
        )
        assert r["rrf_score"] == want, (r, want)
        if lex and vec:
            both += 1
    # the head of the fused list should be dominated by dual-leg items
    assert both >= 1
