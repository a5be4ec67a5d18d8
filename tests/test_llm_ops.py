"""Semantic invariants for the round-4 LLM-pipeline additions: sequence
packing, eval-set decontamination, and LM-rarity (perplexity-shape)
filtering. Cross-engine value equality is covered by test_oracle_parity;
these tests pin the properties the oracle can't express — conservation
laws, flag consistency, and the plan shapes that make them scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_web_mapreduce_spark.operators.dedup import DECON_MOD
from go_web_mapreduce_spark.operators.pipeline_ops import (
    SEQ_PACK_CAP,
    q_sequence_pack,
)
from go_web_mapreduce_spark.operators.text_analysis import (
    PPL_FLAG_MULT,
    q_perplexity_filter,
)
from go_web_mapreduce_spark.queries import REGISTRY
from go_web_mapreduce_spark.sources.tables import load_table
from go_web_mapreduce_spark.functions.text import tokens

from test_plans import executed_plan


def test_sequence_pack_conserves_tokens_and_docs(spark, sf_dir):
    """Packing must lose nothing: per source, bin doc counts and token
    masses sum to the shard's totals, and bins are numbered 0..max with no
    gaps (concat-and-split leaves no empty window behind a full one)."""
    packed = q_sequence_pack(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        r["source"]: (r["n"], r["toks"])
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(tokens("text"))).alias("toks"),
        )
        .collect()
    }
    by_src: dict[str, list] = {}
    for r in packed:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == set(truth)
    for src, rows in by_src.items():
        assert sum(r["n_docs"] for r in rows) == truth[src][0]
        assert sum(r["bin_tokens"] for r in rows) == truth[src][1]
        bins = sorted(r["bin"] for r in rows)
        assert bins == list(range(len(bins)))  # contiguous from 0


def test_sequence_pack_bins_are_ordered_id_ranges(spark, sf_dir):
    """Docs are packed in doc_id order, so bins partition each shard's id
    space into non-overlapping ascending ranges, and every bin a doc STARTS
    in was reachable (its start offset < bin boundary + cap)."""
    packed = q_sequence_pack(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in packed:
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r["bin"])
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] < b["first_doc"]
        # every non-final bin must carry at least cap's worth of progress:
        # the NEXT bin exists only because the running offset crossed its
        # boundary, so cumulative tokens through bin i >= (i+1) * cap
        # minus the final doc's spill; weaker but layout-free: cumulative
        # tokens strictly increase per bin
        cum = 0
        for r in rows[:-1]:
            cum += r["bin_tokens"]
            assert cum >= (r["bin"] + 1) * SEQ_PACK_CAP - SEQ_PACK_CAP


def test_decontaminate_counts_and_eval_exclusion(spark, sf_dir):
    out = {r["source"]: r for r in REGISTRY["q_decontaminate"].fn(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    train_truth = {
        r["source"]: r["n"]
        for r in docs.filter(F.col("doc_id") % DECON_MOD != 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {s: r["n_train"] for s, r in out.items()} == train_truth
    for r in out.values():
        assert 0 <= r["n_contaminated"] <= r["n_train"]
    # the synthetic corpus genuinely contains contamination at k=4
    assert sum(r["n_contaminated"] for r in out.values()) > 0


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The eval shingle set must broadcast: at 100 TB the train side can
    never be shuffled for this check."""
    plan = executed_plan(spark, sf_dir, "q_decontaminate")
    assert "BroadcastHashJoin" in plan


def test_perplexity_filter_flag_consistency(spark, sf_dir):
    rows = q_perplexity_filter(spark, sf_dir).collect()
    assert len(rows) > 0
    flagged = 0
    for r in rows:
        assert 0 <= r["n_rare"] <= r["n_bigrams"]
        assert r["flagged"] == (PPL_FLAG_MULT * r["n_rare"] > r["n_bigrams"])
        assert abs(r["rare_frac"] - r["n_rare"] / r["n_bigrams"]) == 0.0
        flagged += bool(r["flagged"])
    # thresholds are calibrated to split the corpus, not rubber-stamp it
    assert 0 < flagged < len(rows)


def test_bpe_merge_step_mass_and_shape(spark, sf_dir):
    from go_web_mapreduce_spark.operators.text_analysis import (
        BPE_TOP,
        q_bpe_merge_step,
    )

    rows = q_bpe_merge_step(spark, sf_dir).collect()
    assert len(rows) == BPE_TOP
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)
    # total pair mass identity: sum over words of wf * (len - 1)
    docs = load_table(spark, sf_dir, "documents")
    total = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter(F.length("w") >= 2)
        .select((F.length("w") - 1).alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    # the top-20 mass can't exceed the corpus pair mass
    assert sum(cnts) <= total


def test_embedding_centroids_shape_and_bounds(spark, sf_dir):
    from go_web_mapreduce_spark.operators.ml import q_embedding_centroids

    rows = q_embedding_centroids(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    label_counts = {
        r["label"]: r["n"]
        for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(rows) == dim * len(label_counts)
    lo, hi = (
        emb.select(F.explode("embedding").alias("v"))
        .agg(F.min("v"), F.max("v"))
        .collect()[0]
    )
    for r in rows:
        assert r["n"] == label_counts[r["label"]]
        assert lo - 1e-9 <= r["centroid"] <= hi + 1e-9


def test_corpus_pipeline_funnel_monotonicity(spark, sf_dir):
    """The funnel can only narrow: n_train >= n_quality >= n_unique >=
    n_clean per source, retention consistent, and bins cover clean
    tokens at exactly ceil(tokens/cap)."""
    import math

    from go_web_mapreduce_spark.operators.pipeline_ops import (
        CP_BIN_CAP,
        q_corpus_pipeline,
    )

    rows = q_corpus_pipeline(spark, sf_dir).collect()
    assert rows
    narrowed = False
    for r in rows:
        assert r["n_train"] >= r["n_quality"] >= r["n_unique"] >= r["n_clean"]
        assert r["n_bins"] == math.ceil(r["clean_tokens"] / CP_BIN_CAP)
        assert abs(r["retention"] - r["n_clean"] / r["n_train"]) == 0.0
        if r["n_clean"] < r["n_train"]:
            narrowed = True
    assert narrowed  # the gates genuinely drop documents on this corpus
