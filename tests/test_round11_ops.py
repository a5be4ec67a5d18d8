"""Round-11 operators: incremental MinHash dedup (batch vs persisted LSH
index) and the cross-encoder-style rerank stage. Oracle parity is covered
by check_oracle / the driver; these tests pin SEMANTICS on constructed
corpora where the right answer is known by hand."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from go_web_mapreduce_spark.operators.dedup import (
    q_dedup_incremental,
    q_dedup_incremental_minhash,
)
from go_web_mapreduce_spark.operators.similarity import (
    RRF_TOP,
    q_cross_rerank,
    q_rank_fusion,
)


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, source string, lang string, text string"
    ).write.parquet(f"{d}/documents.parquet")


def test_incremental_minhash_classifies_constructed_batch(spark):
    """doc_ids 0..9, cut = 8: docs 8 (verbatim copy of doc 3) and 9
    (near-dup of doc 4 — one word changed out of 12) must flag as
    near-dups of the seen corpus; doc 10 is... not present — and the
    novel doc 9b (disjoint text) must count as novel."""
    base4 = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank today"
    )
    rows = [
        (i, "src_a", "en", f"seen document number {i} with shared filler "
         f"words plus unique token u{i} for good measure")
        for i in range(3)
    ] + [
        (3, "src_a", "en", "alpha beta gamma delta epsilon zeta eta theta "
         "iota kappa lambda mu"),
        (4, "src_a", "en", base4),
        (5, "src_b", "en", "completely different seen text about parquet "
         "files and shuffle partitions in spark"),
        (6, "src_b", "en", "yet another seen document discussing broadcast "
         "joins and adaptive query execution"),
        (7, "src_b", "en", "final seen row mentioning watermarks state "
         "stores and checkpoint recovery paths"),
        # batch (doc_id >= 8): one verbatim copy, one near-dup, one novel
        (8, "src_a", "en", "alpha beta gamma delta epsilon zeta eta theta "
         "iota kappa lambda mu"),
        (9, "src_a", "en", base4.replace("today", "tonight")),
        (10, "src_b", "en", "entirely novel ingest content speaking of "
         "submarines zeppelins and accordion music"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, rows)
        # cut = 0 + floor(11 * 0.8) = 8 → seen 0..7, new 8..10
        out = {
            r["source"]: r
            for r in q_dedup_incremental_minhash(spark, d).collect()
        }
        assert out["src_a"]["n_new"] == 2
        assert out["src_a"]["n_neardup_of_seen"] == 2  # copy + near-dup
        assert out["src_a"]["n_novel"] == 0
        assert out["src_b"]["n_new"] == 1
        assert out["src_b"]["n_neardup_of_seen"] == 0
        assert out["src_b"]["n_novel"] == 1

        # the exact-hash twin sees only the verbatim copy — MinHash must
        # dominate it (near-dup recall is the point of the LSH variant)
        exact = {
            r["source"]: r for r in q_dedup_incremental(spark, d).collect()
        }
        assert exact["src_a"]["n_dup_of_seen"] == 1
        assert (
            out["src_a"]["n_neardup_of_seen"]
            > exact["src_a"]["n_dup_of_seen"]
        )


def test_incremental_minhash_totals_consistent(spark, sf_dir):
    for r in q_dedup_incremental_minhash(spark, sf_dir).collect():
        assert r["n_new"] == r["n_neardup_of_seen"] + r["n_novel"]
        assert r["n_neardup_of_seen"] >= 0 and r["n_novel"] >= 0


def test_cross_rerank_is_a_rescoring_permutation(spark, sf_dir):
    """The rerank stage must keep exactly the fused candidate set (no
    retrieval happens after fusion) and rank it by the fixed-weight
    interaction score, ties by item_id."""
    fused = q_rank_fusion(spark, sf_dir).collect()
    rer = q_cross_rerank(spark, sf_dir).collect()
    assert {r["item_id"] for r in rer} == {r["item_id"] for r in fused}
    assert len(rer) == min(RRF_TOP, len(fused))
    assert sorted(r["rerank"] for r in rer) == list(range(1, len(rer) + 1))
    ordered = sorted(rer, key=lambda r: r["rerank"])
    for a, b in zip(ordered, ordered[1:]):
        assert (a["cross_score"], -a["item_id"]) >= (
            b["cross_score"],
            -b["item_id"],
        )
    for r in rer:
        assert 0.0 <= r["term_coverage"] <= 1.0
        assert r["tf_norm"] >= 0.0
        # fixed-weight fold: recompute driver-side
        expect = (0.6 * r["cos_sim"] + 0.3 * r["term_coverage"]) + (
            0.1 * r["tf_norm"]
        )
        assert expect == r["cross_score"]


def test_session_append_emits_exactly_the_closed_sessions(spark, sf_dir):
    """Append mode must emit a strict watermark-bounded SUBSET of the
    complete-mode final sessions: every emitted session's end (last
    event + 30 min gap) is <= final watermark (max ts, ms floor, - 2 h),
    every closed session IS emitted, and emitted rows match the
    complete-mode rows exactly (same session, same aggregate values)."""
    from go_web_mapreduce_spark.sources.tables import load_table
    from go_web_mapreduce_spark.streaming.events import (
        q_stream_session_append,
        q_stream_session_window,
    )

    comp = {
        (r["user_id"], r["start_us"]): (r["n_events"], r["span_us"])
        for r in q_stream_session_window(spark, sf_dir).collect()
    }
    app = {
        (r["user_id"], r["start_us"]): (r["n_events"], r["span_us"])
        for r in q_stream_session_append(spark, sf_dir).collect()
    }
    assert set(app) <= set(comp)
    for k, v in app.items():
        assert comp[k] == v
    ev = load_table(spark, sf_dir, "events")
    max_us = ev.agg(
        F.max(F.expr("ts_ns div 1000")).alias("m")
    ).first()["m"]
    wm_us = (max_us // 1000 - 7_200_000) * 1000
    gap_us = 30 * 60 * 1_000_000
    closed = {
        k for k, (n, span) in comp.items() if k[1] + span + gap_us <= wm_us
    }
    assert set(app) == closed
    assert 0 < len(app) < len(comp)  # tail sessions stay open in state


def test_cross_rerank_touches_only_candidate_rows(spark, sf_dir):
    """Scale shape: the per-candidate feature joins must be broadcast
    hash joins (candidate side broadcast into the corpus scans) — the
    corpus must never shuffle for the rerank stage."""
    plan = q_cross_rerank(spark, sf_dir)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan
