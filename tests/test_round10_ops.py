"""Round-10 operators: semantic invariants beyond the oracle hash for the
statistics wave (KMV sketch, HHI, Cramér's V, Kruskal–Wallis, Simpson),
the ML trio (CUPED, feature hashing, Huber), the text pair (Kneser-Ney,
vocab coverage), and session path analysis."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from go_web_mapreduce_spark.operators.analytics import (
    KMV_K,
    KMV_M_DOUBLE,
    q_cramers_v,
    q_hhi,
    q_kmv_distinct,
    q_kruskal_wallis,
    q_simpson_diversity,
)
from go_web_mapreduce_spark.operators.ml import (
    FH_DIM,
    HUBER_DELTA_CENTS,
    q_cuped_adjust,
    q_feature_hashing,
    q_huber_mean,
)
from go_web_mapreduce_spark.operators.temporal import (
    PATH_LEN,
    q_path_analysis,
)
from go_web_mapreduce_spark.operators.text_analysis import (
    q_kneser_ney,
    q_vocab_coverage,
)
from go_web_mapreduce_spark.sources.tables import load_table


def test_kmv_small_groups_fall_back_to_exact(spark, sf_dir):
    """Below k distinct hashes the sketch IS the exact count; at or above
    k the estimate must sit within the k=64 KMV error envelope."""
    rows = {r["event_type"]: r for r in q_kmv_distinct(spark, sf_dir).collect()}
    exact = {
        r["event_type"]: r["d"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        assert r["n_kept"] <= KMV_K
        if r["n_kept"] < KMV_K:
            # hash collisions can only shrink: exact fallback equals the
            # distinct-hash count which is <= distinct users
            assert r["est_distinct"] == float(r["n_kept"])
            assert r["n_kept"] <= exact[et]
        else:
            # k=64 -> relative sd ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
            assert abs(r["est_distinct"] - exact[et]) <= 0.51 * exact[et]
            assert 0 < r["kth_hash"] < KMV_M_DOUBLE


def test_hhi_bounds_and_reciprocal(spark, sf_dir):
    for r in q_hhi(spark, sf_dir).collect():
        n = r["n_suppliers"]
        assert 1.0 / n - 1e-12 <= r["hhi"] <= 1.0 + 1e-12
        assert r["eff_firms"] <= n + 1e-9
        assert math.isclose(r["hhi"] * r["eff_firms"], 1.0, rel_tol=1e-12)


def test_cramers_v_in_unit_interval(spark, sf_dir):
    r = q_cramers_v(spark, sf_dir).collect()[0]
    assert r["dof"] == (r["n_rows"] - 1) * (r["n_cols"] - 1)
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["chi2"] >= 0.0


def test_kruskal_wallis_matches_pandas_midranks(spark, sf_dir):
    """Recompute H from scratch with pandas average ranks — the census
    midrank algebra must agree with the textbook per-row formulation."""
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.round("l_quantity").cast("bigint").alias("q")
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("grp")
    )
    pdf = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select("grp", "q")
        .toPandas()
    )
    pdf["rank"] = pdf["q"].rank(method="average")
    n = len(pdf)
    srn = sum(
        g["rank"].sum() ** 2 / len(g) for _, g in pdf.groupby("grp")
    )
    h_ref = 12.0 * srn / (n * (n + 1)) - 3.0 * (n + 1)
    t = pdf.groupby("q").size()
    tie_ref = 1.0 - float((t**3 - t).sum()) / (n**3 - n)

    r = q_kruskal_wallis(spark, sf_dir).collect()[0]
    assert r["n_total"] == n
    assert math.isclose(r["h"], h_ref, rel_tol=1e-9)
    assert math.isclose(r["tie_c"], tie_ref, rel_tol=1e-12)
    assert math.isclose(r["h_adj"], h_ref / tie_ref, rel_tol=1e-9)


def test_simpson_diversity_invariants(spark, sf_dir):
    for r in q_simpson_diversity(spark, sf_dir).collect():
        if r["n_docs"] < 2:
            # λ divides by N(N−1): undefined for a single-document
            # source, emitted as NULL (round-10 ADVICE guard)
            assert r["simpson"] is None and r["gini_simpson"] is None
            continue
        assert 0.0 <= r["simpson"] <= 1.0
        assert math.isclose(r["simpson"] + r["gini_simpson"], 1.0)
        assert 1.0 - 1e-12 <= r["eff_langs"] <= r["n_langs"] + 1e-9


def test_simpson_diversity_single_doc_source_is_null(spark):
    """Directly exercise the N=1 guard: a one-document source yields
    NULL simpson/gini_simpson (not NaN) while eff_langs stays defined."""
    from go_web_mapreduce_spark.operators.analytics import (
        q_simpson_diversity,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [("solo", "en", "x"), ("multi", "en", "y"), ("multi", "de", "z")],
            "source string, lang string, text string",
        ).write.parquet(f"{d}/documents.parquet")
        rows = {
            r["source"]: r for r in q_simpson_diversity(spark, d).collect()
        }
        assert rows["solo"]["simpson"] is None
        assert rows["solo"]["gini_simpson"] is None
        assert rows["solo"]["eff_langs"] == 1.0
        assert rows["multi"]["simpson"] == 0.0  # 2 docs, 2 langs: λ=0
        assert rows["multi"]["gini_simpson"] == 1.0


def test_cuped_theta_matches_numpy(spark, sf_dir):
    import numpy as np

    from go_web_mapreduce_spark.operators.ml import CUPED_CUTOFF

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ts") < F.lit(CUPED_CUTOFF).cast("timestamp"),
                             F.col("cents"))), F.lit(0)).alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("ts") >= F.lit(CUPED_CUTOFF).cast("timestamp"),
                             F.col("cents"))), F.lit(0)).alias("y"),
        )
        .toPandas()
    )
    x = pu["x"].to_numpy(dtype=float)
    y = pu["y"].to_numpy(dtype=float)
    theta_ref = ((x * y).mean() - x.mean() * y.mean()) / (
        (x * x).mean() - x.mean() ** 2
    )
    rows = q_cuped_adjust(spark, sf_dir).collect()
    assert {r["arm"] for r in rows} == {0, 1}
    for r in rows:
        assert math.isclose(r["theta"], theta_ref, rel_tol=1e-9)
        # the CUPED estimate deviates from the raw mean by theta * the
        # arm's covariate imbalance
        shift = r["mean_post"] - r["cuped_mean"]
        imbalance = r["theta"] * (r["mean_pre"] - x.mean() / 100.0)
        assert math.isclose(shift, imbalance, rel_tol=1e-6, abs_tol=1e-9)


def test_feature_hashing_replicates_md5_kernel(spark, sf_dir):
    rows = q_feature_hashing(spark, sf_dir).collect()
    doc = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") == rows[0]["doc_id"])
        .collect()[0]
    )
    vec = [0] * FH_DIM
    for tok in doc["text"].lower().split(" "):
        if not tok:
            continue
        h = hashlib.md5(f"fh:{tok}".encode()).hexdigest()
        b = int(h[:8], 16) % FH_DIM
        s = 1 if int(h[8], 16) % 2 == 0 else -1
        vec[b] += s
    got = [rows[0][f"f{j:02d}"] for j in range(FH_DIM)]
    assert got == vec


def test_huber_mean_is_between_median_and_mean_pull(spark, sf_dir):
    """Replicate the two IRLS steps in python per brand (float tolerance:
    the engine's decimal-cast sums are exact; numpy's aren't)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pdf = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(F.col("p_brand").alias("brand"), "cents")
        .toPandas()
    )
    out = {r["brand"]: r for r in q_huber_mean(spark, sf_dir).collect()}
    for brand, g in pdf.groupby("brand"):
        x = g["cents"].to_numpy(dtype=float)
        mu = x.mean()
        assert math.isclose(out[brand]["mean_price"], mu / 100, rel_tol=1e-9)
        for _ in range(2):
            dev = abs(x - mu)
            w = [1.0 if d <= HUBER_DELTA_CENTS else HUBER_DELTA_CENTS / d
                 for d in dev]
            mu = sum(wi * xi for wi, xi in zip(w, x)) / sum(w)
        # the engine quantizes each w*x term to decimal(28,6) before the
        # exact sum; the raw-float replication drifts ~1e-6 relative from
        # that quantization, so the tolerance sits above it
        assert math.isclose(out[brand]["huber2"], mu / 100, rel_tol=5e-5)
        assert x.min() <= out[brand]["huber2"] * 100 <= x.max()


def test_kneser_ney_probability_matches_census_recompute(spark, sf_dir):
    rows = q_kneser_ney(spark, sf_dir).collect()
    assert rows, "corpus has bigrams"
    for r in rows:
        # P decomposes as discounted ML + lambda * continuation
        d = 0.75
        p_ref = (r["c"] - d) / r["cw1"] + (d * r["n1fw"] / r["cw1"]) * (
            r["n1pw"] / r["n_types"]
        )
        assert math.isclose(r["p_kn"], p_ref, rel_tol=1e-12)
        assert 0.0 < r["p_kn"] <= 1.0
    counts = [r["c"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_vocab_coverage_bounds(spark, sf_dir):
    rows = q_vocab_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["in_vocab"] <= r["n_tokens"]
        assert math.isclose(
            r["coverage"], r["in_vocab"] / r["n_tokens"], rel_tol=1e-12
        )
        if r["in_vocab"] < r["n_tokens"]:
            assert r["oov_types"] > 0


def test_path_analysis_paths_are_full_length(spark, sf_dir):
    rows = q_path_analysis(spark, sf_dir).collect()
    assert rows
    ns = [r["n_sessions"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert len(r["path"].split(">")) == PATH_LEN
        assert r["n_sessions"] >= 1


def test_ivfpq_scaled_is_exact_when_shortlist_covers_corpus(spark, sf_dir):
    """The 200k-vector knobs (nprobe=32=C exhaustive coarse pass,
    shortlist 4000 >= corpus here) must degenerate to the exact cosine
    top-k on small corpora — recall 1.0 by construction, pinning that
    the scale config loses nothing when over-provisioned."""
    from go_web_mapreduce_spark.operators.similarity import (
        TOP_K,
        cosine_topk,
        q_similarity_ivfpq_scaled,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0)
    exact = {r["vec_id"] for r in cosine_topk(emb, probe, TOP_K).collect()}
    got = {r["vec_id"] for r in q_similarity_ivfpq_scaled(spark, sf_dir).collect()}
    assert got == exact
