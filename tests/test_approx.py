"""Approximate aggregates must stay within their advertised error of the
exact answers (the oracle can't hash-check sketches, so accuracy is asserted
here — SURVEY.md §5 adopted pattern 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_web_mapreduce_spark.operators.relational import q_approx_distinct
from go_web_mapreduce_spark.sources.tables import load_table


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    got = {r["l_returnflag"]: r["approx_orders"] for r in q_approx_distinct(spark, sf_dir).collect()}
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, approx in got.items():
        assert abs(approx - exact[k]) <= max(0.1 * exact[k], 5), (k, approx, exact[k])


def test_approx_percentiles_ordered_and_bounded(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    for r in q_approx_distinct(spark, sf_dir).collect():
        p50, p95 = r["price_p50"], r["price_p95"]
        assert bounds[0] <= p50 <= p95 <= bounds[1]


def test_gated_sample_equals_ungated_bottom_k(spark, sf_dir):
    """The count-adaptive hash gate in q_approx_distinct must be invisible
    to the result: bottom-1024-by-md5 of the gated survivor set equals
    bottom-1024 of all rows (the gate keeps ~16k expected survivors per
    group, so losing a bottom-1024 member is a ~40-sigma binomial event)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        "l_returnflag",
        F.md5(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit(":"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("k"),
    )
    gates = li.groupBy("l_returnflag").agg(
        F.expr(
            f"CASE WHEN count(*) <= {16 * 1024} THEN CAST({1 << 60} AS BIGINT) "
            f"ELSE (CAST({1 << 60} AS BIGINT) div count(*)) * {16 * 1024} END"
        ).alias("gate")
    )
    w = W.partitionBy("l_returnflag").orderBy("k")

    def bottom_k(df):
        return {
            (r["l_returnflag"], r["k"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 1024)
            .collect()
        }

    ungated = bottom_k(keyed)
    gated = bottom_k(
        keyed.join(F.broadcast(gates), "l_returnflag").filter(
            F.conv(F.substring("k", 1, 15), 16, 10).cast("long") < F.col("gate")
        ).select("l_returnflag", "k")
    )
    assert gated == ungated


def _native_vs_portable_vs_exact(spark, sf_dir, tol):
    """Shared pin: the registry's only oracle-less entry
    (q_approx_distinct_native, Spark HLL++) must land within ``tol`` of
    exact distinct per group, and within the same band as the
    hash-verified portable HLL — the three-way accuracy triangle."""
    from go_web_mapreduce_spark.operators.relational import (
        q_approx_distinct_native,
    )

    native = {
        r["l_returnflag"]: r
        for r in q_approx_distinct_native(spark, sf_dir).collect()
    }
    portable = {
        r["l_returnflag"]: r["approx_orders"]
        for r in q_approx_distinct(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    bounds = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    assert set(native) == set(exact) == set(portable)
    for k, r in native.items():
        assert abs(r["approx_orders"] - exact[k]) <= max(tol * exact[k], 5), (
            k, r["approx_orders"], exact[k],
        )
        assert abs(portable[k] - exact[k]) <= max(tol * exact[k], 5)
        assert bounds[0] <= r["price_p50"] <= r["price_p95"] <= bounds[1]
        assert r["n"] > 0


def test_approx_distinct_native_pinned_vs_exact(spark, sf_dir):
    # HLL++ at rsd=0.016 → 5-sigma ≈ 8%; small groups take the absolute-5
    # floor in the shared helper
    _native_vs_portable_vs_exact(spark, sf_dir, 0.08)


def test_approx_distinct_native_pinned_at_sf1(spark):
    """The sf1 extension of the pin (round-8 verdict task): distinct
    cardinalities here are ~375k per returnflag group, far past HLL's
    linear-counting regime, so this asserts the true large-n accuracy of
    both estimators. Runs only when the scratch sf1 corpus exists
    (tools/make_scale_corpus.py --copies 10)."""
    import os

    import pytest as _pytest

    sf1 = "/tmp/spark_graft_sf1"
    if not os.path.exists(f"{sf1}/lineitem.parquet"):
        _pytest.skip("sf1 scratch corpus not generated")
    # rsd=0.016 and m=4096 portable HLL (~1.6%): 3% is ~2 sigma for both
    _native_vs_portable_vs_exact(spark, sf1, 0.03)
