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
