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
