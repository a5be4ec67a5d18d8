"""Count-min sketch heavy hitters (q_heavy_hitters_cms).

Pins the two CM-sketch invariants the 100 TB story rests on:
overestimate-only estimates, and cell-wise mergeability of shard sketches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_web_mapreduce_spark.functions.hashing import md5_bucket
from go_web_mapreduce_spark.functions.text import tokens
from go_web_mapreduce_spark.operators.analytics import (
    CMS_DEPTH,
    CMS_TOPK,
    CMS_WIDTH,
    q_heavy_hitters_cms,
)
from go_web_mapreduce_spark.sources.tables import load_table


def test_cms_estimates_never_underestimate(spark, sf_dir):
    rows = q_heavy_hitters_cms(spark, sf_dir).collect()
    assert len(rows) == CMS_TOPK
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"], r


def _sketch(df):
    """d x w counter cells of a (w, c) word-count frame, as a dict."""
    out = {}
    for j in range(CMS_DEPTH):
        got = (
            df.select(md5_bucket(F.col("w"), CMS_WIDTH, salt=j).alias("b"), "c")
            .groupBy("b")
            .agg(F.sum("c").alias("cnt"))
            .collect()
        )
        for r in got:
            out[(j, r["b"])] = r["cnt"]
    return out


def test_cms_shard_sketches_merge_by_cellwise_sum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    whole = _sketch(wc)

    # shard the corpus by doc_id parity, sketch each shard independently
    def shard_wc(pred):
        return (
            docs.filter(pred)
            .select(F.explode(tokens("text")).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    even = _sketch(shard_wc(F.col("doc_id") % 2 == 0))
    odd = _sketch(shard_wc(F.col("doc_id") % 2 == 1))
    merged = dict(even)
    for k, v in odd.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole
