"""int8 scalar quantization (q_embed_quantize) — error-bound fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_web_mapreduce_spark.operators.similarity import (
    INT8_LEVELS,
    int8_maxabs,
    int8_quantize_error,
    q_embed_quantize,
)
from go_web_mapreduce_spark.sources.tables import load_table


def _err(spark, vec):
    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    staged = df.select(
        "embedding",
        (int8_maxabs(F.col("embedding")) / F.lit(INT8_LEVELS)).alias("scale"),
    )
    return staged.select(
        int8_quantize_error(F.col("embedding"), F.col("scale")).alias("e")
    ).first()["e"]


def test_exactly_representable_vectors_have_zero_error(spark):
    # maxabs = 127 -> scale = 1.0 -> every integer component is a code
    assert _err(spark, [127.0, -127.0, 0.0, 64.0]) == 0.0


def test_zero_vector_guard(spark):
    assert _err(spark, [0.0, 0.0, 0.0]) == 0.0


def test_per_dim_error_bounded_by_half_scale(spark):
    # |reconstruction error| <= scale/2 per dimension, so the squared sum
    # over d dims is <= d * (maxabs/254)^2
    vec = [3.14159, -2.71828, 1.41421, -0.57722, 2.23607, -1.61803]
    maxabs = max(abs(v) for v in vec)
    bound = len(vec) * (maxabs / 254.0) ** 2
    assert 0.0 < _err(spark, vec) <= bound * 1.0001


def test_registered_query_mse_within_bound(spark, sf_dir):
    # every per-label max MSE must respect the per-vector bound
    # (maxabs/254)^2 with maxabs <= global max component magnitude
    emb = load_table(spark, sf_dir, "embeddings")
    gmax = emb.select(
        F.max(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda a, v: F.greatest(a, F.abs(v.cast("double"))),
            )
        ).alias("m")
    ).first()["m"]
    for r in q_embed_quantize(spark, sf_dir).collect():
        assert 0.0 <= r["avg_mse"] <= r["max_mse"] <= (gmax / 254.0) ** 2 * 1.0001
