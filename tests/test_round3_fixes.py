"""Regression tests for the round-3 fixes (VERDICT/ADVICE r02): pmod bucket
addressing in the native dispatcher, NULL-token Arrow kernels, contiguous
input_len chunking, the driver-collect-free all-pairs embedding dedup,
sample-trained + persisted IVF, and connected-components convergence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_web_mapreduce_spark.core import (
    submit_algorithm,
    submit_algorithm_native,
)


def test_native_dispatcher_pmod_matches_python_path(spark):
    """A pi_expr that goes negative under Spark's sign-of-dividend `%`
    (``hash(value) % 4``) must address the same [0, n) buckets as the
    Python-compat path, or the same algorithm groups (pi, key) differently
    across the two dispatchers (ADVICE r02 medium)."""
    rows = [(str(i), w) for i, w in enumerate(["ax", "by", "cz", "ax", "by", "ax"])]
    df = spark.createDataFrame(rows, "key string, value string")

    native = submit_algorithm_native(
        df,
        pi_expr="hash(value) % 4",  # negative for some inputs under Spark %
        key_expr="value",
        value_expr="'1'",
        reduce_expr="cast(size(values) as string)",
        num_partitions=4,
    )
    compat = submit_algorithm(
        map_fn=lambda k, v: (hash(v), v, "1"),  # int(pi) % 4 wraps to [0, 4)
        reduce_fn=lambda k, vs: str(len(vs)),
        input_df=df,
        input_len=2,
        num_partitions=4,
    )
    got_n = sorted((r["key"], r["value"]) for r in native.collect())
    got_c = sorted((r["key"], r["value"]) for r in compat.collect())
    # counts per word are partition-layout-independent; both must agree and
    # neither may have split a key group across a negative/positive pi pair
    assert got_n == [("ax", "3"), ("by", "2"), ("cz", "1")]
    assert got_c == got_n
    # and the native pi column itself stays in range
    mapped = df.select(
        F.pmod(F.expr("hash(value) % 4").cast("bigint"), F.lit(4)).alias("pi")
    )
    assert mapped.filter((F.col("pi") < 0) | (F.col("pi") >= 4)).count() == 0


def test_contiguous_chunks_match_reference_slicing(spark):
    """contiguous_chunks=True must give map job i exactly rows
    [i*input_len, min((i+1)*input_len, N)) in input order — the reference's
    ragged slicing (algorithm/algorithm.go:91-103). The map UDF is made
    chunk-sensitive on purpose: it emits the set of row keys each physical
    chunk saw."""
    n, input_len = 10, 4  # chunks: [0..3], [4..7], [8..9] — ragged tail
    rows = [(str(i), f"w{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "key string, value string").coalesce(1)

    out = submit_algorithm(
        # key = the row's own key, value = constant; reduce returns the
        # sorted keys seen in the group — chunk membership is observable
        # through pi because map assigns pi from the first key in the chunk
        map_fn=lambda k, v: (0, k, v),
        reduce_fn=lambda k, vs: ",".join(sorted(vs)),
        input_df=df,
        input_len=input_len,
        num_partitions=1,
        contiguous_chunks=True,
    )
    assert out.count() == n  # 1→1 map, per-key reduce

    # direct check of the physical slicing: run the chunker and record which
    # physical partition each row landed in
    from go_web_mapreduce_spark.core import _contiguous_chunks

    chunked = _contiguous_chunks(df.select("key", "value"), input_len, 3)
    per_part = chunked.select(
        F.spark_partition_id().alias("p"), F.col("key").cast("int").alias("i")
    ).collect()
    got = {}
    for r in per_part:
        got.setdefault(r["p"], set()).add(r["i"])
    assert got == {0: {0, 1, 2, 3}, 1: {4, 5, 6, 7}, 2: {8, 9}}


def test_arrow_kernels_propagate_null_tokens(spark):
    """A single null-text document must degrade to NULL like the Column
    formulations, not crash the Python worker (ADVICE r02)."""
    from go_web_mapreduce_spark.functions.hashing import (
        minhash_sig_arrow,
        simhash_from_tokens_arrow,
    )
    from go_web_mapreduce_spark.functions.text import distinct_shingles_arrow

    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, None), (3, [])],
        "doc_id bigint, toks array<string>",
    )
    out = df.select(
        "doc_id",
        distinct_shingles_arrow(F.col("toks")).alias("sh"),
        simhash_from_tokens_arrow(F.col("toks")).alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["sh"] is None and by_id[2]["fp"] is None
    assert by_id[1]["sh"] is not None and by_id[1]["fp"] is not None

    sig = df.select(
        "doc_id",
        minhash_sig_arrow(distinct_shingles_arrow(F.col("toks")), 16).alias("sig"),
    ).collect()
    by_id = {r["doc_id"]: r["sig"] for r in sig}
    assert by_id[2] is None
    assert by_id[1] is not None and len(by_id[1]) > 0


def test_embedding_near_dup_no_driver_collect(spark):
    """The all-pairs kernel must produce the same pairs as a per-pair exact
    computation, with NO driver-side corpus materialization: the plan is a
    pack → equi-join → mapInPandas pipeline (VERDICT r02 #1). Correct pairs
    + absence of any collect() in the implementation path is asserted by
    running on a corpus whose pairs are known."""
    import inspect

    from go_web_mapreduce_spark.operators import similarity
    from go_web_mapreduce_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    # source-level guard: no .collect( inside the operator
    src = inspect.getsource(similarity.embedding_near_dup_pairs)
    assert ".collect(" not in src and "broadcast(" not in src

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.01, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.98, 0.2]),  # near-dup of 3
        (5, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = sorted(
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.9).collect()
    )
    assert got == [(1, 2), (3, 4)]
    # every unordered pair is considered exactly once even across blocks
    all_pairs = embedding_near_dup_pairs(emb, threshold=-1.0, num_blocks=3)
    assert all_pairs.count() == 10  # C(5,2)
    assert all_pairs.distinct().count() == 10


def test_ivf_sample_training_and_persist(spark, sf_dir, tmp_path):
    """The quantizer must train on a capped sample (VERDICT r02 #2) and the
    persisted index must partition by cid so nprobe search prunes."""
    from go_web_mapreduce_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_persist,
        ivf_topk_persisted,
    )
    from go_web_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # cap below corpus size → sampling path exercised; every vector still
    # assigned exactly once by the map-side transform
    assigned, centroids = ivf_assign(emb, train_sample_cap=max(10, n // 2))
    assert assigned.count() == n
    assert len(centroids) > 0

    path = str(tmp_path / "ivf_index")
    ivf_persist(assigned, centroids, path)
    # the vectors directory is physically partitioned by cid
    import os

    subdirs = [d for d in os.listdir(f"{path}/vectors") if d.startswith("cid=")]
    assert len(subdirs) >= 2

    probe = emb.filter(F.col("vec_id") == 0)
    approx = ivf_topk_persisted(spark, path, probe, k=10)
    exact = {r["vec_id"] for r in cosine_topk(emb, probe, 10).collect()}
    got = {r["vec_id"] for r in approx.collect()}
    assert len(got) == 10
    assert len(exact & got) > 0  # finds at least the probe's neighborhood


def test_connected_components_raises_on_non_convergence(spark):
    """Non-convergence must still fail loudly, never return wrong roots
    silently (ADVICE r02). Since round 4, label propagation hands deep
    chains off to the large-star/small-star variant
    (tests/test_round4_fixes.py), so the loud-failure contract now lives on
    that variant's own max_iter exhaustion."""
    from go_web_mapreduce_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(8)]  # path graph, diameter 8
    edges = spark.createDataFrame(chain, "doc_a bigint, doc_b bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(edges, max_iter=1)
    ok = connected_components(edges, max_iter=20)
    roots = {r["root"] for r in ok.collect()}
    assert roots == {0}
