"""Tests for the named 'sort' and 'graph' workloads (operators/graph.py)
and the closed-form ML query (operators/ml.py::q_ml_linreg)."""

from __future__ import annotations

import numpy as np

from go_web_mapreduce_spark.operators.graph import (
    PR_DAMPING,
    PR_ITERS,
    copurchase_edges,
    global_sort_index,
    pagerank,
)
from go_web_mapreduce_spark.queries import REGISTRY


def test_global_sort_index_is_the_total_order(spark):
    # shuffled input with a non-trivial key: positions must be exactly the
    # rank in the total order, 1-based, a permutation of 1..N
    rows = [(k % 7, k) for k in range(200)]
    df = spark.createDataFrame(rows, "a int, b int").repartition(5)
    out = global_sort_index(df, "a", "b", num_partitions=4).collect()
    assert sorted(r["global_pos"] for r in out) == list(range(1, 201))
    by_pos = sorted(out, key=lambda r: r["global_pos"])
    assert [(r["a"], r["b"]) for r in by_pos] == sorted(rows)


def test_global_sort_index_is_layout_independent(spark):
    rows = [(i * 37 % 101,) for i in range(101)]  # unique keys, scrambled
    a = spark.createDataFrame(rows, "k int").repartition(2)
    b = spark.createDataFrame(rows, "k int").repartition(9)
    ra = {(r["k"], r["global_pos"]) for r in global_sort_index(a, "k").collect()}
    rb = {(r["k"], r["global_pos"]) for r in global_sort_index(b, "k").collect()}
    assert ra == rb


def test_pagerank_uniform_on_symmetric_complete_graph(spark):
    # triangle: every node has identical in/out structure, so rank stays at
    # its initial 1.0 through every iteration of the (1-d) + d·Σ formula
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a in range(3) for b in range(3) if a != b],
        "src long, dst long, w double",
    )
    nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
    got = {r["node"]: r["r"] for r in pagerank(nodes, edges).collect()}
    assert all(abs(v - 1.0) < 1e-12 for v in got.values())


def test_pagerank_matches_dense_numpy_iteration(spark):
    # small directed weighted graph; replicate the exact fixed-iteration
    # recurrence densely in numpy
    raw = [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 0, 5.0)]
    n = 4
    edges = spark.createDataFrame(raw, "src long, dst long, w double")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = {r["node"]: r["r"] for r in pagerank(nodes, edges).collect()}

    P = np.zeros((n, n))
    wout = {}
    for s, d, w in raw:
        wout[s] = wout.get(s, 0.0) + w
    for s, d, w in raw:
        P[d, s] = w / wout[s]
    r = np.ones(n)
    for _ in range(PR_ITERS):
        r = (1 - PR_DAMPING) + PR_DAMPING * (P @ r)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])


def test_copurchase_edges_weights_and_symmetry(spark):
    # order 1 holds parts {10, 20, 20}, order 2 holds {10, 20}: the pair
    # (10,20) co-occurs in two distinct orders → weight 2, both directions
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 20), (2, 10), (2, 20), (3, 30)],
        "l_orderkey long, l_partkey long",
    )
    got = {(r["src"], r["dst"]): r["w"] for r in copurchase_edges(li).collect()}
    assert got == {(10, 20): 2.0, (20, 10): 2.0}


def test_ml_linreg_matches_numpy_lstsq(spark, sf_dir):
    out = REGISTRY["q_ml_linreg"].fn(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    ).collect()
    groups: dict[tuple, list] = {}
    for r in li:
        groups.setdefault((r["l_returnflag"], r["l_linestatus"]), []).append(
            (r["l_quantity"], r["l_extendedprice"])
        )
    assert len(out) == len(groups)
    for row in out:
        pts = np.array(groups[(row["l_returnflag"], row["l_linestatus"])])
        A = np.vstack([pts[:, 0], np.ones(len(pts))]).T
        slope, intercept = np.linalg.lstsq(A, pts[:, 1], rcond=None)[0]
        assert abs(row["slope"] - slope) < 1e-4
        assert abs(row["intercept"] - intercept) < 1e-3
        assert row["n"] == len(pts)
