"""Tests for the named 'sort' and 'graph' workloads (operators/graph.py)
and the closed-form ML query (operators/ml.py::q_ml_linreg)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

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


def test_triangle_stats_on_known_graphs(spark):
    """K4 has 4 triangles and 12 wedges under any orientation-consistent
    counting (closure ratio 1.0); a 4-cycle has wedges but zero
    triangles; a star has zero. Brute-force parity on a random-ish graph
    pins the degree-ordered join against itertools."""
    from itertools import combinations

    from go_web_mapreduce_spark.operators.graph import triangle_stats

    def run(edges):
        df = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges], "u long, v long"
        ).distinct()
        return triangle_stats(df).collect()[0]

    k4 = list(combinations(range(4), 2))
    r = run(k4)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["closure_ratio"] == 1.0

    cycle4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    r = run(cycle4)
    assert r["n_triangles"] == 0 and r["n_wedges"] > 0

    star = [(0, i) for i in range(1, 7)]
    r = run(star)
    assert r["n_triangles"] == 0

    # deterministic pseudo-random graph vs brute force
    nodes = range(12)
    edges = [
        (a, b)
        for a, b in combinations(nodes, 2)
        if (a * 7 + b * 13) % 3 == 0
    ]
    eset = set(edges)
    brute = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    r = run(edges)
    assert r["n_triangles"] == brute


def test_interval_merge_matches_brute_force(spark, sf_dir):
    """Replay the interval merge in plain Python per user and compare
    island counts and covered time exactly."""
    from go_web_mapreduce_spark.operators.temporal import (
        INTERVAL_LEN_US,
        q_interval_merge,
    )
    from go_web_mapreduce_spark.sources.tables import load_table

    got = {r["user_id"]: r for r in q_interval_merge(spark, sf_dir).collect()}
    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "ts_ns div 1000 AS s")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["s"])
    for uid, starts in by_user.items():
        starts.sort()
        islands = []
        for s in starts:
            e = s + INTERVAL_LEN_US
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        g = got[uid]
        assert g["n_islands"] == len(islands)
        assert g["covered_us"] == sum(e - s for s, e in islands)
        assert g["longest_us"] == max(e - s for s, e in islands)


def test_jsonl_roundtrip_survives_hostile_strings(spark, tmp_path):
    """Embedded newlines, quotes, backslash-N, unicode, empty string and
    NULL must all round-trip byte-identically through the JSONL path —
    including the \\N content that the CSV dialect reserves."""
    hostile = [
        (1, 'line1\nline2', "en"),
        (2, 'quote " and \\ backslash', "en"),
        (3, "\\N", "de"),          # CSV's reserved sentinel is safe here
        (4, "", "de"),             # empty string stays empty, not NULL
        (5, None, "fr"),           # NULL stays NULL
        (6, "emoji \U0001f600 and sőr", "hu"),
        (7, "tab\tand\rcarriage", "en"),
    ]
    df = spark.createDataFrame(hostile, "doc_id long, text string, lang string")
    path = str(tmp_path / "jsonl")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema("doc_id long, text string, lang string").json(path)
    assert sorted(map(tuple, back.collect())) == sorted(hostile)


def test_lpa_communities_properties(spark, sf_dir):
    """LPA output must cover every part in the year exactly once, use only
    node ids as community labels (labels originate as node ids and
    propagation can only copy them), find real structure (more than one
    community, fewer communities than nodes), and be deterministic
    across runs (fixed iterations, integer-exact votes, no RNG)."""
    from go_web_mapreduce_spark.operators.graph import PR_YEAR, q_lpa_communities
    from go_web_mapreduce_spark.sources.tables import load_table

    rows = q_lpa_communities(spark, sf_dir).collect()
    got = {r["part_id"]: r["community"] for r in rows}
    assert len(got) == len(rows)  # one row per node

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= f"{PR_YEAR}-01-01")
        & (F.col("l_shipdate") < f"{PR_YEAR + 1}-01-01")
    )
    expect_nodes = {r["l_partkey"] for r in li.select("l_partkey").distinct().collect()}
    assert set(got) == expect_nodes

    assert set(got.values()) <= expect_nodes
    n_comm = len(set(got.values()))
    assert 1 < n_comm < len(got)

    again = {r["part_id"]: r["community"] for r in q_lpa_communities(spark, sf_dir).collect()}
    assert again == got
