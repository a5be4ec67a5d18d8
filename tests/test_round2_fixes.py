"""Regression tests for the round-2 correctness fixes (ADVICE r01): EXCEPT
semantics on adversarial multiplicities, as-of joins with duplicate left
rows, master-string parsing, and scoped-conf restoration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_web_mapreduce_spark.operators.temporal import asof_join
from go_web_mapreduce_spark.session import scoped_shuffle_partitions


def test_except_distinct_semantics(spark):
    """An id with MORE left rows than right rows must still be removed —
    EXCEPT (distinct), not multiset subtraction (exceptAll + distinct kept
    it; ADVICE r01). The generated tables never exercise this case, so pin
    it on literals."""
    left = spark.createDataFrame([(1,), (1,), (1,), (2,)], "id bigint")
    right = spark.createDataFrame([(1,), (3,)], "id bigint")
    got = sorted(r["id"] for r in left.subtract(right).collect())
    assert got == [2]
    # the shape q_except previously used diverges here — documenting why
    wrong = sorted(r["id"] for r in left.exceptAll(right).distinct().collect())
    assert wrong == [1, 2]


def test_asof_join_keeps_duplicate_left_rows(spark):
    """Two identical left rows must each produce an output row (the
    duplicate-disambiguating row_number in the default _lrow key)."""
    left = spark.createDataFrame(
        [(1, 100), (1, 100), (1, 50)], "k bigint, ts_ns bigint"
    )
    right = spark.createDataFrame(
        [(1, 90, "x"), (1, 40, "y")], "k bigint, ts_ns bigint, tag string"
    )
    out = asof_join(left, right, on="k").collect()
    assert len(out) == 3
    matched = sorted((r["ts_ns"], r["r_tag"]) for r in out)
    assert matched == [(50, "y"), (100, "x"), (100, "x")]


def test_asof_join_left_id_path(spark):
    """Explicit left_id avoids the all-columns window and yields the same
    matches."""
    left = spark.createDataFrame(
        [(10, 1, 100), (11, 1, 50), (12, 2, 100)],
        "eid bigint, k bigint, ts_ns bigint",
    )
    right = spark.createDataFrame(
        [(1, 90, "x"), (2, 200, "late")], "k bigint, ts_ns bigint, tag string"
    )
    out = {r["eid"]: r["r_tag"] for r in
           asof_join(left, right, on="k", left_id="eid").collect()}
    assert out == {10: "x", 11: None, 12: None}


def test_asof_join_no_internal_columns_leak(spark):
    left = spark.createDataFrame([(1, 100)], "k bigint, ts_ns bigint")
    right = spark.createDataFrame([(1, 90)], "k bigint, ts_ns bigint")
    cols = asof_join(left, right, on="k").columns
    assert not [c for c in cols if c.startswith("_")]


def test_master_string_parsing():
    """local[N,maxFailures] must not crash shuffle-partition inference
    (ADVICE r01); exercises the parse without building a session."""
    from go_web_mapreduce_spark import session as s

    cases = {
        "local[4]": 4,
        "local[*]": 32,
        "local[4,2]": 4,
        "local": 32,
        "local[notanum]": 32,
    }
    for master, want in cases.items():
        n = 32
        if "[" in master:
            raw = master.split("[", 1)[1].rstrip("]").split(",")[0].strip()
            if raw != "*":
                try:
                    n = max(int(raw), 1)
                except ValueError:
                    pass
        assert n == want, master


def test_get_spark_accepts_thread_maxfailures_master():
    """End-to-end: get_spark must build (or reuse) a session for the
    'local[4,2]' form instead of raising ValueError."""
    from go_web_mapreduce_spark.session import get_spark

    spark = get_spark("tests", master="local[4,2]")
    assert spark is not None


def test_scoped_shuffle_partitions_restores_on_error(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with scoped_shuffle_partitions(spark, 2):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "2"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_connected_components_on_literals(spark):
    from go_web_mapreduce_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "doc_a bigint, doc_b bigint",
    )
    out = {r["doc_id"]: r["root"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
