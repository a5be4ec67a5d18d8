"""Sinks round-trip and skew-mitigation equivalence tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_web_mapreduce_spark.functions.skew import salted_agg, salted_join, with_salt
from go_web_mapreduce_spark.sources.sinks import (
    write_json_lines,
    write_parquet,
    write_sorted_parquet,
)
from go_web_mapreduce_spark.sources.tables import load_table


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_parquet(docs, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # reading one partition must scan only that directory (partition pruning)
    one_lang = docs.select("lang").first()["lang"]
    pruned = back.filter(F.col("lang") == one_lang)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters:")[1][:120]
    assert pruned.count() == docs.filter(F.col("lang") == one_lang).count()


def test_sorted_parquet_sorts_within_files(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    out = str(tmp_path / "events_sorted")
    write_sorted_parquet(ev.repartition(2), out, ["event_id"])
    import glob

    import pyarrow.parquet as pq

    for f in glob.glob(f"{out}/*.parquet"):
        ids = pq.read_table(f, columns=["event_id"]).column("event_id").to_pylist()
        assert ids == sorted(ids)


def test_json_lines_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "docs_json")
    write_json_lines(docs, out)
    back = spark.read.json(out)
    assert back.count() == docs.count()
    assert set(back.columns) == {"doc_id", "lang"}


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["n"]
        for r in salted_agg(
            ev,
            ["event_type"],
            [F.count("*").alias("pn")],
            [F.sum("pn").alias("n")],
            num_salts=8,
        ).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, sf_dir, how):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    small = customer.withColumnRenamed("c_custkey", "o_custkey")
    got = salted_join(orders, small, ["o_custkey"], num_salts=4, how=how)
    want = orders.join(small, ["o_custkey"], how)
    assert got.count() == want.count()
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w


def test_with_salt_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(100)
    salts = with_salt(ev, 4).select("__salt").distinct().collect()
    assert all(0 <= r["__salt"] < 4 for r in salts)
    with pytest.raises(ValueError):
        with_salt(ev, 0)


def test_json_ingest_reads_reference_wire_shape(spark, tmp_path):
    """read_json_ingest parses the reference's POST-body row shape
    (reference: server/api.go:8-13) with an explicit schema, no inference."""
    import json

    from go_web_mapreduce_spark.sources.tables import read_json_ingest

    p = tmp_path / "ingest.jsonl"
    rows = [{"key": "", "value": "bacon"}, {"key": "k2", "value": None}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_json_ingest(spark, str(p))
    assert df.columns == ["key", "value"]
    got = sorted((r["key"], r["value"]) for r in df.collect())
    assert got == [("", "bacon"), ("k2", None)]


def test_register_catalog_enables_plain_sql(spark, sf_dir):
    from go_web_mapreduce_spark.sources.tables import register_catalog

    names = register_catalog(spark, sf_dir, suffix="_cat")
    assert len(names) == 10
    n = spark.sql(
        "SELECT count(*) AS n FROM lineitem_cat JOIN orders_cat "
        "ON l_orderkey = o_orderkey"
    ).first()["n"]
    assert n > 0


def test_csv_roundtrip(spark, tmp_path):
    from go_web_mapreduce_spark.sources.sinks import read_csv, write_csv

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c,with comma", -1.0)],
        "id bigint, name string, score double",
    )
    path = str(tmp_path / "csv_out")
    write_csv(df, path)
    back = read_csv(spark, path, "id bigint, name string, score double")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_roundtrip_with_pushdown(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.sources.sinks import read_orc, write_orc
    from go_web_mapreduce_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter(F.col("o_totalprice") > 1000.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan
    got = back.filter(F.col("o_totalprice") > 1000.0).count()
    want = orders.filter(F.col("o_totalprice") > 1000.0).count()
    assert got == want
