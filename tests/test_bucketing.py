"""Bucketed co-located join: same-key joins over co-bucketed tables must
plan with NO shuffle exchange on either side — the write-once/join-free
storage strategy for repeated big-big joins at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_web_mapreduce_spark.sources.bucketing import cobucketed_join, write_bucketed
from go_web_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # a crashed previous run can leave orphan warehouse dirs behind (the
    # in-memory catalog forgets the table, the directory survives)
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "orders_b", "o_custkey", 8)
    write_bucketed(customer.withColumnRenamed("c_custkey", "o_custkey"),
                   "customer_b", "o_custkey", 8)
    # bucketing pays off for big-big joins; at test scale the planner would
    # rightly broadcast instead — force the big-big path to verify it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "orders_b", "customer_b"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_cobucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = cobucketed_join(spark, left, right, ["o_custkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides read pre-bucketed


def test_cobucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = cobucketed_join(spark, left, right, ["o_custkey"]).count()
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    want = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).count()
    assert got == want > 0


def test_bucketed_agg_avoids_exchange(spark, sf_dir, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # grouping key == bucket key


def test_write_bucketed_validates(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        write_bucketed(orders, "nope", "o_custkey", 0)
