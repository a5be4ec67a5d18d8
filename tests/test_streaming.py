"""Batch/stream parity: the Structured Streaming hourly rollup must produce
exactly the batch plan's answer on the same finite input."""

from __future__ import annotations

from go_web_mapreduce_spark.operators.temporal import q_events_hourly
from go_web_mapreduce_spark.streaming.events import hourly_rollup_stream


def test_stream_equals_batch(spark, sf_dir):
    batch = {
        (r["hour"], r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in q_events_hourly(spark, sf_dir).collect()
    }
    stream = {
        (r["hour"], r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in hourly_rollup_stream(spark, sf_dir).collect()
    }
    assert batch == stream
    assert len(batch) > 0


def test_stream_is_rerunnable(spark, sf_dir):
    a = hourly_rollup_stream(spark, sf_dir).count()
    b = hourly_rollup_stream(spark, sf_dir).count()
    assert a == b > 0


def test_stateful_final_state_equals_batch(spark, sf_dir):
    """applyInPandasWithState final state == batch aggregate on the same
    finite input (single micro-batch path)."""
    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.sources.tables import load_table
    from go_web_mapreduce_spark.streaming.stateful import q_stream_stateful

    got = {
        r["event_type"]: (r["n"], r["max_value"])
        for r in q_stream_stateful(spark, sf_dir).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["max_value"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("value").alias("max_value"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stateful_state_survives_micro_batches(spark, sf_dir, tmp_path):
    """State genuinely accumulates ACROSS micro-batches: two source files,
    maxFilesPerTrigger=1 → two batches; the final emission per key carries
    the running total over both."""
    import pandas as pd
    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.sources.tables import load_table
    from go_web_mapreduce_spark.streaming.stateful import (
        run_to_completion,
        running_event_stats,
    )

    events = load_table(spark, sf_dir, "events")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "events_split"
    half_a.coalesce(1).write.parquet(str(src / "a"))
    half_b.coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*/")
    )
    final = {
        r["event_type"]: r["n"]
        for r in run_to_completion(running_event_stats(stream), spark).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert final == want and len(final) > 0
