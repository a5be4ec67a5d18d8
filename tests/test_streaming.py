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
