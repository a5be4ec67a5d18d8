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


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Late-data semantics: with a 1-hour watermark in append mode, a row
    arriving in a later batch with an event time more than the delay behind
    the observed max is dropped; windows emit only once finalized."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("k", T.StringType()),
        ]
    )
    src = tmp_path / "late_src"
    src.mkdir()

    def write_batch(name: str, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "k"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.parquet(
            str(src / name)
        )

    import time

    # batch a: the 10:00-window row plus a 13:00 row (watermark → 12:00
    # after this batch)
    write_batch("a", [("2024-01-01 10:10:00", "x"), ("2024-01-01 13:00:00", "x")])
    time.sleep(1.1)  # file source orders batches by modification time
    # batch b advances event time; processing it evicts + emits the
    # (closed) 10:00 window
    write_batch("b", [("2024-01-01 14:00:00", "x")])
    time.sleep(1.1)
    # batch c: a row for the ALREADY-FINALIZED 10:00 window — watermark
    # semantics guarantee it cannot resurrect or duplicate the emission
    write_batch("c", [("2024-01-01 10:20:00", "x")])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*/")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_demo")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emissions = [
        (r["w"]["start"].strftime("%H:%M"), r["n"])
        for r in spark.table("late_demo").collect()
    ]
    # exactly one emission for the 10:00 window, counting only the on-time
    # row; the too-late arrival was dropped, not re-emitted
    assert emissions.count(("10:00", 1)) == 1
    assert not any(w == "10:00" and n != 1 for w, n in emissions)


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


def test_multi_microbatch_state_accumulation(spark, sf_dir, tmp_path):
    """Incremental processing: the source split into 4 files consumed one
    per micro-batch (maxFilesPerTrigger=1) must accumulate windowed state
    across batches to the same final answer as one-shot batch execution.
    The single-file tests above run one micro-batch; this is the test that
    state survives and merges across triggers."""
    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.session import scoped_shuffle_partitions
    from go_web_mapreduce_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src_dir = str(tmp_path / "chunks")
    events.repartition(4).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("tv"),
        )
    )
    with scoped_shuffle_partitions(spark, 4):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("chunked")
            .start()
        )
        try:
            q.processAllAvailable()
            n_batches = len(q.recentProgress)
        finally:
            q.stop()

    got = {
        (r["w"]["start"], r["event_type"]): (r["n"], round(r["tv"], 4))
        for r in spark.table("chunked").collect()
    }
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], round(r["tv"], 4))
        for r in events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("tv"),
        )
        .collect()
    }
    assert got == want
    assert n_batches >= 4  # genuinely incremental, not one mega-batch


def test_checkpoint_recovery_resumes_not_restarts(spark, sf_dir, tmp_path):
    """The reference re-queues failed jobs and guards duplicate completions
    (reference: worker/base.go:77-90, master/master.go:181-189); Spark's
    equivalent is checkpoint-based recovery. Stop a chunked stream mid-way,
    restart from the same checkpoint: the final answer must equal batch
    execution (no loss, no double counting) and the restarted query must
    RESUME (its first batch id continues where the first run stopped)."""
    import time as _time

    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.session import scoped_shuffle_partitions
    from go_web_mapreduce_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    src_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    events.repartition(6).write.parquet(src_dir)

    def build():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        return stream.groupBy("event_type").agg(F.count("*").alias("n"))

    with scoped_shuffle_partitions(spark, 4):
        q1 = (
            build().writeStream.outputMode("complete")
            .format("memory").queryName("recov1")
            .option("checkpointLocation", ckpt).start()
        )
        try:
            deadline = _time.time() + 60
            while _time.time() < deadline:
                done = [p for p in q1.recentProgress]
                if len(done) >= 2:
                    break
                _time.sleep(0.2)
        finally:
            q1.stop()  # mid-stream interruption
        first_run_batches = {p["batchId"] for p in q1.recentProgress}
        assert len(first_run_batches) >= 1

        q2 = (
            build().writeStream.outputMode("complete")
            .format("memory").queryName("recov2")
            .option("checkpointLocation", ckpt).start()
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        resumed_batches = {p["batchId"] for p in q2.recentProgress}

    got = {r["event_type"]: r["n"] for r in spark.table("recov2").collect()}
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want  # exactly-once effect across the restart
    if resumed_batches:
        # the restart continued from the checkpoint, not from batch 0
        assert min(resumed_batches) > 0


def test_rocksdb_state_store_incremental_available_now(spark, sf_dir, tmp_path):
    """100 TB state posture (VERDICT r4 next-steps #7): the same stateful
    rollup runs under the RocksDB state store provider — the provider whose
    state size is bounded by disk, not executor heap — driven as TWO
    incremental trigger(availableNow=True) runs from one checkpoint, with
    new data arriving between runs. Asserts (a) RocksDB is genuinely the
    provider (its metrics appear in the progress events), (b) run 2 resumes
    from the checkpoint instead of reprocessing, and (c) the final state
    equals batch execution over everything ingested."""
    import time as _time

    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.session import scoped_shuffle_partitions
    from go_web_mapreduce_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    first = events.filter(F.col("value") < 50)
    late = events.filter(F.col("value") >= 50)
    src_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    first.repartition(3).write.mode("append").parquet(src_dir)

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    rocks = (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    )

    def run(name: str):
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream.groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    try:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
        with scoped_shuffle_partitions(spark, 4):
            q1 = run("rocks1")
            progress1 = list(q1.recentProgress)
            late.repartition(2).write.mode("append").parquet(src_dir)
            q2 = run("rocks2")
            progress2 = list(q2.recentProgress)
    finally:
        if prev_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    # (a) RocksDB really ran: its custom metrics are in the state operator
    metrics = [
        k
        for p in progress1
        for op in p["stateOperators"]
        for k in op.get("customMetrics", {})
    ]
    assert any("rocksdb" in k.lower() for k in metrics), metrics

    # (b) incremental: run 2's batches continue past run 1's
    b1 = {p["batchId"] for p in progress1 if p["stateOperators"]}
    b2 = {p["batchId"] for p in progress2 if p["stateOperators"]}
    assert b1 and b2 and min(b2) > max(b1) - 1 and max(b2) > max(b1)

    # (c) exactly-once state across runs and providers' maintenance
    got = {r["event_type"]: r["n"] for r in spark.table("rocks2").collect()}
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_stream_hll_registers_equal_batch(spark, sf_dir):
    """The streaming max-aggregate over HLL registers must land on the
    IDENTICAL register table — and therefore the identical estimate — as a
    batch groupBy over the same finite input, and the estimate must track
    the exact distinct count within the 4096-register error envelope."""
    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.functions import hll as _hll
    from go_web_mapreduce_spark.sources.tables import load_table
    from go_web_mapreduce_spark.streaming.events import q_stream_hll

    rows = q_stream_hll(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # small-cardinality windows hit linear counting (near-exact); the
        # 1.04/sqrt(4096) ≈ 1.6% asymptotic band plus slack covers the rest
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            3, 0.1 * r["exact_users"]
        ), r

    # batch twin: same registers, same estimate formula
    val = "CAST(user_id AS STRING)"
    batch = (
        load_table(spark, sf_dir, "events")
        .select(
            F.date_trunc("hour", "ts").alias("h"),
            "event_type",
            F.conv(F.substring(F.md5(F.expr(val)), 1, 3), 16, 10)
            .cast("int")
            .alias("bucket"),
            F.expr(_hll.hll_rank_sql(val)).alias("rank"),
        )
        .groupBy("h", "event_type", "bucket")
        .agg(F.max("rank").alias("M"))
    )
    est = _hll.hll_estimate_from_registers(batch, ["h", "event_type"])
    want = {
        (r["h"].strftime("%Y-%m-%d %H:%M:%S"), r["event_type"]): r["approx"]
        for r in est.collect()
    }
    got = {(r["hour"], r["event_type"]): r["approx_users"] for r in rows}
    assert got == want
