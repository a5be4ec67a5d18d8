"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line with per-query
wall-clock seconds.

Each query is materialized via ``write.format("noop")`` — the v2 no-op sink
evaluates EVERY output column and row without driver materialization.
``count()`` would be dishonest here: Catalyst prunes unreferenced work under
a count, eliminating entire Window operators and projections (measured:
q_window_running's count-plan contains no Window node at all), so
projection/window queries would time near zero while doing nothing. The
(untimed) row count for the log line runs as a separate pruned pass.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_web_mapreduce_spark.queries import REGISTRY  # noqa: E402
from go_web_mapreduce_spark.session import get_spark  # noqa: E402


def _calibration_spin(n: int = 10_000_000) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session start-up
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    per_query: dict[str, float] = {}
    total = 0.0
    failed: list[str] = []
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
        except Exception as ex:  # noqa: BLE001 — one bad query must not
            # zero out the whole round's bench record
            failed.append(name)
            print(f"# {name}: FAILED {type(ex).__name__}: {ex}", file=sys.stderr)
            continue
        dt = round(time.time() - t0, 3)
        per_query[name] = dt
        total += dt
        n = df.count()  # untimed, pruned pass — for the log line only
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        # drop py4j refs promptly so the ContextCleaner can release the
        # finished query's broadcasts/checkpoint blocks instead of letting
        # the pressure land as a GC pause inside a later query's timing
        gc.collect()

    result = {
        "metric": "total_query_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # fixed pure-Python spin: calibrates this host's single-core speed at
        # measurement time (observed to swing ~1.5x with neighbor load —
        # BASELINE.md). Compare rounds via value/calibration, not raw seconds.
        "calibration_spin_sec": _calibration_spin(),
    }
    if failed:
        result["failed"] = failed

    # optional throughput pass: all queries submitted concurrently into the
    # session's FAIR scheduler pools — the engine's multi-algorithm surface
    # (service.AlgorithmService; reference runs N masters concurrently,
    # server/views.go:30-36). Wall clock of the whole batch, not per query.
    if os.environ.get("SPARK_GRAFT_BENCH_CONCURRENT") == "1":
        from concurrent.futures import ThreadPoolExecutor

        def run(item):
            name, spec = item
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

        t0 = time.time()
        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(run, sorted(REGISTRY.items())))
        result["concurrent_wall_clock"] = round(time.time() - t0, 3)
        print(f"# concurrent batch: {result['concurrent_wall_clock']:.1f}s",
              file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
