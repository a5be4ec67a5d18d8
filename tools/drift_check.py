"""Three-run drift adjudication (BASELINE.md protocol): fresh session,
bench-style warm pass, then N interleaved timed runs of the named queries
with a calibration spin after each — the procedure that resolved every
previous cross-round drift (r3 regressions, r4 weak marks).

    python tools/drift_check.py [--runs 3] [--sf-dir /root/testdata/sf0.1] \
        q_bloom_join q_dense_grid

Prints a markdown table (run x query, seconds + spin) for BASELINE.md.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_web_mapreduce_spark.queries import REGISTRY  # noqa: E402
from go_web_mapreduce_spark.session import get_spark  # noqa: E402


def _spin(n: int = 10_000_000) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("drift-check")
    from pyspark.sql import functions as F

    # bench.py's warm pass: parquet footers, python worker pool, HOF codegen
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
    _w = F.pandas_udf("long")(lambda s: s)
    spark.range(1000).select(_w("id")).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(1000).select(
        F.aggregate(
            F.transform(F.array_repeat("id", 4), lambda x: x + 1),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("s")
    ).write.mode("overwrite").format("noop").save()

    cols = " | ".join(f"{q} | spin" for q in args.queries)
    print(f"| run | {cols} |")
    print("|" + "---|" * (1 + 2 * len(args.queries)))
    for run in range(args.runs):
        cells = []
        for name in args.queries:
            t0 = time.time()
            df = REGISTRY[name].fn(spark, args.sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            cells += [f"{dt:.3f} s", f"{_spin():.3f}"]
            gc.collect()
        label = "0 (cold)" if run == 0 else f"{run} (warm)"
        print(f"| {label} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
