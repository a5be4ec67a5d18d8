"""Validate the EMITTED cluster count at scale (VERDICT r10 item 1).

Round 10 measured the fixed-C wall one decade up: the C=256 sf10
operating point of q_contrastive_pairs_ivf_scaled OOM-killed the host at
2M vectors (SCALE_MEASURED_SF100.json). Round 11 made C executable —
``cluster_count(n)`` emits a power-of-two-quantized √n — and this tool
measures the AUTO-C path (contrastive_pairs_ivf_auto, the deployment
API) at two corpus sizes so the emitted configuration's exponent replaces
the OOM envelope row:

    SPARK_GRAFT_CPUS=16 python tools/measure_auto_c.py \
        [--small /tmp/spark_graft_sf10] [--big /tmp/spark_graft_sf100] \
        [--ratio 10] [--json OUT.json]

Bounded workers per the documented sf100 protocol (SCALE.md round 10):
python-heavy sf100 runs use 8–20 workers, not 32, on the 125 GB host.
Timing discipline is bench_scale.py's: one untimed warm pass compiles
codegen, the second pass is the measurement via the noop sink, a
calibration spin runs beside each measurement, and the exponent is
computed on spin-normalized times.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_web_mapreduce_spark.functions.ann_config import cluster_count  # noqa: E402
from go_web_mapreduce_spark.session import get_spark  # noqa: E402
from go_web_mapreduce_spark.sources.tables import load_table  # noqa: E402


def _spin(n: int = 10_000_000) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i
    return round(time.time() - t0, 3)


def _run(spark, sf_dir: str) -> tuple[float, int, int]:
    """One full auto-C contrastive pass; returns (sec, n_vectors, C)."""
    from go_web_mapreduce_spark.operators.similarity import (
        contrastive_pairs_ivf_auto,
    )

    t0 = time.time()
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    df = contrastive_pairs_ivf_auto(emb, total_rows=n)
    df.write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 3), n, cluster_count(n)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/tmp/spark_graft_sf10")
    ap.add_argument("--big", default="/tmp/spark_graft_sf100")
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = get_spark("measure-auto-c")
    rec: dict = {
        "workers": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "loadavg_1m": os.getloadavg()[0],
    }
    _run(spark, args.small)  # warm (untimed)
    rec["small_sec"], rec["small_n"], rec["small_C"] = _run(spark, args.small)
    rec["spin_small"] = _spin()
    print(
        f"small: {rec['small_sec']}s at n={rec['small_n']} "
        f"C={rec['small_C']} (spin {rec['spin_small']})",
        file=sys.stderr,
    )
    _run(spark, args.big)  # warm (untimed)
    rec["big_sec"], rec["big_n"], rec["big_C"] = _run(spark, args.big)
    rec["spin_big"] = _spin()
    norm = (rec["big_sec"] / rec["spin_big"]) / (
        rec["small_sec"] / rec["spin_small"]
    )
    rec["t_ratio"] = round(norm, 3)
    rec["exponent"] = round(math.log(norm) / math.log(args.ratio), 3)
    print(
        f"big: {rec['big_sec']}s at n={rec['big_n']} C={rec['big_C']} "
        f"(spin {rec['spin_big']}) -> x{rec['t_ratio']}, "
        f"exp {rec['exponent']}",
        file=sys.stderr,
    )
    result = {"small": args.small, "big": args.big, "ratio": args.ratio,
              "query": "contrastive_pairs_ivf_auto", "rec": rec}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
