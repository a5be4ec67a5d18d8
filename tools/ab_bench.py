"""Interleaved A/B bench between two repo checkouts (optimization rounds).

The sandbox host's speed drifts by 2-3x across minutes, so raw seconds from
runs taken at different times are not comparable. This harness runs the SAME
query list in two checkouts in alternating fresh processes, several rounds,
and reports per-query minima plus a spin stamp per round.

Usage: python tools/ab_bench.py --before /tmp/repo_before --after /root/repo \
           --rounds 3 q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
names = json.loads(sys.argv[2])
from go_web_mapreduce_spark.queries import REGISTRY
from go_web_mapreduce_spark.session import get_spark
spark = get_spark("ab")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
from pyspark.sql import functions as F
_w = F.pandas_udf("long")(lambda s: s)
spark.range(1000).select(_w("id")).write.mode("overwrite").format("noop").save()
out = {}
for n in names:
    t0 = time.time()
    df = REGISTRY[n].fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    out[n] = round(time.time() - t0, 3)
t0 = time.time(); x = 0
for i in range(10_000_000): x += i
out["__spin__"] = round(time.time() - t0, 3)
print("ABRESULT " + json.dumps(out))
"""


def run_tree(tree: str, names: list[str]) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, tree, json.dumps(names)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    print(p.stdout[-2000:], file=sys.stderr)
    print(p.stderr[-4000:], file=sys.stderr)
    raise RuntimeError(f"runner failed in {tree}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--before", default="/tmp/repo_before")
    ap.add_argument("--after", default="/root/repo")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    acc = {"before": [], "after": []}
    for r in range(args.rounds):
        # alternate which tree runs first: the host slows measurably while a
        # round runs, so a fixed order systematically biases the second tree
        order = [("before", args.before), ("after", args.after)]
        if r % 2:
            order.reverse()
        for tag, tree in order:
            t0 = time.time()
            res = run_tree(tree, args.names)
            acc[tag].append(res)
            print(f"# round {r} {tag}: total "
                  f"{sum(v for k, v in res.items() if k != '__spin__'):.1f}s "
                  f"spin {res['__spin__']:.2f} wall {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)

    print(f"{'query':42s} {'before':>8s} {'after':>8s}  ratio")
    tb = ta = 0.0
    for n in args.names:
        b = min(r[n] for r in acc["before"])
        a = min(r[n] for r in acc["after"])
        tb += b; ta += a
        print(f"{n:42s} {b:8.3f} {a:8.3f}  {a/b:5.2f}")
    print(f"{'TOTAL (min per query)':42s} {tb:8.3f} {ta:8.3f}  {ta/tb:5.2f}")
    spins_b = [r["__spin__"] for r in acc["before"]]
    spins_a = [r["__spin__"] for r in acc["after"]]
    print(f"spins before={spins_b} after={spins_a}")


if __name__ == "__main__":
    main()
