"""Per-query profiling for the optimization rounds (guide §1).

For each requested query (default: all), measures separately:
  - build_s: time to construct the DataFrame (spec.fn) — driver-side work,
    including any plan-time collects/localCheckpoints the operator does;
  - exec1_s: first noop-sink materialization (includes codegen compile);
  - exec2_s: second noop-sink materialization (warm codegen) when --warm;
and counts plan features (Exchange / BatchEvalPython / ArrowEvalPython /
MapInArrow|MapInPandas / SortMergeJoin / CartesianProduct) from
explain("formatted"). Optionally dumps the formatted plan per query into a
directory (--plans DIR).

Usage:
  python tools/profile_queries.py [--plans plans/r11] [--warm] [q1 q2 ...]

Output: one JSON line per query on stdout plus a sorted summary on stderr.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_web_mapreduce_spark.queries import REGISTRY  # noqa: E402
from go_web_mapreduce_spark.session import get_spark  # noqa: E402

FEATURES = {
    "exchange": re.compile(r"\bExchange\b"),
    "py_batch": re.compile(r"\bBatchEvalPython\b"),
    "py_arrow": re.compile(r"\bArrowEvalPython\b"),
    "py_map": re.compile(r"\b(MapInArrow|MapInPandas|FlatMapGroupsInPandas)\b"),
    "smj": re.compile(r"\bSortMergeJoin\b"),
    "cartesian": re.compile(r"\bCartesianProduct\b"),
    "bnlj": re.compile(r"\bBroadcastNestedLoopJoin\b"),
    "window": re.compile(r"\bWindow\b"),
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans", default=None, help="dir to dump formatted plans")
    ap.add_argument("--warm", action="store_true", help="run a second timed noop pass")
    ap.add_argument("--no-exec", action="store_true", help="plans only, skip the noop run")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    names = args.names or sorted(REGISTRY)
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    rows = []
    for name in names:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        t1 = time.time()
        txt = plan_text(df)
        t2 = time.time()
        feats = {k: len(rx.findall(txt)) for k, rx in FEATURES.items()}
        if args.plans:
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(txt)
        if not args.no_exec:
            df.write.mode("overwrite").format("noop").save()
        t3 = time.time()
        rec = {
            "query": name,
            "build_s": round(t1 - t0, 3),
            "plan_s": round(t2 - t1, 3),
            "exec1_s": round(t3 - t2, 3),
            **feats,
        }
        if args.warm:
            t4 = time.time()
            df.write.mode("overwrite").format("noop").save()
            rec["exec2_s"] = round(time.time() - t4, 3)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    rows.sort(key=lambda r: -(r["build_s"] + r["exec1_s"]))
    print("\n#  query                                    build  plan  exec1"
          "  exec2  exch py", file=sys.stderr)
    for r in rows[:50]:
        print(f"{r['query']:42s} {r['build_s']:6.2f} {r['plan_s']:5.2f} "
              f"{r['exec1_s']:6.2f} {r.get('exec2_s', -1):6.2f}  "
              f"{r['exchange']:3d} {r['py_batch'] + r['py_arrow'] + r['py_map']:2d}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
