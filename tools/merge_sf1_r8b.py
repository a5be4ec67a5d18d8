"""Assemble the final round-8 CORRECTNESS_sf1 artifact (continuation 2).

Layers (later wins on overlap):
1. carry-over — the committed CORRECTNESS_sf1_r8.json (197 rows: round-7
   carry + this round's earlier session, including the q_semantic_dedup
   numpy-replay row);
2. /tmp/sf1_newops_r8b.json — the sixteen operators added in the second
   continuation session, verified at sf1 (includes q_dedup_edit_distance,
   whose plan changed this session — barrier + thresholded DP — with the
   hash required unchanged).

Usage: python tools/merge_sf1_r8b.py PARTIAL_RESULTS.json

PARTIAL_RESULTS.json is the check_oracle --json output for the sixteen
second-continuation operators (originally /tmp/sf1_newops_r8b.json; the
/tmp copy is ephemeral, so the path is an explicit argument — without it
the committed artifact would not be reproducible from this tool).

Note: round 9 replaced this merged artifact with a single-pass sweep
(CORRECTNESS_sf1_r9.json); this tool is kept only as provenance for the
round-8 file.
"""

from __future__ import annotations

import json
import sys

if len(sys.argv) != 2:
    sys.exit(
        "usage: python tools/merge_sf1_r8b.py PARTIAL_RESULTS.json\n"
        "(the check_oracle --json partial for the second-continuation "
        "operators; the original /tmp/sf1_newops_r8b.json was ephemeral)"
    )

base = json.load(open("CORRECTNESS_sf1_r8.json"))
out_queries = dict(base["queries"])
counts = {"carried": len(out_queries), "new_r8b": 0}

part = json.load(open(sys.argv[1]))
for name, rec in part["queries"].items():
    if name not in out_queries:
        counts["new_r8b"] += 1
    out_queries[name] = rec

summary = {"ok": 0, "rows_only": 0, "fail": 0}
for rec in out_queries.values():
    if rec.get("hash_match"):
        summary["ok"] += 1
    elif rec.get("err") == "no_oracle" or (
        rec.get("hash_match") is None and rec.get("spark_rows") is not None
    ):
        summary["rows_only"] += 1
    else:
        summary["fail"] += 1

with open("CORRECTNESS_sf1_r8.json", "w") as f:
    json.dump(
        {
            "sf_dir": base["sf_dir"],
            "summary": summary,
            "provenance": counts,
            "queries": dict(sorted(out_queries.items())),
        },
        f,
        indent=1,
    )
print("summary:", summary, "provenance:", counts, "total:", len(out_queries))
