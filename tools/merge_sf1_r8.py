"""Assemble CORRECTNESS_sf1_r8.json from this round's sf1 runs.

Layers (later wins on overlap):
1. carry-over — CORRECTNESS_sf1_r7.json entries for queries byte-identical
   since round 7;
2. /tmp/sf1_rerun_r8.json — every query whose behavior changed in round 8
   (the HLL literal-table fix consumers, q_hits, the adaptive-grid
   similarity family, q_stream_stream_join) re-verified at sf1;
3. /tmp/sf1_newops_r8.json — the six round-8 operators at sf1;
4. /tmp/semantic_replay_r8.json — q_semantic_dedup via the committed numpy
   replay (tools/semantic_replay.py), method-tagged.

Usage: python tools/merge_sf1_r8.py
"""

from __future__ import annotations

import json

carry = json.load(open("CORRECTNESS_sf1_r7.json"))["queries"]

out_queries = dict(carry)
provenance_counts = {"carried_r7": 0, "rerun_r8": 0, "new_r8": 0, "replay": 0}

for path, tag in (
    ("/tmp/sf1_rerun_r8.json", "rerun_r8"),
    # the C=256 contrastive re-run AFTER the AS MATERIALIZED oracle fix
    # (the first pass aborted out-of-disk on DuckDB's per-reference CTE
    # inlining) — later layer wins over the FAIL row above
    ("/tmp/sf1_ivfscaled_r8.json", "rerun_r8"),
    ("/tmp/sf1_newops_r8.json", "new_r8"),
    ("/tmp/semantic_replay_r8.json", "replay"),
):
    try:
        part = json.load(open(path))
    except FileNotFoundError:
        print(f"missing {path} — skipped")
        continue
    rows = part.get("queries", part)
    for name, rec in rows.items():
        if not isinstance(rec, dict) or "hash_match" not in rec:
            continue
        out_queries[name] = rec
        provenance_counts[tag] += 1

provenance_counts["carried_r7"] = sum(
    1 for k in out_queries if k in carry and out_queries[k] is carry[k]
)

summary = {"ok": 0, "rows_only": 0, "fail": 0}
for rec in out_queries.values():
    if rec.get("err") == "no_oracle":
        # oracle-less by construction (q_approx_distinct_native) — the
        # driver's rows-only category
        summary["rows_only"] += 1
    elif rec.get("err"):
        summary["fail"] += 1
    elif rec.get("hash_match"):
        summary["ok"] += 1
    elif rec.get("rows_match"):
        summary["rows_only"] += 1
    else:
        summary["fail"] += 1

out = {
    "sf_dir": "/tmp/spark_graft_sf1",
    "provenance": (
        "round 8: every query NEW or behavior-MODIFIED this round re-verified "
        "against the regenerated sf1 corpus (tools/make_scale_corpus.py, same "
        "deterministic tiling); all other entries carried from the round-7 "
        "full run (CORRECTNESS_sf1_r7.json), whose queries are byte-identical "
        "this round. q_semantic_dedup is verified by the committed numpy "
        "replay tool (tools/semantic_replay.py), method-tagged in its row. "
        f"Layer counts: {provenance_counts}"
    ),
    "summary": summary,
    "queries": dict(sorted(out_queries.items())),
}
json.dump(out, open("CORRECTNESS_sf1_r8.json", "w"), indent=1)
print("CORRECTNESS_sf1_r8.json:", summary, provenance_counts,
      "total", len(out_queries))
