"""Assemble CORRECTNESS_sf1_r9.json from the round-9 sf1 sweep.

Every row is FRESH from one session — no carried rows from earlier
rounds (the provenance gap the round-8 verdict flagged on the merged
CORRECTNESS_sf1_r8.json). The sweep runs tools/check_oracle.py over all
registered queries except q_semantic_dedup, sharded round-robin into N
parallel processes purely for wall-clock (each shard is the identical
three-way check against the same corpus), plus tools/semantic_replay.py
for q_semantic_dedup (its committed all-pairs+recursive-closure DuckDB
oracle exceeds any session budget at sf1; the replay is the bit-faithful
numpy twin, method recorded in the row).

    python tools/assemble_sf1_r9.py OUT.json SEMANTIC.json SHARD.json...
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 4:
        sys.exit(
            "usage: python tools/assemble_sf1_r9.py OUT.json "
            "SEMANTIC.json SHARD.json [SHARD.json ...]"
        )
    out_path, semantic_path, *shard_paths = sys.argv[1:]

    queries: dict[str, dict] = {}
    sf_dir = None
    for p in shard_paths:
        shard = json.load(open(p))
        sf_dir = shard["sf_dir"]
        overlap = set(shard["queries"]) & set(queries)
        if overlap:
            sys.exit(f"shards overlap on {sorted(overlap)[:5]} — bad split")
        queries.update(shard["queries"])

    sem = json.load(open(semantic_path))
    if "queries" in sem:
        sem = sem["queries"]
    row = sem["q_semantic_dedup"]
    queries["q_semantic_dedup"] = row

    summary = {"ok": 0, "rows_only": 0, "fail": 0}
    for rec in queries.values():
        if rec.get("hash_match"):
            summary["ok"] += 1
        elif rec.get("err") == "no_oracle" or (
            rec.get("hash_match") is None and rec.get("spark_rows") is not None
        ):
            summary["rows_only"] += 1
        else:
            summary["fail"] += 1

    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "summary": summary,
                "provenance": {
                    "fresh_single_session": True,
                    "carried_rows": 0,
                    "shards": len(shard_paths),
                    "semantic_method": row.get("method", "numpy-replay"),
                },
                "queries": dict(sorted(queries.items())),
            },
            f,
            indent=1,
        )
    print("summary:", summary, "total:", len(queries))
    return 1 if summary["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
