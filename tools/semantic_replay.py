"""Independent sf1 verifier for q_semantic_dedup (VERDICT r7 next-steps #5).

q_semantic_dedup's committed DuckDB oracle replays the full chain (all-pairs
cosine + recursive-CTE transitive closure), which is Θ(n²) with a quadratic
recursive closure on top — it exceeded the session time budget at sf1 in
rounds 6 and 7 and was checked ad hoc with a driver-side numpy replay. This
tool IS that replay, committed and rerunnable, emitting a driver-format
correctness row that tools/merge-style scripts can splice into the sf1
artifact (``method: numpy-replay`` instead of a prose ``not_run`` note).

    python tools/semantic_replay.py [--sf-dir /tmp/spark_graft_sf1] \
        [--json /tmp/semantic_replay.json]

The replay is bit-faithful to the engine kernel, not merely numerically
close: norms and dot products accumulate float64 *dimension-sequentially*
(``acc += a[:, i] * b[:, i]``), the exact operation order of
``operators/similarity.py::embedding_near_dup_pairs``'s score_block, so
every pairwise score is the identical double and the >= threshold decision
cannot flip on an ulp. Components come from an independent union-find (not
the engine's label propagation); root identity relies on
``connected_components``'s documented min-label convergence.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BLOCK = 2048  # row-block for the all-pairs grid (memory, not semantics)


def replay(sf_dir: str, threshold: float):
    """All-pairs cosine >= threshold -> union-find -> (vec_id, root,
    group_size, keep) rows, kernel-bit-faithful."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"], dtype=np.int64)
    mat = np.array([list(v) for v in tbl["embedding"].to_pylist()], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    n, dims = mat.shape

    # norms, dimension-sequential (similarity.py::norms_seq)
    acc = np.zeros(n)
    for i in range(dims):
        acc = acc + mat[:, i] * mat[:, i]
    norms = np.sqrt(acc)

    parent = dict()

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-root union matches connected_components' min-label fixpoint
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    touched = np.zeros(n, dtype=bool)
    n_pairs = 0
    # preallocated buffers: the naive `dots = dots + np.outer(...)` form
    # allocates two corpus-width temporaries per dimension (measured 3-4x
    # slower from allocator/memory churn); in-place multiply+add computes
    # the IDENTICAL float64 sequence (same i-ascending order, fl(a+b) does
    # not care where the operands live)
    dots = np.empty((min(BLOCK, n), n))
    tmp = np.empty_like(dots)
    for s in range(0, n, BLOCK):
        e = min(s + BLOCK, n)
        d = dots[: e - s]
        t = tmp[: e - s]
        d[:] = 0.0
        for i in range(dims):  # dimension-sequential: kernel bit-parity
            np.multiply(mat[s:e, i, None], mat[None, :, i], out=t)
            np.add(d, t, out=d)
        denom = np.outer(norms[s:e], norms)
        score = np.divide(d, denom, out=np.zeros_like(d), where=denom != 0.0)
        # id_a < id_b only: ids are sorted ascending, so keep column index
        # strictly greater than the global row index
        rows_idx, cols_idx = np.nonzero(score >= threshold)
        keep_mask = cols_idx > (rows_idx + s)
        rows_idx, cols_idx = rows_idx[keep_mask], cols_idx[keep_mask]
        n_pairs += len(rows_idx)
        for a, b in zip(ids[rows_idx + s], ids[cols_idx]):
            union(int(a), int(b))
        touched[rows_idx + s] = True
        touched[cols_idx] = True

    nodes = ids[touched]
    roots = {int(v): find(int(v)) for v in nodes}
    sizes: dict[int, int] = {}
    for r in roots.values():
        sizes[r] = sizes.get(r, 0) + 1
    rows = sorted(
        (int(v), roots[int(v)], sizes[roots[int(v)]], int(int(v) == roots[int(v)]))
        for v in nodes
    )
    return rows, n_pairs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from go_web_mapreduce_spark.operators.similarity import SEMANTIC_COS
    from go_web_mapreduce_spark.queries import REGISTRY
    from go_web_mapreduce_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("semantic-replay")
    sdf = REGISTRY["q_semantic_dedup"].fn(spark, args.sf_dir)
    scols = sorted(sdf.columns)
    spdf = sdf.toPandas()
    spark_rows = sorted(
        tuple(int(r[c]) for c in ("vec_id", "root", "group_size", "keep"))
        for r in spdf.to_dict("records")
    )
    t_spark = time.time() - t0

    t1 = time.time()
    oracle_rows, n_pairs = replay(args.sf_dir, SEMANTIC_COS)
    t_replay = time.time() - t1

    rec = {
        "rows_match": len(spark_rows) == len(oracle_rows),
        "schema_match": scols == sorted(["vec_id", "root", "group_size", "keep"]),
        "hash_match": spark_rows == oracle_rows,
        "spark_rows": len(spark_rows),
        "oracle_rows": len(oracle_rows),
        "err": None,
        "method": "numpy-replay",
        "n_pairs": n_pairs,
        "spark_sec": round(t_spark, 1),
        "replay_sec": round(t_replay, 1),
    }
    status = "ok" if rec["hash_match"] and rec["rows_match"] else "FAIL"
    print(f"{status}  q_semantic_dedup @ {args.sf_dir}: "
          f"{rec['spark_rows']} rows vs replay {rec['oracle_rows']} "
          f"({n_pairs} pairs; spark {t_spark:.1f}s, replay {t_replay:.1f}s)")
    if not rec["hash_match"] and rec["rows_match"]:
        diffs = [(a, b) for a, b in zip(spark_rows, oracle_rows) if a != b][:5]
        print("first diffs:", diffs)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"q_semantic_dedup": rec}, f, indent=1)
        print(f"wrote {args.json}")
    return 0 if status == "ok" else 1


if __name__ == "__main__":
    raise SystemExit(main())
