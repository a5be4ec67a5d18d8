"""Synthesize a larger-scale corpus from the sf0.1 testdata (default 10x,
i.e. sf~1: ~6M lineitem rows, 50k documents, 20k embeddings) into a
SCRATCH directory — /root/testdata itself stays untouched per TESTDATA.md.

    python tools/make_scale_corpus.py [--copies 10] \
        [--src /root/testdata/sf0.1] [--out /tmp/spark_graft_sf1]

Design (the reference's own discipline — its bench grid spans 20x input
sizes, algorithm/algorithm_benchmark_test.go:119-165 — applied to this
engine): every table is tiled ``copies`` times with key remapping so
referential integrity and the per-key distributions are preserved exactly,
while the tiling itself cannot manufacture super-linear work:

- relational tables: surrogate keys offset by ``copy * (max_key + 1)``;
  joins stay 1:1 per copy, group cardinalities scale linearly. region and
  nation stay fixed-size (TPC-H semantics: dimensions do not grow with sf
  — the broadcast-join story is unchanged).
- events: event_id/user_id offset per copy; timestamps unchanged (a 10x
  busier service over the same window — per-hour rollup groups stay
  constant while rows scale, the realistic stress).
- documents: copy 0 verbatim; copies 1..k-1 get a deterministic ~30%
  word-level perturbation (hash-gated suffix), so cross-copy pairs fall
  WELL below every near-dup threshold: the corpus's natural near-dup
  structure tiles linearly instead of creating quadratic planted-duplicate
  buckets that would measure the fixture, not the algorithm. n_chars is
  recomputed from the perturbed text.
- embeddings: each copy applies one fixed random permutation of the 64
  dimensions — an isometry, so WITHIN-copy pairwise cosines (cluster
  structure, near-dup pairs, kNN graphs) are preserved exactly while
  cross-copy cosines are near-random; labels offset per copy. Similarity
  workloads therefore scale as k independent copies of the original
  problem — exactly the linear yardstick the scaling measurement needs.

Each table lands as ONE parquet file named ``{table}.parquet`` (what both
load_table and the DuckDB-oracle view registration expect) with 8 MB row
groups so Spark's range-splitting still parallelizes the scan.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from go_web_mapreduce_spark.session import get_spark  # noqa: E402

PERTURB_PCT = 30  # % of words rewritten in copies >= 1
EMB_DIM = 64


def _tiled(src: DataFrame, copies: int, build) -> DataFrame:
    out = None
    for k in range(copies):
        part = build(src, k)
        out = part if out is None else out.unionByName(part)
    return out


def _write_single(df: DataFrame, out_dir: str, name: str) -> None:
    tmp = f"{out_dir}/_tmp_{name}"
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .parquet(tmp)
    )
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{out_dir}/{name}.parquet")
    shutil.rmtree(tmp)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    args = ap.parse_args()
    k_copies, src, out = args.copies, args.src, args.out

    os.makedirs(out, exist_ok=True)
    spark = get_spark("make-scale-corpus")

    def rd(name: str) -> DataFrame:
        return spark.read.parquet(f"{src}/{name}.parquet")

    def mx(df: DataFrame, col: str) -> int:
        return int(df.agg(F.max(col)).first()[0]) + 1

    # fixed-size dimensions: verbatim
    for name in ("region", "nation"):
        _write_single(rd(name), out, name)

    cust, orders, li = rd("customer"), rd("orders"), rd("lineitem")
    part_t, supp = rd("part"), rd("supplier")
    C, OK = mx(cust, "c_custkey"), mx(orders, "o_orderkey")
    P, S = mx(part_t, "p_partkey"), mx(supp, "s_suppkey")

    _write_single(
        _tiled(cust, k_copies, lambda d, k: d.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(k * C))),
        out, "customer",
    )
    _write_single(
        _tiled(supp, k_copies, lambda d, k: d.withColumn(
            "s_suppkey", F.col("s_suppkey") + F.lit(k * S))),
        out, "supplier",
    )
    _write_single(
        _tiled(part_t, k_copies, lambda d, k: d.withColumn(
            "p_partkey", F.col("p_partkey") + F.lit(k * P))),
        out, "part",
    )
    _write_single(
        _tiled(orders, k_copies, lambda d, k: d
               .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * OK))
               .withColumn("o_custkey", F.col("o_custkey") + F.lit(k * C))),
        out, "orders",
    )
    _write_single(
        _tiled(li, k_copies, lambda d, k: d
               .withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * OK))
               .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * P))
               .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * S))),
        out, "lineitem",
    )

    ev = rd("events")
    E, U = mx(ev, "event_id"), mx(ev, "user_id")
    _write_single(
        _tiled(ev, k_copies, lambda d, k: d
               .withColumn("event_id", F.col("event_id") + F.lit(k * E))
               .withColumn("user_id", F.col("user_id") + F.lit(k * U))),
        out, "events",
    )

    docs = rd("documents")
    D = mx(docs, "doc_id")

    def doc_copy(d: DataFrame, k: int) -> DataFrame:
        d = d.withColumn("doc_id", F.col("doc_id") + F.lit(k * D))
        if k == 0:
            return d
        words = F.split(F.col("text"), " ")
        perturbed = F.transform(
            words,
            lambda w, i: F.when(
                F.pmod(F.xxhash64(F.col("doc_id"), F.lit(k), i, w), 100)
                < F.lit(PERTURB_PCT),
                F.concat(w, F.lit(f"~{k}")),
            ).otherwise(w),
        )
        return d.withColumn(
            "text", F.concat_ws(" ", perturbed)
        ).withColumn("n_chars", F.length("text").cast("long"))

    _write_single(_tiled(docs, k_copies, doc_copy), out, "documents")

    emb = rd("embeddings")
    V = mx(emb, "vec_id")
    L = mx(emb, "label")

    def emb_copy(d: DataFrame, k: int) -> DataFrame:
        d = d.withColumn("vec_id", F.col("vec_id") + F.lit(k * V)).withColumn(
            "label", F.col("label") + F.lit(k * L)
        )
        if k == 0:
            return d
        perm = list(range(EMB_DIM))
        random.Random(k).shuffle(perm)  # fixed per copy: an isometry
        return d.withColumn(
            "embedding",
            F.array(*[F.col("embedding")[p] for p in perm]).cast(
                "array<float>"
            ),
        )

    _write_single(_tiled(emb, k_copies, emb_copy), out, "embeddings")

    meta = {"src": src, "copies": k_copies, "tables": {}}
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        meta["tables"][name] = spark.read.parquet(
            f"{out}/{name}.parquet"
        ).count()
    with open(f"{out}/_scale_meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
