"""Dedup precision/recall against PLANTED ground truth (VERDICT r4
next-steps #3): a deterministic fixture corpus with near-duplicate pairs
at parameterized word-overlap levels, evaluated against MinHash-LSH,
SimHash, and the exact n-gram jaccard joins.

Shared by tests/test_dedup_quality.py (asserts recall >= the LSH banding
formula's guarantee and exactness of the jaccard joins) and the SCALE.md
measurement table:

    python tools/dedup_quality.py          # prints the markdown table

Fixture: ``N_BASE`` base documents of ``DOC_WORDS`` words drawn uniformly
from a ``VOCAB``-word vocabulary (accidental cross-doc 3-shingle overlap
~ (DOC_WORDS/VOCAB^3) — negligible), each with ONE planted near-duplicate
made by replacing a fraction p of word positions with fresh random words,
p cycling over ``REPLACE_LEVELS``. Ground truth per planted pair is the
EXACT 3-shingle jaccard computed in pure Python on the identical
tokenization — so every engine-side measurement has an independent
oracle.
"""

from __future__ import annotations

import os
import random
import sys
from dataclasses import dataclass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 120
DOC_WORDS = 60
VOCAB = 4000
REPLACE_LEVELS = [0.0, 0.05, 0.1, 0.2, 0.3, 0.5, 0.7]
SEED = 20260814
SHINGLE_K = 3


@dataclass
class Fixture:
    rows: list[tuple[int, str]]              # (doc_id, text)
    pairs: list[tuple[int, int, float, float]]  # (base, dup, p, true_jaccard)


def _shingles(words: list[str], k: int = SHINGLE_K) -> set[str]:
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def make_fixture() -> Fixture:
    rng = random.Random(SEED)
    vocab = [f"w{i:05d}" for i in range(VOCAB)]
    rows: list[tuple[int, str]] = []
    pairs: list[tuple[int, int, float, float]] = []
    next_id = 0
    for b in range(N_BASE):
        words = [rng.choice(vocab) for _ in range(DOC_WORDS)]
        base_id = next_id
        rows.append((base_id, " ".join(words)))
        next_id += 1
        p = REPLACE_LEVELS[b % len(REPLACE_LEVELS)]
        dup = list(words)
        n_repl = round(p * DOC_WORDS)
        for pos in rng.sample(range(DOC_WORDS), n_repl):
            dup[pos] = rng.choice(vocab)
        dup_id = next_id
        rows.append((dup_id, " ".join(dup)))
        next_id += 1
        a, bset = _shingles(words), _shingles(dup)
        jac = len(a & bset) / len(a | bset)
        pairs.append((base_id, dup_id, p, jac))
    return Fixture(rows=rows, pairs=pairs)


def lsh_candidate_probability(s: float, bands: int, rows: int) -> float:
    """The banding formula: P(>=1 of ``bands`` r-row bands fully agrees)
    when each MinHash component matches independently w.p. s (Leskovec,
    Rajaraman & Ullman, Mining of Massive Datasets ch. 3)."""
    return 1.0 - (1.0 - s**rows) ** bands


def evaluate(spark):
    """Run the three dedup families over the fixture; return per-method
    stats keyed by replace-level, plus the raw pair sets."""
    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.functions.text import (
        distinct_shingles_arrow,
        tokens,
    )
    from go_web_mapreduce_spark.operators.dedup import (
        BANDS,
        JACCARD_THRESHOLD,
        MIN_MATCHING,
        NUM_HASHES,
        ROWS_PER_BAND,
        jaccard_pairs,
        jaccard_pairs_prefix,
        minhash_candidates,
        simhash_pairs,
    )

    fx = make_fixture()
    docs = spark.createDataFrame(fx.rows, "doc_id long, text string")
    shingled = docs.select(
        "doc_id",
        distinct_shingles_arrow(tokens("text"), SHINGLE_K).alias("shingles"),
    )

    def pairset(df) -> set[tuple[int, int]]:
        return {
            (min(r[0], r[1]), max(r[0], r[1]))
            for r in df.select("doc_a", "doc_b").collect()
        }

    cands = minhash_candidates(shingled)
    lsh_cand = pairset(cands)
    lsh_est = pairset(cands.filter(F.col("n_matching") >= MIN_MATCHING))
    sim = pairset(simhash_pairs(docs))
    jac = pairset(jaccard_pairs(shingled, threshold=JACCARD_THRESHOLD))
    jac_prefix = pairset(
        jaccard_pairs_prefix(shingled, threshold=JACCARD_THRESHOLD)
    )

    truth = {(min(a, b), max(a, b)): (p, j) for a, b, p, j in fx.pairs}
    per_level: dict[float, dict] = {}
    for key, (p, j) in sorted(truth.items(), key=lambda kv: kv[1][0]):
        lv = per_level.setdefault(
            p,
            {
                "n": 0, "jaccard_sum": 0.0, "formula_sum": 0.0,
                "formula_var": 0.0, "lsh_cand": 0, "lsh_est": 0,
                "simhash": 0, "jac": 0,
            },
        )
        lv["n"] += 1
        lv["jaccard_sum"] += j
        pr = lsh_candidate_probability(j, BANDS, ROWS_PER_BAND)
        lv["formula_sum"] += pr
        lv["formula_var"] += pr * (1 - pr)
        lv["lsh_cand"] += key in lsh_cand
        lv["lsh_est"] += key in lsh_est
        lv["simhash"] += key in sim
        lv["jac"] += key in jac
    return {
        "fixture": fx,
        "truth": truth,
        "per_level": per_level,
        "lsh_cand": lsh_cand,
        "lsh_est": lsh_est,
        "simhash": sim,
        "jac": jac,
        "jac_prefix": jac_prefix,
        "consts": {
            "bands": BANDS, "rows": ROWS_PER_BAND,
            "num_hashes": NUM_HASHES, "min_matching": MIN_MATCHING,
            "threshold": JACCARD_THRESHOLD,
        },
    }


# ---------------------------------------------------------------------------
# Vector (embedding) ground truth — round-6: the same planted-pair
# discipline applied to the embedding/semantic dedup family.
# ---------------------------------------------------------------------------

N_VEC_BASE = 140
VEC_DIM = 64
# planted target cosines; 1.0 = verbatim duplicate. 0.5 itself is excluded
# (it is the q_dedup_embedding threshold — planting ON the boundary would
# measure float rounding, not the algorithm)
COS_LEVELS = [1.0, 0.95, 0.9, 0.8, 0.7, 0.6, 0.4]
VEC_SEED = SEED + 1
VEC_THRESHOLD = 0.5  # NEAR_DUP_COS


@dataclass
class VectorFixture:
    rows: list[tuple[int, list[float]]]          # (vec_id, embedding)
    pairs: list[tuple[int, int, float]]          # (base, dup, target_cos)


def make_vector_fixture() -> VectorFixture:
    """Base vectors ~ uniform on the unit sphere (64-d); each base gets ONE
    planted near-duplicate at an EXACT target cosine c (orthogonal-noise
    construction: dup = c*u + sqrt(1-c^2)*w with w a unit vector ⊥ u), c
    cycling over COS_LEVELS. Accidental base-base cosines concentrate at
    ~N(0, 1/sqrt(64)) so the planted structure dominates above 0.5 — and
    the numpy all-pairs oracle (:func:`vector_truth_pairs`) counts any
    accidental crossings anyway."""
    import numpy as np

    rng = np.random.default_rng(VEC_SEED)
    rows: list[tuple[int, list[float]]] = []
    pairs: list[tuple[int, int, float]] = []
    next_id = 0
    for b in range(N_VEC_BASE):
        u = rng.normal(size=VEC_DIM)
        u /= np.linalg.norm(u)
        c = COS_LEVELS[b % len(COS_LEVELS)]
        w = rng.normal(size=VEC_DIM)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        dup = c * u + float(np.sqrt(max(0.0, 1.0 - c * c))) * w
        base_id, dup_id = next_id, next_id + 1
        next_id += 2
        rows.append((base_id, [float(x) for x in u]))
        rows.append((dup_id, [float(x) for x in dup]))
        pairs.append((base_id, dup_id, c))
    return VectorFixture(rows=rows, pairs=pairs)


def vector_truth_pairs(threshold: float = VEC_THRESHOLD) -> set[tuple[int, int]]:
    """ALL fixture pairs (planted or accidental) with exact cosine >=
    threshold, computed in pure numpy — the oracle for the engine-side
    pair joins."""
    import numpy as np

    fx = make_vector_fixture()
    ids = [i for i, _ in fx.rows]
    mat = np.array([v for _, v in fx.rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = mat @ mat.T
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if cos[i, j] >= threshold:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def sign_banding_probability(c: float, bands: int, rows: int) -> float:
    """Banding S-curve for sign-LSH: per-bit agreement p = 1 - theta/pi
    (Charikar 2002), then the standard 1-(1-p^r)^b band union."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, c))) / math.pi
    return 1.0 - (1.0 - p**rows) ** bands


def evaluate_vectors(spark):
    """Run the embedding-dedup family over the planted vector fixture:
    exact block-grid pairs (must EQUAL the numpy oracle), the LSH-banded
    scale path (precision 1.0, per-level recall vs the sign-banding
    formula), and the semantic-dedup composition (components must match a
    pure-Python union-find over the oracle edges)."""
    from go_web_mapreduce_spark.operators.dedup import connected_components
    from go_web_mapreduce_spark.operators.similarity import (
        LSH_DEDUP_BANDS,
        LSH_DEDUP_PLANES,
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )
    from pyspark.sql import functions as F

    fx = make_vector_fixture()
    emb = spark.createDataFrame(fx.rows, "vec_id long, embedding array<double>")

    def pairset(df) -> set[tuple[int, int]]:
        return {
            (min(r[0], r[1]), max(r[0], r[1]))
            for r in df.select("vec_a", "vec_b").collect()
        }

    exact = pairset(embedding_near_dup_pairs(emb, threshold=VEC_THRESHOLD))
    lsh = pairset(
        embedding_near_dup_pairs_lsh(emb, threshold=VEC_THRESHOLD)
    )
    truth = vector_truth_pairs(VEC_THRESHOLD)

    # per planted level: recall of each method + the banding prediction
    rows_per_band = LSH_DEDUP_PLANES // LSH_DEDUP_BANDS
    per_level: dict[float, dict] = {}
    for a, b, c in fx.pairs:
        key = (a, b)
        lv = per_level.setdefault(
            c,
            {"n": 0, "exact": 0, "lsh": 0, "formula_sum": 0.0,
             "formula_var": 0.0},
        )
        lv["n"] += 1
        lv["exact"] += key in exact
        lv["lsh"] += key in lsh
        pr = sign_banding_probability(c, LSH_DEDUP_BANDS, rows_per_band)
        # the planted pair only counts for LSH recall if it clears the
        # exact threshold at all (levels below 0.5 must find nothing)
        pr = pr if c >= VEC_THRESHOLD else 0.0
        lv["formula_sum"] += pr
        lv["formula_var"] += pr * (1 - pr)

    # semantic composition on the exact edges: engine components vs a
    # pure-Python union-find over the numpy-oracle edges
    edges = embedding_near_dup_pairs(emb, threshold=VEC_THRESHOLD).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    cc = {
        r["doc_id"]: r["root"] for r in connected_components(edges).collect()
    }
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in truth:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    py_groups: dict[int, set[int]] = {}
    for x in parent:
        py_groups.setdefault(find(x), set()).add(x)
    eng_groups: dict[int, set[int]] = {}
    for x, r in cc.items():
        eng_groups.setdefault(r, set()).add(x)
    groups_match = (
        {frozenset(g) for g in py_groups.values()}
        == {frozenset(g) for g in eng_groups.values()}
    )
    roots_are_min = all(r == min(g) for r, g in eng_groups.items())

    return {
        "fixture": fx,
        "truth": truth,
        "exact": exact,
        "lsh": lsh,
        "per_level": per_level,
        "groups_match": groups_match,
        "roots_are_min": roots_are_min,
        "consts": {
            "planes": LSH_DEDUP_PLANES,
            "bands": LSH_DEDUP_BANDS,
            "threshold": VEC_THRESHOLD,
        },
    }


def python_truth_pairs(threshold: float) -> set[tuple[int, int]]:
    """ALL fixture pairs (planted or accidental) with exact 3-shingle
    jaccard >= threshold, computed in pure Python — the oracle for the
    exact join methods."""
    fx = make_fixture()
    sh = {i: _shingles(t.split(" ")) for i, t in fx.rows}
    ids = sorted(sh)
    out = set()
    for i_idx, a in enumerate(ids):
        for b in ids[i_idx + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= threshold:
                out.add((a, b))
    return out


def main() -> None:
    from go_web_mapreduce_spark.session import get_spark

    spark = get_spark("dedup-quality", master="local[8]",
                      shuffle_partitions=8)
    ev = evaluate(spark)
    c = ev["consts"]
    print(
        f"| replace p | mean jaccard | banding P(cand) | LSH cand recall "
        f"| LSH est>= {c['min_matching']}/{c['num_hashes']} recall "
        f"| SimHash recall | exact-join recall |"
    )
    print("|---|---|---|---|---|---|---|")
    for p, lv in sorted(ev["per_level"].items()):
        n = lv["n"]
        print(
            f"| {p:.2f} | {lv['jaccard_sum'] / n:.3f} "
            f"| {lv['formula_sum'] / n:.3f} | {lv['lsh_cand'] / n:.3f} "
            f"| {lv['lsh_est'] / n:.3f} | {lv['simhash'] / n:.3f} "
            f"| {lv['jac'] / n:.3f} |"
        )
    truth_t = python_truth_pairs(c["threshold"])
    print(f"\nexact jaccard_pairs == python oracle: {ev['jac'] == truth_t}")
    print(f"prefix variant == inverted-index variant: "
          f"{ev['jac_prefix'] == ev['jac']}")
    tp = len(ev["lsh_est"] & set(ev["truth"]))
    print(f"LSH est-gate precision vs planted: {tp}/{len(ev['lsh_est'])}")

    vv = evaluate_vectors(spark)
    c = vv["consts"]
    print(
        f"\n| planted cos | banding P(cand) ({c['bands']}x"
        f"{c['planes'] // c['bands']}-bit) | LSH-banded recall "
        f"| exact-pairs recall |"
    )
    print("|---|---|---|---|")
    for cos_lv, lv in sorted(vv["per_level"].items(), reverse=True):
        n = lv["n"]
        print(
            f"| {cos_lv:.2f} | {lv['formula_sum'] / n:.3f} "
            f"| {lv['lsh'] / n:.3f} | {lv['exact'] / n:.3f} |"
        )
    print(f"\nexact embedding pairs == numpy oracle: "
          f"{vv['exact'] == vv['truth']}")
    print(f"LSH-banded precision (subset of oracle): "
          f"{vv['lsh'] <= vv['truth']}")
    print(f"semantic components == python union-find: {vv['groups_match']}"
          f" (roots are min ids: {vv['roots_are_min']})")


if __name__ == "__main__":
    main()
