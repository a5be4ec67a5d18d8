"""Dedup precision/recall against planted ground truth (VERDICT r4
next-steps #3). The fixture (tools/dedup_quality.py) plants one
near-duplicate per base doc at parameterized word-replace levels and
carries an exact pure-Python 3-shingle-jaccard oracle per pair, so the
assertions below are about the ALGORITHMS, not the corpus:

- the exact n-gram jaccard joins (inverted-index and prefix-filter
  variants) must return EXACTLY the pure-Python pair set — they claim
  exactness, so recall and precision are both 1.0 by assertion;
- MinHash-LSH candidate recall must meet the banding formula's guarantee
  P(cand|s) = 1-(1-s^r)^b within 3-sigma binomial slack, per
  replace-level — the b/r tradeoff stated in dedup.py docstrings,
  measured for the first time;
- SimHash at hamming<=3/60 must find every verbatim duplicate (its
  design point), and every pair it reports must be a genuinely similar
  planted pair, not noise.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from dedup_quality import (  # noqa: E402
    VEC_THRESHOLD,
    evaluate,
    evaluate_vectors,
    lsh_candidate_probability,
    python_truth_pairs,
    sign_banding_probability,
    vector_truth_pairs,
)


@pytest.fixture(scope="module")
def ev(spark):
    return evaluate(spark)


def test_exact_jaccard_joins_match_python_oracle(ev):
    truth = python_truth_pairs(ev["consts"]["threshold"])
    assert ev["jac"] == truth          # recall = precision = 1.0
    assert ev["jac_prefix"] == truth   # both formulations, same exact set


def test_lsh_recall_meets_banding_formula(ev):
    c = ev["consts"]
    for p, lv in sorted(ev["per_level"].items()):
        n = lv["n"]
        expect = lv["formula_sum"] / n
        sigma = math.sqrt(lv["formula_var"]) / n
        got = lv["lsh_cand"] / n
        assert got >= expect - 3 * sigma - 1e-9, (
            f"replace={p}: LSH candidate recall {got:.3f} below banding "
            f"guarantee {expect:.3f} - 3*{sigma:.3f} "
            f"(b={c['bands']}, r={c['rows']})"
        )


def test_lsh_estimate_gate_is_precise(ev):
    """Every pair surviving the n_matching >= 6/12 gate must be a planted
    pair (the fixture's unrelated docs share ~no shingles, so any false
    positive would be an estimator bug, not corpus noise)."""
    assert ev["lsh_est"] <= set(ev["truth"])
    # and the gate keeps the high-similarity population: recall 1.0 on
    # verbatim duplicates
    verbatim = {k for k, (p, j) in ev["truth"].items() if p == 0.0}
    assert verbatim <= ev["lsh_est"]


def test_simhash_design_point(ev):
    verbatim = {k for k, (p, j) in ev["truth"].items() if p == 0.0}
    assert verbatim <= ev["simhash"], "simhash must catch verbatim dups"
    assert ev["simhash"] <= set(ev["truth"]), "simhash reported a non-planted pair"


def test_formula_shape_sane():
    # the S-curve: monotone in s, ~0 at tiny s, ~1 near s=1
    assert lsh_candidate_probability(0.01, 4, 3) < 0.001
    assert lsh_candidate_probability(0.95, 4, 3) > 0.97
    xs = [lsh_candidate_probability(s / 20, 4, 3) for s in range(21)]
    assert xs == sorted(xs)


# ---------------------------------------------------------------------------
# Vector (embedding) family — round-6: planted near-duplicate VECTORS at
# exact target cosines (tools/dedup_quality.make_vector_fixture), so the
# embedding/semantic dedup paths get the same ground-truth discipline the
# shingle methods have had since round 5.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vv(spark):
    return evaluate_vectors(spark)


def test_exact_embedding_pairs_match_numpy_oracle(vv):
    """q_dedup_embedding's block-grid kernel claims exactness: the pair
    set must EQUAL the numpy all-pairs oracle (recall = precision = 1.0),
    including any accidental (non-planted) crossings."""
    assert vv["exact"] == vv["truth"]


def test_lsh_banded_embedding_recall_meets_sign_banding_formula(vv):
    """The sub-quadratic path's recall must track
    1-(1-p^r)^b with p = 1-acos(cos)/pi, within 3-sigma binomial slack
    per planted-cosine level; precision is 1.0 by construction (exact
    re-score), asserted as subset-of-oracle."""
    assert vv["lsh"] <= vv["truth"]  # precision 1.0
    for cos_lv, lv in sorted(vv["per_level"].items()):
        n = lv["n"]
        expect = lv["formula_sum"] / n
        sigma = math.sqrt(lv["formula_var"]) / n
        got = lv["lsh"] / n
        assert got >= expect - 3 * sigma - 1e-9, (
            f"cos={cos_lv}: banded recall {got:.3f} below sign-banding "
            f"guarantee {expect:.3f} - 3*{sigma:.3f}"
        )


def test_lsh_banded_finds_every_verbatim_duplicate(vv):
    """cos = 1.0 pairs have identical sign signatures, so every band
    agrees: recall at the verbatim level must be exactly 1.0 (the
    design-point guarantee, like SimHash's for text)."""
    lv = vv["per_level"][1.0]
    assert lv["lsh"] == lv["n"]


def test_semantic_components_match_python_union_find(vv):
    """The q_semantic_dedup composition (exact pairs -> connected
    components -> min-id keeper) must produce exactly the union-find
    partition of the oracle edge set."""
    assert vv["groups_match"]
    assert vv["roots_are_min"]


def test_sign_banding_formula_shape():
    assert sign_banding_probability(1.0, 2, 8) == pytest.approx(1.0)
    assert sign_banding_probability(0.0, 2, 8) < 0.01
    # monotone in cosine
    vals = [sign_banding_probability(c, 2, 8) for c in (0.4, 0.6, 0.8, 0.95)]
    assert vals == sorted(vals)


def test_vector_truth_contains_planted_above_threshold(vv):
    truth = vector_truth_pairs(VEC_THRESHOLD)
    for a, b, c in vv["fixture"].pairs:
        if c >= VEC_THRESHOLD + 1e-9:
            assert (a, b) in truth
        elif c <= VEC_THRESHOLD - 1e-9:
            assert (a, b) not in truth


def test_containment_catches_inclusion_dups_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much longer one must surface as
    a containment pair with jaccard far below the symmetric threshold, and
    containment must equal the exact set ratio computed locally."""
    from go_web_mapreduce_spark.functions.text import distinct_shingles_arrow, tokens
    from go_web_mapreduce_spark.operators.dedup import (
        CONTAIN_THRESHOLD,
        JACCARD_THRESHOLD,
        SHINGLE_K,
        containment_pairs,
        jaccard_pairs,
    )
    from pyspark.sql import functions as F

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, short),
            (2, filler + " " + short + " " + filler.replace("w", "v")),
            (3, "totally unrelated content nothing shared here at all okay"),
        ],
        ["doc_id", "text"],
    )
    shingled = docs.select(
        "doc_id",
        distinct_shingles_arrow(tokens("text"), SHINGLE_K).alias("shingles"),
    )
    got = containment_pairs(shingled).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in got}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # exact local replay of the same shingle sets
    def shset(text):
        tk = [t for t in text.lower().split() if t]
        if len(tk) < SHINGLE_K:
            return {" ".join(tk)}
        return {" ".join(tk[i : i + SHINGLE_K]) for i in range(len(tk) - SHINGLE_K + 1)}

    a, b = shset(short), shset(filler + " " + short + " " + filler.replace("w", "v"))
    inter = len(a & b)
    assert abs(r["containment"] - inter / min(len(a), len(b))) < 1e-12
    assert abs(r["jaccard"] - inter / len(a | b)) < 1e-12
    assert r["containment"] >= CONTAIN_THRESHOLD
    assert r["jaccard"] < JACCARD_THRESHOLD  # jaccard alone would miss it
    assert jaccard_pairs(shingled).filter(
        (F.col("doc_a") == 1) & (F.col("doc_b") == 2)
    ).count() == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs
