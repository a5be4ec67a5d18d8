"""Measured ANN operating points + config picker (round 6).

``MEASURED`` is the operating-curve table produced by tools/ann_curves.py
at sf0.1 (2,000x64-d embeddings, 20 probes, recall@10 vs exact brute
force) — re-run that tool and refresh this table whenever the quantizer
training or the corpus changes (values here are from the round-6 run,
after training became engine-portable). The whole pipeline is
content-deterministic, so these numbers REPRODUCE exactly on the same
corpus — which is what tests/test_ann_config.py asserts.

:func:`pick_config` turns a recall target into the cheapest measured
configuration — the answer to "which knob, and how far" that the raw
curve table leaves to the reader. The candidate fraction is the cost
proxy: for IVF it is I/O (nprobe/C of the corpus bytes under the
partition-pruned layout), for PQ it is the exact-rerank fraction (the ADC
scan always reads all 8-byte codes), for LSH it is the scanned fraction.
"""

from __future__ import annotations

import math

# measurement protocol (tools/ann_curves.py)
CURVES_SF_DIR = "/root/testdata/sf0.1"
CURVES_K = 10
CURVES_N_PROBES = 20
# the corpus the MEASURED table was produced on: sf0.1 = 2,000 vectors.
# Every shortlist/radius knob in MEASURED is an ABSOLUTE count relative
# to this n — the reason fixed knobs collapse at a new corpus size.
CURVES_CORPUS_SIZE = 2_000
# the coarse quantizer's cluster count (operators/similarity.py
# IVF_CENTROIDS) — nprobe's ceiling
IVF_C = 32

# (config, candidate_fraction, recall@10) per family, sorted by fraction.
MEASURED: dict[str, list[tuple[dict, float, float]]] = {
    "lsh": [
        ({"radius": 0}, 0.004, 0.125),
        ({"radius": 1}, 0.035, 0.255),
        ({"radius": 2}, 0.145, 0.400),
    ],
    "ivf": [
        ({"nprobe": 1}, 1 / 32, 0.255),
        ({"nprobe": 2}, 2 / 32, 0.350),
        ({"nprobe": 4}, 4 / 32, 0.515),
        ({"nprobe": 8}, 8 / 32, 0.625),
        ({"nprobe": 16}, 16 / 32, 0.835),
        ({"nprobe": 32}, 32 / 32, 1.000),
    ],
    "pq": [
        ({"shortlist": 50, "m": 8, "ksub": 16}, 0.025, 0.485),
        ({"shortlist": 100, "m": 8, "ksub": 8}, 0.050, 0.525),
        ({"shortlist": 100, "m": 4, "ksub": 16}, 0.050, 0.480),
        ({"shortlist": 100, "m": 8, "ksub": 16}, 0.050, 0.640),
        ({"shortlist": 100, "m": 16, "ksub": 16}, 0.050, 0.870),
        ({"shortlist": 200, "m": 8, "ksub": 16}, 0.100, 0.820),
        ({"shortlist": 400, "m": 8, "ksub": 16}, 0.200, 0.960),
    ],
    "ivfpq": [
        ({"nprobe": 4, "shortlist": 100}, 4 / 32, 0.505),
        ({"nprobe": 8, "shortlist": 100}, 8 / 32, 0.580),
        ({"nprobe": 16, "shortlist": 100}, 16 / 32, 0.670),
        ({"nprobe": 16, "shortlist": 400}, 16 / 32, 0.820),
        ({"nprobe": 32, "shortlist": 400}, 32 / 32, 0.955),
    ],
}


# Re-measurements at OTHER corpus sizes (SCALE.md round 9, sf10 =
# 200,000 vectors = 100x the curve corpus). Two lessons, both encoded in
# scale_config below: (1) the unscaled knobs collapse — the default
# (nprobe=8, shortlist=100) fell 0.58 -> 0.26 and pick_config(0.8)'s
# (nprobe=16, shortlist=400) fell 0.82 -> 0.44; (2) preserving the
# candidate FRACTION restores the curve — shortlist 400 -> 4000 (the
# same 2% rerank fraction) measured 0.745 at nprobe=16 and 0.800 at
# nprobe=32. Keyed by (family, corpus_size); configs listed with the
# recall actually observed.
MEASURED_AT_SCALE: dict[tuple[str, int], list[tuple[dict, float]]] = {
    ("ivfpq", 200_000): [
        ({"nprobe": 8, "shortlist": 100}, 0.26),  # unscaled default
        ({"nprobe": 16, "shortlist": 400}, 0.44),  # unscaled 0.8-pick
        ({"nprobe": 16, "shortlist": 4000}, 0.745),  # fraction-preserved
        ({"nprobe": 32, "shortlist": 4000}, 0.800),  # + nprobe doubling
    ],
}


def scale_config(config: dict, corpus_size: int) -> dict:
    """Carry a MEASURED operating point to a corpus of ``corpus_size``
    vectors — the executable form of the scale rule the sf10
    re-measurement proved (MEASURED_AT_SCALE above):

    - ``shortlist`` (and LSH ``radius``'s bucket analogue does not
      apply — radius is already corpus-relative) scales ∝ n so the
      exact-rerank **candidate fraction** — the transferable quantity —
      is preserved: ceil(shortlist · n / CURVES_CORPUS_SIZE).
    - ``nprobe`` doubles per decade of scale-up, capped at IVF_C: the
      fraction nprobe/C is nominally corpus-independent, but with 100×
      points per Voronoi cell the coarse-quantizer boundary losses grow
      — measured: a 10×'d shortlist alone recovered only 0.745 of the
      0.82 base point; doubling nprobe 16→32 restored 0.800. (At
      nprobe=C the coarse quantizer is exhaustive and the loss term is
      gone entirely.)
    - ``m``/``ksub`` are per-vector code parameters — corpus-size
      independent, unchanged.

    This is the conservative EXTRAPOLATION: fraction preservation keeps
    the operating point on the measured curve, at ∝n rerank cost. Where
    a cheaper operating point has actually been measured at the target
    size (MEASURED_AT_SCALE — e.g. 200k vectors needs only shortlist
    4000, a tenth of the fraction-preserving 40,000, for recall 0.800),
    :func:`pick_config` returns that observation instead of this rule.

    Down-scaling (corpus smaller than the curve corpus) floors at the
    measured knobs — the measured point is already achievable.
    """
    scale = corpus_size / CURVES_CORPUS_SIZE
    out = dict(config)
    if scale <= 1:
        return out
    if "shortlist" in out:
        out["shortlist"] = int(math.ceil(out["shortlist"] * scale))
    if "nprobe" in out:
        decades = math.ceil(math.log10(scale))
        out["nprobe"] = min(IVF_C, out["nprobe"] * 2**decades)
    return out


def pick_config(
    target_recall: float,
    family: str | None = None,
    corpus_size: int | None = None,
) -> dict | dict[str, dict | None]:
    """Cheapest measured configuration meeting ``target_recall``.

    Returns ``{"family", "config", "expected_recall",
    "candidate_fraction"}`` for one family, or a per-family dict when
    ``family`` is None (``None`` value where the family's measured curve
    never reaches the target — e.g. sign-LSH tops out at 0.40 on this
    weakly separated corpus; use IVF/PQ there).

    Deliberately selects among MEASURED points instead of interpolating
    between them: the curve is concave in places (PQ's cheapest recall
    lever is ``m``, not the shortlist) and an interpolated knob value
    would return an UNMEASURED promise. The returned expected_recall is a
    number that was actually observed — and, the pipeline being
    content-deterministic, reproduces exactly under the measurement
    protocol (tests/test_ann_config.py).

    SCALE RULE (measured at sf10, SCALE.md round 9; now EXECUTABLE):
    these curves are per-CORPUS-SIZE — the shortlist/candidate knobs are
    absolute counts, so at 10× the vectors the same config covers 1/10
    the corpus fraction and recall collapses (ivfpq's 0.82 point
    measured 0.44 at 200k vectors). Pass ``corpus_size`` and the picked
    config is carried to that n: if a re-measurement exists at that
    exact size (MEASURED_AT_SCALE), the cheapest measured point meeting
    the target is returned with its OBSERVED recall
    (``recall_basis = "measured-at-scale"`` — at 200k that is shortlist
    4000 + nprobe 32 → 0.800, a tenth of the fraction-preserving
    shortlist); otherwise :func:`scale_config` extrapolates by
    preserving the candidate fraction (shortlist ∝ n; nprobe doubled
    per decade, capped at IVF_C) and ``recall_basis = "fraction-rule"``
    with expected_recall still the base-curve observation the rule aims
    to preserve. Without ``corpus_size`` the knobs are valid ONLY at
    CURVES_CORPUS_SIZE vectors.
    """
    if family is None:
        return {
            f: _scaled(_pick_one(target_recall, f), f, target_recall,
                       corpus_size)
            for f in MEASURED
        }
    out = _pick_one(target_recall, family)
    if out is None:
        best = max(r for _, _, r in MEASURED[family])
        raise ValueError(
            f"family {family!r} tops out at measured recall@{CURVES_K} "
            f"= {best:.3f} < target {target_recall} — pick another family "
            "(pick_config(target) compares all)"
        )
    return _scaled(out, family, target_recall, corpus_size)


def _scaled(
    pick: dict | None,
    family: str,
    target_recall: float,
    corpus_size: int | None,
):
    if pick is None or corpus_size is None:
        return pick
    # measured override: entries are listed cheapest-first, so the first
    # one meeting the target is the pick
    for m_cfg, m_recall in MEASURED_AT_SCALE.get((family, corpus_size), []):
        if m_recall >= target_recall:
            return dict(
                pick,
                config=dict(m_cfg),
                expected_recall=m_recall,
                corpus_size=corpus_size,
                recall_basis="measured-at-scale",
            )
    return dict(
        pick,
        config=scale_config(pick["config"], corpus_size),
        corpus_size=corpus_size,
        recall_basis="fraction-rule",
    )


def _pick_one(target_recall: float, family: str) -> dict | None:
    if family not in MEASURED:
        raise KeyError(f"unknown family {family!r}; have {sorted(MEASURED)}")
    hits = [
        (frac, recall, cfg)
        for cfg, frac, recall in MEASURED[family]
        if recall >= target_recall
    ]
    if not hits:
        return None
    frac, recall, cfg = min(hits, key=lambda t: (t[0], -t[1]))
    return {
        "family": family,
        "config": dict(cfg),
        "expected_recall": recall,
        "candidate_fraction": frac,
    }
