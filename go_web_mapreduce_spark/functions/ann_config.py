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

# measurement protocol (tools/ann_curves.py)
CURVES_SF_DIR = "/root/testdata/sf0.1"
CURVES_K = 10
CURVES_N_PROBES = 20

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


def pick_config(
    target_recall: float, family: str | None = None
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

    SCALE RULE (measured at sf10, SCALE.md round 9): these curves are
    per-CORPUS-SIZE — the shortlist/candidate knobs are absolute counts,
    so at 10× the vectors the same config covers 1/10 the corpus
    fraction and recall collapses (ivfpq's 0.82 point measured 0.44 at
    200k vectors). To carry an operating point to a new corpus size n,
    scale ``shortlist`` ∝ n to preserve ``candidate_fraction`` (and
    raise nprobe with it): shortlist 400→4000 + nprobe 16→32 restored
    recall@10 to 0.800 at 200k. candidate_fraction, not the raw knob,
    is the transferable quantity.
    """
    if family is None:
        return {f: _pick_one(target_recall, f) for f in MEASURED}
    out = _pick_one(target_recall, family)
    if out is None:
        best = max(r for _, _, r in MEASURED[family])
        raise ValueError(
            f"family {family!r} tops out at measured recall@{CURVES_K} "
            f"= {best:.3f} < target {target_recall} — pick another family "
            "(pick_config(target) compares all)"
        )
    return out


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
