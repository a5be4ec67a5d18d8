"""DuckDB oracle generators for the iterative linear-algebra queries.

Round 6 closes the last two rows-only registry entries
(``q_svd_top_component``, ``q_ml_logreg``) by making the ITERATION ITSELF
engine-portable, the same discipline that converted the IVF/PQ family
(functions/ann_oracle.py) and the BPE training loop:

* a fixed iteration count is part of the algorithm's definition (no
  convergence races, no RNG);
* every step is either elementwise float64 arithmetic (bit-identical
  across engines) or a bounded SUM whose ~1e-15 cross-engine accumulation
  drift is provably damped by the algorithm (normalized matrix powers and
  converged Newton steps are stable maps — measured agreement ~1e-15 /
  ~1e-12, six decimal orders inside the driver's 6-decimal rounding);
* the Spark side runs the numerically IDENTICAL algorithm in driver-side
  numpy on the distributed partials (gram/gradient/Hessian), so both
  engines compute the same function of corpus content.

**Top principal component** replays the classical power method with
REPEATED SQUARING: the embeddings' Gram spectrum is near-isotropic
(measured lambda2/lambda1 = 0.984 at sf0.01..sf0.1 — a Marchenko-Pastur
bulk edge), so plain power iteration needs ~900 steps to converge below
the 1e-6 hash granularity; squaring the (max-rescaled) matrix ``s`` times
yields the G^(2^s) direction in ``s`` 64x64 matmuls — 2^10 = 1024
effective iterations, residual (lambda2/lambda1)^1024 ~ 6e-8, measured
cross-engine loading agreement 3e-15.

**Logistic regression** replays the distributed-Newton fit with the dense
linear solve replaced by a fixed-iteration NEWTON-SCHULZ inverse
(X_{k+1} = X_k (2I - H X_k), X_0 = I / ||H||_inf) — quadratic convergence
for the SPD ridge-regularized Hessian, every step a 65x65 matmul both
engines express identically, and the identity-scaled init makes the
required iteration count ~constant in corpus size (see LOGREG_SCHULZ).

Reference parity note: the reference (go-web-mapreduce) names SVD among
its intended MapReduce workloads (presentation.pptx "What is MapReduce?"
slide) but ships no linear-algebra surface; this family is part of the
extension mandate (SURVEY.md §2, LLM-data-pipeline operators).
"""

from __future__ import annotations

SVD_SQUARINGS = 10  # 2^10 = 1024 effective power iterations
# the top-k variant needs a deeper schedule: deflation errors compound
# (a residual eps in v1 injects lam1*eps into the deflated matrix, which
# the next component amplifies by 1/gap), and the Marchenko-Pastur bulk's
# eigenvalue ratios tighten toward 1 as the corpus grows. 2^14 = 16384
# effective iterations drive each component to machine precision through
# ratio 0.999 (measured: all three components align with np.linalg.eigh
# to < 5e-16 at sf0.01); each extra squaring is one more 64x64 matmul.
SVD_TOPK_SQUARINGS = 14
SVD_TOPK = 3
# Newton-Schulz iterations for the logreg Hessian solve, with the
# scale-invariant init X_0 = I/||H||_inf: the error spectral radius is
# 1 - lambda_min/||H||_inf, and both lambda_min and ||H||_inf grow ~n with
# corpus rows, so the required count is ~constant in data scale (measured
# np.linalg.solve parity: n=500 -> 16, n=2e3 -> 18, n=2e5 -> 20 iters; the
# rejected X_0 = H/(||H||_1 ||H||_inf) init needs log2(n) more). 24 leaves
# two doublings of margin, and over-iterating past convergence is a fixed
# point (X(2I-HX) = X when X = H^-1), so the constant is safe everywhere.
LOGREG_SCHULZ = 24
_EMB = "SELECT vec_id AS id, embedding AS emb FROM embeddings"


def gram_ctes(p: str, src: str, dim: int) -> tuple[list[str], str]:
    """CTEs building the dim x dim Gram matrix ``(i, j, v)`` (1-based) of
    the ``(id, emb)`` source — the SQL twin of ``gram_matrix``'s one-pass
    distributed partials."""
    lines = [
        f"{p}el AS MATERIALIZED (SELECT id, t.d, emb[t.d]::DOUBLE AS v "
        f"FROM ({src}) {p}el_t, range(1, {dim + 1}) t(d))",
        f"{p}g AS MATERIALIZED (SELECT a.d AS i, b.d AS j, SUM(a.v*b.v) AS v "
        f"FROM {p}el a JOIN {p}el b USING (id) GROUP BY a.d, b.d)",
    ]
    return lines, f"{p}g"


def svd_oracle(dim: int, squarings: int = SVD_SQUARINGS) -> str:
    """Full oracle for ``q_svd_top_component`` — Gram, ``squarings``
    max-rescaled squarings, column extraction at the argmax-diagonal
    index, L2 normalization, largest-|component|-positive sign fix,
    Rayleigh-quotient singular value and explained variance."""
    ctes, g = gram_ctes("", _EMB, dim)
    ctes += [
        f"tr AS (SELECT SUM(v) AS t FROM {g} WHERE i = j)",
        # start basis vector: argmax of diag(G), ties to the lowest index
        # (numpy argmax convention)
        f"jsel AS (SELECT i AS jj FROM {g} WHERE i = j "
        f"ORDER BY v DESC, i ASC LIMIT 1)",
        f"mx0 AS (SELECT MAX(ABS(v)) AS m FROM {g})",
        f"m0 AS MATERIALIZED (SELECT i, j, {g}.v / (SELECT m FROM mx0) AS v "
        f"FROM {g})",
    ]
    prev = "m0"
    for t in range(1, squarings + 1):
        ctes += [
            f"r{t} AS MATERIALIZED (SELECT a.i, b.j, SUM(a.v*b.v) AS v "
            f"FROM {prev} a JOIN {prev} b ON a.j = b.i GROUP BY a.i, b.j)",
            f"x{t} AS (SELECT MAX(ABS(v)) AS m FROM r{t})",
            f"m{t} AS MATERIALIZED (SELECT i, j, r{t}.v / (SELECT m FROM x{t}) AS v "
            f"FROM r{t})",
        ]
        prev = f"m{t}"
    ctes += [
        f"vraw AS (SELECT i, v FROM {prev} WHERE j = (SELECT jj FROM jsel))",
        "vnrm AS (SELECT SQRT(SUM(v*v)) AS n FROM vraw)",
        "vu AS (SELECT i, v / (SELECT n FROM vnrm) AS v FROM vraw)",
        "sgn AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s "
        "FROM vu ORDER BY ABS(v) DESC, i ASC LIMIT 1)",
        "vf AS MATERIALIZED (SELECT i, v * (SELECT s FROM sgn) AS v FROM vu)",
        f"ray AS (SELECT SUM(a.v * g.v * b.v) AS lam "
        f"FROM vf a JOIN {g} g ON a.i = g.i JOIN vf b ON g.j = b.i)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT (i - 1)::BIGINT AS component, v AS loading,\n"
        "       SQRT(GREATEST((SELECT lam FROM ray), 0.0)) AS singular_value,\n"
        "       (SELECT lam FROM ray) / (SELECT t FROM tr) AS explained_variance\n"
        "FROM vf ORDER BY component"
    )


def _power_ctes(p: str, src_cte: str, squarings: int) -> tuple[list[str], str]:
    """CTEs for one max-rescaled repeated-squaring chain over matrix CTE
    ``src_cte`` (long form ``(i, j, v)``), prefixed ``p``. Returns
    ``(cte_list, final_matrix_cte)``."""
    lines = [
        f"{p}mx0 AS (SELECT MAX(ABS(v)) AS m FROM {src_cte})",
        f"{p}m0 AS MATERIALIZED (SELECT i, j, {src_cte}.v / (SELECT m FROM {p}mx0) AS v "
        f"FROM {src_cte})",
    ]
    prev = f"{p}m0"
    for t in range(1, squarings + 1):
        lines += [
            f"{p}r{t} AS MATERIALIZED (SELECT a.i, b.j, SUM(a.v*b.v) AS v "
            f"FROM {prev} a JOIN {prev} b ON a.j = b.i GROUP BY a.i, b.j)",
            f"{p}x{t} AS (SELECT MAX(ABS(v)) AS m FROM {p}r{t})",
            f"{p}m{t} AS MATERIALIZED (SELECT i, j, {p}r{t}.v / (SELECT m FROM {p}x{t}) AS v "
            f"FROM {p}r{t})",
        ]
        prev = f"{p}m{t}"
    return lines, prev


def svd_topk_oracle(
    dim: int, k: int = SVD_TOPK, squarings: int = SVD_TOPK_SQUARINGS
) -> str:
    """Oracle for ``q_svd_topk`` — the top-``k`` principal components by
    repeated squaring with HOTELLING DEFLATION between components
    (G_{c+1} = G_c − λ_c v_c v_cᵀ, λ_c the Rayleigh quotient on the
    ORIGINAL Gram so explained-variance shares stay exact); each
    component replays the q_svd_top_component extraction (argmax-diagonal
    start column, L2 normalization, largest-|entry|-positive sign)."""
    ctes, g = gram_ctes("", _EMB, dim)
    ctes.append(f"tr AS (SELECT SUM(v) AS t FROM {g} WHERE i = j)")
    cur = g
    selects = []
    for c in range(1, k + 1):
        ctes.append(
            f"jsel{c} AS (SELECT i AS jj FROM {cur} WHERE i = j "
            f"ORDER BY v DESC, i ASC LIMIT 1)"
        )
        power, last = _power_ctes(f"c{c}", cur, squarings)
        ctes += power
        ctes += [
            f"vraw{c} AS (SELECT i, v FROM {last} WHERE j = (SELECT jj FROM jsel{c}))",
            f"vnrm{c} AS (SELECT SQRT(SUM(v*v)) AS n FROM vraw{c})",
            f"vu{c} AS (SELECT i, v / (SELECT n FROM vnrm{c}) AS v FROM vraw{c})",
            f"sgn{c} AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s "
            f"FROM vu{c} ORDER BY ABS(v) DESC, i ASC LIMIT 1)",
            f"vf{c} AS MATERIALIZED (SELECT i, v * (SELECT s FROM sgn{c}) AS v "
            f"FROM vu{c})",
            f"ray{c} AS (SELECT SUM(a.v * g.v * b.v) AS lam "
            f"FROM vf{c} a JOIN {g} g ON a.i = g.i JOIN vf{c} b ON g.j = b.i)",
        ]
        if c < k:
            ctes.append(
                f"gd{c + 1} AS MATERIALIZED (SELECT g.i, g.j, "
                f"g.v - (SELECT lam FROM ray{c}) * (a.v * b.v) AS v "
                f"FROM {cur} g JOIN vf{c} a ON a.i = g.i "
                f"JOIN vf{c} b ON b.i = g.j)"
            )
            cur = f"gd{c + 1}"
        selects.append(
            f"SELECT {c}::BIGINT AS comp, (i - 1)::BIGINT AS component, "
            f"v AS loading, "
            f"SQRT(GREATEST((SELECT lam FROM ray{c}), 0.0)) AS singular_value, "
            f"(SELECT lam FROM ray{c}) / (SELECT t FROM tr) AS explained_variance "
            f"FROM vf{c}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(selects)


def logreg_oracle(
    dim: int,
    iters: int,
    l2: float,
    plane: list[float],
    schulz: int = LOGREG_SCHULZ,
) -> str:
    """Full oracle for ``q_ml_logreg`` — the generic Newton fit replay
    (:func:`logreg_core_oracle`) over embedding features with md5-plane
    labels (left-fold dot against the literal plane, the same
    accumulation order as the engine's F.aggregate fold)."""
    pl = "[" + ", ".join(repr(float(v)) for v in plane) + "]"
    feat_sql = (
        f"SELECT id, emb, CASE WHEN "
        f"list_reduce(list_transform(range(len(emb)), "
        f"i -> emb[i+1]::DOUBLE * ({pl})[i+1]), (x, y) -> x + y) > 0 "
        f"THEN 1.0 ELSE 0.0 END AS y FROM ({_EMB}) lab_t"
    )
    return logreg_core_oracle(dim, iters, l2, feat_sql, schulz)


def logreg_core_oracle(
    dim: int,
    iters: int,
    l2: float,
    feat_sql: str,
    schulz: int = LOGREG_SCHULZ,
) -> str:
    """Replay of ``operators/ml.logreg_fit`` over ANY feature source:
    ``feat_sql`` must yield ``(id, emb, y)`` with ``emb`` a ``dim``-long
    list and ``y`` in {0.0, 1.0}. Bias-augmented long-form features,
    stable sigmoid, per-iteration gradient/Hessian aggregation, and the
    Hessian solve as ``schulz`` Newton-Schulz steps — the numerically
    identical fixed-iteration algorithm the engine runs in driver-side
    numpy on distributed partials.

    Every CTE is MATERIALIZED: the NS recurrence references each iterate
    twice (in H@X and in X@T), and an inlining CTE planner would otherwise
    recompute the chain exponentially.
    """
    a = dim + 1  # augmented dimension (last row/col = bias)
    ctes = [
        f"feat AS MATERIALIZED ({feat_sql})",
        # bias-augmented long-form features (id, d, v), d 1-based, d=a -> 1
        f"xel AS MATERIALIZED (SELECT id, t.d, "
        f"CASE WHEN t.d = {a} THEN 1.0 ELSE emb[t.d]::DOUBLE END AS v "
        f"FROM feat, range(1, {a + 1}) t(d))",
        "lab AS MATERIALIZED (SELECT id, y FROM feat)",
        f"w0 AS MATERIALIZED (SELECT t.d, 0.0 AS v FROM range(1, {a + 1}) t(d))",
    ]
    w = "w0"
    for t in range(1, iters + 1):
        ctes += [
            f"z{t} AS MATERIALIZED (SELECT x.id, SUM(x.v * w.v) AS z "
            f"FROM xel x JOIN {w} w USING (d) GROUP BY x.id)",
            # overflow-stable sigmoid: exp only ever sees -|z| (ml.logreg_fit)
            f"p{t} AS MATERIALIZED (SELECT z.id, CASE WHEN z >= 0 "
            f"THEN 1.0/(1.0 + EXP(-z)) ELSE EXP(z)/(1.0 + EXP(z)) END AS p, "
            f"lab.y FROM z{t} z JOIN lab USING (id))",
            f"g{t} AS MATERIALIZED (SELECT x.d, SUM(x.v * (p.p - p.y)) AS v "
            f"FROM xel x JOIN p{t} p USING (id) GROUP BY x.d)",
            # ridge on gradient and Hessian diag; bias (d = a) unpenalized
            f"ga{t} AS MATERIALIZED (SELECT g.d, g.v + "
            f"CASE WHEN g.d = {a} THEN 0.0 ELSE {l2!r} * w.v END AS v "
            f"FROM g{t} g JOIN {w} w USING (d))",
            f"h{t} AS MATERIALIZED (SELECT a.d AS i, b.d AS j, "
            f"SUM((a.v * (p.p * (1.0 - p.p))) * b.v) AS v "
            f"FROM xel a JOIN xel b USING (id) JOIN p{t} p USING (id) "
            f"GROUP BY a.d, b.d)",
            f"ha{t} AS MATERIALIZED (SELECT i, j, v + "
            f"CASE WHEN i = j AND i < {a} THEN {l2!r} ELSE 0.0 END AS v "
            f"FROM h{t})",
            # Newton-Schulz init: X0 = I / ||H||_inf (scale-invariant)
            f"ni{t} AS (SELECT MAX(s) AS v FROM "
            f"(SELECT i, SUM(ABS(v)) AS s FROM ha{t} GROUP BY i))",
            f"k{t}_0 AS MATERIALIZED (SELECT t.d AS i, t.d AS j, "
            f"1.0 / (SELECT v FROM ni{t}) AS v FROM range(1, {a + 1}) t(d))",
        ]
        k = f"k{t}_0"
        for s in range(1, schulz + 1):
            ctes += [
                # X_{k+1} = X_k (2I - H X_k)
                f"hx{t}_{s} AS MATERIALIZED (SELECT h.i, k.j, "
                f"SUM(h.v * k.v) AS v FROM ha{t} h JOIN {k} k ON h.j = k.i "
                f"GROUP BY h.i, k.j)",
                f"k{t}_{s} AS MATERIALIZED (SELECT x.i, tt.j, "
                f"SUM(x.v * tt.v) AS v FROM {k} x JOIN "
                f"(SELECT i, j, CASE WHEN i = j THEN 2.0 ELSE 0.0 END - v AS v "
                f"FROM hx{t}_{s}) tt ON x.j = tt.i GROUP BY x.i, tt.j)",
            ]
            k = f"k{t}_{s}"
        ctes += [
            f"dw{t} AS MATERIALIZED (SELECT k.i AS d, SUM(k.v * g.v) AS v "
            f"FROM {k} k JOIN ga{t} g ON k.j = g.d GROUP BY k.i)",
            f"w{t} AS MATERIALIZED (SELECT w.d, w.v - dw.v AS v "
            f"FROM {w} w JOIN dw{t} dw USING (d))",
        ]
        w = f"w{t}"
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT (d - 1)::BIGINT AS component, v AS weight "
        f"FROM {w} ORDER BY component"
    )
