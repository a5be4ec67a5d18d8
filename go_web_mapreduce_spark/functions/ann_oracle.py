"""DuckDB oracle generators for the IVF/PQ ANN query family.

Round 5 made quantizer/codebook training a pure function of corpus CONTENT
(driver-side numpy Lloyd over an id-hash-ordered capped sample); round 6
makes every training step ENGINE-PORTABLE — md5(cast(id as string)) sample
key (identical bytes in Spark and DuckDB), init = first-k hash-ordered
sample rows (no RNG), empty clusters keep their previous centroid — so the
whole train → assign → shortlist → exact-rerank pipeline replays as plain
SQL and the previously rows-only ANN queries become hash-verified.

Each generator emits CTE fragments; the ``*_oracle`` functions compose the
four query oracles. The Lloyd iterations are UNROLLED (the q_bpe_train
5-level-CTE discipline): a fixed iteration count is part of the algorithm's
definition here, not a convergence loop.

Float discipline: OUTPUT scores are left-fold cosines on both engines
(bit-identical — the established _COS_SQL / dimension-sequential-numpy
parity). Training intermediates (per-dim means, squared distances) are
unordered SUM/AVG aggregations whose ~1e-15 cross-engine drift can only
change results if a sample point sits equally distant from two centroids
or two ADC scores tie at the shortlist boundary — measure-zero on real
embeddings; the driver's 6-decimal rounding adds further slack.

Reference parity note: the reference engine (go-web-mapreduce) has no ANN
surface; this family is part of the extension mandate (SURVEY.md §2,
LLM-data-pipeline operators).
"""

from __future__ import annotations

# DuckDB mirror of the engine's fold-based cosine (same text as
# operators/similarity._COS_SQL — duplicated here to keep this module
# import-free of the operators package, which imports us at registration)
_COS = """
  list_reduce(list_transform(range(len({a})), i -> {a}[i+1]::DOUBLE * {b}[i+1]::DOUBLE),
              (x, y) -> x + y)
  / (sqrt(list_reduce(list_transform({a}, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y))
     * sqrt(list_reduce(list_transform({b}, x -> x::DOUBLE * x::DOUBLE), (x, y) -> x + y)))
"""


def _cos(a: str, b: str) -> str:
    return _COS.format(a=a, b=b)


def lloyd_ctes(
    p: str, src: str, dim: int, k: int, iters: int, cap: int
) -> tuple[list[str], str]:
    """CTEs replaying ``ivf_assign``'s driver-side numpy Lloyd training.

    ``src`` is SQL yielding ``(id, emb)``. Returns ``(cte_list,
    final_centroid_cte)``; the final CTE is long-form ``(cid, d, v)``
    with ``d`` 1-based.
    """
    lines = [
        f"{p}samp AS MATERIALIZED (SELECT emb, md5(CAST(id AS VARCHAR)) AS hk "
        f"FROM ({src}) {p}s_t ORDER BY hk LIMIT {cap})",
        f"{p}sr AS MATERIALIZED (SELECT row_number() OVER (ORDER BY hk) - 1 AS sid, emb "
        f"FROM {p}samp)",
        f"{p}sl AS MATERIALIZED (SELECT sid, t.d, emb[t.d]::DOUBLE AS v "
        f"FROM {p}sr, range(1, {dim + 1}) t(d))",
        f"{p}c0 AS MATERIALIZED (SELECT sid AS cid, d, v FROM {p}sl WHERE sid < {k})",
    ]
    prev = f"{p}c0"
    for t in range(1, iters + 1):
        lines += [
            f"{p}d{t} AS MATERIALIZED (SELECT s.sid, c.cid, "
            f"SUM((s.v - c.v)*(s.v - c.v)) AS dd "
            f"FROM {p}sl s JOIN {prev} c USING (d) GROUP BY s.sid, c.cid)",
            f"{p}a{t} AS MATERIALIZED (SELECT sid, cid FROM {p}d{t} QUALIFY "
            f"row_number() OVER (PARTITION BY sid ORDER BY dd, cid) = 1)",
            f"{p}m{t} AS MATERIALIZED (SELECT a.cid, s.d, AVG(s.v) AS v "
            f"FROM {p}a{t} a JOIN {p}sl s USING (sid) GROUP BY a.cid, s.d)",
            f"{p}c{t} AS MATERIALIZED (SELECT pc.cid, pc.d, COALESCE(m.v, pc.v) AS v "
            f"FROM {prev} pc LEFT JOIN {p}m{t} m "
            f"ON m.cid = pc.cid AND m.d = pc.d)",
        ]
        prev = f"{p}c{t}"
    return lines, prev


def assign_ctes(
    p: str, src: str, dim: int, cent: str
) -> tuple[list[str], str, str]:
    """CTEs replaying ``ivf_assign_frozen`` (Euclidean argmin, ties to the
    lowest cid). Returns ``(cte_list, dist_cte, assign_cte)`` — the dist
    CTE ``(id, cid, dd)`` is reused by the kNN-graph probe-list ranking."""
    lines = [
        f"{p}cl AS MATERIALIZED (SELECT id, t.d, emb[t.d]::DOUBLE AS v "
        f"FROM ({src}) {p}c_t, range(1, {dim + 1}) t(d))",
        f"{p}ad AS MATERIALIZED (SELECT a.id, c.cid, SUM((a.v - c.v)*(a.v - c.v)) AS dd "
        f"FROM {p}cl a JOIN {cent} c USING (d) GROUP BY a.id, c.cid)",
        f"{p}asg AS MATERIALIZED (SELECT id, cid FROM {p}ad QUALIFY "
        f"row_number() OVER (PARTITION BY id ORDER BY dd, cid) = 1)",
    ]
    return lines, f"{p}ad", f"{p}asg"


def pq_lloyd_ctes(
    p: str,
    src: str,
    dim: int,
    m: int,
    ksub: int,
    iters: int,
    cap: int,
    normalize: bool,
) -> tuple[list[str], str]:
    """CTEs replaying ``pq_train``: per-subspace Lloyd over the md5-ordered
    capped sample. ``normalize`` mirrors _normalize_rows (zero-norm rows
    kept verbatim). Returns ``(cte_list, final_codebook_cte)``; the final
    CTE is ``(j, c, sd, v)`` with ``sd`` 0-based within the subspace."""
    dsub = dim // m
    lines = [
        f"{p}ps AS MATERIALIZED (SELECT emb, md5(CAST(id AS VARCHAR)) AS hk "
        f"FROM ({src}) {p}p_t ORDER BY hk LIMIT {cap})",
        f"{p}pr AS MATERIALIZED (SELECT row_number() OVER (ORDER BY hk) - 1 AS sid, emb "
        f"FROM {p}ps)",
        f"{p}pl AS MATERIALIZED (SELECT sid, t.d, emb[t.d]::DOUBLE AS v "
        f"FROM {p}pr, range(1, {dim + 1}) t(d))",
    ]
    base = f"{p}pl"
    if normalize:
        lines += [
            f"{p}pn AS MATERIALIZED (SELECT sid, sqrt(SUM(v*v)) AS nrm FROM {p}pl "
            f"GROUP BY sid)",
            f"{p}pu AS MATERIALIZED (SELECT l.sid, l.d, "
            f"CASE WHEN n.nrm = 0 THEN l.v ELSE l.v / n.nrm END AS v "
            f"FROM {p}pl l JOIN {p}pn n USING (sid))",
        ]
        base = f"{p}pu"
    lines.append(
        f"{p}px AS MATERIALIZED (SELECT sid, ((d-1)//{dsub})::INT AS j, "
        f"((d-1)%{dsub})::INT AS sd, v FROM {base})"
    )
    lines.append(
        f"{p}b0 AS MATERIALIZED (SELECT j, sid AS c, sd, v FROM {p}px WHERE sid < {ksub})"
    )
    prev = f"{p}b0"
    for t in range(1, iters + 1):
        lines += [
            f"{p}bd{t} AS MATERIALIZED (SELECT s.sid, s.j, c.c, "
            f"SUM((s.v - c.v)*(s.v - c.v)) AS dd FROM {p}px s "
            f"JOIN {prev} c ON s.j = c.j AND s.sd = c.sd "
            f"GROUP BY s.sid, s.j, c.c)",
            f"{p}ba{t} AS MATERIALIZED (SELECT sid, j, c FROM {p}bd{t} QUALIFY "
            f"row_number() OVER (PARTITION BY sid, j ORDER BY dd, c) = 1)",
            f"{p}bm{t} AS MATERIALIZED (SELECT a.j, a.c, s.sd, AVG(s.v) AS v "
            f"FROM {p}ba{t} a JOIN {p}px s ON a.sid = s.sid AND a.j = s.j "
            f"GROUP BY a.j, a.c, s.sd)",
            f"{p}b{t} AS MATERIALIZED (SELECT pc.j, pc.c, pc.sd, COALESCE(m.v, pc.v) AS v "
            f"FROM {prev} pc LEFT JOIN {p}bm{t} m "
            f"ON m.j = pc.j AND m.c = pc.c AND m.sd = pc.sd)",
        ]
        prev = f"{p}b{t}"
    return lines, prev


def pq_encode_ctes(
    p: str, src: str, dim: int, m: int, cb: str, normalize: bool
) -> tuple[list[str], str]:
    """CTEs replaying ``pq_encode`` (per-subspace Euclidean argmin, ties to
    the lowest code). Returns ``(cte_list, code_cte)`` with codes long-form
    ``(id, j, c)``."""
    dsub = dim // m
    lines = [
        f"{p}el AS MATERIALIZED (SELECT id, t.d, emb[t.d]::DOUBLE AS v "
        f"FROM ({src}) {p}e_t, range(1, {dim + 1}) t(d))",
    ]
    base = f"{p}el"
    if normalize:
        lines += [
            f"{p}en AS MATERIALIZED (SELECT id, sqrt(SUM(v*v)) AS nrm FROM {p}el "
            f"GROUP BY id)",
            f"{p}eu AS MATERIALIZED (SELECT l.id, l.d, "
            f"CASE WHEN n.nrm = 0 THEN l.v ELSE l.v / n.nrm END AS v "
            f"FROM {p}el l JOIN {p}en n USING (id))",
        ]
        base = f"{p}eu"
    lines += [
        f"{p}es AS MATERIALIZED (SELECT id, ((d-1)//{dsub})::INT AS j, "
        f"((d-1)%{dsub})::INT AS sd, v FROM {base})",
        f"{p}ed AS MATERIALIZED (SELECT s.id, s.j, c.c, "
        f"SUM((s.v - c.v)*(s.v - c.v)) AS dd FROM {p}es s "
        f"JOIN {cb} c ON s.j = c.j AND s.sd = c.sd GROUP BY s.id, s.j, c.c)",
        f"{p}ec AS MATERIALIZED (SELECT id, j, c FROM {p}ed QUALIFY "
        f"row_number() OVER (PARTITION BY id, j ORDER BY dd, c) = 1)",
    ]
    return lines, f"{p}ec"


_EMB_SRC = "SELECT vec_id AS id, embedding AS emb FROM embeddings"


def ivf_oracle(
    dim: int, k: int, iters: int, cap: int, nprobe: int, top_k: int
) -> str:
    """Full-SQL oracle for q_similarity_ivf: replayed Lloyd training →
    frozen assignment → driver-identical nprobe centroid ranking → exact
    fold-cosine rerank of the probed lists."""
    lloyd, cent = lloyd_ctes("i", _EMB_SRC, dim, k, iters, cap)
    assign, _, asg = assign_ctes("i", _EMB_SRC, dim, cent)
    ctes = lloyd + assign + [
        f"icent_l AS MATERIALIZED (SELECT cid, list(v ORDER BY d) AS c FROM {cent} "
        f"GROUP BY cid)",
        "ipr AS MATERIALIZED (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0)",
        f"itopc AS MATERIALIZED (SELECT cid FROM icent_l, ipr "
        f"ORDER BY {_cos('c', 'pv')} DESC, cid LIMIT {nprobe})",
    ]
    return (
        "WITH\n" + ",\n".join(ctes) + f"""
    SELECT e.vec_id, {_cos('e.embedding', 'p.pv')} AS score
    FROM embeddings e
    JOIN {asg} a ON a.id = e.vec_id
    JOIN itopc t ON t.cid = a.cid
    CROSS JOIN ipr p
    ORDER BY score DESC, e.vec_id LIMIT {top_k}
    """
    )


def pq_oracle(
    dim: int, m: int, ksub: int, iters: int, cap: int,
    shortlist: int, top_k: int,
) -> str:
    """Full-SQL oracle for q_similarity_pq: replayed codebook training →
    frozen encoding → LUT ADC shortlist → exact fold-cosine rerank."""
    dsub = dim // m
    train, cb = pq_lloyd_ctes("p", _EMB_SRC, dim, m, ksub, iters, cap, True)
    enc, code = pq_encode_ctes("p", _EMB_SRC, dim, m, cb, True)
    ctes = train + enc + [
        "prb AS MATERIALIZED (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0)",
        f"prbl AS MATERIALIZED (SELECT t.d, pv[t.d]::DOUBLE AS v "
        f"FROM prb, range(1, {dim + 1}) t(d))",
        "prbu AS MATERIALIZED (SELECT d, CASE WHEN nrm = 0 THEN v ELSE v / nrm END AS v "
        "FROM (SELECT d, v, sqrt(SUM(v*v) OVER ()) AS nrm FROM prbl) prbu_t)",
        f"prbs AS MATERIALIZED (SELECT ((d-1)//{dsub})::INT AS j, "
        f"((d-1)%{dsub})::INT AS sd, v FROM prbu)",
        f"plut AS MATERIALIZED (SELECT c.j, c.c, SUM(p.v * c.v) AS ip FROM {cb} c "
        f"JOIN prbs p ON p.j = c.j AND p.sd = c.sd GROUP BY c.j, c.c)",
        f"padc AS MATERIALIZED (SELECT e.id, SUM(l.ip) AS adc FROM {code} e "
        f"JOIN plut l ON l.j = e.j AND l.c = e.c GROUP BY e.id)",
        f"pshort AS MATERIALIZED (SELECT id FROM padc ORDER BY adc DESC, id "
        f"LIMIT {shortlist})",
    ]
    return (
        "WITH\n" + ",\n".join(ctes) + f"""
    SELECT e.vec_id, {_cos('e.embedding', 'p.pv')} AS score
    FROM embeddings e
    JOIN pshort s ON s.id = e.vec_id
    CROSS JOIN prb p
    ORDER BY score DESC, e.vec_id LIMIT {top_k}
    """
    )


def ivfpq_oracle(
    dim: int, k: int, ivf_iters: int, ivf_cap: int, nprobe: int,
    m: int, ksub: int, pq_iters: int, pq_cap: int,
    shortlist: int, top_k: int,
) -> str:
    """Full-SQL oracle for q_similarity_ivfpq: L2-normalize (zero → 0,
    matching ivfpq_build's Column transform) → replayed coarse Lloyd →
    residuals → replayed residual-codebook training + encoding → exact
    score decomposition ⟨p̂,c⟩ + ADC(residual) over the nprobe lists →
    exact fold-cosine rerank on the RAW vectors."""
    dsub = dim // m
    unit = [
        f"ul AS MATERIALIZED (SELECT vec_id AS id, t.d, embedding[t.d]::DOUBLE AS v "
        f"FROM embeddings, range(1, {dim + 1}) t(d))",
        "un AS MATERIALIZED (SELECT id, sqrt(SUM(v*v)) AS nrm FROM ul GROUP BY id)",
        "uv AS MATERIALIZED (SELECT ul.id, ul.d, "
        "CASE WHEN un.nrm = 0 THEN 0.0 ELSE ul.v / un.nrm END AS v "
        "FROM ul JOIN un USING (id))",
        "ulist AS MATERIALIZED (SELECT id, list(v ORDER BY d) AS emb FROM uv GROUP BY id)",
    ]
    usrc = "SELECT id, emb FROM ulist"
    lloyd, cent = lloyd_ctes("v", usrc, dim, k, ivf_iters, ivf_cap)
    assign, _, asg = assign_ctes("v", usrc, dim, cent)
    resid = [
        f"rl AS MATERIALIZED (SELECT u.id, u.d, u.v - c.v AS v FROM uv u "
        f"JOIN {asg} a ON a.id = u.id "
        f"JOIN {cent} c ON c.cid = a.cid AND c.d = u.d)",
        "rlist AS MATERIALIZED (SELECT id, list(v ORDER BY d) AS emb FROM rl GROUP BY id)",
    ]
    rsrc = "SELECT id, emb FROM rlist"
    ptrain, cb = pq_lloyd_ctes("r", rsrc, dim, m, ksub, pq_iters, pq_cap, False)
    penc, code = pq_encode_ctes("r", rsrc, dim, m, cb, False)
    search = [
        "fpr AS MATERIALIZED (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0)",
        f"fpl AS MATERIALIZED (SELECT t.d, pv[t.d]::DOUBLE AS v "
        f"FROM fpr, range(1, {dim + 1}) t(d))",
        # probe normalization: pv / (||pv|| or 1) — zero-norm stays zero
        "fph AS MATERIALIZED (SELECT d, CASE WHEN nrm = 0 THEN v ELSE v / nrm END AS v "
        "FROM (SELECT d, v, sqrt(SUM(v*v) OVER ()) AS nrm FROM fpl) fph_t)",
        f"fps AS MATERIALIZED (SELECT ((d-1)//{dsub})::INT AS j, "
        f"((d-1)%{dsub})::INT AS sd, v FROM fph)",
        f"vcent_l AS MATERIALIZED (SELECT cid, list(v ORDER BY d) AS c FROM {cent} "
        f"GROUP BY cid)",
        # centroid ranking by cosine to the RAW probe (scale-invariant),
        # mirroring _nearest_centroids
        f"ftopc AS MATERIALIZED (SELECT cid FROM vcent_l, fpr "
        f"ORDER BY {_cos('c', 'pv')} DESC, cid LIMIT {nprobe})",
        f"fbase AS MATERIALIZED (SELECT c.cid, SUM(p.v * c.v) AS base FROM {cent} c "
        f"JOIN fph p USING (d) GROUP BY c.cid)",
        f"flut AS MATERIALIZED (SELECT c.j, c.c, SUM(p.v * c.v) AS ip FROM {cb} c "
        f"JOIN fps p ON p.j = c.j AND p.sd = c.sd GROUP BY c.j, c.c)",
        f"fadcs AS MATERIALIZED (SELECT e.id, SUM(l.ip) AS s FROM {code} e "
        f"JOIN {asg} a ON a.id = e.id "
        f"JOIN ftopc t ON t.cid = a.cid "
        f"JOIN flut l ON l.j = e.j AND l.c = e.c GROUP BY e.id)",
        f"fadc AS MATERIALIZED (SELECT f.id, b.base + f.s AS adc FROM fadcs f "
        f"JOIN {asg} a ON a.id = f.id JOIN fbase b ON b.cid = a.cid)",
        f"fshort AS MATERIALIZED (SELECT id FROM fadc ORDER BY adc DESC, id "
        f"LIMIT {shortlist})",
    ]
    ctes = unit + lloyd + assign + resid + ptrain + penc + search
    return (
        "WITH\n" + ",\n".join(ctes) + f"""
    SELECT e.vec_id, {_cos('e.embedding', 'p.pv')} AS score
    FROM embeddings e
    JOIN fshort s ON s.id = e.vec_id
    CROSS JOIN fpr p
    ORDER BY score DESC, e.vec_id LIMIT {top_k}
    """
    )


def knn_graph_ivf_oracle(
    dim: int, k: int, iters: int, cap: int, aprobe: int, graph_k: int
) -> str:
    """Full-SQL oracle for q_knn_graph_ivf: replayed Lloyd training →
    each vector indexed in its argmin list and probing its ``aprobe``
    nearest lists → fold-cosine over the candidate pairs (bit-identical to
    the dimension-sequential numpy kernel) → per-vector rank."""
    lloyd, cent = lloyd_ctes("g", _EMB_SRC, dim, k, iters, cap)
    assign, dist, asg = assign_ctes("g", _EMB_SRC, dim, cent)
    ctes = lloyd + assign + [
        f"gprobe AS MATERIALIZED (SELECT id, cid FROM {dist} QUALIFY "
        f"row_number() OVER (PARTITION BY id ORDER BY dd, cid) <= {aprobe})",
        f"gpairs AS MATERIALIZED (SELECT q.id AS vec_id, i.id AS nbr FROM gprobe q "
        f"JOIN {asg} i ON i.cid = q.cid WHERE i.id <> q.id)",
        f"gsc AS MATERIALIZED (SELECT p.vec_id, p.nbr, "
        f"{_cos('a.embedding', 'b.embedding')} AS score FROM gpairs p "
        f"JOIN embeddings a ON a.vec_id = p.vec_id "
        f"JOIN embeddings b ON b.vec_id = p.nbr)",
    ]
    return (
        "WITH\n" + ",\n".join(ctes) + f"""
    SELECT vec_id, nbr, score,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, nbr) AS rnk
    FROM gsc
    QUALIFY rnk <= {graph_k}
    """
    )
