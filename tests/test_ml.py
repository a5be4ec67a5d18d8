"""The named 'ML' workload: distributed Newton logistic regression must
match a local numpy solve of the identical objective, recover the
generating hyperplane's direction, and be reproducible."""

from __future__ import annotations

import numpy as np
import pytest

from go_web_mapreduce_spark.operators.ml import (
    ML_DIM,
    ML_ITERS,
    ML_L2,
    labeled_embeddings,
    logreg_fit,
    true_plane,
)
from go_web_mapreduce_spark.sources.tables import load_table

from conftest import SF_DIR


def _local_newton(X, y, iters=ML_ITERS, l2=ML_L2):
    """The identical objective solved in one process: the ground truth the
    distributed fit must reproduce."""
    Xa = np.hstack([X, np.ones((len(X), 1))])
    w = np.zeros(Xa.shape[1])
    for _ in range(iters):
        z = Xa @ w
        p = np.where(
            z >= 0,
            1.0 / (1.0 + np.exp(-np.abs(z))),
            np.exp(-np.abs(z)) / (1.0 + np.exp(-np.abs(z))),
        )
        g = Xa.T @ (p - y)
        H = (Xa * (p * (1.0 - p))[:, None]).T @ Xa
        reg = np.full(len(w), l2)
        reg[-1] = 0.0
        g = g + reg * w
        H = H + np.diag(reg)
        w = w - np.linalg.solve(H, g)
    return w


@pytest.fixture(scope="module")
def data(spark):
    return labeled_embeddings(load_table(spark, SF_DIR, "embeddings"))


@pytest.fixture(scope="module")
def fitted(data):
    return np.array(logreg_fit(data))


def test_matches_local_numpy_solve(data, fitted):
    rows = data.select("embedding", "label").collect()
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    y = np.array([r["label"] for r in rows], dtype=np.float64)
    want = _local_newton(X, y)
    # same objective, same iterations; only float summation order differs
    assert np.allclose(fitted, want, rtol=1e-6, atol=1e-8)


def test_recovers_generating_plane_direction(fitted):
    w = fitted[:-1]  # drop bias
    p = np.array(true_plane(ML_DIM))
    # 500 samples in 64 dims bounds how sharply the direction resolves;
    # 0.95 is far above chance (random 64-dim cosines concentrate near 0)
    cos = w @ p / (np.linalg.norm(w) * np.linalg.norm(p))
    assert cos > 0.95


def test_separates_training_data(data, fitted):
    rows = data.select("embedding", "label").collect()
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    y = np.array([r["label"] for r in rows], dtype=np.float64)
    pred = (np.hstack([X, np.ones((len(X), 1))]) @ fitted > 0).astype(float)
    assert (pred == y).mean() > 0.99


def test_reproducible_and_layout_insensitive(data, fitted):
    again = np.array(logreg_fit(data))
    assert (again == fitted).all()  # same layout → bit-identical
    relaid = np.array(logreg_fit(data.repartition(7)))
    assert np.allclose(relaid, fitted, rtol=1e-9, atol=1e-12)


def test_query_shape(spark):
    from go_web_mapreduce_spark.queries import REGISTRY

    df = REGISTRY["q_ml_logreg"].fn(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == ML_DIM + 1
    assert df.columns == ["component", "weight"]


def test_covariance_matches_numpy(spark, sf_dir):
    import numpy as np

    from go_web_mapreduce_spark.queries import REGISTRY

    out = {r["l_returnflag"]: r for r in
           REGISTRY["q_ml_covariance"].fn(spark, sf_dir).collect()}
    rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], r["l_extendedprice"], r["l_discount"])
        )
    assert set(out) == set(groups)
    for flag, pts in groups.items():
        X = np.array(pts, dtype=np.float64)
        C = np.cov(X.T, bias=True)  # population covariance, as E[xy]-E[x]E[y]
        got = out[flag]
        names = ["q", "p", "d"]
        for i in range(3):
            for j in range(i, 3):
                key = f"cov_{names[i]}{names[j]}"
                scale = max(1.0, abs(C[i, j]))
                assert abs(got[key] - C[i, j]) / scale < 1e-6, (flag, key)
        assert got["n"] == len(pts)


def test_nearest_centroid_matches_numpy(spark, sf_dir):
    """Confusion counts must equal a local numpy nearest-class-mean
    classification exactly, and the diagonal must dominate (vectors sit
    closest to their own class mean far more often than chance)."""
    from go_web_mapreduce_spark.operators.ml import q_nearest_centroid
    from go_web_mapreduce_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    y = np.array([r["label"] for r in rows])
    labels = np.array(sorted(set(y.tolist())))
    C = np.stack([X[y == lb].mean(axis=0) for lb in labels])
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    pred = labels[np.argmin(d2, axis=1)]

    got = {
        (r["label"], r["pred_label"]): (r["n"], r["mean_sq_dist"])
        for r in q_nearest_centroid(spark, sf_dir).collect()
    }
    want = {}
    for t, p, d in zip(y.tolist(), pred.tolist(), d2.min(axis=1).tolist()):
        n, s = want.get((t, p), (0, 0.0))
        want[(t, p)] = (n + 1, s + d)
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        assert got[k][0] == n, k
        assert abs(got[k][1] - s / n) < 1e-6, k
    diag = sum(n for (t, p), (n, _) in want.items() if t == p)
    total = sum(n for (n, _) in want.values())
    assert diag / total > 1.0 / len(labels)


def test_quality_classifier_matches_local_fit(spark, sf_dir):
    """The in-engine trained classifier must reproduce a local numpy fit of
    the identical fixed-iteration objective on the identical features.
    (The synthetic corpus deliberately carries no real language signal —
    per-language stopword ratios are all ~0.06 — so this test pins the
    training MACHINERY, not signal recovery; cross-engine parity of the
    whole fit is the DuckDB oracle's job.)"""
    from go_web_mapreduce_spark.functions.text import tokens
    from go_web_mapreduce_spark.operators.ml import (
        ML_ITERS,
        ML_L2,
        QC_DIM,
        _ns_solve,
        q_quality_classifier,
    )
    from go_web_mapreduce_spark.operators.text_analysis import (
        STOPWORDS,
        stopword_hits,
    )
    from go_web_mapreduce_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    w = {
        r["component"]: r["weight"]
        for r in q_quality_classifier(spark, sf_dir).collect()
    }
    assert len(w) == QC_DIM + 1 and all(np.isfinite(v) for v in w.values())

    toks = tokens("text")
    n_tok = F.size(toks)
    safe_n = F.greatest(n_tok, F.lit(1))
    feats = load_table(spark, sf_dir, "documents").select(
        F.log((F.lit(1) + n_tok).cast("double")).alias("f0"),
        ((F.col("n_chars").cast("double") / safe_n) / F.lit(10.0)).alias("f1"),
        (stopword_hits(toks, STOPWORDS["en"]).cast("double") / safe_n).alias("f2"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    ).collect()
    X = np.array([[r["f0"], r["f1"], r["f2"]] for r in feats])
    y = np.array([r["y"] for r in feats])
    Xa = np.hstack([X, np.ones((len(X), 1))])
    wv = np.zeros(QC_DIM + 1)
    for _ in range(ML_ITERS):
        z = Xa @ wv
        p = np.where(
            z >= 0,
            1.0 / (1.0 + np.exp(-np.abs(z))),
            np.exp(-np.abs(z)) / (1.0 + np.exp(-np.abs(z))),
        )
        g = Xa.T @ (p - y)
        H = (Xa * (p * (1.0 - p))[:, None]).T @ Xa
        reg = np.full(QC_DIM + 1, ML_L2)
        reg[-1] = 0.0
        g = g + reg * wv
        H = H + np.diag(reg)
        wv = wv - _ns_solve(H, g)
    got = np.array([w[i] for i in range(QC_DIM + 1)])
    assert np.max(np.abs(got - wv)) < 1e-9

    again = {
        r["component"]: r["weight"]
        for r in q_quality_classifier(spark, sf_dir).collect()
    }
    assert again == w


def test_auc_eval_matches_numpy_rank_statistic(spark, sf_dir):
    """Per-source AUC must equal a local midrank Mann-Whitney computation
    exactly (both sides are integer/half-integer arithmetic), and sit in
    [0, 1]."""
    from go_web_mapreduce_spark.functions.text import tokens
    from go_web_mapreduce_spark.operators.ml import q_auc_eval
    from go_web_mapreduce_spark.operators.text_analysis import (
        STOPWORDS,
        stopword_hits,
    )
    from go_web_mapreduce_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    toks = tokens("text")
    rows = load_table(spark, sf_dir, "documents").select(
        "source",
        (
            stopword_hits(toks, STOPWORDS["en"]).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("s"),
        (F.col("lang") == "en").alias("y"),
    ).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["s"], r["y"]))

    got = {r["source"]: r for r in q_auc_eval(spark, sf_dir).collect()}
    assert set(got) == set(by_src)
    for src, pts in by_src.items():
        scores = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        order = np.argsort(scores, kind="mergesort")
        ranks = np.empty(len(scores))
        sorted_s = scores[order]
        i = 0
        while i < len(sorted_s):
            j = i
            while j < len(sorted_s) and sorted_s[j] == sorted_s[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0  # midrank, 1-based
            i = j
        np_ = int(y.sum())
        nn = len(y) - np_
        if np_ and nn:
            want = (float(ranks[y].sum()) - np_ * (np_ + 1) / 2.0) / (np_ * nn)
        else:
            want = 0.5
        assert got[src]["n_pos"] == np_ and got[src]["n_neg"] == nn, src
        assert got[src]["auc"] == want, (src, got[src]["auc"], want)
        assert 0.0 <= got[src]["auc"] <= 1.0


def test_calibration_matches_bruteforce(spark, sf_dir):
    """Per-bin confidence/accuracy and the global Brier/ECE must equal a
    local replay of the same scoring; mass conservation across bins."""
    from go_web_mapreduce_spark.operators.ml import CAL_BINS, q_calibration
    from go_web_mapreduce_spark.operators.text_analysis import STOPWORDS
    from go_web_mapreduce_spark.sources.tables import load_table

    sw = set(STOPWORDS["en"])
    rows = load_table(spark, sf_dir, "documents").select("text", "lang").collect()
    binned: dict[int, list[tuple[float, int]]] = {}
    for r in rows:
        tk = [t for t in r["text"].lower().split() if t]
        s = sum(t in sw for t in tk) / max(len(tk), 1)
        y = 1 if r["lang"] == "en" else 0
        b = min(int(s * CAL_BINS), CAL_BINS - 1)
        binned.setdefault(b, []).append((s, y))
    total = sum(len(v) for v in binned.values())
    brier = sum((s - y) ** 2 for v in binned.values() for s, y in v) / total
    got = {r["bin"]: r for r in q_calibration(spark, sf_dir).collect()}
    assert set(got) == set(binned)
    ece = 0.0
    for b, v in binned.items():
        conf = sum(s for s, _ in v) / len(v)
        acc = sum(y for _, y in v) / len(v)
        g = got[b]
        assert g["n"] == len(v)
        assert abs(g["conf"] - conf) < 1e-8
        assert abs(g["acc"] - acc) < 1e-12
        assert abs(g["gap"] - abs(acc - conf)) < 1e-8
        ece += len(v) * abs(acc - conf)
    ece /= total
    for g in got.values():
        assert abs(g["brier"] - brier) < 1e-8
        assert abs(g["ece"] - ece) < 1e-8
    assert sum(g["n"] for g in got.values()) == total


def test_embedding_separation_matches_numpy(spark, sf_dir):
    """Pairwise Fisher ratios must equal a numpy replay: squared centroid
    distance over summed within-class variance traces, all 45 pairs."""
    import numpy as np

    from go_web_mapreduce_spark.operators.ml import q_embedding_separation
    from go_web_mapreduce_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").select("label", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(np.array(r["embedding"], dtype=np.float64))
    mus = {l: np.mean(np.stack(v), axis=0) for l, v in by_label.items()}
    disps = {
        l: float(np.mean(((np.stack(v) - mus[l]) ** 2).sum(axis=1)))
        for l, v in by_label.items()
    }
    got = {(r["label_a"], r["label_b"]): r for r in q_embedding_separation(spark, sf_dir).collect()}
    labels = sorted(by_label)
    assert len(got) == len(labels) * (len(labels) - 1) // 2
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            g = got[(la, lb)]
            d2 = float(((mus[la] - mus[lb]) ** 2).sum())
            assert abs(g["dist2"] - d2) < 1e-6 * max(d2, 1e-9)
            assert abs(g["disp_a"] - disps[la]) < 1e-6 * disps[la]
            assert abs(g["disp_b"] - disps[lb]) < 1e-6 * disps[lb]
            assert abs(g["fisher"] - d2 / (disps[la] + disps[lb])) < 1e-6
            assert g["n_a"] == len(by_label[la]) and g["n_b"] == len(by_label[lb])


def test_pr_curve_matches_sklearn_style_reference(spark, sf_dir):
    """Curve points and AP must equal a local replay of the scikit-learn
    average-precision definition (step integral over distinct thresholds),
    with precision/recall exact at every point."""
    from collections import defaultdict

    from go_web_mapreduce_spark.operators.ml import q_pr_curve
    from go_web_mapreduce_spark.operators.text_analysis import STOPWORDS
    from go_web_mapreduce_spark.sources.tables import load_table

    sw = set(STOPWORDS["en"])
    rows = load_table(spark, sf_dir, "documents").select(
        "source", "text", "lang"
    ).collect()
    by_src = defaultdict(list)
    for r in rows:
        tk = [t for t in r["text"].lower().split() if t]
        s = sum(t in sw for t in tk) / max(len(tk), 1)
        by_src[r["source"]].append((s, 1 if r["lang"] == "en" else 0))
    got = defaultdict(dict)
    aps = {}
    for r in q_pr_curve(spark, sf_dir).collect():
        got[r["source"]][r["threshold"]] = r
        aps[r["source"]] = r["ap"]
    for src, pairs in by_src.items():
        npos = sum(y for _, y in pairs)
        if npos == 0:
            assert src not in got
            continue
        # distinct thresholds descending
        agg = defaultdict(lambda: [0, 0])
        for s, y in pairs:
            agg[s][0] += 1
            agg[s][1] += y
        tp = fp = 0
        prev_tp = 0
        ap = 0.0
        for s in sorted(agg, reverse=True):
            n, p = agg[s]
            tp += p
            fp += n - p
            prec = tp / (tp + fp)
            ap += (tp - prev_tp) / npos * prec
            g = got[src][s]
            assert g["tp"] == tp and g["fp"] == fp
            assert abs(g["precision"] - prec) < 1e-12
            assert abs(g["recall"] - tp / npos) < 1e-12
            prev_tp = tp
        assert abs(aps[src] - ap) < 1e-9
        assert 0.0 <= aps[src] <= 1.0


def test_mcnemar_matches_bruteforce(spark, sf_dir):
    """Discordant cells and the continuity-corrected chi2 must equal a
    local replay of both raters against the lang truth."""
    from go_web_mapreduce_spark.operators.ml import q_mcnemar
    from go_web_mapreduce_spark.operators.text_analysis import (
        KAPPA_SW_MIN,
        KAPPA_WLEN_MAX,
        STOPWORDS,
    )
    from go_web_mapreduce_spark.sources.tables import load_table

    sw = set(STOPWORDS["en"])
    rows = load_table(spark, sf_dir, "documents").select(
        "source", "text", "lang"
    ).collect()
    cells: dict[str, list[int]] = {}
    for r in rows:
        tk = [t for t in r["text"].lower().split() if t]
        ra = 1 if sum(t in sw for t in tk) / max(len(tk), 1) >= KAPPA_SW_MIN else 0
        rb = 1 if sum(map(len, tk)) / max(len(tk), 1) <= KAPPA_WLEN_MAX else 0
        y = 1 if r["lang"] == "en" else 0
        b, c, n = cells.setdefault(r["source"], [0, 0, 0])
        cells[r["source"]] = [
            b + (ra == y and rb != y),
            c + (ra != y and rb == y),
            n + 1,
        ]
    got = {r["source"]: r for r in q_mcnemar(spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for src, (b, c, n) in cells.items():
        g = got[src]
        assert (g["b"], g["c"], g["n"]) == (b, c, n)
        chi2 = ((abs(b - c) - 1.0) ** 2 / (b + c)) if b + c else 0.0
        assert abs(g["mcnemar_chi2"] - chi2) < 1e-12
        assert g["a_better"] == (b > c)


def test_conformal_threshold_matches_numpy_and_covers(spark, sf_dir):
    """Thresholds must equal the rank-selected calibration quantile in a
    numpy replay, held-out coverage must match exactly, and aggregate
    coverage must sit near the 1-alpha guarantee (binomial slack)."""
    import hashlib
    import math

    import numpy as np

    from go_web_mapreduce_spark.operators.ml import (
        CONF_ALPHA,
        q_conformal_threshold,
    )
    from go_web_mapreduce_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    train, cal, ev = {}, {}, {}
    for r in rows:
        h = int(hashlib.md5(f"cf:{r['vec_id']}".encode()).hexdigest()[:4], 16) % 4
        bucket = train if h <= 1 else cal if h == 2 else ev
        bucket.setdefault(r["label"], []).append(
            (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        )
    got = {r["label"]: r for r in q_conformal_threshold(spark, sf_dir).collect()}
    tot_cov = tot_n = 0
    for label, items in cal.items():
        mu = np.mean(np.stack([v for _, v in train[label]]), axis=0)
        scores = sorted(
            (float(((v - mu) ** 2).sum()), vid) for vid, v in items
        )
        n = len(scores)
        r_idx = math.ceil((n + 1) * (1 - CONF_ALPHA))
        g = got[label]
        assert g["n_cal"] == n
        if r_idx > n:
            assert g["threshold"] is None
        else:
            thr = scores[r_idx - 1][0]
            assert abs(g["threshold"] - thr) < 1e-9 * max(thr, 1e-12)
            evs = [float(((v - mu) ** 2).sum()) for _, v in ev.get(label, [])]
            covered = sum(s <= g["threshold"] for s in evs)
            assert g["n_eval"] == len(evs)
            assert abs(g["coverage"] - covered / len(evs)) < 1e-12
            tot_cov += covered
            tot_n += len(evs)
    # exchangeability guarantee: aggregate coverage >= 1 - alpha - slack
    assert tot_cov / tot_n >= 1 - CONF_ALPHA - 3 * math.sqrt(
        CONF_ALPHA * (1 - CONF_ALPHA) / tot_n
    )
