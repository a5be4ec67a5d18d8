"""Round-7 operators: EWMA smoothing, DP histogram release, contrastive
pair mining, BPE encoding census, RAKE keywords — each replayed locally in
pure Python/numpy (the oracle hash check runs separately via
tools/check_oracle.py; these pin semantics against an independent
implementation and the properties the docstrings claim)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from go_web_mapreduce_spark.sources.tables import load_table


def test_ewma_matches_local_replay(spark, sf_dir):
    from go_web_mapreduce_spark.operators.temporal import EWMA_ALPHA, q_ewma

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    daily: dict = defaultdict(list)
    for r in ev:
        daily[(r["event_type"], r["ts"].strftime("%Y-%m-%d"))].append(r["value"])
    series: dict = defaultdict(list)
    for (et, day), vals in sorted(daily.items()):
        # exact decimal-cents mean, like the engine's dsum discipline
        m = sum(round(v * 100) for v in vals) / 100.0 / len(vals)
        series[et].append(((et, day), len(vals), m))
    want = {}
    for et, rows in series.items():
        acc = None
        for key, n, m in rows:
            acc = m if acc is None else acc * (1 - EWMA_ALPHA) + EWMA_ALPHA * m
            want[key] = (n, m, acc)
    got = q_ewma(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        n, m, acc = want[(r["event_type"], str(r["day"]))]
        assert r["n_events"] == n
        assert r["mean_value"] == pytest.approx(m, abs=1e-12)
        assert r["ewma"] == pytest.approx(acc, abs=1e-9)
        assert r["deviation"] == pytest.approx(r["mean_value"] - r["ewma"], abs=1e-12)


def test_dp_histogram_noise_is_reproducible_and_calibrated(spark, sf_dir):
    from go_web_mapreduce_spark.operators.pipeline_ops import (
        DP_EPSILON,
        q_dp_histogram,
    )

    rows1 = {(r["event_type"], r["day"]): r for r in q_dp_histogram(spark, sf_dir).collect()}
    rows2 = {(r["event_type"], r["day"]): r for r in q_dp_histogram(spark, sf_dir).collect()}
    # content-addressed noise: bit-identical across runs (no RNG state)
    assert {k: v["noisy_n"] for k, v in rows1.items()} == {
        k: v["noisy_n"] for k, v in rows2.items()
    }
    b = 1.0 / DP_EPSILON
    errs = sorted(abs(v["noisy_n"] - v["n"]) for v in rows1.values())
    n = len(errs)
    assert n > 50  # the grid is big enough to test distribution shape
    # Laplace(b): median |noise| = b ln 2, 95th pct = b ln 20; md5 uniforms
    # should land within wide tolerance of both
    med = errs[n // 2]
    assert 0.4 * b * math.log(2) < med < 2.0 * b * math.log(2)
    # err_bound_95 is constant; ~95% of cells inside (allow 85%+)
    frac = sum(abs(v["noisy_n"] - v["n"]) <= v["err_bound_95"] for v in rows1.values()) / n
    assert frac >= 0.85
    # noise never degenerate: no cell has zero noise
    assert all(v["noisy_n"] != v["n"] for v in rows1.values())


def test_contrastive_pairs_match_numpy_replay(spark, sf_dir):
    import numpy as np

    from go_web_mapreduce_spark.operators.similarity import (
        CP_K,
        CP_NEG_K,
        CP_POS_T,
        q_contrastive_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in emb])
    mat = np.array([list(r["embedding"]) for r in emb], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    order = np.argsort(ids)
    ids, mat, norms = ids[order], mat[order], norms[order]
    sim = (mat @ mat.T) / np.outer(norms, norms)
    want = set()
    for a in range(len(ids)):
        scores = sim[a].copy()
        scores[a] = -np.inf
        top = sorted(range(len(ids)), key=lambda j: (-scores[j], ids[j]))[:CP_K]
        pos = [j for j in top if scores[j] >= CP_POS_T]
        negs = [j for j in top if scores[j] < CP_POS_T][:CP_NEG_K]
        if not pos or not negs:
            continue
        p = pos[0]
        for rank, ng in enumerate(negs, start=1):
            want.add((int(ids[a]), int(ids[p]), int(ids[ng]), rank))
    got = {
        (r["anchor"], r["pos_id"], r["neg_id"], r["neg_rank"])
        for r in q_contrastive_pairs(spark, sf_dir).collect()
    }
    assert got == want
    rows = q_contrastive_pairs(spark, sf_dir).collect()
    assert all(r["pos_score"] >= CP_POS_T > r["neg_score"] for r in rows)


def test_bpe_encode_census_matches_python_reference(spark, sf_dir):
    from tests.test_llm_ops import _py_bpe_train
    from go_web_mapreduce_spark.operators.text_analysis import (
        BPE_TOP,
        BPE_TRAIN_STEPS,
        q_bpe_encode,
    )
    from go_web_mapreduce_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    freq = Counter()
    for r in docs.select(tokens("text").alias("tk")).collect():
        freq.update(r["tk"])
    _, vocab = _py_bpe_train(dict(freq), BPE_TRAIN_STEPS)
    census: Counter = Counter()
    for w, syms in vocab.items():
        for s in syms:
            census[s] += freq[w]
    want = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP]
    got = [(r["symbol"], r["cnt"], r["merged"]) for r in q_bpe_encode(spark, sf_dir).collect()]
    assert [(s, c) for s, c, _ in got] == want
    assert all(m == (len(s) > 1) for s, _, m in got)
    # the census must actually contain merged (multi-char) subwords
    assert any(m for _, _, m in got)


def test_keyword_rake_matches_bruteforce(spark, sf_dir):
    from go_web_mapreduce_spark.operators.text_analysis import (
        RAKE_MAX_LEN,
        RAKE_TOPK,
        _RAKE_STOPS,
        q_keyword_rake,
    )

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    stops = set(_RAKE_STOPS)
    phrases: Counter = Counter()
    for r in docs:
        tk = [t for t in r["text"].lower().split() if t]
        cur: list[str] = []
        for w in tk + ["the"]:  # sentinel stopword flushes the tail
            if w in stops:
                if cur and len(cur) <= RAKE_MAX_LEN:
                    phrases[" ".join(cur)] += 1
                cur = []
            else:
                cur.append(w)
    freq: Counter = Counter()
    deg: Counter = Counter()
    for ph, c in phrases.items():
        ws = ph.split(" ")
        for w in ws:
            freq[w] += c
            deg[w] += c * len(ws)
    scored = {}
    for ph, c in phrases.items():
        ws = ph.split(" ")
        s = 0.0
        for w in ws:  # phrase word order, 0.0 init — the engine's fold
            s += deg[w] / freq[w]
        scored[ph] = (len(ws), c, s)
    want = sorted(scored.items(), key=lambda kv: (-kv[1][2], kv[0]))[:RAKE_TOPK]
    got = q_keyword_rake(spark, sf_dir).collect()
    assert len(got) == min(RAKE_TOPK, len(scored))
    for r, (ph, (nw, c, s)) in zip(got, want):
        assert r["phrase"] == ph
        assert r["n_words"] == nw
        assert r["phrase_freq"] == c
        assert r["score"] == pytest.approx(s, abs=1e-12)


def test_char_entropy_matches_local_replay(spark, sf_dir):
    from go_web_mapreduce_spark.operators.text_analysis import q_char_entropy

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    per_source: dict = defaultdict(list)
    for r in docs:
        cnt = Counter(r["text"].lower())
        n = sum(cnt.values())
        h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        per_source[r["source"]].append(h)
    got = {r["source"]: r for r in q_char_entropy(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for src, hs in per_source.items():
        r = got[src]
        assert r["n_docs"] == len(hs)
        assert r["avg_entropy"] == pytest.approx(sum(hs) / len(hs), abs=1e-6)
        assert r["min_entropy"] == pytest.approx(min(hs), abs=1e-6)
        assert r["max_entropy"] == pytest.approx(max(hs), abs=1e-6)
        # natural prose lives in a sane band
        assert 1.0 < r["avg_entropy"] < 5.0


def test_hits_matches_numpy_replay(spark, sf_dir):
    import numpy as np

    from go_web_mapreduce_spark.operators.graph import (
        HITS_ITERS,
        PR_YEAR,
        q_hits,
    )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= f"{PR_YEAR}-01-01")
            & (F.col("l_shipdate") < f"{PR_YEAR + 1}-01-01")
        )
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order: dict = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    from itertools import permutations

    w: Counter = Counter()
    for parts in by_order.values():
        for s, d in permutations(parts, 2):
            w[(s, d)] += 1
    nodes = sorted({p for parts in by_order.values() for p in parts})
    idx = {p: i for i, p in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for (s, d), c in w.items():
        A[idx[s], idx[d]] = c
    h = np.ones(len(nodes))
    for _ in range(HITS_ITERS):
        a = A.T @ h
        a = a / a.max()
        h = A @ a
        h = h / h.max()
    got = {r["part_id"]: r for r in q_hits(spark, sf_dir).collect()}
    assert set(got) == set(nodes)
    for p in nodes:
        assert got[p]["authority"] == pytest.approx(a[idx[p]], abs=1e-9)
        assert got[p]["hub"] == pytest.approx(h[idx[p]], abs=1e-9)
    # scores are max-normalized into (0, 1]
    assert max(r["authority"] for r in got.values()) == pytest.approx(1.0)
    assert max(r["hub"] for r in got.values()) == pytest.approx(1.0)


def test_stream_topk_matches_batch(spark, sf_dir):
    from go_web_mapreduce_spark.streaming.events import (
        STREAM_TOPK,
        q_stream_topk,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id").collect()
    cnt: Counter = Counter()
    for r in ev:
        cnt[(r["ts"].strftime("%Y-%m-%d %H:00:00"), r["user_id"])] += 1
    want = set()
    by_hour: dict = defaultdict(list)
    for (hour, uid), n in cnt.items():
        by_hour[hour].append((uid, n))
    for hour, rows in by_hour.items():
        rows.sort(key=lambda un: (-un[1], un[0]))
        for rnk, (uid, n) in enumerate(rows[:STREAM_TOPK], start=1):
            want.add((hour, uid, n, rnk))
    got = {
        (r["hour"], r["user_id"], r["n"], r["rnk"])
        for r in q_stream_topk(spark, sf_dir).collect()
    }
    assert got == want


def test_contrastive_ivf_thresholds_and_coverage(spark, sf_dir):
    """The IVF miner must obey the same pos/neg threshold contract as the
    exact miner, and cover a solid fraction of the anchors the exact
    miner found triples for (IVF misses only where a true neighbor falls
    outside the probed lists — the measured recall curve)."""
    from go_web_mapreduce_spark.operators.similarity import (
        CP_POS_T,
        q_contrastive_pairs,
        q_contrastive_pairs_ivf,
    )

    exact = q_contrastive_pairs(spark, sf_dir).collect()
    ivf = q_contrastive_pairs_ivf(spark, sf_dir).collect()
    assert ivf, "IVF miner returned no triples"
    assert all(r["pos_score"] >= CP_POS_T > r["neg_score"] for r in ivf)
    exact_anchors = {r["anchor"] for r in exact}
    ivf_anchors = {r["anchor"] for r in ivf}
    # coverage floor: at the default aprobe/C operating point the probed
    # candidate fraction finds a positive for most anchors the exact
    # miner served (floor far below measured, like tests/test_ann.py)
    assert len(ivf_anchors & exact_anchors) >= 0.5 * len(exact_anchors)
