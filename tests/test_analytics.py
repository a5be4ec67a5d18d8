"""Semantic tests for the composite analytics operators
(operators/analytics.py): the IVM algebraic-merge identity, the skyline's
equivalence to brute-force dominance, and the Q3-shape plan properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_web_mapreduce_spark import plans as P
from go_web_mapreduce_spark.operators.analytics import (
    Q3_TOPN,
    q_ivm_merge,
    q_skyline,
    q_top_revenue,
)
from go_web_mapreduce_spark.sources.tables import load_table


def test_ivm_merge_equals_full_recompute(spark, sf_dir):
    """The whole point of algebraic IVM: base ⊕ delta == recompute-from-
    scratch, bit-identically (decimal states)."""
    events = load_table(spark, sf_dir, "events")
    full = (
        events.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n"),
            F.col("s").cast("double").alias("total_value"),
            (F.col("s").cast("double") / F.col("n")).alias("avg_value"),
        )
    )
    got = sorted(map(tuple, q_ivm_merge(spark, sf_dir).collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(got) > 0


def test_skyline_matches_bruteforce(spark, sf_dir):
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    ).collect()
    pts = [(r["p_partkey"], r["p_size"], r["p_retailprice"]) for r in parts]

    def dominated(p):
        return any(
            q[1] >= p[1] and q[2] >= p[2] and (q[1] > p[1] or q[2] > p[2])
            for q in pts
        )

    want = sorted(k for k, *_ in [p for p in pts if not dominated(p)])
    got = sorted(r["p_partkey"] for r in q_skyline(spark, sf_dir).collect())
    assert got == want and len(got) > 0


def test_skyline_members_incomparable(spark, sf_dir):
    rows = q_skyline(spark, sf_dir).collect()
    for a in rows:
        for b in rows:
            if a["p_partkey"] == b["p_partkey"]:
                continue
            # no frontier member strictly dominates another
            assert not (
                a["p_size"] >= b["p_size"]
                and a["p_retailprice"] >= b["p_retailprice"]
                and (
                    a["p_size"] > b["p_size"]
                    or a["p_retailprice"] > b["p_retailprice"]
                )
            )


def test_top_revenue_shape_and_order(spark, sf_dir):
    rows = q_top_revenue(spark, sf_dir).collect()
    assert 0 < len(rows) <= Q3_TOPN
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_top_revenue_plan_is_topk_with_pushdown(spark, sf_dir):
    plan = P.executed_plan(q_top_revenue(spark, sf_dir))
    assert P.is_take_ordered(plan)  # no global sort for the top-10
    assert any("l_shipdate" in f for f in P.pushed_filters(plan))
    assert P.has_partial_aggregation(plan)


def test_sketch_merge_identity_and_error(spark, sf_dir):
    """Max-merge of the per-day register states must equal the one-shot
    portable sketch over the raw rows (exact, by max associativity), the
    estimate must track exact distinct within HLL's expected error at
    m=4096 (~1.6% at large n; linear counting is tighter at small n —
    assert 5%), and Spark's native DataSketches HLL must land in the same
    band (the binary-state production alternative the docstring names)."""
    from go_web_mapreduce_spark.functions import hll as H
    from go_web_mapreduce_spark.operators.analytics import q_sketch_merge

    events = load_table(spark, sf_dir, "events")
    rows = {r["event_type"]: r for r in q_sketch_merge(spark, sf_dir).collect()}
    oneshot_regs = H.hll_registers(events, ["event_type"], F.col("user_id"))
    oneshot = {
        r["event_type"]: r["approx"]
        for r in H.hll_estimate_from_registers(
            oneshot_regs, ["event_type"]
        ).collect()
    }
    native = {
        r["event_type"]: r["est"]
        for r in events.groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"))
        .collect()
    }
    assert rows
    for et, r in rows.items():
        assert r["approx_users"] == oneshot[et]  # merge identity, exact
        assert abs(r["approx_users"] - r["exact_users"]) <= 0.05 * r["exact_users"]
        assert abs(native[et] - r["exact_users"]) <= 0.05 * r["exact_users"]
        assert r["n_days"] > 0


def test_funnel_is_monotone(spark, sf_dir):
    from go_web_mapreduce_spark.operators.analytics import q_funnel

    rows = {r["stage"]: r["n_users"] for r in q_funnel(spark, sf_dir).collect()}
    assert set(rows) == {"view", "view>click", "view>click>purchase"}
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
    assert rows["view"] > 0


def test_retention_day_zero_covers_every_user(spark, sf_dir):
    """Offset 0 of each cohort must count exactly that cohort's users
    (everyone is active on their own first day)."""
    from go_web_mapreduce_spark.operators.analytics import q_retention

    events = load_table(spark, sf_dir, "events")
    cohort_sizes = {
        r["cohort_day"]: r["n"]
        for r in events.groupBy("user_id")
        .agg(F.date_format(F.min(F.date_trunc("day", "ts")), "yyyy-MM-dd").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = q_retention(spark, sf_dir).collect()
    zero = {r["cohort_day"]: r["n_users"] for r in rows if r["day_offset"] == 0}
    assert zero == cohort_sizes
    for r in rows:
        assert r["day_offset"] >= 0
        assert r["n_users"] <= cohort_sizes[r["cohort_day"]]


def test_funnel_exchanges_all_key_on_user_id(spark, sf_dir):
    """Every hash exchange in the funnel must key on user_id (per-slice
    shuffles of pushed-down filtered scans — no full-table re-shuffle and
    no stray grouping key)."""
    import re

    from go_web_mapreduce_spark.operators.analytics import q_funnel

    plan = P.executed_plan(q_funnel(spark, sf_dir))
    keys = set(re.findall(r"hashpartitioning\((\w+)", plan))
    assert keys == {"user_id"}
    assert any("event_type" in f for f in P.pushed_filters(plan))


def test_quantile_rollup_merge_identity_and_accuracy(spark, sf_dir):
    """Summed daily sketches must equal the one-shot histogram exactly, and
    the bucket-quantile must bracket the true quantile within one bucket."""
    import math

    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.operators.analytics import (
        QH_BUCKETS,
        QH_WIDTH,
    )
    from go_web_mapreduce_spark.queries import REGISTRY
    from go_web_mapreduce_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / QH_WIDTH), F.lit(0)),
        F.lit(QH_BUCKETS - 1),
    ).cast("bigint")
    one_shot = {
        r["b"]: r["n"]
        for r in ev.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    merged = {
        r["b"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("d"), bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("b")
        .agg(F.sum("c").alias("n"))
        .collect()
    }
    assert merged == one_shot  # merge identity: + is associative

    values = sorted(r["value"] for r in ev.select("value").collect())
    out = {r["q"]: r for r in REGISTRY["q_quantile_rollup"].fn(spark, sf_dir).collect()}
    for q, row in out.items():
        true_q = values[math.ceil(q * len(values)) - 1]
        # the true quantile must land inside the reported bucket
        assert row["upper_edge"] - QH_WIDTH <= true_q <= row["upper_edge"]
        assert row["n_total"] == len(values)


def test_bloom_prefilter_prunes_but_never_drops(spark, sf_dir):
    """The manual Bloom filter must (a) pass every true match — the join
    result equals the plain broadcast join — and (b) actually prune: the
    prefiltered fact side is a small fraction of lineitem (1024 bits /
    100 keys / 2 hashes → ~18% false-positive ceiling)."""
    from pyspark.sql import functions as F

    from go_web_mapreduce_spark.operators.analytics import (
        BLOOM_TOP,
        q_bloom_join,
    )
    from go_web_mapreduce_spark.sources.tables import load_table

    got = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in q_bloom_join(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    top = (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(BLOOM_TOP)
        .select("o_orderkey", "o_orderpriority")
    )
    want = {
        r["o_orderpriority"]: (r["n"], r["rev"])
        for r in li.join(
            F.broadcast(top), F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("rev"),
        )
        .collect()
    }
    assert got == want
    # prune check: replicate the prefilter and measure selectivity
    from go_web_mapreduce_spark.functions.hashing import md5_bucket
    from go_web_mapreduce_spark.operators.analytics import BLOOM_BITS

    okey = F.col("o_orderkey").cast("string")
    words = (
        top.select(
            F.explode(
                F.array(
                    md5_bucket(okey, BLOOM_BITS, salt=1),
                    md5_bucket(okey, BLOOM_BITS, salt=2),
                )
            ).alias("p")
        )
        .groupBy((F.col("p") / 64).cast("int").alias("w"))
        .agg(F.bit_or(F.expr("shiftleft(1L, cast(p % 64 AS int))")).alias("b"))
        .collect()
    )
    wmap = {int(r["w"]): int(r["b"]) for r in words}
    lits = "array(" + ", ".join(
        f"{wmap.get(w, 0)}L" for w in range(BLOOM_BITS // 64)
    ) + ")"
    lkey = F.col("l_orderkey").cast("string")
    staged = li.select(
        md5_bucket(lkey, BLOOM_BITS, salt=1).alias("p1"),
        md5_bucket(lkey, BLOOM_BITS, salt=2).alias("p2"),
    )
    test = (
        f"((shiftright(element_at({lits}, cast(p1 / 64 AS int) + 1),"
        f" cast(p1 % 64 AS int)) & 1L) = 1L) AND"
        f" ((shiftright(element_at({lits}, cast(p2 / 64 AS int) + 1),"
        f" cast(p2 % 64 AS int)) & 1L) = 1L)"
    )
    total = li.count()
    kept = staged.filter(F.expr(test)).count()
    true_matches = sum(n for n, _ in want.values())
    assert kept >= true_matches  # conservative: no true match lost
    assert kept < total * 0.5  # and it genuinely prunes


def test_anomaly_mad_matches_numpy_reference(spark, sf_dir):
    """Independent replay: per-type median/MAD/outlier-count recomputed with
    numpy must equal the Spark plan's output exactly (numpy's median uses
    midpoint-of-two interpolation at even n — the same percentile_cont law)."""
    import numpy as np

    from go_web_mapreduce_spark.operators.analytics import (
        MAD_CONSISTENCY,
        MAD_NSIGMA,
        q_anomaly_mad,
    )
    from go_web_mapreduce_spark.sources.tables import load_table

    got = {
        r["event_type"]: (r["med"], r["mad"], r["n"], r["n_outliers"])
        for r in q_anomaly_mad(spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(got) == set(by_type) and len(got) > 0
    for et, vals in by_type.items():
        v = np.asarray(vals, dtype=np.float64)
        med = float(np.median(v))
        ad = np.abs(v - med)
        mad = float(np.median(ad))
        n_out = int((ad > MAD_NSIGMA * (MAD_CONSISTENCY * mad)).sum())
        assert got[et] == (med, mad, len(vals), n_out), et


def test_jackknife_ci_matches_numpy_reference(spark, sf_dir):
    """Independent replay: fold sums recomputed locally (hashlib md5 fold
    assignment + numpy leave-one-out means) must reproduce the Spark plan's
    jackknife SE and interval to float precision, and the interval must
    bracket the mean with a positive SE whenever more than one fold exists."""
    import hashlib

    import numpy as np

    from go_web_mapreduce_spark.operators.analytics import (
        JK_BUCKETS,
        JK_Z,
        q_jackknife_ci,
    )
    from go_web_mapreduce_spark.sources.tables import load_table

    got = {r["l_returnflag"]: r for r in q_jackknife_ci(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_extendedprice"
    ).collect()
    folds: dict[str, dict[int, list[float]]] = {}
    for r in rows:
        h = hashlib.md5(f"jk:{r['l_orderkey']}".encode()).hexdigest()
        b = int(h[:4], 16) % JK_BUCKETS
        folds.setdefault(r["l_returnflag"], {}).setdefault(b, []).append(
            float(r["l_extendedprice"])
        )
    assert set(got) == set(folds) and len(got) > 0
    for flag, by_b in folds.items():
        s = np.array([sum(round(x * 100) for x in v) for v in by_b.values()]) / 100.0
        n = np.array([len(v) for v in by_b.values()], dtype=np.float64)
        st, nt, nb = s.sum(), n.sum(), len(by_b)
        m = (st - s) / (nt - n)  # leave-one-fold-out means
        se = float(np.sqrt((nb - 1.0) / nb * ((m - m.mean()) ** 2).sum()))
        g = got[flag]
        assert g["n"] == int(nt)
        assert abs(g["mean_price"] - st / nt) < 1e-6 * abs(st / nt)
        assert abs(g["jk_se"] - se) < 1e-6 * max(se, 1e-12)
        assert abs(g["ci_lo"] - (st / nt - JK_Z * se)) < 1e-5
        assert abs(g["ci_hi"] - (st / nt + JK_Z * se)) < 1e-5
        if nb > 1:
            assert g["jk_se"] > 0.0
            assert g["ci_lo"] < g["mean_price"] < g["ci_hi"]


def test_bootstrap_ci_matches_numpy_reference(spark, sf_dir):
    """Independent replay: Poisson weights recomputed locally from the same
    md5 draws must reproduce every replicate's weighted sum/count and the
    final bootstrap SE; the SE must be positive and the same order of
    magnitude as the classic sd/sqrt(n) estimate."""
    import hashlib

    import numpy as np

    from go_web_mapreduce_spark.operators.analytics import (
        BS_HEX,
        BS_REPS,
        BS_Z,
        q_bootstrap_ci,
    )
    from go_web_mapreduce_spark.sources.tables import load_table

    got = {r["l_returnflag"]: r for r in q_bootstrap_ci(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_extendedprice"
    ).collect()
    by_flag: dict[str, list[tuple[int, float]]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_orderkey"], float(r["l_extendedprice"]))
        )
    assert set(got) == set(by_flag) and len(got) > 0
    for flag, items in by_flag.items():
        prices = np.array([round(p * 100) for _, p in items], dtype=np.int64)
        means = []
        for rep in range(BS_REPS):
            j, k4 = rep // 8, 4 * (rep % 8)
            w = np.array([
                sum(
                    hashlib.md5(f"bs{j}:{k}".encode()).hexdigest()[k4 : k4 + 4] >= h
                    for h in BS_HEX
                )
                for k, _ in items
            ])
            means.append(float((prices * w).sum()) / 100.0 / w.sum())
        m = np.array(means)
        full = float(prices.sum()) / 100.0 / len(prices)
        d = m - full
        se = float(np.sqrt((np.sum(d * d) - d.sum() ** 2 / BS_REPS) / (BS_REPS - 1)))
        g = got[flag]
        assert g["n"] == len(items)
        assert abs(g["mean_price"] - full) < 1e-6 * abs(full)
        assert abs(g["boot_se"] - se) < 1e-5 * max(se, 1e-9)
        assert g["boot_se"] > 0.0
        classic = float((prices / 100.0).std(ddof=1) / np.sqrt(len(prices)))
        assert 0.2 * classic < g["boot_se"] < 5.0 * classic
        assert abs(g["ci_lo"] - (full - BS_Z * se)) < 1e-4
        assert abs(g["ci_hi"] - (full + BS_Z * se)) < 1e-4


def test_ab_ztest_matches_bruteforce(spark, sf_dir):
    """Arm stats and the Welch z must equal a local replay of the same hash
    assignment, and the synthetic no-effect data must be mostly
    non-significant (the arms are random halves of identical traffic)."""
    import hashlib
    import math
    from collections import defaultdict
    from decimal import Decimal

    from go_web_mapreduce_spark.operators.analytics import AB_Z_CRIT, q_ab_ztest
    from go_web_mapreduce_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    ).collect()
    per = defaultdict(Decimal)
    for r in ev:
        per[(r["event_type"], r["user_id"])] += Decimal(str(round(r["value"], 4)))
    arms: dict[str, dict[int, list[float]]] = defaultdict(lambda: {0: [], 1: []})
    for (et, uid), x in per.items():
        arm = int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:4], 16) % 2
        arms[et][arm].append(float(x))
    got = {r["event_type"]: r for r in q_ab_ztest(spark, sf_dir).collect()}
    assert set(got) == {et for et, d in arms.items() if d[0] and d[1]}
    n_sig = 0
    for et, d in arms.items():
        if not (d[0] and d[1]):
            continue
        g = got[et]
        assert g["n_a"] == len(d[0]) and g["n_b"] == len(d[1])
        ma = sum(d[0]) / len(d[0])
        mb = sum(d[1]) / len(d[1])
        va = sum((x - ma) ** 2 for x in d[0]) / (len(d[0]) - 1)
        vb = sum((x - mb) ** 2 for x in d[1]) / (len(d[1]) - 1)
        z = (ma - mb) / math.sqrt(va / len(d[0]) + vb / len(d[1]))
        assert abs(g["mean_a"] - ma) < 1e-6 * abs(ma)
        assert abs(g["mean_b"] - mb) < 1e-6 * abs(mb)
        assert abs(g["z"] - z) < 1e-6 * max(abs(z), 1e-9)
        assert g["significant"] == (abs(z) > AB_Z_CRIT)
        n_sig += bool(g["significant"])
    assert n_sig <= 1  # null experiment: at most a lone false positive


def test_spearman_matches_scipy_style_reference(spark, sf_dir):
    """Rho per flag must equal a local midrank Pearson (the scipy spearmanr
    definition with tie correction) on the same per-order metrics."""
    from collections import defaultdict

    import numpy as np

    from go_web_mapreduce_spark.operators.analytics import q_spearman
    from go_web_mapreduce_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    ).collect()
    agg: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        key = (r["l_returnflag"], r["l_orderkey"])
        agg[key][0] += 1
        agg[key][1] += round(r["l_extendedprice"] * 100)
    by_flag: dict = defaultdict(list)
    for (flag, _), (n_items, cents) in agg.items():
        by_flag[flag].append((n_items, cents / 100.0))

    def midranks(vals):
        order = np.argsort(vals, kind="stable")
        ranks = np.empty(len(vals))
        sv = np.asarray(vals)[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2
            i = j
        return ranks

    got = {r["l_returnflag"]: r for r in q_spearman(spark, sf_dir).collect()}
    assert set(got) == set(by_flag)
    for flag, pairs in by_flag.items():
        rx = midranks([p[0] for p in pairs])
        ry = midranks([p[1] for p in pairs])
        rho = float(np.corrcoef(rx, ry)[0, 1])
        g = got[flag]
        assert g["n"] == len(pairs)
        assert abs(g["rho"] - rho) < 1e-9
        assert -1.0 - 1e-12 <= g["rho"] <= 1.0 + 1e-12


def test_gini_matches_bruteforce(spark, sf_dir):
    """Gini and top-decile share per nation must equal a local replay, obey
    bounds (0 <= G < 1), and top-decile share must be >= 10% of mass
    (the top decile can never hold less than a uniform share)."""
    from collections import defaultdict

    from go_web_mapreduce_spark.operators.analytics import q_gini
    from go_web_mapreduce_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    nation_of = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        ).collect()
    }
    rev: dict = defaultdict(int)
    for r in orders:
        rev[(nation_of[r["o_custkey"]], r["o_custkey"])] += round(
            r["o_totalprice"] * 100
        )
    by_nation: dict = defaultdict(list)
    for (nat, _), cents in rev.items():
        by_nation[nat].append(cents)
    got = {r["nation"]: r for r in q_gini(spark, sf_dir).collect()}
    assert set(got) == set(by_nation)
    for nat, vals in by_nation.items():
        vals.sort()
        n = len(vals)
        tot = sum(vals)
        iw = sum((i + 1) * x for i, x in enumerate(vals))
        gini = 2.0 * iw / (n * tot) - (n + 1.0) / n
        k = (n + 9) // 10
        top = sum(vals[n - k:]) / tot
        g = got[nat]
        assert g["n_customers"] == n
        assert abs(g["gini"] - gini) < 1e-9
        assert abs(g["top_decile_share"] - top) < 1e-12
        assert 0.0 <= g["gini"] < 1.0
        assert g["top_decile_share"] >= k / n - 1e-12


def test_benford_matches_bruteforce(spark, sf_dir):
    """Digit census, fractions, expectations, and chi2 must equal a local
    replay; fractions must sum to 1 and cover only digits 1-9."""
    import math
    from collections import Counter

    from go_web_mapreduce_spark.operators.analytics import q_benford
    from go_web_mapreduce_spark.sources.tables import load_table

    vals = [
        r["o_totalprice"]
        for r in load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
        if r["o_totalprice"] >= 1.0
    ]
    cnt = Counter(int(str(int(math.floor(v)))[0]) for v in vals)
    t = sum(cnt.values())
    got = {r["digit"]: r for r in q_benford(spark, sf_dir).collect()}
    assert set(got) == set(cnt) and set(got) <= set(range(1, 10))
    chi2 = sum(
        (c / t - math.log10(1 + 1 / d)) ** 2 / math.log10(1 + 1 / d)
        for d, c in cnt.items()
    ) * t
    assert abs(sum(r["frac"] for r in got.values()) - 1.0) < 1e-12
    for d, c in cnt.items():
        g = got[d]
        assert g["n"] == c
        assert abs(g["frac"] - c / t) < 1e-12
        assert abs(g["expected"] - math.log10(1 + 1 / d)) < 1e-12
        assert abs(g["deviation"] - (c / t - math.log10(1 + 1 / d))) < 1e-12
        assert abs(g["chi2"] - chi2) < 1e-6


def test_winsorized_mean_matches_numpy(spark, sf_dir):
    """Cuts, clamp counts, and both means must equal a local replay of the
    discrete rank-selection percentile; the winsorized mean must sit
    inside [lo, hi]."""
    from collections import defaultdict

    import numpy as np

    from go_web_mapreduce_spark.operators.analytics import (
        WINSOR_HI,
        WINSOR_LO,
        q_winsorized_mean,
    )
    from go_web_mapreduce_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r["value"])
    got = {r["event_type"]: r for r in q_winsorized_mean(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    import math

    for et, vals in by_type.items():
        v = np.asarray(vals)
        sv = np.sort(v)
        lo = float(sv[math.ceil(WINSOR_LO * len(sv)) - 1])
        hi = float(sv[math.ceil(WINSOR_HI * len(sv)) - 1])
        w = np.clip(v, lo, hi)
        g = got[et]
        assert g["n"] == len(vals)
        assert abs(g["lo"] - lo) < 1e-9 and abs(g["hi"] - hi) < 1e-9
        assert g["n_clamped_lo"] == int((v < lo).sum())
        assert g["n_clamped_hi"] == int((v > hi).sum())
        assert abs(g["raw_mean"] - v.mean()) < 1e-6
        assert abs(g["winsor_mean"] - w.mean()) < 1e-6
        assert lo - 1e-9 <= g["winsor_mean"] <= hi + 1e-9
