"""ANN operating curves (VERDICT r4 next-steps #6): recall@k vs candidate
fraction for each approximate-search path at its tunable knob, so a user
can pick a config instead of trusting one operating point.

    python tools/ann_curves.py [sf_dir]     # default /root/testdata/sf0.1

Sweeps, against the exact brute-force top-k over ``N_PROBES`` probe
vectors:
- LSH multi-probe radius 0/1/2   (candidate fraction ~ C(H,<=r)/2^H)
- IVF nprobe 1..32 of 32 lists   (candidate fraction ~ nprobe/32)
- PQ shortlist 50..400 at m=8/ksub=16, plus m/ksub variants
   (candidate fraction = shortlist/corpus for the exact-rerank stage;
   the ADC pass always reads all codes — 8 bytes/vector)

Prints a markdown table for SCALE.md. The recall floors the defaults must
keep are pinned in tests/test_ann.py (this tool is measurement, tests are
the contract).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_PROBES = 20
K = 10


def main() -> None:
    from go_web_mapreduce_spark.operators.similarity import (
        IVF_CENTROIDS,
        NUM_HYPERPLANES,
        ann_topk_lsh,
        cosine_topk,
        ivf_topk,
        pq_topk,
    )
    from go_web_mapreduce_spark.session import get_spark
    from go_web_mapreduce_spark.sources.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-curves")
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n_corpus = emb.count()
    probes = [
        emb.filter(F.col("vec_id") == i) for i in range(N_PROBES)
    ]
    exact = [
        {r["vec_id"] for r in cosine_topk(emb, p, K).collect()}
        for p in probes
    ]

    def recall(mk_df) -> float:
        tot = 0.0
        for p, ex in zip(probes, exact):
            got = {r["vec_id"] for r in mk_df(p).collect()}
            tot += len(got & ex) / len(ex)
        return tot / len(probes)

    rows: list[tuple[str, str, float, float]] = []

    for radius in (0, 1, 2):
        frac = sum(
            math.comb(NUM_HYPERPLANES, r) for r in range(radius + 1)
        ) / (1 << NUM_HYPERPLANES)
        r = recall(lambda p, rad=radius: ann_topk_lsh(emb, p, K, radius=rad))
        rows.append((f"LSH radius={radius}", f"~{frac:.3f}", r, frac))

    for nprobe in (1, 2, 4, 8, 16, 32):
        frac = nprobe / IVF_CENTROIDS
        r = recall(lambda p, np_=nprobe: ivf_topk(emb, p, K, nprobe=np_))
        rows.append((f"IVF nprobe={nprobe}/32", f"~{frac:.3f}", r, frac))

    from go_web_mapreduce_spark.operators.similarity import (
        PQ_SHORTLIST,
        _ivfpq_search,
        ivfpq_build,
    )

    codes, centroids, cb = ivfpq_build(emb)
    codes = codes.localCheckpoint(eager=True)
    for nprobe, shortlist in (
        (4, PQ_SHORTLIST), (8, PQ_SHORTLIST), (16, PQ_SHORTLIST),
        # the high-recall end of the curve: pick_config needs measured
        # points past 0.8, which the default shortlist never reaches
        (16, 400), (32, 400),
    ):
        frac = nprobe / IVF_CENTROIDS
        r = recall(
            lambda p, np_=nprobe, s=shortlist: _ivfpq_search(
                codes, centroids, cb, emb, p, K, np_, s, "vec_id"
            )
        )
        rows.append(
            (f"IVFPQ nprobe={nprobe}/32 shortlist={shortlist}",
             f"~{frac:.3f}", r, frac)
        )

    for shortlist, m, ksub in (
        (50, 8, 16), (100, 8, 16), (200, 8, 16), (400, 8, 16),
        (100, 4, 16), (100, 16, 16), (100, 8, 8),
    ):
        frac = shortlist / n_corpus
        r = recall(
            lambda p, s=shortlist, mm=m, kk=ksub: pq_topk(
                emb, p, K, shortlist=s, m=mm, ksub=kk
            )
        )
        rows.append(
            (f"PQ shortlist={shortlist} m={m} ksub={ksub}",
             f"{frac:.3f}", r, frac)
        )

    print(f"| config | candidate fraction | recall@{K} (n={N_PROBES} probes) |")
    print("|---|---|---|")
    for name, fs, r, _ in rows:
        print(f"| {name} | {fs} | {r:.3f} |")


if __name__ == "__main__":
    main()
