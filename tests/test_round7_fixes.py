"""Round-7 changes (the round-6 ADVICE items):

1. q_gini's rank-weighted sum accumulates in DECIMAL(28,0): a BIGINT
   iwsum (~cents*n^2/2 per nation) wraps silently around sf~50-100 in
   Spark's non-ANSI sum while the DuckDB oracle's HUGEINT-to-BIGINT cast
   errors — the engines diverged exactly where the scale claims apply.
   Pinned here by running q_gini AND its registered oracle on a synthetic
   nation whose iwsum exceeds 2^63.
2. q_self_bleu guards ln(0): a source whose n-grams at some order are all
   unique to it has clipped precision exactly 0 — DuckDB's ln(0) throws
   while Spark's F.log(0) yields NULL. Both engines must now return the
   mathematically correct self_bleu = 0.0.
"""

from __future__ import annotations

import duckdb
import pytest


def _write_parquet(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _duck_con(tdir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tdir}/{t}.parquet/*.parquet'")
    return con


def test_gini_iwsum_survives_bigint_overflow(spark, tmp_path):
    """50 customers at cents = 8e15 each: sum(i*cents) = 1275 * 8e15
    ~ 1.02e19 > 2^63, where the old BIGINT accumulator wrapped (Spark) or
    errored on the cast (DuckDB). Both engines must agree with the exact
    int replay."""
    from go_web_mapreduce_spark.queries import REGISTRY
    from go_web_mapreduce_spark.operators.analytics import q_gini

    tdir = str(tmp_path)
    # iwsum grows ~n^2 while tot grows ~n, so iwsum crosses 2^63 first —
    # the fixture mirrors that ordering: tot = 4e17 (fits int64), iwsum =
    # 1275 * 8e15 ~ 1.02e19 (overflows int64), per-row i*cents <= 4e17.
    n = 50
    price = 8.0e13  # cents = 8e15 per customer
    cust = [(i, f"c{i}", 0, 0.0, "SEG") for i in range(1, n + 1)]
    orders = [
        (i, i, "O", price, None, "1-URGENT") for i in range(1, n + 1)
    ]
    _write_parquet(
        spark, cust,
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
        f"{tdir}/customer.parquet",
    )
    _write_parquet(
        spark, orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        f"{tdir}/orders.parquet",
    )

    cents = round(price * 100)
    iw = sum(i * cents for i in range(1, n + 1))
    assert iw > 2**63  # the fixture really exercises the overflow regime
    tot = n * cents
    want = 2.0 * iw / (n * tot) - (n + 1.0) / n

    row = q_gini(spark, tdir).collect()[0]
    assert row["n_customers"] == n
    assert row["gini"] == pytest.approx(want, abs=1e-12)
    assert 0.0 <= row["gini"] < 1.0  # a wrapped sum goes wildly negative

    con = _duck_con(tdir, ["customer", "orders"])
    orow = con.execute(REGISTRY["q_gini"].oracle).fetchall()
    assert len(orow) == 1
    assert orow[0][2] == pytest.approx(want, abs=1e-12)


def test_self_bleu_zero_precision_yields_zero_not_null(spark, tmp_path):
    """Source 'uniq' shares unigrams with the corpus but every one of its
    bigrams/trigrams appears nowhere else: clipped p2 = p3 = 0, so the
    geometric mean is 0 by definition. Spark must emit 0.0 (not NULL) and
    the DuckDB oracle must not crash on ln(0)."""
    from go_web_mapreduce_spark.queries import REGISTRY
    from go_web_mapreduce_spark.operators.text_analysis import q_self_bleu

    tdir = str(tmp_path)
    docs = [
        (1, "alpha beta gamma delta", "en", "uniq", 22),
        (2, "delta gamma beta alpha", "en", "common", 22),
        (3, "delta gamma beta alpha", "en", "common2", 22),
    ]
    _write_parquet(
        spark, docs,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
        f"{tdir}/documents.parquet",
    )

    got = {r["source"]: r for r in q_self_bleu(spark, tdir).collect()}
    u = got["uniq"]
    assert u["p1"] == 1.0  # every unigram exists elsewhere
    assert u["p2"] == 0.0 and u["p3"] == 0.0
    assert u["self_bleu"] == 0.0  # the guard: 0.0, never NULL
    # the two identical sources fully reproduce each other
    assert got["common"]["self_bleu"] == pytest.approx(1.0)

    con = _duck_con(tdir, ["documents"])
    rows = con.execute(REGISTRY["q_self_bleu"].oracle).fetchall()
    by_src = {r[0]: r for r in rows}
    assert by_src["uniq"][4] == 0.0
    assert by_src["common"][4] == pytest.approx(1.0)
