"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles most skew at runtime by
splitting oversized partitions. Salting is the *planned* alternative for the
cases AQE can't fix: a single group key so hot that even one split of it
overwhelms a task (the classic null-key / power-law-head problem in web-scale
dedup and joins).

Both helpers are algebraic rewrites with identical results:

- ``salted_agg``: group by (key, salt) first — the hot key's rows spread over
  ``num_salts`` tasks producing partial states — then re-aggregate by key.
  Works for any associative aggregate (the decomposition COUNT→SUM,
  SUM→SUM, MIN→MIN... is the caller's, kept explicit).
- ``salted_join``: salt the skewed (big) side randomly; explode the small
  side ``num_salts``× so every (key, salt) pair still matches. Join
  cardinality is unchanged; the hot key now lands on ``num_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, num_salts: int) -> DataFrame:
    """Uniform random salt in [0, num_salts). Nondeterministic by design —
    never use in an oracle-checked value path, only as a partitioning aid."""
    if num_salts <= 0:
        raise ValueError("num_salts must be positive")
    return df.withColumn(SALT_COL, (F.rand() * num_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then keys.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` merge the partials
    per key and must reference the partial alias names. Example::

        salted_agg(events, ["user_id"],
                   [F.count("*").alias("pn")],
                   [F.sum("pn").alias("n")])
    """
    salted = with_salt(df, num_salts)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``num_salts``
    tasks. The small side is exploded ``num_salts``× (acceptable precisely
    when it is the small side); results equal ``big.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salted_big = with_salt(big, num_salts)
    exploded_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted_big.join(exploded_small, [*on, SALT_COL], how).drop(SALT_COL)
