"""Query registry — the contract between operator modules and __spark_entry__.

Each operator module declares its queries with :func:`query`; the driver-facing
``__spark_entry__.queries()`` / ``oracle_sql()`` are projections of this one
registry, so a query and its DuckDB oracle live next to the implementation
they verify.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views; None → rows-only check
    description: str
    # name of the primary query this one is a documented-slower alternative
    # plan for (e.g. prefix-filter jaccard vs the inverted-index default).
    # Alternates run and verify like everything else; bench.py reports a
    # separate headline total without them so a deliberately-kept slow
    # variant doesn't read as a regression.
    variant_of: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    description: str,
    variant_of: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, description=description,
            variant_of=variant_of,
        )
        return fn

    return deco
