"""Aggregated query registry — import side effect populates REGISTRY.

``__spark_entry__`` calls :func:`all_queries` / :func:`all_oracles`; tests and
bench iterate the same registry so there is exactly one source of truth for
"what the engine implements".
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import go_web_mapreduce_spark.operators  # noqa: F401  (registers all queries)
from go_web_mapreduce_spark.registry import REGISTRY, QuerySpec

# post-registration invariant: every variant_of must name a registered
# primary query — a typo would otherwise silently skew bench.py's
# headline/alternates split (it keys only on the field being non-None)
for _spec in REGISTRY.values():
    if _spec.variant_of is not None and _spec.variant_of not in REGISTRY:
        raise ValueError(
            f"query {_spec.name!r}: variant_of={_spec.variant_of!r} does "
            "not resolve to a registered query"
        )
    if _spec.variant_of == _spec.name:
        raise ValueError(f"query {_spec.name!r} cannot be its own variant")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }


def get(name: str) -> QuerySpec:
    return REGISTRY[name]
