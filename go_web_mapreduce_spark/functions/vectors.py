"""Vector math over ``array<float>`` columns — pure Column expressions.

No Python UDFs: ``zip_with`` + ``aggregate`` compile to Catalyst expressions
that run inside codegen, so cosine over a 100 TB embedding table is a single
scan with no serialization wall. (A Pandas-UDF variant was benchmarked and
lost: Arrow transfer of the vectors costs more than the JVM-side fold.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length float-array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of a float-array column (double)."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 where either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)
