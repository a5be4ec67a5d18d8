"""Cross-engine-deterministic numeric aggregates.

Floating-point SUM/AVG are nondeterministic across engines (and across runs:
partial-aggregation order varies), and ``round()`` itself disagrees between
Spark (HALF_UP on the shortest decimal string) and DuckDB (nearest on the
binary value) at ``.xx5`` boundaries. The fix used throughout the engine:

- cast each double to ``decimal(18, s)`` *before* summing → the sum is exact
  and order-independent; cast the result back to double for a stable schema.
- express AVG as ``exact_sum / count`` (one IEEE division of identical
  operands → identical bits in every engine).
- never round row-level arithmetic: identical IEEE expressions produce
  identical doubles already.

DuckDB oracle equivalents:
  dsum(x, s)  →  CAST(sum(CAST(x AS DECIMAL(18, s))) AS DOUBLE)
  davg(x, s)  →  CAST(sum(CAST(x AS DECIMAL(18, s))) AS DOUBLE) / count(x)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(c: Column | str, scale: int = 4) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(c: Column | str, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum divided by count."""
    col = F.col(c) if isinstance(c, str) else c
    return dsum(col, scale) / F.count(col)
