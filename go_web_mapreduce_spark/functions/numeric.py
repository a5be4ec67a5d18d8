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

DuckDB oracle equivalents (note the string round-trip):
  dsum(x, s)  →  CAST(CAST(sum(CAST(x AS DECIMAL(18, s))) AS STRING) AS DOUBLE)
  davg(x, s)  →  dsum-equivalent / count(x)

Why the string hop (spelled STRING — both engines parse it; Spark rejects bare VARCHAR): DuckDB's direct DECIMAL→DOUBLE cast computes
``(double)unscaled / 10^scale`` — TWO roundings, off by one ulp from the
correctly-rounded value once the unscaled integer exceeds 2^53 (observed on
sum(l_extendedprice²) at sf0.001: unscaled ≈ 7.1e16). Spark (Java
BigDecimal.doubleValue) and Python are correctly rounded, so large exact
sums hash-mismatched in the last ulp. DECIMAL→STRING is exact and
STRING→DOUBLE is correctly-rounded strtod, so the round-trip always yields
the same double as Spark — a no-op below 2^53 and a fix above it.
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
