"""Numeric helpers for oracle-exact aggregation.

Floating-point SUM is order-dependent, and Spark's task/partition ordering
differs from any single-threaded oracle — so a ``SUM(double)`` can differ in
the last ulps between runs, let alone between engines.  The engine's
convention for money-like columns:

1. cast to a tight DECIMAL (exact, and double->decimal rounding is
   deterministic: binary doubles are never exactly at a decimal .5 tie, so
   round-half-up and round-nearest agree),
2. do the arithmetic and the SUM in decimal domain (exact integer math,
   order-independent — safe under any degree of parallelism),
3. cast the final aggregate to DOUBLE for a stable, engine-neutral schema.

This is also the right call at 100 TB: a partial-aggregated decimal sum is
deterministic no matter how AQE re-splits the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast a column to DECIMAL(precision, scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DecimalType(precision, scale))


def dbl(col: Column) -> Column:
    """Cast (usually a decimal aggregate) to DOUBLE."""
    return col.cast("double")
