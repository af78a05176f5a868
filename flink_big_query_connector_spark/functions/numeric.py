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


def roundf_expr(x: Column, digits: int) -> Column:
    """Tie-safe floor-form rounding at an arbitrary scale (see
    :func:`round6_expr` for the classes that need it; 9dp integer
    ratios tie too — 1/1024 terminates at exactly 10 digits ending in
    5).  Twin: :func:`sql_roundf`.

    CONVENTION: the floor form rounds halves toward +INFINITY, so
    negative exact ties round toward zero (-0.1276375 -> -0.127637),
    unlike HALF_UP (-0.127638).  Safe precisely because engine and
    oracle always change in matched pairs (parity + static-guard tests
    enforce this); documented as published-output semantics in
    COVERAGE.md."""
    m = float(10 ** digits)
    return F.floor(x.cast("double") * F.lit(m) + F.lit(0.5)) / F.lit(m)


def sql_roundf(x: str, digits: int) -> str:
    """DuckDB twin of :func:`roundf_expr` (same IEEE ops, same
    order)."""
    m = float(10 ** digits)
    return f"floor(CAST({x} AS DOUBLE) * {m!r} + 0.5) / {m!r}"


def round6_expr(x: Column) -> Column:
    """6dp rounding of a double that is SAFE at exact decimal ties, via
    the identical-IEEE-formula pattern: ``floor(x * 1e6 + 0.5) / 1e6``
    (evaluated bitwise-identically by Spark and DuckDB — twin:
    :func:`sql_round6`).

    ``F.round(x, 6)`` is NOT cross-engine-safe when the value's exact
    decimal form can terminate ON the 6dp boundary: Spark rounds the
    double's shortest STRING repr half-up while DuckDB rounds in float
    arithmetic, and the two split there.  Two value classes hit such
    ties routinely and must use this form: (a) integer/integer ratios
    (seed 202: -10211/80000 = -0.1276375), and (b) doubles cast from
    exact DECIMAL sums of scale >= 7 and their per-count means (seed
    505: a DECIMAL(20,9) logprob sum ending in ...500).  A third class
    is SIGNED ZERO, (c): for values in (-5e-7, 0) DuckDB's round
    returns -0.0 while Spark's never does (BigDecimal has no signed
    zero), and the two are repr-distinct to the driver hash (seed 606:
    a signed random projection) — the floor form is immune, since
    ``floor`` of the shifted value is integer zero and both engines
    emit +0.0.  Irrational-ish values bounded away from zero (cosines
    near +-1, raw logs) effectively never hit any class, so the plain
    round(_, 6) convention stays fine there."""
    return roundf_expr(x, 6)


def sql_round6(x: str) -> str:
    """DuckDB twin of :func:`round6_expr` (same IEEE ops, same order)."""
    return sql_roundf(x, 6)


def round6_ratio_expr(numer: Column, denom: Column) -> Column:
    """Tie-safe 6dp rounding of an integer/integer ratio (see
    :func:`round6_expr`, class (a))."""
    return round6_expr(numer.cast("double") / denom.cast("double"))


def sql_round6_ratio(numer: str, denom: str) -> str:
    """DuckDB twin of :func:`round6_ratio_expr` (same IEEE ops, same
    order)."""
    return sql_round6(
        f"CAST({numer} AS DOUBLE) / CAST({denom} AS DOUBLE)"
    )


def sql_dbl(expr: str) -> str:
    """DuckDB DECIMAL -> DOUBLE cast that is CORRECTLY ROUNDED — the
    twin of the engine's ``dbl()`` (Spark's BigDecimal.doubleValue).

    DuckDB's native decimal->double cast converts the scaled integer to
    double FIRST and divides by 10^scale second: two roundings.  Once
    the scaled integer exceeds 2^53 (a money sum over ~9e15 micro
    units — reached between sf0.1 and sf1 on the Q1 charge column) the
    first conversion is lossy and the result can differ from the
    correctly-rounded value by an ulp, hash-splitting against Spark.
    Routing through VARCHAR makes DuckDB parse the exact decimal string
    straight to the nearest double — one correctly-rounded conversion,
    bitwise Spark's."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"
