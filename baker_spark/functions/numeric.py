"""Cross-engine deterministic numeric aggregation helpers.

Problem: ``sum(double)`` depends on accumulation order (parallelism makes
it nondeterministic) and ``CAST(decimal AS DOUBLE)`` rounds differently in
Spark (BigDecimal.doubleValue) and DuckDB (scaled-int division). The
driver's oracle compares value *hashes*, so "close" is not enough.

Solution used by every aggregate query in this engine:

1. cast inputs to DECIMAL(18,6) (exact, deterministic for data with <= 6
   fractional digits, which all synthetic money/quantity columns have),
2. aggregate in decimal (exact in both engines),
3. emit ``CAST(floor(x * 10^k) AS BIGINT)`` — floor of an exact decimal has
   no rounding ties, so both engines agree bit-for-bit.

Column naming convention: ``*_c2`` = value * 100 floored (cents),
``*_c6`` = value * 1e6 floored (micros).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(18,6)"


def dec(col: Column | str) -> Column:
    """Exact decimal view of a numeric column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def cents(col: Column) -> Column:
    """floor(x*100) as BIGINT — deterministic 2-dp fixed-point."""
    return F.floor(col * F.lit(100)).cast("long")


def micros(col: Column) -> Column:
    """floor(x*1e6) as BIGINT — deterministic 6-dp fixed-point."""
    return F.floor(col * F.lit(1000000)).cast("long")


def c2_long(col: Column | str) -> Column:
    """Exact integer cents of a 2-dp money DOUBLE column:
    round(x*100) as BIGINT. A 2-dp value stored in double sits within
    ~1e-11 of the true decimal, so x*100 is within 1e-9 of an integer —
    rounding recovers it exactly (no tie cases exist), and aggregation
    proceeds in BIGINT, which Tungsten sums ~2-3x faster than
    DECIMAL(18,6). Use only on columns known to carry <= 2 fractional
    digits; `dec()` is the general path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def duck_c2_long(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def duck_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,6))"


def duck_cents(expr: str) -> str:
    return f"CAST(floor(({expr}) * 100) AS BIGINT)"


def duck_micros(expr: str) -> str:
    return f"CAST(floor(({expr}) * 1000000) AS BIGINT)"
