"""Order-independent (exact-decimal) money aggregation.

Floating-point SUM/AVG depend on summation order, which differs between
Spark's partitioned partial aggregation and any single-threaded oracle — a
`round(x, 2)` on top can then land on opposite sides of a half-cent
boundary. For money-shaped columns (fixed ≤2-4 decimal places) we aggregate
as DECIMAL instead: decimal addition is exact and therefore
order-independent, so Spark and DuckDB produce bit-identical doubles after
the final cast. This matters at any scale; at 100 TB it also means results
don't drift run-to-run as AQE re-partitions.

Spark helpers here pair with oracle-SQL fragments of the shape::

    ROUND(CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE), 2)
    ROUND(CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) / COUNT(x), 2)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRECISION = 18  # input cast width; SUM widens (Spark +10, DuckDB to 38) without overflow


def dec(c: Column | str, scale: int = 2) -> Column:
    """Cast a money-shaped double to exact decimal."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({PRECISION},{scale})")


def portable_round(c: Column, n: int = 2) -> Column:
    """Engine-portable half-up rounding: ``floor(x*10^n + 0.5) / 10^n``.

    Spark's ``round()`` rounds the double's shortest *decimal repr* (via
    BigDecimal.valueOf) while DuckDB rounds the *binary value* — they
    disagree on values like 4201.315 (stored as 4201.31499…). This formula
    is the same sequence of IEEE ops in both engines, so identical inputs
    give identical outputs. Oracle-SQL twin: ``FLOOR(x*100 + 0.5)/100``.
    """
    p = 10**n
    return F.floor(c * p + F.lit(0.5)) / p


def sql_round(expr: str, n: int = 2) -> str:
    """DuckDB fragment matching :func:`portable_round`."""
    p = 10**n
    return f"FLOOR(({expr}) * {p} + 0.5) / {p}"


def exact_sum(c: Column | str, scale: int = 2, round_to: int | None = None) -> Column:
    """Order-independent SUM, returned as double (portably rounded)."""
    out = F.sum(dec(c, scale)).cast("double")
    return portable_round(out, round_to if round_to is not None else scale)


def exact_avg(c: Column | str, scale: int = 2, round_to: int | None = None) -> Column:
    """Order-independent AVG: exact decimal sum divided by non-null count."""
    col = F.col(c) if isinstance(c, str) else c
    out = F.sum(dec(col, scale)).cast("double") / F.count(col)
    return portable_round(out, round_to if round_to is not None else scale)
