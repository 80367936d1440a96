"""Scalar column helpers — SURVEY.md §2.9 (SC1-SC16).

Pure ``Column -> Column`` functions; everything stays JVM-side inside
whole-stage codegen (no Python UDFs). Each helper cites the reference
behavior it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def day_name(ts: Column) -> Column:
    """English weekday name (SC3) — pandas ``dt.day_name()``,
    reference sales_analytics_dag.py:73. Locale pinned English."""
    return F.date_format(ts, "EEEE")


def age_years(birthdate: Column, as_of: Column) -> Column:
    """Birthday-aware age in whole years (SC5).

    Exactly the reference's arithmetic (customer_analytics_dag.py:76-82):
    year difference minus one if the birthday hasn't been reached yet.
    Explicit year/month/day comparison rather than ``months_between`` so the
    semantics are portable (same formula runs in the DuckDB oracle) and free
    of end-of-month special cases. ``as_of`` is an explicit column/literal
    instead of ``current_date()`` so results are reproducible (SURVEY §4
    item 3).
    """
    not_yet = (F.month(as_of) < F.month(birthdate)) | (
        (F.month(as_of) == F.month(birthdate)) & (F.dayofmonth(as_of) < F.dayofmonth(birthdate))
    )
    return (F.year(as_of) - F.year(birthdate) - not_yet.cast("int")).cast("int")


def tenure_days(start: Column, as_of: Column) -> Column:
    """Whole-day difference (SC6) — reference customer_analytics_dag.py:85."""
    return F.datediff(as_of, start)


def zero_guard(c: Column) -> Column:
    """Replace 0 with 1 in a divisor (SC7) — reference
    sales_analytics_dag.py:188-191 ``replace(0, 1)``."""
    return F.when(c == 0, F.lit(1)).otherwise(c)


def safe_div(num: Column, den: Column) -> Column:
    """Division with the reference's zero-guard divisor semantics (SC7+SC8)."""
    return num / zero_guard(den)


def pct_ratio(num: Column, den: Column) -> Column:
    """Ratio ×100 (SC8) — reference sales_analytics_dag.py:124-126."""
    return num * 100.0 / den


def market_position(diff: Column) -> Column:
    """3-way sign classification (SC9) — reference web_scraping_dag.py:178-186."""
    return (
        F.when(diff > 0, F.lit("Above Market"))
        .when(diff < 0, F.lit("Below Market"))
        .otherwise(F.lit("At Market"))
    )


def parse_currency(c: Column) -> Column:
    """Currency-string cleanup 'Rp1.234.567' -> 1234567 (SC10) —
    reference web_scraping_dag.py:100."""
    return F.regexp_replace(c, r"[Rp.]", "").cast("long")


def benford_first_digit(value: Column) -> Column:
    """First significant digit of a money-shaped double — shared by the
    batch DQ check (plans/extended.py::dq_benford_deviation) and the
    streaming monitor (streaming/streams.py::benford_monitor_stream) so
    the two faces cannot drift. floor -> bigint -> string -> first char:
    integer/string ops only, so Spark and DuckDB agree bit-for-bit (no
    log10 on data — libm divergence risk). Caller filters to value >= 1
    (sub-1 values have no integer first digit)."""
    return F.substring(F.floor(value).cast("bigint").cast("string"), 1, 1).cast(
        "int"
    )
