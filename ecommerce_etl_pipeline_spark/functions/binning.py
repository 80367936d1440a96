"""Quantile and fixed-interval bucketing — SURVEY.md §2.5 (W1, W2).

The reference buckets with pandas ``qcut`` (equal-frequency quartiles,
sales_analytics_dag.py:78-82 / product_analytics_dag.py:129-133) and ``cut``
(fixed right-closed intervals, customer_analytics_dag.py:88-92). ``qcut``
computes linearly-interpolated quantile *edges* and then right-closed
bucketing — NOT the same as ``ntile`` at ties. For oracle-exact semantics we
compute the edges once (exact ``percentile``; a single tree-aggregated scalar
row, cheap even at 100 TB though at that scale ``approx_percentile`` with a
tight error is the pragmatic default — pass ``exact=False``) and bucket with
a ``when`` chain, mirroring DuckDB ``quantile_cont`` in the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_edges(
    df: DataFrame, col: str, probs: Sequence[float], *, exact: bool = True
) -> list[float]:
    """Interior quantile edges of ``df[col]`` (linear interpolation, matching
    pandas qcut / DuckDB quantile_cont)."""
    fn = "percentile" if exact else "approx_percentile"
    arr = ", ".join(str(p) for p in probs)
    row = df.select(F.expr(f"{fn}({col}, array({arr}))").alias("q")).first()
    return [float(x) for x in row["q"]]


def round_edges(edges: Sequence[float], n: int = 4) -> list[float]:
    """Half-up-round collected edges driver-side: ``floor(x*10^n + 0.5)/10^n``.

    The Python twin of :func:`exact_agg.portable_round` — interpolated
    quantiles at non-exact indices are FP-order-sensitive across engines, so
    any query that *scores against* collected edges must round them (and the
    oracle's ``quantile_cont`` identically) before the ``<=`` comparisons.
    """
    import math

    p = 10**n
    return [math.floor(x * p + 0.5) / p for x in edges]


def bucket_by_edges(c: Column, edges: Sequence[float], labels: Sequence[str]) -> Column:
    """Right-closed bucketing by precomputed edges: x <= edges[0] -> labels[0],
    … else labels[-1]. len(labels) == len(edges) + 1."""
    assert len(labels) == len(edges) + 1
    expr = F.when(c <= F.lit(edges[0]), F.lit(labels[0]))
    for i in range(1, len(edges)):
        expr = expr.when(c <= F.lit(edges[i]), F.lit(labels[i]))
    return expr.otherwise(F.lit(labels[-1]))


def quantile_bins(
    df: DataFrame,
    col: str,
    labels: Sequence[str],
    *,
    out: str = "bin",
    exact: bool = True,
    round_dp: int | None = 4,
) -> DataFrame:
    """pandas ``qcut(df[col], q=len(labels), labels=labels)`` (W1).

    Equal-frequency buckets via exact quantile edges + right-closed ``when``
    chain. Two Spark jobs (edge scalar, then bucketing) — the edge job reads
    one column and aggregates to a single row, so it is scan-bound, not
    shuffle-bound.

    Edges are half-up-rounded to ``round_dp`` decimals before the ``<=``
    comparisons (:func:`round_edges` — the a24/a26 boundary doctrine, r11
    ADVICE): interpolated quantiles at non-exact indices are FP-order-
    sensitive across engines, so every oracle-backed caller's DuckDB twin
    must FLOOR-round its ``quantile_cont`` edges identically
    (``FLOOR(e * 10^dp + 0.5) / 10^dp``). Pass ``round_dp=None`` for raw
    edges.
    """
    q = len(labels)
    probs = [i / q for i in range(1, q)]
    edges = quantile_edges(df, col, probs, exact=exact)
    if round_dp is not None:
        edges = round_edges(edges, round_dp)
    return df.withColumn(out, bucket_by_edges(F.col(col), edges, labels))


def fixed_bins(c: Column, edges: Sequence[float], labels: Sequence[str]) -> Column:
    """pandas ``cut(x, bins=[-inf, *edges, inf], labels=labels)`` (W2) —
    right-closed fixed intervals, reference customer_analytics_dag.py:88-92.

    NULL handling is the CALLER's job: the when-chain's ``otherwise``
    catches NULL input and labels it ``labels[-1]``, whereas pandas
    ``cut`` maps NaN to NaN — callers whose input can be NULL must guard
    with ``F.when(c.isNotNull(), fixed_bins(...))`` (and mirror the guard
    in their oracle's CASE — ADVICE r12 #2)."""
    return bucket_by_edges(c, edges, labels)
