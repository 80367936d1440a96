"""Skew-handling for hot keys — the manual complement to AQE's skew-join
splitting (SURVEY.md §4).

AQE already splits oversized shuffle partitions for sort-merge joins at
runtime. Salting is still needed when (a) a *groupBy* key is hot (AQE does
not split aggregation groups), or (b) a skewed join must avoid sort-merge
entirely. The pattern: explode the hot side's key into ``key⊕salt``,
replicate the small side per salt, aggregate partially per salted key, then
merge — two short shuffles instead of one unbounded one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, *, col_name: str = "_salt") -> DataFrame:
    """Add a uniform salt column in [0, buckets)."""
    return df.withColumn(col_name, F.floor(F.rand(42) * buckets).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    *,
    buckets: int = 16,
    merge: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (keys + salt) — hot keys spread over ``buckets``
    reducers; phase 2 merges the partials by the true keys. ``aggs`` maps
    output name -> phase-1 aggregate; ``merge`` maps the same names to the
    phase-2 re-aggregate (default: SUM, correct for count/sum partials).
    """
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    merge = merge or {name: F.sum(name) for name in aggs}
    return phase1.groupBy(*keys).agg(*[c.alias(name) for name, c in merge.items()])


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join: salt the big side, replicate the (broadcastable)
    small side once per salt value, join on (key, salt). No shuffle of the
    big side at all — the standard fix when one join key holds a large
    fraction of the fact table."""
    big_s = with_salt(big, buckets)
    small_r = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = big_s.join(F.broadcast(small_r), on=[key, "_salt"], how=how)
    return out.drop("_salt")
