"""Parallelism guard for compute-heavy per-row stages.

A small dimension-sized table often arrives as ONE parquet split, so any
expensive per-row work (shingling, hashing, vector math, pandas UDFs) runs
on a single core while the rest of the cluster idles — measured 8s -> ~1s on
the MinHash pipeline at sf0.1 on local[32]. At 100 TB inputs already carry
thousands of splits and this is a no-op; the guard only widens genuinely
under-split inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


#: Logical operators whose presence means the data already passed (or will
#: pass) through an exchange — its parallelism is governed by
#: spark.sql.shuffle.partitions / AQE, not by input splits.
_WIDE_OPS = ("Aggregate", "Join", "Repartition", "Sort", "Distinct", "Window", "Deduplicate")


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: cluster default
    parallelism) if it currently has fewer partitions. Never shrinks.

    Only scan-shaped plans (no wide operator in the lineage) are probed and
    widened: post-shuffle outputs are already sized by
    ``spark.sql.shuffle.partitions``/AQE, and — the sharp edge — calling
    ``df.rdd`` on a plan that CONTAINS exchanges makes AQE materialize every
    query stage eagerly, launching real jobs at plan-construction time.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if not df.is_cached:
        plan = df._jdf.queryExecution().analyzed().toString()
        if any(op in plan for op in _WIDE_OPS):
            return df
    # Cached frames are probe-safe: the eager materialization fills the
    # cache its consumers read anyway, and AQE may have coalesced the cached
    # output far below cluster width (small post-agg results) — exactly the
    # case where re-widening before heavy per-row work pays.
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)


def repartition_for_collect(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-partition on the grouping keys BEFORE a collect_list/collect_set
    aggregation.

    List collection has no map-side reduction — partial aggregation carries
    every element through the exchange anyway — so shuffling raw rows first
    costs nothing extra, and it moves the expensive list build off the scan
    side: even when the input arrives as one split (small local file) or a
    few hot splits, the build runs at full parallelism. The follow-up
    groupBy on the same keys satisfies its clustering requirement from this
    partitioning, so Catalyst plans NO second exchange. Measured 2x on the
    basket-pair pipeline at sf0.1.
    """
    from pyspark.sql import functions as F

    return df.repartition(*[F.col(k) for k in keys])
