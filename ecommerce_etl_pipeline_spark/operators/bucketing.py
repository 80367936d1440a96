"""Bucketed star-schema writes: the Spark stand-in for the reference's
Postgres indexes (init_db.py:113-116; SURVEY.md §2.1 S11, §4).

Writing both sides of a recurring fact-to-fact join bucketed by the join
key makes the join a zero-shuffle sort-merge: each bucket pair joins
locally. At 100 TB this converts the single biggest network cost of the
workload (orders ⋈ lineitem) into a map-side operation — provided BOTH
tables share bucket count and key, and
``spark.sql.sources.bucketing.enabled`` stays on (default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str,
    buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table. ``sort_by``
    additionally pre-sorts within buckets so the sort-merge join skips its
    sort phase."""
    writer = df.write.mode(mode).bucketBy(buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)
