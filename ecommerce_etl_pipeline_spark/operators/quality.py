"""Data-quality expectations gate: declarative row-level rules + referential
integrity checks, evaluated as a handful of scans regardless of rule count.

The reference validates data imperatively, one concern at a time
(clean_product_v2.py:35-59 — int-range checks, null fills; data_sampling.py
semi-filters for referential integrity). Here the same concerns are an
engine surface: a rule list compiled into ONE conditional-count aggregate
per table — N rules add zero extra scans, each rule is a
``SUM(CASE WHEN violated THEN 1 END)`` inside the same partial aggregate —
plus one anti-join per foreign-key rule (the only rule kind that
fundamentally needs a second relation). At 100 TB the whole report costs one
pass over each fact table; the 1-row aggregate outputs are unpivoted and
unioned driver-free.

NULL policy: a row that cannot be evaluated (NULL in the checked column)
counts as a violation — expectations are assertions, and an unknown is a
failure, matching SQL CHECK-constraint semantics under ``NOT VALID``
inversion.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named row-level expectation; ``violated`` is True for failing rows."""

    name: str
    violated: Column


def check_rules(df: DataFrame, table_name: str, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules in ONE aggregate scan of ``df``.

    Returns (table_name, rule, n_rows, n_violations) — one row per rule.
    """
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.coalesce(r.violated, F.lit(True)).cast("bigint")).alias(f"_v{i}")
        for i, r in enumerate(rules)
    ]
    one = df.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(table_name).alias("table_name"),
                        F.lit(r.name).alias("rule"),
                        F.col("_n").cast("bigint").alias("n_rows"),
                        F.coalesce(F.col(f"_v{i}"), F.lit(0))
                        .cast("bigint")
                        .alias("n_violations"),
                    )
                    for i, r in enumerate(rules)
                ]
            )
        ).alias("r")
    ).select("r.*")


def check_foreign_key(
    child: DataFrame,
    child_table: str,
    fk: str,
    parent: DataFrame,
    pk: str,
    rule_name: str | None = None,
) -> DataFrame:
    """Referential-integrity rule: child rows whose ``fk`` has no matching
    parent ``pk`` (orphans). ONE scan of each side: a left join against the
    de-duplicated parent keys (so the child is never multiplied) feeds a
    single aggregate counting rows and misses together; Spark broadcasts
    the parent side when it is dimension-sized, so the child is never
    shuffled."""
    hits = parent.select(F.col(pk).alias(fk)).distinct().withColumn("_hit", F.lit(1))
    joined = child.select(F.col(fk)).join(hits, fk, "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_hit").isNull().cast("bigint")).alias("n_violations"),
    ).select(
        F.lit(child_table).alias("table_name"),
        F.lit(rule_name or f"fk_{fk}").alias("rule"),
        F.col("n_rows").cast("bigint"),
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("bigint").alias("n_violations"),
    )


def validation_report(parts: list[DataFrame]) -> DataFrame:
    """Union per-table rule results into one report with violation rates."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "violation_rate",
        (F.col("n_violations").cast("double") / F.col("n_rows")),
    )
