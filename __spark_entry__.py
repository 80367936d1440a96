"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`ecommerce_etl_pipeline_spark.plans` — the named-query
registry where every operator from SURVEY.md §2 lives alongside its DuckDB
oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_etl_pipeline_spark.plans import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily sales A1) on sf0.001; driver checks rows>0."""
    return all_queries()["a1_daily_sales"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return all_oracles()
