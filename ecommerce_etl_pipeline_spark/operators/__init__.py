"""Reusable operator helpers (SURVEY.md §2 operator layer)."""

from ecommerce_etl_pipeline_spark.operators.parallelism import ensure_parallelism  # noqa: F401
