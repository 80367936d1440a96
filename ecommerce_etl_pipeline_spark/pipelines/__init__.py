"""Composite pipelines mirroring the reference's four Airflow DAGs
(SURVEY.md §3, §7 step 8) — each a pure DataFrame->dict-of-DataFrames
function; orchestration, XCom serialization and staging round-trips are
replaced by one lazy Spark program per pipeline.
"""

from ecommerce_etl_pipeline_spark.pipelines.reference import (  # noqa: F401
    customer_pipeline,
    pricing_pipeline,
    product_pipeline,
    sales_pipeline,
)
