"""Composite pipelines: every output table materializes with sane row
counts, and cross-table invariants hold."""

from __future__ import annotations

from ecommerce_etl_pipeline_spark.pipelines import (
    customer_pipeline,
    pricing_pipeline,
    product_pipeline,
    sales_pipeline,
)
from ecommerce_etl_pipeline_spark.sources.io import load_table

SF = "/root/testdata/sf0.001"


def test_sales_pipeline(spark):
    out = sales_pipeline(spark, SF)
    n_orders = load_table(spark, SF, "orders").count()
    assert out["fact_daily_sales"].count() > 0
    assert out["fact_order_size"].count() == 4  # quartile bands
    total = sum(r.num_orders for r in out["fact_priority_sales"].collect())
    assert total == n_orders


def test_customer_pipeline(spark):
    out = customer_pipeline(spark, SF)
    n_cust = load_table(spark, SF, "customer").count()
    assert out["dim_customer"].count() == n_cust
    segs = {r.segment for r in out["dim_customer"].select("segment").distinct().collect()}
    assert segs <= {"New", "Regular", "Loyal", "VIP", None}
    assert out["fact_location_stats"].count() > 0
    assert out["fact_customer_behavior"].count() > 0


def test_product_pipeline(spark):
    out = product_pipeline(spark, SF)
    n_part = load_table(spark, SF, "part").count()
    assert out["fact_product_sales"].count() == n_part
    assert out["fact_top_products"].count() == min(100, n_part)
    assert out["fact_product_pairs"].filter("product1 >= product2").count() == 0


def test_pricing_pipeline(spark):
    out = pricing_pipeline(spark, SF)
    pos = {r.market_position for r in out["fact_market_position"].collect()}
    assert pos <= {"Above Market", "Below Market", "At Market"}
    assert out["fact_competitor_stats"].count() > 0
