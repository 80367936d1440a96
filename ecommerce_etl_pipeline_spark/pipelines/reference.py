"""The reference's four analytics DAGs as single lazy Spark programs.

Each function mirrors one Airflow DAG's semantics end-to-end (SURVEY.md §3):
the reference's extract -> XCom -> transform -> XCom -> load task chain
becomes one DataFrame DAG whose scan/transform prefix is shared by every
output table — Catalyst deduplicates the common subtree, and what were
process boundaries (XCom JSON round-trips through the Airflow metadata DB)
are now in-memory stage boundaries.

Outputs are dicts of named DataFrames (the reference's warehouse.* tables);
callers persist with sources.io.write_table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.functions.binning import fixed_bins, quantile_bins
from ecommerce_etl_pipeline_spark.functions.exact_agg import dec, exact_avg, exact_sum, portable_round
from ecommerce_etl_pipeline_spark.functions.scalar import day_name, safe_div
from ecommerce_etl_pipeline_spark.sources.io import load_table


def sales_pipeline(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """sales_analytics DAG (reference sales_analytics_dag.py): temporal
    features + quartile banding, then four warehouse tables off one shared
    transform prefix."""
    orders = load_table(spark, sf_dir, "orders")
    enriched = quantile_bins(
        orders.select(
            "*",
            F.hour("o_orderdate").alias("order_hour"),
            day_name(F.col("o_orderdate")).alias("order_day"),
            F.month("o_orderdate").alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
        ),
        "o_totalprice",
        ["Small", "Medium", "Large", "Extra Large"],
        out="order_size",
    )
    daily = enriched.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.count("o_orderkey").alias("num_orders"),
        exact_sum("o_totalprice").alias("total_sales"),
    )
    by_priority = enriched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("num_orders"),
        exact_sum("o_totalprice").alias("total_sales"),
    )
    by_size = enriched.groupBy("order_size").agg(
        F.count(F.lit(1)).alias("num_orders"),
        exact_avg("o_totalprice").alias("avg_order_value"),
    )
    ltv = enriched.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count("o_orderkey").alias("order_count"),
        exact_sum("o_totalprice").alias("total_spent"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("lifetime_days"),
    )
    return {
        "fact_daily_sales": daily,
        "fact_priority_sales": by_priority,
        "fact_order_size": by_size,
        "fact_customer_ltv": ltv,
    }


def customer_pipeline(
    spark: SparkSession, sf_dir: str, as_of: str = "2024-06-30"
) -> dict[str, DataFrame]:
    """customer_analytics DAG (reference customer_analytics_dag.py):
    tenure + segmentation dims, geo stats, behavior join — the reference's
    Postgres-delegated join (its only real query pushdown) runs natively."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")

    first_order = orders.groupBy("o_custkey").agg(
        F.to_date(F.min("o_orderdate")).alias("first_order")
    )
    tenure = F.datediff(F.to_date(F.lit(as_of)), F.col("first_order"))
    dim_customer = (
        customer.join(first_order, customer.c_custkey == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
            tenure.alias("tenure_days"),
            # NULL tenure (customer with no orders) -> NULL segment: the
            # reference's pandas.cut maps NaN to NaN
            # (customer_analytics_dag.py:88-92); an unguarded when-chain
            # would fall through to the 'VIP' else-branch (ADVICE r12 #2)
            F.when(
                tenure.isNotNull(),
                fixed_bins(
                    tenure, [9125, 9490, 10220], ["New", "Regular", "Loyal", "VIP"]
                ),
            ).alias("segment"),
        )
    )
    location_stats = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left"
    ).groupBy(F.col("n_name").alias("nation_name")).agg(
        F.count("c_custkey").alias("customer_count"),
        exact_avg("c_acctbal").alias("avg_balance"),
    )
    behavior = (
        orders.join(  # reference pushed this join to Postgres; native here
            customer.select("c_custkey"), orders.o_custkey == F.col("c_custkey"), "inner"
        )
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            F.countDistinct(F.to_date("o_orderdate")).alias("active_days"),
            F.count("o_orderkey").alias("order_count"),
        )
        .withColumn(
            "orders_per_active_day",
            portable_round(safe_div(F.col("order_count") * 1.0, F.col("active_days")), 2),
        )
    )
    return {
        "dim_customer": dim_customer,
        "fact_location_stats": location_stats,
        "fact_customer_behavior": behavior,
    }


def product_pipeline(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """product_analytics DAG (reference product_analytics_dag.py): line-item
    rollup joined to the dim with zero-fill, category/price-band rollups,
    top products, market-basket pairs."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")

    rollup = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_quantity"),
        exact_sum("l_extendedprice").alias("total_value"),
    )
    product_sales = (
        part.join(rollup, part.p_partkey == rollup.l_partkey, "left")
        .na.fill({"total_quantity": 0, "total_value": 0.0})
        .select("p_partkey", "p_name", "p_brand", "p_type", "total_quantity", "total_value")
    )
    category_perf = product_sales.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("num_products"),
        F.sum("total_quantity").alias("total_quantity"),
        portable_round(F.sum(dec("total_value", 2)).cast("double"), 2).alias("total_value"),
    )
    price_bands = quantile_bins(
        part, "p_retailprice", ["Budget", "Medium", "Premium", "Luxury"], out="price_band"
    ).groupBy("price_band").agg(F.count(F.lit(1)).alias("num_products"))
    top_products = (
        product_sales.orderBy(F.desc("total_value"), F.asc("p_partkey")).limit(100)
    )
    a, b = li.select("l_orderkey", "l_partkey").alias("a"), li.select(
        "l_orderkey", "l_partkey"
    ).alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("product1"), F.col("b.l_partkey").alias("product2"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    return {
        "fact_product_sales": product_sales,
        "fact_category_performance": category_perf,
        "fact_price_bands": price_bands,
        "fact_top_products": top_products,
        "fact_product_pairs": pairs,
    }


def pricing_pipeline(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """web_scraping/pricing DAG (reference web_scraping_dag.py): external
    price quotes modeled as a second observation set (no Selenium — the
    scrape is an I/O adapter, SURVEY §2.1 S10); per-product stats + market
    positioning."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")

    observed = li.groupBy(F.col("l_partkey").alias("product_id")).agg(
        exact_avg("l_extendedprice").alias("avg_observed_price"),
        F.min("l_extendedprice").alias("min_observed_price"),
        F.max("l_extendedprice").alias("max_observed_price"),
        portable_round(F.stddev_samp("l_extendedprice"), 2).alias("std_observed_price"),
    )
    from ecommerce_etl_pipeline_spark.functions.scalar import market_position

    diff = F.col("p_retailprice") - F.col("avg_observed_price")
    positioned = (
        part.join(observed, part.p_partkey == observed.product_id, "left")
        .filter(F.col("avg_observed_price").isNotNull())
        .select(
            "p_partkey",
            "p_retailprice",
            "avg_observed_price",
            portable_round(diff, 2).alias("price_diff"),
            market_position(diff).alias("market_position"),
        )
    )
    return {"fact_competitor_stats": observed, "fact_market_position": positioned}
