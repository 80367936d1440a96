"""Aggregation queries — SURVEY.md §2.4 (A1-A16) over driver testdata.

Each query is a lazy one-pass ``groupBy().agg()`` program: Catalyst plans a
partial (map-side) hash aggregate before the shuffle and a final aggregate
after, so network traffic is proportional to |groups|, not |rows| — the
property that makes these queries hold up at 100 TB. Group keys are
low-cardinality (dates, flags, brands) except the per-customer/per-product
rollups, which shuffle on a uniformly-distributed key.

Money aggregates go through :mod:`..functions.exact_agg` (exact decimal,
order-independent sums; engine-portable rounding) so results are
bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.functions.binning import quantile_bins
from ecommerce_etl_pipeline_spark.functions.exact_agg import (
    dec,
    exact_avg,
    exact_sum,
    portable_round,
    sql_round,
)
from ecommerce_etl_pipeline_spark.functions.scalar import safe_div
from ecommerce_etl_pipeline_spark.plans.registry import register
from ecommerce_etl_pipeline_spark.sources.io import load_table

# Oracle-SQL fragments matching the exact_agg helpers.
_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE)"
_DAVG = "CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({x})"


def SUM2(x: str) -> str:
    return sql_round(_DSUM.format(x=x), 2)


def AVG2(x: str) -> str:
    return sql_round(_DAVG.format(x=x), 2)


@register(
    "a1_daily_sales",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           COUNT(o_orderkey) AS num_orders,
           {SUM2('o_totalprice')} AS total_sales
    FROM orders
    GROUP BY 1
    """,
    doc="Daily sales rollup (A1) — reference sales_analytics_dag.py:102-109.",
)
def a1_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.count("o_orderkey").alias("num_orders"),
        exact_sum("o_totalprice").alias("total_sales"),
    )


@register(
    "a2_priority_analysis",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS num_orders,
           {SUM2('o_totalprice')} AS total_sales,
           {AVG2('o_totalprice')} AS avg_order_value
    FROM orders
    GROUP BY 1
    """,
    doc="Single-key multi-aggregate (A2) — reference payment-method analysis, "
    "sales_analytics_dag.py:112-116.",
)
def a2_priority_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("num_orders"),
        exact_sum("o_totalprice").alias("total_sales"),
        exact_avg("o_totalprice").alias("avg_order_value"),
    )


_DISC_SUM = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(9,2)))"
    " AS DOUBLE)"
)


@register(
    "a3_discount_effectiveness",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS num_items,
           {sql_round(_DISC_SUM, 2)} AS total_discount,
           {SUM2('l_extendedprice')} AS total_value,
           {sql_round(f"{_DISC_SUM} * 100.0 / {_DSUM.format(x='l_extendedprice')}", 2)}
               AS discount_pct
    FROM lineitem
    WHERE l_discount > 0
    GROUP BY 1
    """,
    doc="Filter -> groupBy -> post-agg ratio (A3) — reference promo "
    "effectiveness, sales_analytics_dag.py:119-126. The filter pushes into "
    "the parquet scan (PushedFilters).",
)
def a3_discount_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = dec("l_extendedprice", 2) * F.col("l_discount").cast("decimal(9,2)")
    sum_disc = F.sum(disc).cast("double")
    sum_val = F.sum(dec("l_extendedprice", 2)).cast("double")
    return (
        li.filter(F.col("l_discount") > 0)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("num_items"),
            portable_round(sum_disc, 2).alias("total_discount"),
            portable_round(sum_val, 2).alias("total_value"),
            portable_round(sum_disc * 100.0 / sum_val, 2).alias("discount_pct"),
        )
    )


_LTV_AVG = _DAVG.format(x="o_totalprice")
_LIFETIME = (
    "date_diff('day', CAST(MIN(o_orderdate) AS DATE), CAST(MAX(o_orderdate) AS DATE))"
)


@register(
    "a4_customer_ltv",
    oracle=f"""
    SELECT o_custkey AS customer_id,
           COUNT(o_orderkey) AS order_count,
           {SUM2('o_totalprice')} AS total_spent,
           {sql_round(_LTV_AVG, 2)} AS avg_order_value,
           CAST({_LIFETIME} AS INTEGER) AS lifetime_days,
           {sql_round(
               f"COUNT(o_orderkey) * 365.0 * ({_LTV_AVG}) / "
               f"(CASE WHEN {_LIFETIME} = 0 THEN 1 ELSE {_LIFETIME} END)", 2)}
               AS projected_annual_value
    FROM orders
    GROUP BY 1
    """,
    doc="RFM-style LTV (A4) — reference sales_analytics_dag.py:169-197: "
    "count/sum/avg/min/max per customer, lifetime days with the replace(0,1) "
    "zero-guard (SC7), x365 projection (SC8).",
)
def a4_customer_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    avg_raw = F.sum(dec("o_totalprice", 2)).cast("double") / F.count("o_totalprice")
    agg = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count("o_orderkey").alias("order_count"),
        exact_sum("o_totalprice").alias("total_spent"),
        portable_round(avg_raw, 2).alias("avg_order_value"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).cast("int").alias("lifetime_days"),
        avg_raw.alias("_avg_raw"),
    )
    return agg.withColumn(
        "projected_annual_value",
        portable_round(
            safe_div(F.col("order_count") * 365.0 * F.col("_avg_raw"), F.col("lifetime_days")), 2
        ),
    ).drop("_avg_raw")


@register(
    "a5_nation_stats",
    oracle=f"""
    SELECT c_nationkey AS nation_key,
           COUNT(c_custkey) AS customer_count,
           {AVG2('c_acctbal')} AS avg_balance
    FROM customer
    GROUP BY 1
    """,
    doc="Location stats (A5) — reference customer_analytics_dag.py:98-102.",
)
def a5_nation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(F.col("c_nationkey").alias("nation_key")).agg(
        F.count("c_custkey").alias("customer_count"),
        exact_avg("c_acctbal").alias("avg_balance"),
    )


@register(
    "a6_user_behavior",
    oracle=f"""
    SELECT user_id,
           COUNT(DISTINCT event_type) AS distinct_event_types,
           COUNT(*) AS total_events,
           {sql_round("COUNT(*) * 1.0 / COUNT(DISTINCT event_type)", 2)} AS events_per_type
    FROM events
    GROUP BY 1
    """,
    doc="Behavior per user with exact distinct (A6) — reference "
    "customer_analytics_dag.py:191-202 nunique(session_id). At 100 TB swap "
    "countDistinct for approx_count_distinct (HLL sketch, no extra shuffle) "
    "unless exactness is required.",
)
def a6_user_behavior(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("distinct_event_types"),
        F.count(F.lit(1)).alias("total_events"),
        portable_round(F.count(F.lit(1)) * 1.0 / F.countDistinct("event_type"), 2).alias(
            "events_per_type"
        ),
    )


@register(
    "a7_returnflag_performance",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS num_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_quantity,
           {SUM2('l_extendedprice')} AS total_value
    FROM lineitem
    GROUP BY 1
    """,
    doc="Category performance (A7) — reference product_analytics_dag.py:111-119.",
)
def a7_returnflag_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("num_items"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_quantity"),
        exact_sum("l_extendedprice").alias("total_value"),
    )


_DISC_PRICE_SUM = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE)"
)


@register(
    "a8_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           {SUM2('l_extendedprice')} AS sum_base_price,
           {sql_round(_DISC_PRICE_SUM, 2)} AS sum_disc_price,
           {sql_round("CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(l_quantity)", 2)}
               AS avg_qty,
           {sql_round(
               "CAST(SUM(CAST(l_discount AS DECIMAL(9,2))) AS DOUBLE) / COUNT(l_discount)", 4)}
               AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY 1, 2
    """,
    doc="Two-key multi-aggregate with date predicate (A8; TPC-H Q1 shape) — "
    "reference seasonal performance product_analytics_dag.py:123-126 "
    "generalized.",
)
def a8_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_sum = F.sum(F.col("l_quantity").cast("bigint"))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qty_sum.alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            portable_round(
                F.sum(
                    dec("l_extendedprice", 2)
                    * (F.lit(1) - F.col("l_discount").cast("decimal(9,2)"))
                ).cast("double"),
                2,
            ).alias("sum_disc_price"),
            portable_round(qty_sum.cast("double") / F.count("l_quantity"), 2).alias("avg_qty"),
            portable_round(
                F.sum(F.col("l_discount").cast("decimal(9,2)")).cast("double")
                / F.count("l_discount"),
                4,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "a10_product_rollup",
    oracle=f"""
    SELECT l_partkey AS product_id,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_quantity,
           {SUM2('l_extendedprice')} AS total_value,
           {AVG2('l_extendedprice')} AS avg_item_price
    FROM lineitem
    GROUP BY 1
    """,
    doc="Per-product sales rollup over line items (A10) — reference "
    "product_analytics_dag.py:69-73 (post-explode).",
)
def a10_product_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_partkey").alias("product_id")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_quantity"),
        exact_sum("l_extendedprice").alias("total_value"),
        exact_avg("l_extendedprice").alias("avg_item_price"),
    )


@register(
    "a11_brand_price_stats",
    oracle=f"""
    SELECT p_brand,
           {AVG2('p_retailprice')} AS avg_price,
           MIN(p_retailprice) AS min_price,
           MAX(p_retailprice) AS max_price,
           {sql_round("STDDEV_SAMP(p_retailprice)", 2)} AS std_price
    FROM part
    GROUP BY 1
    """,
    doc="Price stats incl. sample stddev (A11) — reference "
    "web_scraping_dag.py:149-157; pandas std == stddev_samp (SURVEY §7 risk 3). "
    "min/max pass through unrounded: identical input sets give identical doubles.",
)
def a11_brand_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        exact_avg("p_retailprice").alias("avg_price"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        portable_round(F.stddev_samp("p_retailprice"), 2).alias("std_price"),
    )


@register(
    "a12_price_band_performance",
    oracle=f"""
    WITH edges AS (
        -- Edges half-up-rounded to 4dp on BOTH engines (the a24/a26
        -- boundary doctrine, applied here per the r11 ADVICE): raw
        -- interpolated quantiles are FP-order-sensitive across engines.
        SELECT FLOOR(CAST(quantile_cont(p_retailprice, 0.25) AS DOUBLE) * 10000 + 0.5) / 10000 AS q1,
               FLOOR(CAST(quantile_cont(p_retailprice, 0.50) AS DOUBLE) * 10000 + 0.5) / 10000 AS q2,
               FLOOR(CAST(quantile_cont(p_retailprice, 0.75) AS DOUBLE) * 10000 + 0.5) / 10000 AS q3
        FROM part
    )
    SELECT CASE WHEN p_retailprice <= q1 THEN 'Budget'
                WHEN p_retailprice <= q2 THEN 'Medium'
                WHEN p_retailprice <= q3 THEN 'Premium'
                ELSE 'Luxury' END AS price_band,
           COUNT(*) AS num_products,
           {SUM2('p_retailprice')} AS total_price
    FROM part, edges
    GROUP BY 1
    """,
    doc="qcut quartile banding then groupBy (A12+W1) — reference "
    "product_analytics_dag.py:129-139. Exact interpolated quantile edges, "
    "half-up-rounded to 4dp on both engines (round_edges / the a24-a26 "
    "boundary doctrine, r12 per the r11 ADVICE), + right-closed when-chain "
    "so DuckDB quantile_cont matches at bin edges (SURVEY §4 item 1).",
)
def a12_price_band_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    banded = quantile_bins(
        part, "p_retailprice", ["Budget", "Medium", "Premium", "Luxury"], out="price_band"
    )
    return banded.groupBy("price_band").agg(
        F.count(F.lit(1)).alias("num_products"),
        exact_sum("p_retailprice").alias("total_price"),
    )


@register(
    "a13_type_value_counts",
    oracle="""
    SELECT p_type, COUNT(*) AS cnt
    FROM part
    GROUP BY 1
    ORDER BY cnt DESC, p_type
    LIMIT 10
    """,
    doc="Top-10 value-counts profiling (A13/O2) — reference "
    "complete_analyzer.py:91-103; deterministic tiebreak on the key.",
)
def a13_type_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("p_type"))
        .limit(10)
    )


@register(
    "a14_table_profile",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS distinct_customers,
           COUNT(DISTINCT o_orderstatus) AS distinct_statuses,
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_priorities,
           {AVG2('o_totalprice')} AS avg_totalprice
    FROM orders
    """,
    doc="Column profiling: row/distinct/null counts (A14) — reference "
    "complete_analyzer.py:44-62.",
)
def a14_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.countDistinct("o_orderstatus").alias("distinct_statuses"),
        F.sum(F.col("o_orderpriority").isNull().cast("bigint")).alias("null_priorities"),
        exact_avg("o_totalprice").alias("avg_totalprice"),
    )


@register(
    "a15_event_time_range",
    oracle="""
    SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS earliest,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS latest
    FROM events
    """,
    doc="Global min/max of a timestamp column (A15) — reference "
    "complete_analyzer.py:126-129; rendered as text for oracle-stable compare.",
)
def a15_event_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return events.agg(
        F.date_format(F.min("ts"), fmt).alias("earliest"),
        F.date_format(F.max("ts"), fmt).alias("latest"),
    )


@register(
    "a16_rollup_hierarchy",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(CASE WHEN l_returnflag IS NOT NULL THEN l_linestatus END, 'ALL')
               AS linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP generalization of the reference's separate one- and two-key "
    "groupbys (A7+A8 — SURVEY §2.4 note). One shuffle computes all "
    "hierarchy levels.",
)
def a16_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce(
                F.when(F.col("l_returnflag").isNotNull(), F.col("l_linestatus")), F.lit("ALL")
            ).alias("linestatus"),
            "sum_qty",
            "cnt",
        )
    )
