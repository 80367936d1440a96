"""Projection / filter / scalar-function queries — SURVEY.md §2.2 (P1-P9),
§2.9 (SC1-SC16), §2.6 (O1-O3).

These are scan-dominated queries: the point at scale is that every predicate
lands in ``PushedFilters`` and the projection in ``ReadSchema`` of the
parquet scan (verified by tests/test_plans.py), so a 100 TB table is read as
row groups × needed columns, never whole rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.functions.binning import fixed_bins
from ecommerce_etl_pipeline_spark.functions.exact_agg import portable_round, sql_round
from ecommerce_etl_pipeline_spark.functions.scalar import age_years, day_name, tenure_days
from ecommerce_etl_pipeline_spark.plans.registry import register
from ecommerce_etl_pipeline_spark.sources.io import load_table

AS_OF = "2024-06-30"  # pinned determinism date (SURVEY §4 item 3)


@register(
    "p1_projection_filter",
    oracle="""
    SELECT l_orderkey, l_partkey, l_extendedprice,
           CASE WHEN LOWER(l_linestatus) = 'o' THEN TRUE ELSE FALSE END AS is_open
    FROM lineitem
    WHERE l_returnflag IS NOT NULL
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity BETWEEN 1 AND 2147483647
    """,
    doc="Column projection + not-null + range predicates + boolean flag "
    "derivation (P1, P2, P5, P8) — reference product_analytics_dag.py:142-145, "
    "sales_analytics_dag.py:119, clean_product_v2.py:38-50, "
    "customer_analytics_dag.py:95. All three predicates push into the scan.",
)
def p1_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_returnflag").isNotNull()
            & F.col("l_discount").between(0.02, 0.08)
            & F.col("l_quantity").between(1, 2147483647)
        ).select(
            "l_orderkey",
            "l_partkey",
            "l_extendedprice",
            (F.lower("l_linestatus") == "o").alias("is_open"),
        )
    )


@register(
    "p6_null_defaults",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), 0.05) AS discount_filled,
           COALESCE(NULLIF(l_returnflag, 'N'), 'Unknown') AS flag_filled
    FROM lineitem
    """,
    doc="Per-column default substitution (P6) — reference "
    "clean_product_v2.py:56-59 / product_analytics_dag.py:80-84 na.fill; "
    "nulls are synthesized via NULLIF since testdata is clean.",
)
def p6_null_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    with_nulls = li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif("l_discount", F.lit(0.0)).alias("discount_filled"),
        F.nullif("l_returnflag", F.lit("N")).alias("flag_filled"),
    )
    return with_nulls.na.fill({"discount_filled": 0.05, "flag_filled": "Unknown"})


@register(
    "p7_lossy_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           COALESCE(TRY_CAST(event_type AS INTEGER), -1) AS bad_cast_filled
    FROM events
    """,
    doc="Lossy numeric cast, invalid -> null -> default (P7) — reference "
    "clean_product_v2.py:32,53 to_numeric(errors='coerce'). try_cast keeps "
    "the lenient semantics even under the driver's ANSI-enabled session.",
)
def p7_lossy_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_value"),
        F.coalesce(F.col("event_type").try_cast("int"), F.lit(-1)).alias("bad_cast_filled"),
    )


@register(
    "sc_temporal_features",
    oracle="""
    SELECT event_id,
           CAST(hour(ts) AS INTEGER) AS event_hour,
           dayname(ts) AS event_day,
           CAST(month(ts) AS INTEGER) AS event_month,
           CAST(year(ts) AS INTEGER) AS event_year,
           strftime(ts, '%Y-%m-%d') AS event_date_str,
           LOWER(event_type) AS event_type_lc,
           LEAST(user_id, event_id) AS small_id,
           GREATEST(user_id, event_id) AS big_id
    FROM events
    """,
    doc="Temporal field extraction + formatting + lower + least/greatest "
    "(SC2, SC3, SC4, SC11, SC13) — reference sales_analytics_dag.py:72-75, "
    "customer_analytics_dag.py:37-39,95, product_analytics_dag.py:204-205. "
    "English day names pinned (SURVEY §7 risk 2).",
)
def sc_temporal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").cast("int").alias("event_hour"),
        day_name(F.col("ts")).alias("event_day"),
        F.month("ts").cast("int").alias("event_month"),
        F.year("ts").cast("int").alias("event_year"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date_str"),
        F.lower("event_type").alias("event_type_lc"),
        F.least("user_id", "event_id").alias("small_id"),
        F.greatest("user_id", "event_id").alias("big_id"),
    )


@register(
    "sc_age_tenure_segments",
    oracle=f"""
    SELECT o_custkey AS customer_id,
           CAST(year(DATE '{AS_OF}') - year(first_order)
                - CASE WHEN month(DATE '{AS_OF}') < month(first_order)
                        OR (month(DATE '{AS_OF}') = month(first_order)
                            AND day(DATE '{AS_OF}') < day(first_order))
                       THEN 1 ELSE 0 END AS INTEGER) AS account_age_years,
           CAST(date_diff('day', first_order, DATE '{AS_OF}') AS INTEGER) AS tenure_days,
           CASE WHEN date_diff('day', first_order, DATE '{AS_OF}') <= 9125 THEN 'New'
                WHEN date_diff('day', first_order, DATE '{AS_OF}') <= 9490 THEN 'Regular'
                WHEN date_diff('day', first_order, DATE '{AS_OF}') <= 10220 THEN 'Loyal'
                ELSE 'VIP' END AS segment
    FROM (SELECT o_custkey, CAST(MIN(o_orderdate) AS DATE) AS first_order
          FROM orders GROUP BY 1)
    """,
    doc="Birthday-aware age (SC5), tenure days (SC6), fixed-interval "
    "segmentation (W2) with a pinned as_of date (SC16) — reference "
    "customer_analytics_dag.py:76-92. Bin edges scaled to the testdata's "
    "1995-2001 order dates.",
)
def sc_age_tenure_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    as_of = F.to_date(F.lit(AS_OF))
    first = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.to_date(F.min("o_orderdate")).alias("first_order")
    )
    tenure = tenure_days(F.col("first_order"), as_of)
    return first.select(
        "customer_id",
        age_years(F.col("first_order"), as_of).alias("account_age_years"),
        tenure.cast("int").alias("tenure_days"),
        fixed_bins(tenure, [9125, 9490, 10220], ["New", "Regular", "Loyal", "VIP"]).alias(
            "segment"
        ),
    )


@register(
    "sc_currency_roundtrip",
    oracle="""
    SELECT p_partkey,
           'Rp' || CAST(CAST(FLOOR(p_retailprice) AS BIGINT) AS VARCHAR) AS price_str,
           CAST(regexp_replace('Rp' || CAST(CAST(FLOOR(p_retailprice) AS BIGINT) AS VARCHAR),
                               '[Rp.]', '', 'g') AS BIGINT) AS price_parsed,
           replace(p_brand || ' ' || p_type, ' ', '%20') AS search_query
    FROM part
    """,
    doc="Currency-string render + cleanup-parse (SC10) and concat + "
    "URL-encode (SC12) — reference web_scraping_dag.py:77-79,100. floor() "
    "before the int cast on BOTH sides: DuckDB rounds double->bigint casts "
    "while Spark truncates.",
)
def sc_currency_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    price_str = F.concat(
        F.lit("Rp"), F.floor("p_retailprice").cast("bigint").cast("string")
    )
    return part.select(
        "p_partkey",
        price_str.alias("price_str"),
        F.regexp_replace(price_str, r"[Rp.]", "").cast("bigint").alias("price_parsed"),
        F.regexp_replace(F.concat_ws(" ", "p_brand", "p_type"), " ", "%20").alias(
            "search_query"
        ),
    )


@register(
    "sc_market_position",
    oracle=f"""
    WITH brand_avg AS (
        SELECT p_brand,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(p_retailprice) AS avg_brand_price
        FROM part GROUP BY 1
    )
    SELECT p_partkey,
           {sql_round("p_retailprice - avg_brand_price", 2)} AS price_diff,
           CASE WHEN p_retailprice - avg_brand_price > 0 THEN 'Above Market'
                WHEN p_retailprice - avg_brand_price < 0 THEN 'Below Market'
                ELSE 'At Market' END AS market_position
    FROM part JOIN brand_avg USING (p_brand)
    """,
    doc="Price-vs-market diff + 3-way sign classification (SC8, SC9) — "
    "reference web_scraping_dag.py:168-186. The brand average joins back "
    "broadcast (tiny dim).",
)
def sc_market_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.exact_agg import dec
    from ecommerce_etl_pipeline_spark.functions.scalar import market_position

    part = load_table(spark, sf_dir, "part")
    brand_avg = part.groupBy("p_brand").agg(
        (F.sum(dec("p_retailprice", 2)).cast("double") / F.count("p_retailprice")).alias(
            "avg_brand_price"
        )
    )
    diff = F.col("p_retailprice") - F.col("avg_brand_price")
    return (
        part.join(F.broadcast(brand_avg), "p_brand")
        .select(
            "p_partkey",
            portable_round(diff, 2).alias("price_diff"),
            market_position(diff).alias("market_position"),
        )
    )


@register(
    "o1_global_topk",
    oracle="""
    SELECT l_partkey AS product_id,
           FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100
               AS total_value
    FROM lineitem
    GROUP BY 1
    ORDER BY total_value DESC, product_id
    LIMIT 100
    """,
    doc="Global top-k with projection (O1) — reference "
    "product_analytics_dag.py:142-145 nlargest(100). Spark plans "
    "TakeOrderedAndProject: per-partition heaps, no full sort.",
)
def o1_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.exact_agg import exact_sum

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("product_id"))
        .agg(exact_sum("l_extendedprice").alias("total_value"))
        .orderBy(F.desc("total_value"), F.asc("product_id"))
        .limit(100)
    )


@register(
    "o3_year_histogram",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, COUNT(*) AS cnt
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Histogram sorted by key (O3/A13 variant) — reference "
    "complete_analyzer.py:103 value_counts().sort_index().",
)
def o3_year_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("order_year")
    )
