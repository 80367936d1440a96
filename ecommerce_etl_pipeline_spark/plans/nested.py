"""Nested / JSON / array queries — SURVEY.md §2.8 (N1-N6).

The reference's transactions carry a JSON array-of-struct column
(``product_metadata``) that every DAG re-parses row-by-row in Python. Here
the same shapes run as JVM-side higher-order functions (``aggregate``,
``transform``, ``explode``) — no Python in the loop, and exact-decimal
accumulators keep array-order irrelevant for the oracle compare.

The testdata has no raw JSON-array column, so array inputs are
reconstructed per order with ``collect_list``/``collect_set`` (itself the
N-side surface: build nested from relational) before the higher-order ops
run; the oracle expresses the same semantics relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.operators.parallelism import repartition_for_collect
from ecommerce_etl_pipeline_spark.plans.registry import register
from ecommerce_etl_pipeline_spark.sources.io import load_table


@register(
    "n1_json_scalar_extract",
    oracle="""
    SELECT event_type,
           COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_count,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
               AS k_sum,
           CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
               AS k_max
    FROM events
    GROUP BY 1
    """,
    doc="JSON scalar extraction + aggregate (N1/N6) — reference "
    "event_metadata parsing, 01-init.sql:72 / sales_analytics_dag.py:38. "
    "get_json_object evaluates JVM-side without a full from_json schema.",
)
def n1_json_scalar_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("k_count"),
        F.sum(k).cast("bigint").alias("k_sum"),
        F.max(k).cast("int").alias("k_max"),
    )


@register(
    "n2_hof_array_aggregate",
    oracle="""
    SELECT l_orderkey AS order_key,
           CAST(COUNT(*) AS INTEGER) AS num_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_items,
           FLOOR(CAST(SUM(CAST(l_quantity AS BIGINT)
                          * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5)
               / 100 AS total_product_value
    FROM lineitem
    GROUP BY 1
    """,
    doc="Per-row array aggregation via higher-order functions (N2) — "
    "reference sales_analytics_dag.py:53-64 row-apply UDF replaced by "
    "F.aggregate/F.size over an array-of-struct, zero Python. The array is "
    "built with collect_list; decimal accumulator makes element order "
    "irrelevant.",
)
def n2_hof_array_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    # Pre-partition: list collection has no map-side reduction, so this costs
    # no extra exchange and parallelizes the array build off a one-split scan.
    li = repartition_for_collect(li, "l_orderkey")
    nested = li.groupBy(F.col("l_orderkey").alias("order_key")).agg(
        F.collect_list(
            F.struct(
                F.col("l_quantity").cast("bigint").alias("q"),
                F.col("l_extendedprice").alias("p"),
            )
        ).alias("items")
    )
    return nested.select(
        "order_key",
        F.size("items").alias("num_items"),
        F.aggregate(
            "items", F.lit(0).cast("bigint"), lambda acc, x: acc + x["q"]
        ).alias("total_items"),
        (
            F.floor(
                F.aggregate(
                    "items",
                    F.lit(0).cast("decimal(28,2)"),
                    # re-cast after each add: Spark widens decimal addition,
                    # but the accumulator type must stay fixed
                    lambda acc, x: (
                        acc + x["q"].cast("decimal(10,0)") * x["p"].cast("decimal(18,2)")
                    ).cast("decimal(28,2)"),
                ).cast("double")
                * 100
                + 0.5
            )
            / 100
        ).alias("total_product_value"),
    )


@register(
    "n3_build_explode_roundtrip",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS num_line_items,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    doc="Nested build then explode back to line items (N3) — reference "
    "product_analytics_dag.py:53-65 iterrows explode replaced by native "
    "explode(). Round-trips collect_list -> explode to prove the nested "
    "path; the oracle states the equivalent relational answer.",
)
def n3_build_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fact-fact join, unhinted (see j1: scan-proportional estimates flip
    # the strategy to SMJ exactly when the data outgrows a broadcast)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(F.collect_list(F.struct(F.col("l_quantity").alias("q"))).alias("items"))
    )
    exploded = nested.select("order_year", F.explode("items").alias("it"))
    return exploded.groupBy("order_year").agg(
        F.count(F.lit(1)).alias("num_line_items"),
        F.sum(F.col("it.q").cast("bigint")).alias("total_quantity"),
    )


@register(
    "n4_pair_expansion_hof",
    oracle="""
    SELECT product1, product2, COUNT(*) AS pair_count
    FROM (
        SELECT DISTINCT a.l_orderkey, a.l_partkey AS product1, b.l_partkey AS product2
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    GROUP BY 1, 2
    """,
    doc="Unordered i<j pair expansion inside an array via nested transform + "
    "flatten (N4/J7) — reference product_analytics_dag.py:196-206 nested "
    "loops. collect_set dedups parts within an order (hence DISTINCT in the "
    "oracle); pair blow-up is bounded by max items/order, not table size.",
)
def n4_pair_expansion_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = repartition_for_collect(li, "l_orderkey").groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                """
                flatten(transform(parts, (x, i) ->
                    transform(slice(parts, i + 2, size(parts) - i - 1), y ->
                        struct(x AS product1, y AS product2))))
                """
            )
        ).alias("pair")
    )
    return pairs.groupBy(
        F.col("pair.product1").alias("product1"), F.col("pair.product2").alias("product2")
    ).agg(F.count(F.lit(1)).alias("pair_count"))


@register(
    "n5_to_json_render",
    oracle="""
    SELECT event_id,
           '{"event_id":' || CAST(event_id AS VARCHAR)
               || ',"event_type":"' || event_type || '"}' AS payload
    FROM events
    """,
    doc="JSON render of a struct (N5) — reference data_generator.py:42-50 "
    "json.dumps. Spark uses real to_json; the oracle states the identical "
    "byte string by construction.",
)
def n5_to_json_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("payload"),
    )


@register(
    "n6_variant_metadata",
    oracle="""
    SELECT event_type,
           COUNT(CASE WHEN event_type IN ('purchase', 'click')
                      THEN json_extract_string(props, '$.k') END) AS typed_extracts,
           COUNT(*) AS total_events
    FROM events
    GROUP BY 1
    """,
    doc="Per-event-type variant metadata extraction (N6) — reference "
    "data_generator.py:41-50: SEARCH carries search_keywords, ITEM_DETAIL "
    "carries product fields; extraction is conditional on event_name.",
)
def n6_variant_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    typed = F.when(
        F.col("event_type").isin("purchase", "click"), F.get_json_object("props", "$.k")
    )
    return ev.groupBy("event_type").agg(
        F.count(typed).alias("typed_extracts"),
        F.count(F.lit(1)).alias("total_events"),
    )
