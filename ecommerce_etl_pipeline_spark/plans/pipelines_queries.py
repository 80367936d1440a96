"""Driver-certifiable faces of the reference's composite pipeline DAGs.

pipelines/reference.py mirrors the reference's four Airflow DAGs as lazy
multi-output Spark programs (SURVEY.md §3); their outputs were pinned by
multi-statement DuckDB oracles in tests/test_pipelines.py only. This module
registers each DAG's ENTIRE warehouse output as ONE oracle-backed query on
a shared (warehouse_table, entity_key, metrics...) spine, so a
single-statement DuckDB oracle replays the whole DAG and the grading
driver certifies the composite end-to-end. Since round 12 ALL FOUR DAGs
are covered: pl_sales_warehouse (r11, brief #6), pl_customer_warehouse
(r12, brief #6), pl_product_warehouse and pl_pricing_warehouse (r12).

Every REGISTERED venue is the scale-shaped plan — GROUPING SETS fusions
or single-pass face explosion, never a union that rescans an input
(Catalyst does not dedup scans across union branches; the r11 verdict
flagged exactly that on the then-registered sales union, and r12 flipped
it per brief #2) — while the union-over-pipeline-code twins
(:func:`sales_warehouse_union` etc.) stay pinned row-for-row equal in
tests/test_pipelines.py, so the certs cover the actual §3 pipeline code
paths too.

Reference parity: sales_analytics_dag.py / customer_analytics_dag.py /
product_analytics_dag.py / web_scraping_dag.py (extract -> transform ->
load task chains).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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
        -- Edges half-up-rounded to 4dp on BOTH engines (round_edges /
        -- the a24-a26 boundary doctrine, applied r12 per the r11
        -- ADVICE): raw interpolated quantiles are FP-order-sensitive.
        SELECT FLOOR(CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE) * 10000 + 0.5) / 10000 AS q1,
               FLOOR(CAST(quantile_cont(o_totalprice, 0.50) AS DOUBLE) * 10000 + 0.5) / 10000 AS q2,
               FLOOR(CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE) * 10000 + 0.5) / 10000 AS q3
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
    "rollup, exact-quartile order-size bands, customer LTV) normalized "
    "onto one (warehouse_table, entity_key, metrics) spine. The "
    "REGISTERED venue is the single-scan GROUPING SETS fusion (r11 "
    "VERDICT brief #2): ONE column-pruned orders scan + one Expand(x4), "
    "map-side partial aggregation before the single shuffle — the 100 TB "
    "plan (the union form rescans the fact 4x; Catalyst does not dedup "
    "scans across union branches). The §3 pipeline code path "
    "(pipelines/reference.py::sales_pipeline) stays certified via "
    "sales_warehouse_union, pinned row-for-row equal in "
    "tests/test_pipelines.py. Plus one exact-quantile edge scalar "
    "(4dp-rounded on both engines). Reference "
    "sales_analytics_dag.py:102-197.",
)
def pl_sales_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sales_warehouse_fused(spark, sf_dir)


def sales_warehouse_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four-branch union face over the ACTUAL §3 pipeline code
    (pipelines/reference.py::sales_pipeline) — the registered venue until
    r12, retained as the parity twin pinned row-for-row equal to the
    registered fused plan in tests/test_pipelines.py. Each union branch
    keeps its own column-pruned orders scan, so at scale this shape wants
    the enriched extract materialized once (write_table, the reference's
    extract->XCom shape); the fused plan needs no materialization."""
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
    """The single-scan GROUPING SETS fusion — since r12 the REGISTERED
    venue of pl_sales_warehouse (r11 VERDICT brief #2), the 100 TB shape:
    ONE column-pruned orders scan, one Expand(x4), partial
    aggregation that collapses map-side before the single shuffle, then a
    narrow grouping-flag projection. All four warehouse tables derive
    from the same five measures (counts, exact-decimal sum, min/max
    order date), so no per-table rescan exists. Pinned row-for-row equal
    to the §3 pipeline-code union twin in tests/test_pipelines.py.

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


_CW_AS_OF = "2024-06-30"
_CW_STRUCT = (
    "struct<warehouse_table:string,entity_key:string,n1:bigint,"
    "n2:bigint,amount:double,label1:string,label2:string>"
)


@register(
    "pl_customer_warehouse",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(MIN(o_orderdate) AS DATE) AS first_order,
               COUNT(o_orderkey) AS order_count,
               COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS active_days
        FROM orders GROUP BY o_custkey
    ),
    base AS (
        SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment, c.c_nationkey,
               (DATE '{_CW_AS_OF}' - p.first_order) AS tenure_days,
               p.order_count, p.active_days
        FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
    )
    SELECT 'dim_customer' AS warehouse_table,
           CAST(c_custkey AS VARCHAR) AS entity_key,
           CAST(tenure_days AS BIGINT) AS n1,
           CAST(NULL AS BIGINT) AS n2,
           CAST(c_acctbal AS DOUBLE) AS amount,
           CASE WHEN tenure_days IS NULL THEN CAST(NULL AS VARCHAR)
                WHEN tenure_days <= 9125 THEN 'New'
                WHEN tenure_days <= 9490 THEN 'Regular'
                WHEN tenure_days <= 10220 THEN 'Loyal'
                ELSE 'VIP' END AS label1,
           c_mktsegment AS label2
    FROM base
    UNION ALL
    SELECT 'fact_customer_behavior', CAST(c_custkey AS VARCHAR),
           order_count, active_days,
           {sql_round('order_count * 1.0 / active_days', 2)},
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM base WHERE order_count IS NOT NULL
    UNION ALL
    SELECT 'fact_location_stats', n_name,
           COUNT(c_custkey), CAST(NULL AS BIGINT),
           {_AVG2('c_acctbal')},
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="The reference's customer_analytics DAG certified END-TO-END as "
    "one query (r11 VERDICT brief #6): all three warehouse tables "
    "(dim_customer with tenure + fixed-bin segmentation, per-nation "
    "location stats, per-customer behavior — the reference's only "
    "in-database query, customer_analytics_dag.py:177-188) on one "
    "(warehouse_table, entity_key, n1, n2, amount, label1, label2) "
    "spine. The REGISTERED venue is fused from the start (the sales-"
    "warehouse r11->r12 lesson applied proactively): ONE orders scan "
    "(per-customer min-date/count/distinct-days rollup), ONE customer "
    "scan, nation broadcast, then a 2-set GROUPING SETS (customer grain "
    "+ nation grain, one Expand(x2)) and a post-aggregation face "
    "explosion — no union branch ever rescans an input (the union-of-"
    "pipeline form scans customer 3x and orders 2x; Catalyst does not "
    "dedup scans across union branches). The actual SURVEY.md paragraph-3 "
    "pipeline code path (pipelines/reference.py::customer_pipeline) stays "
    "certified via customer_warehouse_union, pinned row-for-row equal in "
    "tests/test_pipelines.py. Segment edges are fixed integers (no "
    "quantile interpolation), money via exact decimal, ratios via the "
    "portable_round formula on both engines. NULL tenure (customers "
    "with no orders) yields NULL segment on both engines since r13 "
    "(ADVICE r12 #2 — pandas.cut maps NaN to NaN; the previous "
    "else-branch mislabeled them 'VIP').",
)
def pl_customer_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.binning import fixed_bins

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")

    per_cust = orders.groupBy("o_custkey").agg(
        F.to_date(F.min("o_orderdate")).alias("first_order"),
        F.count("o_orderkey").alias("order_count"),
        F.countDistinct(F.to_date("o_orderdate")).alias("active_days"),
    )
    tenure = F.datediff(F.to_date(F.lit(_CW_AS_OF)), F.col("first_order"))
    base = (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .select(
            "c_custkey",
            "c_acctbal",
            "c_mktsegment",
            "n_name",
            tenure.alias("tenure_days"),
            # NULL tenure (no orders, ~1/3 of TPC-H customers) -> NULL
            # segment, matching pandas.cut's NaN -> NaN (ADVICE r12 #2:
            # the unguarded else-branch mislabeled them 'VIP')
            F.when(
                tenure.isNotNull(),
                fixed_bins(
                    tenure, [9125, 9490, 10220], ["New", "Regular", "Loyal", "VIP"]
                ),
            ).alias("segment"),
            "order_count",
            "active_days",
            # duplicate used ONLY as an aggregate input: Expand nulls
            # grouping columns per set (the sales-fusion `_od` pattern)
            F.col("c_acctbal").alias("_bal"),
        )
    )
    g = base.groupingSets(
        [
            [
                "c_custkey",
                "c_acctbal",
                "c_mktsegment",
                "tenure_days",
                "segment",
                "order_count",
                "active_days",
            ],
            ["n_name"],
        ],
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        "tenure_days",
        "segment",
        "order_count",
        "active_days",
        "n_name",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("_bal", 2)).alias("bal_sum"),
        F.count("_bal").alias("bal_n"),
        F.grouping("c_custkey").alias("g_cust"),
    )

    def spine(table, key, n1, n2, amount, label1, label2):
        return F.struct(
            F.lit(table).alias("warehouse_table"),
            key.cast("string").alias("entity_key"),
            n1.cast("bigint").alias("n1"),
            n2.cast("bigint").alias("n2"),
            amount.cast("double").alias("amount"),
            label1.cast("string").alias("label1"),
            label2.cast("string").alias("label2"),
        )

    null_b = F.lit(None).cast("bigint")
    null_s = F.lit(None).cast("string")
    dim_face = spine(
        "dim_customer",
        F.col("c_custkey"),
        F.col("tenure_days"),
        null_b,
        F.col("c_acctbal"),
        F.col("segment"),
        F.col("c_mktsegment"),
    )
    beh_face = spine(
        "fact_customer_behavior",
        F.col("c_custkey"),
        F.col("order_count"),
        F.col("active_days"),
        portable_round(F.col("order_count") * 1.0 / F.col("active_days"), 2),
        null_s,
        null_s,
    )
    loc_face = spine(
        "fact_location_stats",
        F.col("n_name"),
        F.col("cnt"),
        null_b,
        portable_round(F.col("bal_sum").cast("double") / F.col("bal_n"), 2),
        null_s,
        null_s,
    )
    faces = (
        F.when(
            F.col("g_cust") == 0,
            F.array(dim_face, F.when(F.col("order_count").isNotNull(), beh_face)),
        )
        .otherwise(F.array(loc_face))
        # when/otherwise over struct arrays can drop field names (r11
        # gotcha) — the cast restores them before getField
        .cast(f"array<{_CW_STRUCT}>")
    )
    face = F.explode(faces).alias("face")
    return (
        g.select(face)
        .filter(F.col("face").isNotNull())
        .select("face.*")
    )


def customer_warehouse_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-branch union face over the ACTUAL SURVEY.md paragraph-3
    pipeline code (pipelines/reference.py::customer_pipeline) — the parity
    twin pinned row-for-row equal to the registered fused plan in
    tests/test_pipelines.py, so the driver cert covers the pipeline code
    path. Each branch keeps its own scans (customer 3x, orders 2x), so at
    scale this shape wants the per-customer extract materialized once."""
    from ecommerce_etl_pipeline_spark.pipelines.reference import customer_pipeline

    tables = customer_pipeline(spark, sf_dir, as_of=_CW_AS_OF)
    null_b = F.lit(None).cast("bigint")
    null_s = F.lit(None).cast("string")

    def face(df, table, key, n1, n2, amount, label1, label2):
        return df.select(
            F.lit(table).alias("warehouse_table"),
            key.cast("string").alias("entity_key"),
            n1.cast("bigint").alias("n1"),
            n2.cast("bigint").alias("n2"),
            amount.cast("double").alias("amount"),
            label1.cast("string").alias("label1"),
            label2.cast("string").alias("label2"),
        )

    dim = face(
        tables["dim_customer"], "dim_customer",
        F.col("c_custkey"), F.col("tenure_days"), null_b,
        F.col("c_acctbal"), F.col("segment"), F.col("c_mktsegment"),
    )
    beh = face(
        tables["fact_customer_behavior"], "fact_customer_behavior",
        F.col("customer_id"), F.col("order_count"), F.col("active_days"),
        F.col("orders_per_active_day"), null_s, null_s,
    )
    loc = face(
        tables["fact_location_stats"], "fact_location_stats",
        F.col("nation_name"), F.col("customer_count"), null_b,
        F.col("avg_balance"), null_s, null_s,
    )
    return dim.unionByName(beh).unionByName(loc)


_PW_STRUCT = (
    "struct<warehouse_table:string,entity_key:string,n1:bigint,"
    "n2:bigint,amount:double,label1:string,label2:string>"
)

# ---------------------------------------------------------------------------
# pl_product_warehouse — shared SQL fragments. The composite oracle is
# the UNION ALL of exactly these five face fragments over the same base
# CTEs, and each fragment is ALSO registered standalone as a
# pl_pw_face_* diagnostic (r12 VERDICT brief "Next round" #2b: the
# composite's only driver cert attempt failed on hash, unreproducible
# locally — a repeat failure must name the face). Version-stability pins
# (brief #2d): quantile_cont input CAST to DOUBLE (a DECIMAL-typed input
# engages a different interpolation path in newer DuckDB builds), the
# comma join rewritten as explicit CROSS JOIN, and the top-100 selected
# via ROW_NUMBER instead of ORDER-BY-LIMIT-in-subquery.
# ---------------------------------------------------------------------------
_PW_BASE_CTES = f"""
    rollup AS (
        SELECT l_partkey,
               -- Outer CAST is load-bearing (r13 driver red, judge-verified):
               -- DuckDB SUM(BIGINT) returns HUGEINT, which the bit-exact
               -- compare layer surfaces as float64 (910.0 vs Spark's bigint
               -- 910); UNION ALL then unifies the whole composite n1 column.
               -- registry.py doctrine: always CAST(SUM(...) AS BIGINT).
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS tq,
               {_SUM2('l_extendedprice')} AS tv
        FROM lineitem GROUP BY 1
    ),
    edges AS (
        -- 4dp half-up-rounded on BOTH engines (quantile_bins round_dp=4)
        SELECT FLOOR(CAST(quantile_cont(CAST(p_retailprice AS DOUBLE), 0.25) AS DOUBLE) * 10000 + 0.5) / 10000 AS q1,
               FLOOR(CAST(quantile_cont(CAST(p_retailprice AS DOUBLE), 0.50) AS DOUBLE) * 10000 + 0.5) / 10000 AS q2,
               FLOOR(CAST(quantile_cont(CAST(p_retailprice AS DOUBLE), 0.75) AS DOUBLE) * 10000 + 0.5) / 10000 AS q3
        FROM part
    ),
    banded AS (
        SELECT p_partkey, p_brand, p_type,
               CASE WHEN p_retailprice <= q1 THEN 'Budget'
                    WHEN p_retailprice <= q2 THEN 'Medium'
                    WHEN p_retailprice <= q3 THEN 'Premium'
                    ELSE 'Luxury' END AS price_band,
               COALESCE(tq, 0) AS total_quantity,
               COALESCE(tv, 0.0) AS total_value
        FROM part LEFT JOIN rollup ON p_partkey = l_partkey
        CROSS JOIN edges
    )
"""

_PW_FACE_SALES = """
    SELECT 'fact_product_sales' AS warehouse_table,
           CAST(p_partkey AS VARCHAR) AS entity_key,
           total_quantity AS n1, CAST(NULL AS BIGINT) AS n2,
           total_value AS amount, p_brand AS label1, p_type AS label2
    FROM banded
"""

_PW_FACE_CATEGORY = f"""
    SELECT 'fact_category_performance' AS warehouse_table,
           p_brand AS entity_key, COUNT(*) AS n1,
           -- CAST required: re-aggregating the BIGINT total_quantity would
           -- yield HUGEINT again even with tq cast in _PW_BASE_CTES.
           CAST(SUM(total_quantity) AS BIGINT) AS n2, {_SUM2('total_value')} AS amount,
           CAST(NULL AS VARCHAR) AS label1, CAST(NULL AS VARCHAR) AS label2
    FROM banded GROUP BY 2
"""

_PW_FACE_BANDS = """
    SELECT 'fact_price_bands' AS warehouse_table,
           price_band AS entity_key, COUNT(*) AS n1, CAST(NULL AS BIGINT) AS n2,
           CAST(NULL AS DOUBLE) AS amount,
           CAST(NULL AS VARCHAR) AS label1, CAST(NULL AS VARCHAR) AS label2
    FROM banded GROUP BY 2
"""

_PW_FACE_TOP = """
    SELECT 'fact_top_products' AS warehouse_table,
           CAST(p_partkey AS VARCHAR) AS entity_key, total_quantity AS n1,
           CAST(NULL AS BIGINT) AS n2, total_value AS amount,
           p_brand AS label1, p_type AS label2
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY total_value DESC, p_partkey) AS rn
          FROM banded) ranked
    WHERE rn <= 100
"""

_PW_FACE_PAIRS = """
    SELECT 'fact_product_pairs' AS warehouse_table,
           CAST(product1 AS VARCHAR) || '-' || CAST(product2 AS VARCHAR) AS entity_key,
           pair_count AS n1, CAST(NULL AS BIGINT) AS n2, CAST(NULL AS DOUBLE) AS amount,
           CAST(NULL AS VARCHAR) AS label1, CAST(NULL AS VARCHAR) AS label2
    FROM (
        SELECT a.l_partkey AS product1, b.l_partkey AS product2,
               COUNT(*) AS pair_count
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
"""


def _product_base(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The product DAG's shared per-part base: banded part LEFT JOIN one
    lineitem rollup, quartile edges computed ONCE (one eager edge job —
    ADVICE r12 #4 fixed the double quantile_bins invocation) and 4dp
    half-up-rounded before the ``<=`` comparisons (boundary doctrine).
    Returns (base, lineitem) so the pairs face reuses the same scan
    definition. Mirrors the composite oracle's ``banded`` CTE exactly."""
    from ecommerce_etl_pipeline_spark.functions.binning import (
        bucket_by_edges,
        quantile_edges,
        round_edges,
    )
    from ecommerce_etl_pipeline_spark.functions.exact_agg import exact_sum

    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rollup = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("tq"),
        exact_sum("l_extendedprice").alias("tv"),
    )
    edges = round_edges(
        quantile_edges(part, "p_retailprice", [0.25, 0.50, 0.75])
    )
    banded = part.withColumn(
        "price_band",
        bucket_by_edges(
            F.col("p_retailprice"),
            edges,
            ["Budget", "Medium", "Premium", "Luxury"],
        ),
    )
    base = banded.join(rollup, banded.p_partkey == rollup.l_partkey, "left").select(
        "p_partkey",
        "p_brand",
        "p_type",
        "price_band",
        F.coalesce(F.col("tq"), F.lit(0).cast("bigint")).alias("total_quantity"),
        F.coalesce(F.col("tv"), F.lit(0.0)).alias("total_value"),
    )
    return base, li


def _product_pairs(li: DataFrame) -> DataFrame:
    """Market-basket pairs on the warehouse spine: the J7 HOF expansion
    over ONE lineitem scan — no self-join. Value-strict i<j expansion
    over the raw MULTISET (duplicate parts within an order multiply the
    pair count, the pipeline's self-join semantics — contrast n4's
    collect_set/DISTINCT face; property-tested vs itertools in
    tests/test_properties.py)."""
    from ecommerce_etl_pipeline_spark.operators.parallelism import (
        repartition_for_collect,
    )

    baskets = (
        repartition_for_collect(li.select("l_orderkey", "l_partkey"), "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.collect_list("l_partkey").alias("parts"))
    )
    return (
        baskets.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(parts, x ->
                        transform(filter(parts, y -> x < y), y ->
                            struct(x AS product1, y AS product2))))
                    """
                )
            ).alias("pair")
        )
        .groupBy(
            F.col("pair.product1").alias("product1"),
            F.col("pair.product2").alias("product2"),
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .select(
            F.lit("fact_product_pairs").alias("warehouse_table"),
            F.concat_ws(
                "-",
                F.col("product1").cast("string"),
                F.col("product2").cast("string"),
            ).alias("entity_key"),
            F.col("pair_count").cast("bigint").alias("n1"),
            F.lit(None).cast("bigint").alias("n2"),
            F.lit(None).cast("double").alias("amount"),
            F.lit(None).cast("string").alias("label1"),
            F.lit(None).cast("string").alias("label2"),
        )
    )


@register(
    "pl_product_warehouse",
    oracle=f"""
    WITH {_PW_BASE_CTES}
    {_PW_FACE_SALES}
    UNION ALL
    {_PW_FACE_CATEGORY}
    UNION ALL
    {_PW_FACE_BANDS}
    UNION ALL
    {_PW_FACE_TOP}
    UNION ALL
    {_PW_FACE_PAIRS}
    """,
    doc="The reference's product_analytics DAG certified END-TO-END as one "
    "query: all five warehouse tables (per-part sales rollup with "
    "zero-fill, per-brand category performance, exact-quartile price "
    "bands, deterministic top-100 products, market-basket pairs) on one "
    "(warehouse_table, entity_key, n1, n2, amount, label1, label2) "
    "spine. Scale shape of the REGISTERED venue (single-derivation since "
    "r13, VERDICT r12 brief #3): the per-part base (banded part LEFT "
    "JOIN one lineitem rollup, ONE eager 4dp-rounded quantile-edge job) "
    "is computed ONCE and MATERIALIZED (persist locally; at 100 TB the "
    "reference's extract->XCom parquet handoff — the base is part-grain, "
    "dimension-sized); the GROUPING SETS fan (part grain / brand / band, "
    "one Expand(x3)) and the top-100 TakeOrderedAndProject both read the "
    "materialized base, so ONE part scan + ONE lineitem rollup feed both "
    "faces; the pairs face is the J7 HOF expansion over "
    "ONE lineitem scan — NO self-join (the union-of-pipeline twin pays "
    "5 part + 5 lineitem scans including a lineitem self-join). "
    "Ordering doctrine: top-100 orders by the 2dp-rounded exact-decimal "
    "total_value with p_partkey tiebreak, so both engines pick the "
    "identical set. Category aggregates the ROUNDED per-part doubles "
    "via exact decimal — the pipeline's two-level rounding, replicated. "
    "Oracle pinned to version-stable forms (r13): quantile_cont over an "
    "explicit DOUBLE cast, CROSS JOIN instead of comma join, top-100 "
    "via ROW_NUMBER. Per-face diagnostic twins: pl_pw_face_*. Reference "
    "product_analytics_dag.py:96-206.",
)
def pl_product_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, li = _product_base(spark, sf_dir)
    # Materialize the base ONCE (the reference's extract->XCom handoff;
    # at 100 TB this is a write_table parquet handoff, locally a spill-
    # safe persist). Measured alternative rejected: deriving the top-100
    # from the fan's exploded output does NOT reuse the grouping-sets
    # exchange (the nested-ReusedExchange limitation — the fan branch
    # holds the original broadcast exchange, the top branch its Reused
    # twin, so the agg exchanges no longer canonicalize equal) and pays
    # a second part scan PLUS a duplicated Expand+shuffle. The cache is
    # part-grain (dimension-sized, bounded by |part|), released by
    # consumers via the retained_caches contract.
    base = base.persist()

    fan_in = base.withColumns(
        {
            # duplicates used ONLY as aggregate inputs (Expand nulls
            # grouping columns per set — the warehouse-fusion pattern)
            "_tq": F.col("total_quantity"),
            "_tv": F.col("total_value"),
        }
    )
    g = fan_in.groupingSets(
        [
            ["p_partkey", "p_brand", "p_type", "total_quantity", "total_value"],
            ["p_brand"],
            ["price_band"],
        ],
        "p_partkey",
        "p_brand",
        "p_type",
        "total_quantity",
        "total_value",
        "price_band",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("_tq").alias("sum_tq"),
        portable_round(F.sum(dec("_tv", 2)).cast("double"), 2).alias("sum_tv"),
        F.grouping("p_partkey").alias("g_part"),
        F.grouping("price_band").alias("g_band"),
    )

    def spine(table, key, n1, n2, amount, label1, label2):
        return F.struct(
            table.cast("string").alias("warehouse_table"),
            key.cast("string").alias("entity_key"),
            n1.cast("bigint").alias("n1"),
            n2.cast("bigint").alias("n2"),
            amount.cast("double").alias("amount"),
            label1.cast("string").alias("label1"),
            label2.cast("string").alias("label2"),
        )

    null_b = F.lit(None).cast("bigint")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    sales_face = spine(
        F.lit("fact_product_sales"), F.col("p_partkey"),
        F.col("total_quantity"), null_b, F.col("total_value"),
        F.col("p_brand"), F.col("p_type"),
    )
    cat_face = spine(
        F.lit("fact_category_performance"), F.col("p_brand"),
        F.col("cnt"), F.col("sum_tq"), F.col("sum_tv"), null_s, null_s,
    )
    band_face = spine(
        F.lit("fact_price_bands"), F.col("price_band"),
        F.col("cnt"), null_b, null_d, null_s, null_s,
    )
    faces = (
        F.when(F.col("g_part") == 0, F.array(sales_face))
        .when(F.col("g_band") == 0, F.array(band_face))
        .otherwise(F.array(cat_face))
        .cast(f"array<{_PW_STRUCT}>")
    )
    fanned = (
        g.select(F.explode(faces).alias("face"))
        .filter(F.col("face").isNotNull())
        .select("face.*")
    )

    # Top-100 = TakeOrderedAndProject over the SAME materialized base
    # (r12 VERDICT brief #3 / ADVICE #4): no second part scan, no second
    # lineitem rollup, no second eager edge job — both faces feed off
    # one base derivation.
    top = (
        base.orderBy(F.desc("total_value"), F.asc("p_partkey"))
        .limit(100)
        .select(
            F.lit("fact_top_products").alias("warehouse_table"),
            F.col("p_partkey").cast("string").alias("entity_key"),
            F.col("total_quantity").cast("bigint").alias("n1"),
            F.lit(None).cast("bigint").alias("n2"),
            F.col("total_value").cast("double").alias("amount"),
            F.col("p_brand").cast("string").alias("label1"),
            F.col("p_type").cast("string").alias("label2"),
        )
    )
    out = fanned.unionByName(top).unionByName(_product_pairs(li))
    # release handle for sequential consumers (bench/cost_report); the
    # concurrent sweep retains deliberately (check_correctness docstring)
    out.retained_caches = [base]
    return out


def product_warehouse_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five-branch union face over the ACTUAL SURVEY.md paragraph-3
    pipeline code (pipelines/reference.py::product_pipeline) — the parity
    twin pinned row-for-row equal to the registered fused plan in
    tests/test_pipelines.py (5 part + 5 lineitem scans incl. the
    self-join; at scale this shape wants fact_product_sales materialized
    once)."""
    from ecommerce_etl_pipeline_spark.pipelines.reference import product_pipeline

    tables = product_pipeline(spark, sf_dir)
    null_b = F.lit(None).cast("bigint")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    def face(df, table, key, n1, n2, amount, label1, label2):
        return df.select(
            F.lit(table).alias("warehouse_table"),
            key.cast("string").alias("entity_key"),
            n1.cast("bigint").alias("n1"),
            n2.cast("bigint").alias("n2"),
            amount.cast("double").alias("amount"),
            label1.cast("string").alias("label1"),
            label2.cast("string").alias("label2"),
        )

    sales = face(
        tables["fact_product_sales"], "fact_product_sales",
        F.col("p_partkey"), F.col("total_quantity"), null_b,
        F.col("total_value"), F.col("p_brand"), F.col("p_type"),
    )
    cat = face(
        tables["fact_category_performance"], "fact_category_performance",
        F.col("p_brand"), F.col("num_products"), F.col("total_quantity"),
        F.col("total_value"), null_s, null_s,
    )
    bands = face(
        tables["fact_price_bands"], "fact_price_bands",
        F.col("price_band"), F.col("num_products"), null_b, null_d,
        null_s, null_s,
    )
    top = face(
        tables["fact_top_products"], "fact_top_products",
        F.col("p_partkey"), F.col("total_quantity"), null_b,
        F.col("total_value"), F.col("p_brand"), F.col("p_type"),
    )
    pairs = face(
        tables["fact_product_pairs"], "fact_product_pairs",
        F.concat_ws(
            "-",
            F.col("product1").cast("string"),
            F.col("product2").cast("string"),
        ),
        F.col("pair_count"), null_b, null_d, null_s, null_s,
    )
    return (
        sales.unionByName(cat)
        .unionByName(bands)
        .unionByName(top)
        .unionByName(pairs)
    )


# ---------------------------------------------------------------------------
# Per-face diagnostic slices of pl_product_warehouse (r12 VERDICT brief
# #2b). Each registers ONE face of the composite, its oracle the SAME
# SQL fragment the composite's UNION ALL uses — so if the composite's
# driver hash ever goes red again (r12: hash_match=false, rows/schema
# green, unreproducible locally in 5 driver-faithful bit-exact repros),
# the driver itself localizes the divergence to a face. Spark sides
# share _product_base/_product_pairs with the composite.
# ---------------------------------------------------------------------------

_PW_DIAG_DOC = (
    " Diagnostic slice of pl_product_warehouse (r12 brief #2b): same "
    "face SQL as the composite's UNION branch, same spine column names, "
    "shared _product_base — a driver red on the composite plus greens "
    "here names the diverging face."
)


def _pw_spine_select(df: DataFrame, table: str, key, n1, n2, amount, label1, label2) -> DataFrame:
    return df.select(
        F.lit(table).alias("warehouse_table"),
        key.cast("string").alias("entity_key"),
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        amount.cast("double").alias("amount"),
        label1.cast("string").alias("label1"),
        label2.cast("string").alias("label2"),
    )


# lazy: F.lit at module level would require an active SparkContext at
# import time (the registry imports with no session)
def _NULL_B() -> Column:
    return F.lit(None).cast("bigint")


def _NULL_D() -> Column:
    return F.lit(None).cast("double")


def _NULL_S() -> Column:
    return F.lit(None).cast("string")


@register(
    "pl_pw_face_sales",
    oracle=f"WITH {_PW_BASE_CTES} {_PW_FACE_SALES}",
    doc="fact_product_sales face: the per-part banded base (zero-filled "
    "lineitem rollup LEFT-joined to quartile-banded part) at part grain "
    "— one part scan, one lineitem rollup, one 4dp-rounded edge job."
    + _PW_DIAG_DOC,
)
def pl_pw_face_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, _ = _product_base(spark, sf_dir)
    return _pw_spine_select(
        base, "fact_product_sales", F.col("p_partkey"),
        F.col("total_quantity"), _NULL_B(), F.col("total_value"),
        F.col("p_brand"), F.col("p_type"),
    )


@register(
    "pl_pw_face_category",
    oracle=f"WITH {_PW_BASE_CTES} {_PW_FACE_CATEGORY}",
    doc="fact_category_performance face: per-brand counts and exact-"
    "decimal sums of the ROUNDED per-part doubles (the pipeline's "
    "two-level rounding)." + _PW_DIAG_DOC,
)
def pl_pw_face_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, _ = _product_base(spark, sf_dir)
    agg = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("total_quantity").alias("sum_tq"),
        portable_round(
            F.sum(dec("total_value", 2)).cast("double"), 2
        ).alias("sum_tv"),
    )
    return _pw_spine_select(
        agg, "fact_category_performance", F.col("p_brand"),
        F.col("cnt"), F.col("sum_tq"), F.col("sum_tv"), _NULL_S(), _NULL_S(),
    )


@register(
    "pl_pw_face_bands",
    oracle=f"WITH {_PW_BASE_CTES} {_PW_FACE_BANDS}",
    doc="fact_price_bands face: part counts per exact-quartile price "
    "band (4dp half-up-rounded edges on both engines — the boundary "
    "doctrine)." + _PW_DIAG_DOC,
)
def pl_pw_face_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, _ = _product_base(spark, sf_dir)
    agg = base.groupBy("price_band").agg(F.count(F.lit(1)).alias("cnt"))
    return _pw_spine_select(
        agg, "fact_price_bands", F.col("price_band"),
        F.col("cnt"), _NULL_B(), _NULL_D(), _NULL_S(), _NULL_S(),
    )


@register(
    "pl_pw_face_top",
    oracle=f"WITH {_PW_BASE_CTES} {_PW_FACE_TOP}",
    doc="fact_top_products face: deterministic top-100 by 2dp-rounded "
    "exact-decimal total_value with integer p_partkey tiebreak "
    "(TakeOrderedAndProject; oracle via ROW_NUMBER — version-stable "
    "form)." + _PW_DIAG_DOC,
)
def pl_pw_face_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, _ = _product_base(spark, sf_dir)
    top = base.orderBy(F.desc("total_value"), F.asc("p_partkey")).limit(100)
    return _pw_spine_select(
        top, "fact_top_products", F.col("p_partkey"),
        F.col("total_quantity"), _NULL_B(), F.col("total_value"),
        F.col("p_brand"), F.col("p_type"),
    )


@register(
    "pl_pw_face_pairs",
    oracle=_PW_FACE_PAIRS,
    doc="fact_product_pairs face: market-basket pair counts — the J7 "
    "HOF multiset expansion over ONE lineitem scan (no self-join; the "
    "oracle replays the reference's self-join form, value-equal by the "
    "property-tested multiset semantics)." + _PW_DIAG_DOC,
)
def pl_pw_face_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _product_pairs(load_table(spark, sf_dir, "lineitem"))


@register(
    "pl_pricing_warehouse",
    oracle=f"""
    WITH observed AS (
        SELECT l_partkey AS product_id,
               {_AVG2('l_extendedprice')} AS avg_p,
               MIN(l_extendedprice) AS min_p,
               MAX(l_extendedprice) AS max_p,
               {sql_round('STDDEV_SAMP(l_extendedprice)', 2)} AS std_p
        FROM lineitem GROUP BY 1
    )
    SELECT 'fact_competitor_stats' AS warehouse_table,
           CAST(product_id AS VARCHAR) AS entity_key,
           avg_p AS v1, min_p AS v2, max_p AS v3, std_p AS v4,
           CAST(NULL AS VARCHAR) AS label
    FROM observed
    UNION ALL
    SELECT 'fact_market_position', CAST(p_partkey AS VARCHAR),
           avg_p, p_retailprice,
           FLOOR((p_retailprice - avg_p) * 100 + 0.5) / 100,
           CAST(NULL AS DOUBLE),
           CASE WHEN p_retailprice - avg_p > 0 THEN 'Above Market'
                WHEN p_retailprice - avg_p < 0 THEN 'Below Market'
                ELSE 'At Market' END
    FROM part JOIN observed ON p_partkey = product_id
    """,
    doc="The reference's pricing/web-scraping DAG certified END-TO-END as "
    "one query: both warehouse tables (per-product observed-price stats "
    "incl. sample stddev — the a11 raw-STDDEV_SAMP-plus-2dp-round "
    "precedent — and the market positioning with the zero-guard "
    "semantics) on one (warehouse_table, entity_key, v1..v4, label) "
    "spine. The REGISTERED venue is single-pass: ONE lineitem rollup "
    "(per-part stats), ONE part scan joined at part grain, both faces "
    "emitted per row via a 2-struct explode — no table is scanned twice "
    "(the union-of-pipeline twin re-derives the rollup for each table). "
    "The position sign tests the RAW retail-minus-avg difference (avg "
    "is the exact-decimal 2dp double, identical on both engines); "
    "price_diff rounds portably at output. Reference "
    "web_scraping_dag.py:96-191; the Selenium scrape itself is the S10 "
    "external-source adapter (sources/external.py), exercised in "
    "tests/test_external_source.py.",
)
def pl_pricing_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.exact_agg import exact_avg
    from ecommerce_etl_pipeline_spark.functions.scalar import market_position

    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    observed = li.groupBy(F.col("l_partkey").alias("product_id")).agg(
        exact_avg("l_extendedprice").alias("avg_p"),
        F.min("l_extendedprice").alias("min_p"),
        F.max("l_extendedprice").alias("max_p"),
        portable_round(F.stddev_samp("l_extendedprice"), 2).alias("std_p"),
    )
    base = part.join(
        observed, part.p_partkey == observed.product_id, "inner"
    )
    diff = F.col("p_retailprice") - F.col("avg_p")
    stats_face = F.struct(
        F.lit("fact_competitor_stats").alias("warehouse_table"),
        F.col("product_id").cast("string").alias("entity_key"),
        F.col("avg_p").cast("double").alias("v1"),
        F.col("min_p").cast("double").alias("v2"),
        F.col("max_p").cast("double").alias("v3"),
        F.col("std_p").cast("double").alias("v4"),
        F.lit(None).cast("string").alias("label"),
    )
    pos_face = F.struct(
        F.lit("fact_market_position").alias("warehouse_table"),
        F.col("p_partkey").cast("string").alias("entity_key"),
        F.col("avg_p").cast("double").alias("v1"),
        F.col("p_retailprice").cast("double").alias("v2"),
        portable_round(diff, 2).cast("double").alias("v3"),
        F.lit(None).cast("double").alias("v4"),
        market_position(diff).cast("string").alias("label"),
    )
    return base.select(
        F.explode(F.array(stats_face, pos_face)).alias("face")
    ).select("face.*")


def pricing_warehouse_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-branch union face over the ACTUAL SURVEY.md paragraph-3
    pipeline code (pipelines/reference.py::pricing_pipeline) — the parity
    twin pinned row-for-row equal to the registered single-pass plan in
    tests/test_pipelines.py."""
    from ecommerce_etl_pipeline_spark.pipelines.reference import pricing_pipeline

    tables = pricing_pipeline(spark, sf_dir)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    stats = tables["fact_competitor_stats"].select(
        F.lit("fact_competitor_stats").alias("warehouse_table"),
        F.col("product_id").cast("string").alias("entity_key"),
        F.col("avg_observed_price").cast("double").alias("v1"),
        F.col("min_observed_price").cast("double").alias("v2"),
        F.col("max_observed_price").cast("double").alias("v3"),
        F.col("std_observed_price").cast("double").alias("v4"),
        null_s.alias("label"),
    )
    pos = tables["fact_market_position"].select(
        F.lit("fact_market_position").alias("warehouse_table"),
        F.col("p_partkey").cast("string").alias("entity_key"),
        F.col("avg_observed_price").cast("double").alias("v1"),
        F.col("p_retailprice").cast("double").alias("v2"),
        F.col("price_diff").cast("double").alias("v3"),
        null_d.alias("v4"),
        F.col("market_position").cast("string").alias("label"),
    )
    return stats.unionByName(pos)
