"""Extended engine surface: the SQL API (spark.sql over registered views),
exact percentiles, argmax/argmin, array-collecting aggregates, pivot, and
the wider string/date scalar library — capabilities a user of the reference
would expect from a complete engine even where the reference had no direct
analogue (SURVEY.md §2.4 note, §2.9).
"""

from __future__ import annotations

import math
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.functions.exact_agg import (
    exact_sum,
    portable_round,
    sql_round,
)
from ecommerce_etl_pipeline_spark.plans.registry import register
from ecommerce_etl_pipeline_spark.sources.io import load_table

#: createOrReplaceTempView is DROP+CREATE under the hood, so two sql_*
#: queries racing on a thread pool (the check_correctness sweep runs 4
#: workers) can catch each other mid-replace and fail analysis with an
#: opaque collectToPython error (observed round 10: a transient
#: sql_nation_revenue/sql_top_revenue_orders pair failure at sf0.1 that
#: a single-threaded rerun couldn't reproduce). Registration is memoized
#: per (session, view) -> sf_dir under a lock: after first registration
#: the call is a no-op for an unchanged sf_dir — no replace, no race.
#: A session keyed by id() can alias a stopped-and-collected predecessor
#: whose address was reused — and the consequence would be a silently
#: SKIPPED registration ('table not found' at analysis), not a redundant
#: re-register (ADVICE r10 #1 caught the inverted claim here). The memo
#: is therefore only trusted when the view actually exists in the live
#: session's catalog; tableExists is a cheap catalog lookup, so the
#: no-replace fast path (the race fix) is preserved.
_VIEW_LOCK = threading.Lock()
_VIEWS_REGISTERED: dict[tuple[int, str], str] = {}


def _register_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    with _VIEW_LOCK:
        sid = id(spark)
        for t in tables:
            if _VIEWS_REGISTERED.get((sid, t)) == sf_dir and spark.catalog.tableExists(t):
                continue
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
            _VIEWS_REGISTERED[(sid, t)] = sf_dir


@register(
    "sql_top_revenue_orders",
    oracle=f"""
    SELECT l.l_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
           {sql_round("CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))"
                      " * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE)", 2)}
               AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1, 2
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-shaped three-table join via the spark.sql TEXT interface "
    "over registered views — the engine's SQL front door. Catalyst plans "
    "it identically to the DataFrame form (broadcast customer, shuffle "
    "orders⋈lineitem on orderkey).",
)
def sql_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT
               l.l_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
               {sql_round("CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))"
                          " * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE)", 2)}
                   AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY 1, 2
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """
    )


@register(
    "sql_nation_revenue",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           {sql_round("CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))"
                      " * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE)", 2)}
               AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
    doc="TPC-H Q5-shaped five-table star join via spark.sql: the region/"
    "nation/customer dim chain broadcasts; only the orders⋈lineitem edge "
    "shuffles.",
)
def sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, "region", "nation", "customer", "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT
               n.n_name AS nation_name,
               {sql_round("CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))"
                          " * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE)", 2)}
                   AS revenue
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE r.r_name = 'ASIA'
        GROUP BY 1
        """
    )


@register(
    "a17_percentiles",
    oracle=f"""
    SELECT p_brand,
           {sql_round("CAST(quantile_cont(p_retailprice, 0.25) AS DOUBLE)", 4)} AS p25,
           {sql_round("CAST(quantile_cont(p_retailprice, 0.50) AS DOUBLE)", 4)} AS median,
           {sql_round("CAST(quantile_cont(p_retailprice, 0.75) AS DOUBLE)", 4)} AS p75
    FROM part
    GROUP BY 1
    """,
    doc="Exact interpolated percentiles per group (W1 foundation). At 100 TB "
    "use approx_percentile (t-digest sketch, single pass, mergeable) — exact "
    "percentile keeps per-group value buffers.",
)
def a17_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        portable_round(F.expr("percentile(p_retailprice, 0.25)"), 4).alias("p25"),
        portable_round(F.expr("percentile(p_retailprice, 0.50)"), 4).alias("median"),
        portable_round(F.expr("percentile(p_retailprice, 0.75)"), 4).alias("p75"),
    )


@register(
    "a18_argmax",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice ASC, o_orderkey DESC) AS rmin
        FROM orders
    )
    SELECT o_custkey AS customer_id,
           MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS biggest_order,
           MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS smallest_order
    FROM ranked
    GROUP BY 1
    """,
    doc="argmax/argmin with deterministic composite tiebreak (max_by over a "
    "struct ordering) — ties on totalprice resolve by orderkey on both "
    "engines.",
)
def a18_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias("biggest_order"),
        F.expr("min_by(o_orderkey, struct(o_totalprice, -o_orderkey))").alias(
            "smallest_order"
        ),
    )


@register(
    "a19_collect_sorted",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           CAST(len(list(DISTINCT l_linestatus)) AS INTEGER) AS n_statuses
    FROM lineitem
    GROUP BY 1
    """,
    doc="Array-collecting aggregate rendered deterministically "
    "(sort_array(collect_set) -> join) — nested results compare as text.",
)
def a19_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cs = F.sort_array(F.collect_set("l_linestatus"))
    return li.groupBy("l_returnflag").agg(
        F.array_join(cs, ",").alias("statuses"),
        F.size(cs).alias("n_statuses"),
    )


@register(
    "a20_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F
    FROM lineitem
    GROUP BY 1
    """,
    doc="Pivot (one shuffle; pivot values pinned so the schema is static — "
    "never let pivot() scan for distinct values at scale).",
)
def a20_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).count()
    return out.na.fill(0)


@register(
    "sc_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 8) AS name_prefix,
           lpad(p_brand, 12, '*') AS brand_padded,
           reverse(p_brand) AS brand_rev,
           replace(p_type, ' ', '_') AS type_snake,
           repeat(p_brand, 2) AS brand_twice,
           CAST(strpos(p_name, 'a') AS INTEGER) AS first_a,
           split_part(p_type, ' ', 1) AS type_head,
           CAST(levenshtein(p_brand, p_type) AS INTEGER) AS brand_type_dist
    FROM part
    """,
    doc="String-function library (SC10-SC12 generalization): case, substr, "
    "pad, reverse, replace, repeat, find, split_part, levenshtein — all "
    "JVM-side, all DuckDB-portable.",
)
def sc_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.levenshtein("p_brand", "p_type").cast("int").alias("brand_type_dist"),
    )


@register(
    "sc_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS review_date,
           date_trunc('month', CAST(o_orderdate AS DATE)) AS order_month_start,
           last_day(CAST(o_orderdate AS DATE)) AS order_month_end,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_weekday,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter
    FROM orders
    """,
    doc="Date arithmetic library (SC3-SC6 generalization): day/month "
    "offsets, month truncation, last_day, ISO weekday, quarter. ISO weekday "
    "via weekday()+1 (Spark dayofweek is Sunday-based; DuckDB dayofweek is "
    "0-based — isodow is the portable form).",
)
def sc_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.add_months(d, 2).alias("review_date"),
        F.trunc(d, "month").alias("order_month_start"),
        F.last_day(d).alias("order_month_end"),
        (F.weekday(d) + 1).cast("int").alias("iso_weekday"),
        F.quarter(d).cast("int").alias("order_quarter"),
    )


@register(
    "a22_cube",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS priority,
           CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                ELSE o_orderstatus END AS status,
           COUNT(*) AS cnt,
           FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5)
               / 100 AS total_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    doc="CUBE over two keys — all 4 grouping combinations in ONE shuffle "
    "(the full generalization of the reference's separate groupbys, "
    "completing rollup/a16; SURVEY §2.4 note). GROUPING() disambiguates "
    "subtotal rows from natural NULLs on both engines.",
)
def a22_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            exact_sum("o_totalprice").alias("total_price"),
            # grouping() is only valid inside the cube's aggregate list
            F.grouping("o_orderpriority").alias("_gp"),
            F.grouping("o_orderstatus").alias("_gs"),
        )
        .select(
            F.when(F.col("_gp") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            F.when(F.col("_gs") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            "cnt",
            "total_price",
        )
    )


@register(
    "sql_correlated_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 450000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
    """,
    doc="Correlated EXISTS / NOT EXISTS subqueries through the SQL API — "
    "Catalyst decorrelates them into a left-semi and a left-anti join on "
    "o_custkey (no per-row re-execution, unlike the reference's pandas "
    "isin emulations). Scale shape: two hash joins on the same key; the "
    "aggregated-filter build sides broadcast when small.",
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        """
    )


@register(
    "sql_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS num_orders,
           FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS total_price,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus))
    """,
    doc="Explicit GROUPING SETS (the third grouping-set form beside "
    "a16_rollup_hierarchy and a22_cube): three different group-bys in ONE "
    "scan via the Expand node — each input row is replicated once per set "
    "before the partial aggregate, so at 100 TB this is one pass over the "
    "facts instead of |sets| separate jobs; GROUPING() disambiguates "
    "aggregated-away keys from genuine NULLs.",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS num_orders,
               FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     * 100 + 0.5) / 100 AS total_price,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))
        """
    )


@register(
    "dq_validation_report",
    oracle=f"""
    WITH rows_rules AS (
        SELECT 'lineitem' AS table_name, 'l_quantity_in_1_50' AS rule,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN COALESCE(NOT (l_quantity BETWEEN 1 AND 50), TRUE)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'lineitem', 'l_discount_in_0_0.1',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN COALESCE(NOT (l_discount BETWEEN 0 AND 0.1), TRUE)
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem', 'l_shipdate_not_null',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'orders', 'o_totalprice_positive',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN COALESCE(o_totalprice <= 0, TRUE) THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders', 'o_orderstatus_known',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                             OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem', 'fk_l_orderkey',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'orders', 'fk_o_custkey',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
    )
    SELECT table_name, rule, n_rows, n_violations,
           CAST(n_violations AS DOUBLE) / n_rows AS violation_rate
    FROM rows_rules
    """,
    doc="Declarative data-quality gate (operators/quality.py): range / "
    "not-null / domain rules compiled into ONE conditional-count aggregate "
    "scan per table (N rules, zero extra scans) plus one anti-join per "
    "foreign-key rule (parent side broadcasts). The engine surface for the "
    "reference's imperative validation (clean_product_v2.py:35-59 int-range "
    "checks, data_sampling.py referential integrity). NULL in a checked "
    "column counts as a violation.",
)
def dq_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.operators import quality

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    q = F.col
    parts = [
        quality.check_rules(
            li,
            "lineitem",
            [
                quality.Rule("l_quantity_in_1_50", ~q("l_quantity").between(1, 50)),
                quality.Rule("l_discount_in_0_0.1", ~q("l_discount").between(0, 0.1)),
                quality.Rule("l_shipdate_not_null", q("l_shipdate").isNull()),
            ],
        ),
        quality.check_rules(
            orders,
            "orders",
            [
                quality.Rule("o_totalprice_positive", q("o_totalprice") <= 0),
                quality.Rule(
                    "o_orderstatus_known", ~q("o_orderstatus").isin("O", "F", "P")
                ),
            ],
        ),
        quality.check_foreign_key(li, "lineitem", "l_orderkey", orders, "o_orderkey"),
        quality.check_foreign_key(orders, "orders", "o_custkey", customer, "c_custkey"),
    ]
    return quality.validation_report(parts)


#: Benford first-digit expectation log10(1 + 1/d), computed ONCE in Python
#: and embedded as the SAME double literal in both the Spark plan and the
#: DuckDB oracle — no engine libm call, so no cross-engine log10 ulp risk
#: in an oracle-checked value (the portable_round doctrine applied to
#: transcendentals: keep them out of both engines entirely).
_BENFORD_EXPECTED = {d: math.log10(1 + 1 / d) for d in range(1, 10)}


@register(
    "dq_benford_deviation",
    oracle=f"""
    WITH c AS (
        SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INTEGER) AS digit,
               COUNT(*) AS n
        FROM lineitem
        -- >= 1, not > 0: benford_first_digit's contract (values in (0,1)
        -- have no integer first digit) and the streaming face's filter
        -- (streams.py::benford_monitor_stream) — aligned r12 per the r11
        -- ADVICE so the two faces cannot drift. No-op on TPC-H prices.
        WHERE l_extendedprice >= 1
        GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM c)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           {sql_round('CAST(n AS DOUBLE) / tot', 6)} AS observed_frac,
           {sql_round(
               'CASE digit '
               + ' '.join(
                   f'WHEN {d} THEN CAST({v!r} AS DOUBLE)'
                   for d, v in _BENFORD_EXPECTED.items()
               )
               + ' END', 6)} AS expected_frac,
           {sql_round(
               'ABS(CAST(n AS DOUBLE) / tot - (CASE digit '
               + ' '.join(
                   f'WHEN {d} THEN CAST({v!r} AS DOUBLE)'
                   for d, v in _BENFORD_EXPECTED.items()
               )
               + ' END))', 6)} AS abs_dev
    FROM c, t
    """,
    doc="Benford first-digit conformance over the price fact — the "
    "classic synthetic-/corrupted-data detector a DQ suite runs on every "
    "money column (complements dq_validation_report's rule checks and "
    "dq_psi_drift's distribution drift). First digit extracted via "
    "floor -> bigint -> string (no log10 on data, so no cross-engine "
    "libm divergence; the Benford expectations are Python-computed "
    "literals shared by plan and oracle). Scale shape: one fact scan "
    "into a 9-cell map-side-combined aggregate, total via a broadcast "
    "one-row crossJoin over the 9-row rollup — no window, no second "
    "scan.",
)
def dq_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.scalar import benford_first_digit

    li = load_table(spark, sf_dir, "lineitem")
    digit = benford_first_digit(F.col("l_extendedprice"))
    counts = (
        li.filter(F.col("l_extendedprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("double").alias("tot"))
    expected = F.lit(None).cast("double")
    for d, v in reversed(_BENFORD_EXPECTED.items()):
        expected = F.when(F.col("digit") == d, F.lit(v)).otherwise(expected)
    obs = F.col("n").cast("double") / F.col("tot")
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        portable_round(obs, 6).alias("observed_frac"),
        portable_round(expected, 6).alias("expected_frac"),
        portable_round(F.abs(obs - expected), 6).alias("abs_dev"),
    )


@register(
    "a23_zscore_outliers",
    oracle=f"""
    WITH m AS (
        SELECT p_brand,
               COUNT(*) AS n,
               SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS s,
               SUM(CAST(p_retailprice AS DECIMAL(18,2))
                   * CAST(p_retailprice AS DECIMAL(18,2))) AS ss
        FROM part GROUP BY p_brand
    ),
    z AS (
        SELECT p_partkey, part.p_brand AS p_brand, p_retailprice,
               (p_retailprice - CAST(s AS DOUBLE) / n)
                 / NULLIF(SQRT((CAST(ss AS DOUBLE)
                                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                               / NULLIF(n - 1, 0)), 0) AS zval
        FROM part JOIN m ON part.p_brand = m.p_brand
    )
    SELECT p_partkey, p_brand, p_retailprice, {sql_round("zval", 4)} AS zscore
    FROM z WHERE ABS(zval) > 2
    """,
    doc="Per-group z-score outlier detection (|z| > 2 within brand) — the "
    "statistical data-quality screen over numeric features. Moments (n, "
    "decimal sum, decimal sum-of-squares) are pre-aggregated exactly per "
    "group (map-side combinable, order-independent — FP window aggregates "
    "would make the |z|>2 boundary partitioning-dependent) and broadcast "
    "back; the final mean/stddev/z arithmetic runs on group-level scalars "
    "with identical IEEE ops on both engines.",
)
def a23_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    dec = F.col("p_retailprice").cast("decimal(18,2)")
    m = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        )
        / F.nullif(F.col("n") - F.lit(1), F.lit(0))
    )
    z = (F.col("p_retailprice") - mean) / F.nullif(sd, F.lit(0.0))
    return (
        part.join(F.broadcast(m), "p_brand")
        .withColumn("_z", z)
        .filter(F.abs(F.col("_z")) > 2)
        .select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            portable_round(F.col("_z"), 4).alias("zscore"),
        )
    )


@register(
    "a24_winsorized_stats",
    oracle=f"""
    WITH caps AS (
        SELECT FLOOR(CAST(quantile_cont(p_retailprice, 0.05) AS DOUBLE) * 100 + 0.5) / 100
                   AS lo,
               FLOOR(CAST(quantile_cont(p_retailprice, 0.95) AS DOUBLE) * 100 + 0.5) / 100
                   AS hi
        FROM part
    )
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN p_retailprice < lo OR p_retailprice > hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
           {sql_round("CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)"
                      " / COUNT(*)", 2)} AS avg_raw,
           {sql_round("CAST(SUM(CAST(GREATEST(LEAST(p_retailprice, hi), lo)"
                      " AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 2)} AS avg_winsorized
    FROM part CROSS JOIN caps
    GROUP BY p_brand
    """,
    doc="Winsorization: clamp a numeric feature at global p05/p95 before "
    "aggregating — the outlier-robust normalization step of a feature "
    "pipeline. Quantile caps are computed once (two scalars, broadcast), "
    "portably rounded to cents so both engines clamp at identical "
    "boundaries; averages run in exact decimal (order-independent).",
)
def a24_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    caps = part.agg(
        portable_round(F.expr("percentile(p_retailprice, 0.05)"), 2).alias("lo"),
        portable_round(F.expr("percentile(p_retailprice, 0.95)"), 2).alias("hi"),
    )
    clamped = F.greatest(F.least(F.col("p_retailprice"), F.col("hi")), F.col("lo"))
    capped = (F.col("p_retailprice") < F.col("lo")) | (
        F.col("p_retailprice") > F.col("hi")
    )
    return (
        part.crossJoin(F.broadcast(caps))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(capped.cast("long")).alias("n_capped"),
            portable_round(
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_raw"),
            portable_round(
                F.sum(clamped.cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)),
                2,
            ).alias("avg_winsorized"),
        )
    )


@register(
    "a25_price_histogram",
    oracle="""
    WITH bounds AS (
        SELECT MIN(p_retailprice) AS lo, MAX(p_retailprice) AS hi FROM part
    ),
    bucketed AS (
        SELECT LEAST(CAST(FLOOR((p_retailprice - lo) / (hi - lo) * 10) AS INT), 9)
                   AS bucket,
               lo, hi
        FROM part CROSS JOIN bounds
    )
    SELECT bucket,
           FLOOR((lo + (hi - lo) * bucket / 10) * 100 + 0.5) / 100 AS bucket_lo,
           FLOOR((lo + (hi - lo) * (bucket + 1) / 10) * 100 + 0.5) / 100 AS bucket_hi,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM bucketed
    GROUP BY bucket, lo, hi
    """,
    doc="Fixed-width 10-bucket histogram between global min/max — the "
    "profiling primitive behind every distribution dashboard. Two scalar "
    "aggregates broadcast; the bucket expression is deterministic "
    "arithmetic so counts are exact on both engines. One map-side "
    "combinable shuffle of 10 groups.",
)
def a25_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    bounds = part.agg(
        F.min("p_retailprice").alias("lo"), F.max("p_retailprice").alias("hi")
    )
    span = F.col("hi") - F.col("lo")
    bucket = F.least(
        F.floor((F.col("p_retailprice") - F.col("lo")) / span * 10).cast("int"),
        F.lit(9),
    )
    return (
        part.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"), "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .select(
            "bucket",
            portable_round(F.col("lo") + span * F.col("bucket") / 10, 2).alias(
                "bucket_lo"
            ),
            portable_round(F.col("lo") + span * (F.col("bucket") + 1) / 10, 2).alias(
                "bucket_hi"
            ),
            "n_parts",
        )
    )


@register(
    "txt_freq_spectrum",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY 1)
    SELECT CAST(freq AS BIGINT) AS freq, CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM vocab
    GROUP BY freq
    """,
    doc="Token frequency-of-frequencies spectrum (the Zipf / Good-Turing "
    "profile): how many distinct tokens occur exactly f times. Two exact "
    "integer aggregations; the second input is already tiny (one row per "
    "distinct frequency). The standard corpus-health check before "
    "vocabulary decisions.",
)
def txt_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return vocab.groupBy("freq").agg(F.count(F.lit(1)).alias("n_tokens"))


@register(
    "a26_rfm_segments",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               (DATE '1998-12-31' - CAST(MAX(o_orderdate) AS DATE)) AS recency_days,
               COUNT(*) AS frequency,
               FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     * 100 + 0.5) / 100 AS monetary
        FROM orders GROUP BY o_custkey
    ),
    edges AS (
        -- Edges rounded half-up to 4dp on BOTH engines (the a24 doctrine):
        -- interpolated quantiles at non-exact indices are FP-order-sensitive,
        -- so scoring against raw doubles risks cross-engine boundary flips.
        SELECT FLOOR(CAST(quantile_cont(recency_days, 0.25) AS DOUBLE) * 10000 + 0.5) / 10000 AS r1,
               FLOOR(CAST(quantile_cont(recency_days, 0.50) AS DOUBLE) * 10000 + 0.5) / 10000 AS r2,
               FLOOR(CAST(quantile_cont(recency_days, 0.75) AS DOUBLE) * 10000 + 0.5) / 10000 AS r3,
               FLOOR(CAST(quantile_cont(frequency, 0.25) AS DOUBLE) * 10000 + 0.5) / 10000 AS f1,
               FLOOR(CAST(quantile_cont(frequency, 0.50) AS DOUBLE) * 10000 + 0.5) / 10000 AS f2,
               FLOOR(CAST(quantile_cont(frequency, 0.75) AS DOUBLE) * 10000 + 0.5) / 10000 AS f3,
               FLOOR(CAST(quantile_cont(monetary, 0.25) AS DOUBLE) * 10000 + 0.5) / 10000 AS m1,
               FLOOR(CAST(quantile_cont(monetary, 0.50) AS DOUBLE) * 10000 + 0.5) / 10000 AS m2,
               FLOOR(CAST(quantile_cont(monetary, 0.75) AS DOUBLE) * 10000 + 0.5) / 10000 AS m3
        FROM rfm
    ),
    scored AS (
        SELECT o_custkey,
               CASE WHEN recency_days <= r1 THEN 4 WHEN recency_days <= r2 THEN 3
                    WHEN recency_days <= r3 THEN 2 ELSE 1 END AS r_score,
               CASE WHEN frequency <= f1 THEN 1 WHEN frequency <= f2 THEN 2
                    WHEN frequency <= f3 THEN 3 ELSE 4 END AS f_score,
               CASE WHEN monetary <= m1 THEN 1 WHEN monetary <= m2 THEN 2
                    WHEN monetary <= m3 THEN 3 ELSE 4 END AS m_score
        FROM rfm, edges
    )
    SELECT o_custkey, r_score, f_score, m_score,
           CASE WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3 THEN 'champion'
                WHEN r_score >= 3 AND f_score <= 2 THEN 'recent'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """,
    doc="RFM customer segmentation — the canonical e-commerce marketing "
    "analysis: per-customer Recency (days since last order at the pinned "
    "as-of date 1998-12-31 — never current_date), Frequency, Monetary "
    "(exact-decimal sum, so the quartile inputs are order-independent "
    "and engine-identical), each scored into exact interpolated "
    "quartiles (the a12/W1 machinery) whose edges are half-up-rounded "
    "to 4dp on both engines before the <= comparisons (the a24 "
    "boundary doctrine), then mapped to named segments. "
    "Scale shape: one map-side-combinable per-customer rollup, one "
    "9-scalar quantile aggregate broadcast back as literals, one narrow "
    "scoring pass.",
)
def a26_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.binning import (
        quantile_edges,
        round_edges,
    )

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.max("o_orderdate").cast("date")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        exact_sum("o_totalprice").alias("monetary"),
    )
    probs = [0.25, 0.50, 0.75]

    def score(col: str, best_low: bool) -> F.Column:
        # 4dp half-up edges on both engines — see round_edges / a24.
        e = round_edges(quantile_edges(rfm, col, probs))
        labels = [4, 3, 2, 1] if best_low else [1, 2, 3, 4]
        expr = F.when(F.col(col) <= F.lit(e[0]), F.lit(labels[0]))
        for i in (1, 2):
            expr = expr.when(F.col(col) <= F.lit(e[i]), F.lit(labels[i]))
        return expr.otherwise(F.lit(labels[3]))

    scored = rfm.select(
        "o_custkey",
        score("recency_days", best_low=True).alias("r_score"),
        score("frequency", best_low=False).alias("f_score"),
        score("monetary", best_low=False).alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.when(
            (F.col("r_score") >= 3) & (F.col("f_score") >= 3) & (F.col("m_score") >= 3),
            F.lit("champion"),
        )
        .when((F.col("r_score") >= 3) & (F.col("f_score") <= 2), F.lit("recent"))
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), F.lit("at_risk"))
        .otherwise(F.lit("regular")),
    )


@register(
    "dq_psi_drift",
    oracle=f"""
    WITH base AS (
        SELECT o_totalprice AS v FROM orders WHERE YEAR(o_orderdate) <= 1997
    ),
    cur AS (
        SELECT o_totalprice AS v FROM orders WHERE YEAR(o_orderdate) >= 1998
    ),
    edges AS (
        -- 4dp half-up edges on both engines (a24/a26 boundary doctrine).
        SELECT FLOOR(CAST(quantile_cont(v, 0.2) AS DOUBLE) * 10000 + 0.5) / 10000 AS e1,
               FLOOR(CAST(quantile_cont(v, 0.4) AS DOUBLE) * 10000 + 0.5) / 10000 AS e2,
               FLOOR(CAST(quantile_cont(v, 0.6) AS DOUBLE) * 10000 + 0.5) / 10000 AS e3,
               FLOOR(CAST(quantile_cont(v, 0.8) AS DOUBLE) * 10000 + 0.5) / 10000 AS e4
        FROM base
    ),
    bb AS (
        SELECT CASE WHEN v <= e1 THEN 1 WHEN v <= e2 THEN 2 WHEN v <= e3 THEN 3
                    WHEN v <= e4 THEN 4 ELSE 5 END AS bin, COUNT(*) AS c
        FROM base, edges GROUP BY 1
    ),
    cb AS (
        SELECT CASE WHEN v <= e1 THEN 1 WHEN v <= e2 THEN 2 WHEN v <= e3 THEN 3
                    WHEN v <= e4 THEN 4 ELSE 5 END AS bin, COUNT(*) AS c
        FROM cur, edges GROUP BY 1
    ),
    tot AS (SELECT (SELECT SUM(c) FROM bb) AS nb, (SELECT SUM(c) FROM cb) AS nc),
    bins AS (SELECT 1 AS bin UNION ALL SELECT 2 UNION ALL SELECT 3
             UNION ALL SELECT 4 UNION ALL SELECT 5),
    probs AS (
        SELECT bins.bin,
               (COALESCE(bb.c, 0) + 0.5) / (nb + 2.5) AS p,
               (COALESCE(cb.c, 0) + 0.5) / (nc + 2.5) AS q
        FROM bins LEFT JOIN bb USING (bin) LEFT JOIN cb USING (bin) CROSS JOIN tot
    )
    SELECT bin,
           {sql_round("p", 6)} AS p_base,
           {sql_round("q", 6)} AS p_current,
           {sql_round(
               "(p - q) * (CAST(FLOOR(ln(p) * 1e9 + 0.5) AS BIGINT)"
               " - CAST(FLOOR(ln(q) * 1e9 + 0.5) AS BIGINT)) / 1e9", 6)} AS psi_term
    FROM probs
    """,
    doc="Population Stability Index drift report: order-value distribution "
    "for orders through 1997 (baseline) vs 1998+ (current) over baseline "
    "quintiles — the standard ML-ops input-drift monitor (PSI > 0.2 = "
    "significant shift). Exact interpolated edges (W1 machinery, "
    "half-up-rounded to 4dp on both engines), +0.5 smoothing so "
    "empty bins stay finite, and the ln ratio is nano-quantized to an "
    "integer difference so every psi term replays bit-for-bit in DuckDB "
    "despite crossing an FP log. Two scans + two 4-scalar aggregates; "
    "the report is 5 rows.",
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.binning import (
        quantile_edges,
        round_edges,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.year("o_orderdate") <= 1997).select(
        F.col("o_totalprice").alias("v")
    )
    cur = orders.filter(F.year("o_orderdate") >= 1998).select(
        F.col("o_totalprice").alias("v")
    )
    # 4dp half-up edges on both engines — see round_edges / a24 / a26.
    e = round_edges(quantile_edges(base, "v", [0.2, 0.4, 0.6, 0.8]))

    def binned(df: DataFrame) -> DataFrame:
        b = (
            F.when(F.col("v") <= e[0], 1)
            .when(F.col("v") <= e[1], 2)
            .when(F.col("v") <= e[2], 3)
            .when(F.col("v") <= e[3], 4)
            .otherwise(5)
        )
        return df.groupBy(b.alias("bin")).agg(F.count(F.lit(1)).alias("c"))

    bb = binned(base)
    cb = binned(cur)
    bins = spark.range(1, 6).select(F.col("id").cast("int").alias("bin"))
    nb = bb.agg(F.sum("c").alias("nb"))
    nc = cb.agg(F.sum("c").alias("nc"))
    p = (F.coalesce(F.col("bc"), F.lit(0)) + 0.5) / (F.col("nb") + 2.5)
    q = (F.coalesce(F.col("cc"), F.lit(0)) + 0.5) / (F.col("nc") + 2.5)
    nano_ln_ratio = (
        F.floor(F.log(p) * 1e9 + 0.5).cast("bigint")
        - F.floor(F.log(q) * 1e9 + 0.5).cast("bigint")
    ).cast("double") / 1e9
    return (
        bins.join(bb.select(F.col("bin"), F.col("c").alias("bc")), "bin", "left")
        .join(cb.select(F.col("bin"), F.col("c").alias("cc")), "bin", "left")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nc))
        .select(
            "bin",
            portable_round(p, 6).alias("p_base"),
            portable_round(q, 6).alias("p_current"),
            portable_round((p - q) * nano_ln_ratio, 6).alias("psi_term"),
        )
    )


@register(
    "a27_pareto_revenue",
    oracle=f"""
    WITH rev AS (
        SELECT p.p_brand AS brand,
               FLOOR(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l.l_discount AS DECIMAL(9,2)))) AS DOUBLE)
                     * 100 + 0.5) / 100 AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    ),
    tot AS (SELECT CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS total FROM rev)
    SELECT brand, revenue,
           CAST(rk AS INTEGER) AS revenue_rank,
           {sql_round("cum / total", 6)} AS cum_share
    FROM (
        SELECT brand, revenue,
               ROW_NUMBER() OVER (ORDER BY revenue DESC, brand) AS rk,
               SUM(revenue) OVER (ORDER BY revenue DESC, brand
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM rev
    ) CROSS JOIN tot
    """,
    doc="Pareto concentration curve: brands ranked by lineitem revenue "
    "with each brand's CUMULATIVE share of total — the 80/20 analysis "
    "every merchandising review starts with. Revenue is exact-decimal "
    "summed then portably rounded BEFORE the window, so the running sum "
    "adds identical doubles in identical (rank-ordered) sequence on "
    "both engines. The global window runs over the BRAND grain — "
    "dimension-bounded (like w7's calendar grain), never fact-sized — "
    "so the single-partition sort is a few dozen rows at any SF.",
)
def a27_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ecommerce_etl_pipeline_spark.functions.exact_agg import exact_sum

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            exact_sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(9,2)")),
                scale=4,
                round_to=2,
            ).alias("revenue")
        )
    )
    # EXPECTED WindowExec "No Partition Defined" WARN: both global windows
    # run over the per-BRAND rollup (|brands| rows, 25 in TPC-H at any SF)
    # — bounded grain by design, never the lineitem fact (the w5/w7 class;
    # see tests/test_plans.py::test_moving_avg_runs_over_daily_rollup).
    w = Window.orderBy(F.desc("revenue"), "brand")
    cum = Window.orderBy(F.desc("revenue"), "brand").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # exact-decimal total: revenues are cent-rounded doubles, and an FP
    # sum over them would be partition-order-dependent (the a23 class)
    tot = rev.agg(
        F.sum(F.col("revenue").cast("decimal(18,2)")).cast("double").alias("total")
    )
    return (
        rev.withColumn("revenue_rank", F.row_number().over(w).cast("int"))
        .withColumn("cum", F.sum("revenue").over(cum))
        .crossJoin(F.broadcast(tot))
        .select(
            "brand",
            "revenue",
            "revenue_rank",
            portable_round(F.col("cum") / F.col("total"), 6).alias("cum_share"),
        )
    )
