"""Set-operation queries — SURVEY.md §2.7 (U1 + the intersect/except
surface the engine exposes as built-ins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.plans.registry import register
from ecommerce_etl_pipeline_spark.sources.io import load_table


@register(
    "u1_union_chunks",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_quantity
    FROM (
        SELECT l_returnflag, l_quantity FROM lineitem WHERE l_discount < 0.05
        UNION ALL
        SELECT l_returnflag, l_quantity FROM lineitem WHERE l_discount >= 0.05
    )
    GROUP BY 1
    """,
    doc="Row union of homogeneous slices (U1) — reference chunked-concat, "
    "data_sampling.py:68,97. unionByName is a zero-cost plan node: both "
    "branches stay partition-parallel, no shuffle until the aggregate.",
)
def u1_union_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity", "l_discount")
    lo = li.filter(F.col("l_discount") < 0.05).drop("l_discount")
    hi = li.filter(F.col("l_discount") >= 0.05).drop("l_discount")
    return (
        lo.unionByName(hi)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_quantity"),
        )
    )


@register(
    "u2_intersect_keys",
    oracle="""
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT DISTINCT (engine built-in; absent from the reference, "
    "SURVEY §2.7): customers with both open and fulfilled orders. Known "
    "caveat: join-strategy hints do NOT survive Spark's "
    "ReplaceIntersectWithSemiJoin rewrite (the hint is resolved before the "
    "semi join exists), so the leg join follows size estimates; at scale, "
    "write fact-fact set ops as explicit semi/anti joins (j6/j8 shapes) "
    "when the plan must be pinned.",
)
def u2_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("customer_id")
    )
    done_c = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("customer_id")
    )
    return open_c.intersect(done_c)


@register(
    "u3_except_keys",
    oracle="""
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey FROM lineitem
    """,
    doc="EXCEPT DISTINCT (engine built-in, SURVEY §2.7): parts never sold. "
    "Same answer as the j3 zero-fill path, via set semantics.",
)
def u3_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    sold = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey")
    )
    # same hint caveat as u2_intersect_keys: set-op rewrites drop join
    # hints; the pinned-plan form of this query is j3/j8's anti join
    return part.subtract(sold)  # EXCEPT DISTINCT


@register(
    "u4_unpivot",
    oracle="""
    WITH wide AS (
        SELECT n.n_name,
               CAST(COUNT(*) AS DOUBLE) AS num_customers,
               FLOOR(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     * 100 + 0.5) / 100 AS total_acctbal,
               CAST(MAX(c.c_acctbal) AS DOUBLE) AS max_acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    )
    SELECT n_name, 'num_customers' AS metric, num_customers AS value FROM wide
    UNION ALL
    SELECT n_name, 'total_acctbal', total_acctbal FROM wide
    UNION ALL
    SELECT n_name, 'max_acctbal', max_acctbal FROM wide
    """,
    doc="Unpivot / melt (wide metrics -> long key-value rows), the inverse "
    "of a20_pivot and the missing half of the reshape surface. Narrow, "
    "shuffle-free plan node (Expand): each input row fans out to one row "
    "per metric column in place — at 100 TB the fan-out happens after the "
    "aggregate, never on fact-sized data.",
)
def u4_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.exact_agg import exact_sum

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    wide = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("num_customers"),
            exact_sum("c_acctbal", round_to=2).alias("total_acctbal"),
            F.max(F.col("c_acctbal").cast("double")).alias("max_acctbal"),
        )
    )
    return wide.unpivot(
        "n_name",
        ["num_customers", "total_acctbal", "max_acctbal"],
        "metric",
        "value",
    )


@register(
    "u5_cdc_merge",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               0 AS s, 'I' AS op
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 100,
               1, 'U'
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    del AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 2, 'D'
        FROM orders WHERE o_orderkey % 17 = 0
    ),
    ins AS (
        SELECT o_orderkey + 1000000000, o_custkey, 'N', 1.0, 1, 'I'
        FROM orders WHERE o_orderkey % 23 = 0
    ),
    allr AS (
        SELECT * FROM base UNION ALL SELECT * FROM upd
        UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                     ORDER BY s DESC, op DESC) AS rn
        FROM allr
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           floor(o_totalprice * 100 + 0.5) / 100 AS o_totalprice
    FROM ranked WHERE rn = 1 AND op != 'D'
    """,
    doc="CDC MERGE apply (operators/cdc.py::apply_changes) — the "
    "Delta/Iceberg APPLY CHANGES shape without a table format: a "
    "deterministic change feed (updates on keys %10, deletes on %17, "
    "inserts of new keys on %23, sequence-ordered) resolves per-key "
    "latest-wins against the base snapshot, deletes remove rows, base "
    "rows ride as sequence-0 upserts. ONE key shuffle (window rank), no "
    "join; the full forward of the reference's upsert-lite (S9) to real "
    "MERGE semantics.",
)
def u5_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.exact_agg import portable_round
    from ecommerce_etl_pipeline_spark.operators.cdc import apply_changes

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    upd = orders.filter(k % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(100)).alias("o_totalprice"),
        F.lit(1).alias("_seq"),
        F.lit("U").alias("_op"),
    )
    dele = orders.filter(k % 17 == 0).select(
        *orders.columns, F.lit(2).alias("_seq"), F.lit("D").alias("_op")
    )
    ins = orders.filter(k % 23 == 0).select(
        (k + F.lit(1000000000)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
        F.lit(1).alias("_seq"),
        F.lit("I").alias("_op"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    merged = apply_changes(orders, changes, ["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        portable_round(F.col("o_totalprice"), 2).alias("o_totalprice"),
    )


@register(
    "u6_snapshot_diff",
    oracle="""
    WITH oldt AS (
        SELECT o_orderkey, o_totalprice FROM orders
    ),
    newt AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.5
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 0
        UNION ALL
        -- Synthetic inserts are re-keyed by NEGATION: TPC-H orderkeys are
        -- strictly positive at every SF, so -k can never collide with a
        -- real key (a fixed +10M offset would collide once SF >= ~2).
        SELECT -o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 13 = 0
    ),
    d AS (
        SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                        THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM oldt o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows FROM d GROUP BY 1
    """,
    doc="Snapshot reconciliation (operators/cdc.py::snapshot_diff): "
    "recover added/removed/changed/unchanged classifications from two "
    "table snapshots via one null-safe full outer join — the audit "
    "primitive when no CDC feed exists (the reverse of u5's MERGE "
    "apply). The 'new' snapshot is a deterministic synthetic mutation "
    "of orders (10% deleted, every 7th repriced, every 13th re-keyed "
    "by negation as an insert — collision-free at any SF since real "
    "keys are strictly positive) so the full classification matrix is "
    "exercised. At "
    "scale both snapshots bucket on the key (S11) and the join is "
    "exchange-free.",
)
def u6_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.operators.cdc import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    new = (
        orders.filter(F.col("o_orderkey") % 10 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 1.5
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
        .unionByName(
            # Negated keys stay collision-free at any SF (keys are > 0).
            orders.filter(F.col("o_orderkey") % 13 == 0).select(
                (-F.col("o_orderkey")).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    diff = snapshot_diff(orders, new, ["o_orderkey"], ["o_totalprice"])
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_rows"))
