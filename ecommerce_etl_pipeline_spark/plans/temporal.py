"""Temporal / range-join / sketch queries — engine surface the reference's
clickstream-attribution domain implies but its pandas code cannot express:
as-of joins (attribute each event to the user's most recent prior order),
range joins against interval dims, and mergeable distinct-count sketches.

As-of join strategy for 100 TB: the naive formulation is an inequality join
(events x orders on user AND orderdate <= ts) whose intermediate blows up
with orders-per-user; instead, union both inputs into one stream tagged by
side and take a running ``last(order_payload, ignorenulls)`` window per
user — ONE shuffle on the (high-cardinality) user key, no join blow-up,
per-partition sort only. This is the standard point-in-time-correctness
shape for feature backfill (no future leakage: ties at equal timestamps
admit the order, matching ``o_orderdate <= ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_etl_pipeline_spark.functions.exact_agg import exact_sum
from ecommerce_etl_pipeline_spark.plans.registry import register
from ecommerce_etl_pipeline_spark.sources.io import load_table


@register(
    "j9_asof_join",
    oracle="""
    SELECT e.event_id, e.event_type,
           m.o_orderkey AS matched_orderkey,
           m.o_totalprice AS matched_totalprice,
           CAST(date_diff('day', CAST(m.o_orderdate AS DATE), CAST(e.ts AS DATE))
                AS INTEGER) AS days_since_order
    FROM events e
    LEFT JOIN (
        SELECT ee.event_id AS eid, o.o_orderkey, o.o_totalprice, o.o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY ee.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events ee
        JOIN orders o ON ee.user_id = o.o_custkey AND o.o_orderdate <= ee.ts
    ) m ON m.eid = e.event_id AND m.rn = 1
    """,
    doc="As-of (point-in-time) join: each event matched to the user's most "
    "recent order with o_orderdate <= ts, deterministic tiebreak on max "
    "orderkey. Implemented as union + running last-ignorenulls window — one "
    "shuffle on user_id, no inequality-join blow-up (the oracle states the "
    "same semantics as a rank-1 inequality join). The operator the "
    "reference's clickstream->transaction attribution "
    "(customer_analytics_dag.py:177-188) needs but equi-joins can't give.",
)
def j9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    # Tag and union: orders carry the payload, events carry null payload.
    # side=0 sorts orders BEFORE events at equal timestamps, so an order at
    # exactly ts is admitted (<=, no future leakage); among equal
    # (user, orderdate) orders the ascending orderkey sort makes the running
    # last() pick the max orderkey — the oracle's DESC,DESC rank-1 row.
    o_tag = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("side"),
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
    )
    e_tag = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        "event_id",
        "event_type",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = o_tag.unionByName(e_tag).select(
        "side",
        "event_id",
        "event_type",
        "t",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("matched_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("matched_totalprice"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("m_orderdate"),
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "event_type",
        "matched_orderkey",
        "matched_totalprice",
        F.datediff(F.to_date("t"), F.to_date("m_orderdate"))
        .cast("int")
        .alias("days_since_order"),
    )


@register(
    "j10_range_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('small', 0.0, 50000.0), ('medium', 50000.0, 150000.0),
               ('large', 150000.0, 300000.0), ('jumbo', 300000.0, 1e18)
    )
    SELECT b.band, COUNT(*) AS order_count,
           FLOOR(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5)
               / 100 AS total_price
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY 1
    """,
    doc="Range (interval) join against a tiny interval dim: broadcast "
    "nested-loop with a band predicate — the generic form of the W1/W2 "
    "bucketing operators when bin edges live in a TABLE, not the query. At "
    "scale with a large interval side you'd bucketize the point side onto "
    "interval-aligned keys first (equi-join + residual predicate); here the "
    "dim is 4 rows, so the broadcast NLJ never shuffles the fact side.",
)
def j10_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bands = orders.sparkSession.createDataFrame(
        [
            ("small", 0.0, 50_000.0),
            ("medium", 50_000.0, 150_000.0),
            ("large", 150_000.0, 300_000.0),
            ("jumbo", 300_000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            exact_sum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "sk_hll_user_reach",
    oracle=None,  # sketch estimates are engine-specific: rows-only check
    doc="Mergeable distinct-count sketches: per-event-type user reach via "
    "HLL sketch aggregate, plus the re-aggregated ALL row from "
    "hll_union_agg over the per-type sketches — the sketch (not the raw "
    "keys) crosses the second aggregation, which is the whole point at "
    "100 TB: partial sketches merge map-side, the exchange carries KB-sized "
    "binaries, and stored sketches can be re-rolled to any grouping without "
    "rescanning. Exact countDistinct alongside documents the estimate "
    "error. Rows-only check (HLL implementations differ across engines).",
)
def sk_hll_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "exact_users",
    )
    overall = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("exact_users").alias("exact_users"),  # upper bound, not exact
    ).select(F.lit("ALL").alias("event_type"), "approx_users", "exact_users")
    return typed.unionByName(overall)


@register(
    "sk_approx_quantiles",
    oracle=None,  # sketch estimates are merge-order dependent: rows-only check
    doc="Approximate quantiles per group via percentile_approx "
    "(Greenwald-Khanna summaries, accuracy=10000 => rank error <= n/10000) "
    "with the exact interpolated percentiles alongside to document the "
    "estimate error. The sketch is the 100 TB path: partial summaries are "
    "KB-sized, merge map-side, and the exchange never carries raw values — "
    "exact percentile needs the whole group materialized per key. "
    "Rows-only check (summary merge order is partitioning-dependent); the "
    "rank-error bound is asserted in tests/test_sketches.py.",
)
def sk_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.percentile_approx(price, 0.5, 10000).alias("approx_p50"),
        F.percentile_approx(price, 0.95, 10000).alias("approx_p95"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"),
    )


def cms_frequency_estimates(
    items: DataFrame,
    *,
    item_col: str = "t",
    depth: int = 4,
    width: int = 1024,
    top_n: int = 20,
) -> DataFrame:
    """Count-Min Sketch frequency table + estimates for the ``top_n`` most
    frequent items: depth x width counters over md5-portable hashes, one
    map-side-combinable shuffle of ``depth`` rows per occurrence,
    estimate = min over rows. CMS never underestimates; the overcount
    column is the collision error the chosen width buys
    (tests/test_llmops_algos.py forces collisions at a tiny width to
    exercise the min-over-rows logic the corpus vocabulary never hits).
    Returns (token, exact_n, cms_estimate, overcount)."""
    from ecommerce_etl_pipeline_spark.llmops.splits import hash_uint32

    tok = items.select(F.col(item_col).alias("t"))

    def bucket(t: F.Column, d: int) -> F.Column:
        return F.pmod(hash_uint32(t, f"cms:{d}:"), F.lit(width))

    def melt(df: DataFrame, keep: list[str]) -> DataFrame:
        return df.select(
            *keep,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"), bucket(F.col("t"), d).alias("bucket")
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("h"),
        ).select(*keep, "h.d", "h.bucket")

    cms = melt(tok, ["t"]).groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
    exact_top = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "t")
        .limit(top_n)
    )
    probes = melt(exact_top, ["t", "exact_n"])
    return (
        cms.join(F.broadcast(probes), ["d", "bucket"])
        .groupBy(F.col("t").alias("token"), "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "token",
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_n")).alias("overcount"),
        )
    )


@register(
    "sk_cms_token_counts",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    hashed AS (
        SELECT t, d,
               CAST(('0x' || substr(md5('cms:' || CAST(d AS VARCHAR) || ':' || t), 1, 8))
                    AS BIGINT) % 1024 AS bucket
        FROM tok CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d)
    ),
    cms AS (
        SELECT d, bucket, COUNT(*) AS c FROM hashed GROUP BY d, bucket
    ),
    exact_top AS (
        SELECT t, COUNT(*) AS exact_n FROM tok GROUP BY t
        ORDER BY exact_n DESC, t LIMIT 20
    ),
    probes AS (
        SELECT e.t, e.exact_n,
               CAST(('0x' || substr(md5('cms:' || CAST(d.d AS VARCHAR) || ':' || e.t), 1, 8))
                    AS BIGINT) % 1024 AS bucket, d.d
        FROM exact_top e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d) d
    )
    SELECT p.t AS token, p.exact_n,
           CAST(MIN(cms.c) AS BIGINT) AS cms_estimate,
           CAST(MIN(cms.c) - p.exact_n AS BIGINT) AS overcount
    FROM probes p JOIN cms ON cms.d = p.d AND cms.bucket = p.bucket
    GROUP BY p.t, p.exact_n
    """,
    doc="Count-Min Sketch frequency estimation, fully ORACLE-CHECKED "
    "(unlike the HLL/GK sketches, whose estimators are library-internal): "
    "a 4x1024 counter table over md5-PORTABLE hashes — the sketch is an "
    "aggregated DataFrame, built with one map-side-combinable shuffle of "
    "4 rows per token and mergeable across corpora by cell-wise "
    "addition. Estimates (min over the 4 rows) are exact integers, so "
    "DuckDB reproduces every cell and every estimate bit-for-bit; "
    "CMS never underestimates, and the overcount column shows the "
    "collision error the 1024-bucket width buys at this vocabulary size.",
)
def sk_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.llmops.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("t"))
    return cms_frequency_estimates(tok, depth=4, width=1024, top_n=20)
