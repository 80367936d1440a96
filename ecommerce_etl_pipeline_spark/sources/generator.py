"""Distributed synthetic-event generator — SURVEY.md §2.10 SM4 / §2.8 N5.

The reference generates click/transaction batches with a single-process
Python loop (data_generator.py:83-111: uuid4, random.choice ladders,
json.dumps). Here the generator IS a DataFrame: ``spark.range(n)`` fans out
across the cluster and every derived column is a seeded ``rand()``
expression, so generating 10^12 rows is the same program as 10^3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ["HOMEPAGE", "SEARCH", "ITEM_DETAIL", "ADD_TO_CART", "CHECKOUT"]
PAYMENT_METHODS = ["Credit Card", "Debit Card", "OVO", "Gopay"]
SEARCH_TERMS = ["shirt", "shoes", "pants", "dress"]


def _pick(options: list[str], r: F.Column) -> F.Column:
    """Seeded uniform pick from a literal list (rand -> when ladder)."""
    n = len(options)
    expr = F.when(r < 1 / n, F.lit(options[0]))
    for i in range(1, n - 1):
        expr = expr.when(r < (i + 1) / n, F.lit(options[i]))
    return expr.otherwise(F.lit(options[-1]))


def generate_clicks(
    spark: SparkSession,
    n: int,
    *,
    n_users: int = 1000,
    seed: int = 42,
    start: str = "2024-01-01",
) -> DataFrame:
    """Synthetic clickstream (reference data_generator.py:26-50): uuid event
    ids, seeded event-type/traffic-source picks, per-type variant JSON
    metadata rendered with to_json (N5)."""
    base = spark.range(n).select(
        F.col("id").alias("seq"),
        F.expr("uuid()").alias("event_id"),
        F.floor(F.rand(seed) * n_users).cast("bigint").alias("user_id"),
        _pick(EVENT_TYPES, F.rand(seed + 1)).alias("event_name"),
        _pick(["mobile", "web"], F.rand(seed + 2)).alias("traffic_source"),
        (
            F.to_timestamp(F.lit(start))
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.rand(seed + 3) * 86400 * 30)
        ).alias("event_time"),
        _pick(SEARCH_TERMS, F.rand(seed + 4)).alias("_term"),
        F.floor(F.rand(seed + 5) * 44000).cast("bigint").alias("_pid"),
    )
    meta = (
        F.when(
            F.col("event_name") == "SEARCH",
            F.to_json(F.struct(F.col("_term").alias("search_keywords"))),
        )
        .when(
            F.col("event_name").isin("ITEM_DETAIL", "ADD_TO_CART"),
            F.to_json(F.struct(F.col("_pid").alias("product_id"))),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return base.select(
        "event_id", "user_id", "event_name", "traffic_source", "event_time",
        meta.alias("event_metadata"),
    )


def generate_transactions(
    spark: SparkSession,
    n: int,
    *,
    n_customers: int = 1000,
    seed: int = 42,
    start: str = "2024-01-01",
) -> DataFrame:
    """Synthetic transactions with a JSON array-of-struct product_metadata
    column (reference data_generator.py:52-81): 1-3 items, qty 1-3, price
    50k-500k, rendered via transform + to_json — the raw shape the nested
    operators (N1-N4) consume."""
    base = spark.range(n).select(
        F.expr("uuid()").alias("booking_id"),
        F.floor(F.rand(seed) * n_customers).cast("bigint").alias("customer_id"),
        F.expr("uuid()").alias("session_id"),
        _pick(PAYMENT_METHODS, F.rand(seed + 1)).alias("payment_method"),
        (
            F.to_timestamp(F.lit(start))
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.rand(seed + 2) * 86400 * 30)
        ).alias("created_at"),
        (F.floor(F.rand(seed + 3) * 3) + 1).cast("int").alias("_n_items"),
        F.col("id").alias("_seq"),
    )
    items = F.transform(
        F.sequence(F.lit(1), F.col("_n_items")),
        lambda i: F.struct(
            F.floor(F.rand(seed + 4) * 44000).cast("bigint").alias("product_id"),
            (F.floor(F.rand(seed + 5) * 3) + 1).cast("int").alias("quantity"),
            (F.floor(F.rand(seed + 6) * 450000) + 50000).cast("bigint").alias("item_price"),
        ),
    )
    return base.select(
        "booking_id",
        "customer_id",
        "session_id",
        "payment_method",
        "created_at",
        F.to_json(items).alias("product_metadata"),
    )
