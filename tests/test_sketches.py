"""Accuracy gates for sketch-based operators: the estimate must sit inside
the structure's guaranteed error bound, measured against the exact answer."""

from __future__ import annotations

import pyspark.sql.functions as F

from ecommerce_etl_pipeline_spark.plans.registry import get
from ecommerce_etl_pipeline_spark.sources.io import load_table

SF = "/root/testdata/sf0.01"


def test_approx_quantiles_within_rank_error(spark):
    """percentile_approx(accuracy=10000) guarantees rank error <= n/10000;
    verify via the actual rank of each estimate in the sorted group."""
    rows = get("sk_approx_quantiles").fn(spark, SF).collect()
    assert len(rows) > 0
    li = load_table(spark, SF, "lineitem")
    for r in rows:
        grp = li.filter(F.col("l_returnflag") == r["l_returnflag"])
        n = r["n_items"]
        tol = max(1.0, n / 10000) + 1  # rank slack: bound + interpolation edge
        for q, est in ((0.5, r["approx_p50"]), (0.95, r["approx_p95"])):
            rank = grp.filter(F.col("l_extendedprice") <= est).count()
            assert abs(rank - q * n) <= tol, (r["l_returnflag"], q, rank, q * n)


def test_hll_reach_within_relative_error(spark):
    """Spark's HLL default (lgConfigK=12) has ~1.6% standard error; allow
    5 sigma against the exact distinct counts computed alongside."""
    rows = get("sk_hll_user_reach").fn(spark, SF).collect()
    typed = [r for r in rows if r["event_type"] != "ALL"]
    assert typed
    for r in typed:
        rel = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel <= 0.08, (r["event_type"], rel)
