"""operators/quality.py on dirty in-memory data: the oracle query runs on
clean testdata (all-zero violations), so these prove the rules actually
fire — range/null violations counted, FK orphans found, NULL-counts-as-
violation policy."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.operators import quality


def test_rules_fire_on_dirty_rows(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 200.0)],
        "id bigint, amount double",
    )
    report = quality.check_rules(
        df,
        "t",
        [
            quality.Rule("amount_in_0_100", ~F.col("amount").between(0, 100)),
            quality.Rule("amount_not_null", F.col("amount").isNull()),
        ],
    )
    got = {r["rule"]: (r["n_rows"], r["n_violations"]) for r in report.collect()}
    # -5 out of range, 200 out of range, NULL counts as violation too
    assert got["amount_in_0_100"] == (4, 3)
    assert got["amount_not_null"] == (4, 1)


def test_fk_orphans_counted_once_despite_dup_parent_keys(spark):
    child = spark.createDataFrame([(1,), (1,), (2,), (9,)], "k bigint")
    parent = spark.createDataFrame([(1,), (1,), (2,)], "k bigint")
    row = quality.check_foreign_key(child, "child", "k", parent, "k").collect()[0]
    # duplicate parent pk must not multiply child rows: n_rows stays 4
    assert (row["n_rows"], row["n_violations"]) == (4, 1)


def test_validation_report_rates(spark):
    df = spark.createDataFrame([(1,), (None,)], "v bigint")
    parts = [quality.check_rules(df, "t", [quality.Rule("v_nn", F.col("v").isNull())])]
    row = quality.validation_report(parts).collect()[0]
    assert row["violation_rate"] == 0.5
