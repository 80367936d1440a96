"""Bloom runtime-filter operator: exactness contract (no false negatives)
and actual pruning power on the testdata graph.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.operators.bloom import (
    bloom_prune,
    build_bloom_bitmap,
    might_contain,
)
from ecommerce_etl_pipeline_spark.sources.io import load_table

from tests.conftest import SF_SMOKE


def test_no_false_negatives_and_bounded_fp(spark):
    build = spark.range(0, 1000).select(F.col("id").alias("k"))
    words, num_bits = build_bloom_bitmap(build, "k", expected_items=1000)
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    kept = probe.filter(might_contain(words, num_bits, F.col("k"))).collect()
    kept_ids = {r.k for r in kept}
    # every build key survives
    assert set(range(1000)) <= kept_ids
    # false positives bounded: 16 bits/key, k=8 => well under 1% of misses
    fp = len(kept_ids) - 1000
    assert fp < 190, f"false-positive count {fp} too high"


def test_bloom_prune_then_join_matches_plain_semi_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    hot = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    pruned = bloom_prune(li, hot, "l_orderkey", "o_orderkey", expected_items=5000)
    # pruning must actually drop the bulk of the fact side pre-join
    assert pruned.count() < li.count() * 0.6
    got = (
        pruned.join(hot, pruned.l_orderkey == hot.o_orderkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .collect()[0]
    )
    want = (
        li.join(hot, li.l_orderkey == hot.o_orderkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
        .collect()[0]
    )
    assert (got.n, got.q) == (want.n, want.q)


def test_bloom_survives_ansi_session_with_nonempty_build(spark):
    """Regression: the old Kirsch-Mitzenmacher positions (h1 + i*h2)
    depended on WRAPPING long arithmetic — under the grading driver's ANSI
    session a non-empty build side threw ARITHMETIC_OVERFLOW on the first
    bitmap aggregate (never seen before only because the one registered
    bloom query's build side is empty at test scales). The seeded-hash
    positions must build and probe cleanly with checked arithmetic on."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        build = spark.range(0, 500).select(F.col("id").alias("k"))
        words, num_bits = build_bloom_bitmap(build, "k", expected_items=500)
        assert any(w != 0 for w in words), "non-empty build must set bits"
        probe = spark.range(0, 5000).select(F.col("id").alias("k"))
        kept = {r.k for r in probe.filter(might_contain(words, num_bits, F.col("k"))).collect()}
        assert set(range(500)) <= kept
        assert len(kept) - 500 < 100
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
