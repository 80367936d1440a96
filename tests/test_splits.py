"""Semantic invariants of the deterministic corpus-partitioning operators
(llmops/splits.py): split stability under corpus growth, pack tiling, exact
stratified counts. Oracle parity is covered by test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_etl_pipeline_spark.llmops import splits


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_split_fractions_and_stability(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    assigned = splits.assign_splits(docs, "doc_id", weights)
    counts = {r["split"]: r["n"] for r in assigned.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == docs.count()
    # md5 is uniform: each observed fraction within ±0.1 of its weight
    for name, w in weights.items():
        assert abs(counts.get(name, 0) / n - w) < 0.1, (name, counts)

    # growth stability: assignment on a subset equals the full-corpus
    # assignment restricted to that subset (per-row purity)
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub_assigned = splits.assign_splits(subset, "doc_id", weights)
    full = {r["doc_id"]: r["split"] for r in assigned.collect()}
    for r in sub_assigned.collect():
        assert full[r["doc_id"]] == r["split"]


def test_split_salt_changes_assignment(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    weights = {"train": 0.5, "test": 0.5}
    a = splits.assign_splits(docs, "doc_id", weights, salt="a")
    b = splits.assign_splits(docs, "doc_id", weights, salt="b")
    moved = (
        a.select("doc_id", "split")
        .join(b.select("doc_id", F.col("split").alias("split_b")), "doc_id")
        .filter(F.col("split") != F.col("split_b"))
        .count()
    )
    assert moved > 0


def test_pack_sequences_tiles_token_stream(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    budget = 128
    packed = splits.pack_sequences(docs, budget=budget, n_shards=4)
    rows = packed.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["pack_offset"] < budget
        assert r["pack_id"] >= 0
    # within each shard, documents tile the token stream with no gaps:
    # global start offsets (pack_id*budget + pack_offset) are exactly the
    # running sum of preceding docs' token counts
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: (r["pack_id"], r["pack_offset"]))
        expected_start = 0
        for r in shard_rows:
            assert r["pack_id"] * budget + r["pack_offset"] == expected_start
            expected_start += r["n_tokens"]


def test_stratified_exact_counts_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n = 5
    sample = splits.stratified_exact_sample(docs, "lang", n)
    per = {r["lang"]: r["c"] for r in sample.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    sizes = {r["lang"]: r["c"] for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    for lang, size in sizes.items():
        assert per.get(lang, 0) == min(n, size)
    # replayable: same rows both runs
    again = splits.stratified_exact_sample(docs, "lang", n)
    assert sorted(r["doc_id"] for r in sample.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_mixture_quotas_largest_remainder():
    from ecommerce_etl_pipeline_spark.llmops.splits import mixture_quotas

    q = mixture_quotas({"a": 0.5, "b": 0.3, "c": 0.2}, 100)
    assert q == {"a": 50, "b": 30, "c": 20}
    # remainders: 33.4/33.3/33.3 -> one extra seat to the largest fraction
    q = mixture_quotas({"a": 0.334, "b": 0.333, "c": 0.333}, 100)
    assert sum(q.values()) == 100 and q["a"] == 34


def test_mixture_sample_respects_quotas_and_determinism(spark, sf_dir):
    from ecommerce_etl_pipeline_spark.llmops.splits import mixture_sample
    from ecommerce_etl_pipeline_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 0.6, "src1": 0.4}
    a = mixture_sample(docs, weights, total_n=20)
    counts = {r.source: r.cnt for r in a.groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts == {"src0": 12, "src1": 8}
    # replayable: identical draw on a second evaluation
    b = mixture_sample(docs, weights, total_n=20)
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())


def test_mixture_quotas_validates_weights():
    import pytest

    from ecommerce_etl_pipeline_spark.llmops.splits import mixture_quotas

    with pytest.raises(ValueError, match="sum to 1"):
        mixture_quotas({"a": 0.7, "b": 0.7}, 100)
    with pytest.raises(ValueError, match="non-negative"):
        mixture_quotas({"a": 1.5, "b": -0.5}, 100)


def test_temperature_weights_properties():
    from ecommerce_etl_pipeline_spark.llmops.splits import (
        mixture_quotas,
        temperature_weights,
    )

    counts = {"big": 900, "mid": 90, "small": 10}
    w_nat = temperature_weights(counts, alpha=1.0)
    assert abs(w_nat["big"] - 0.9) < 1e-12  # alpha=1 is natural proportions
    w_uni = temperature_weights(counts, alpha=0.0)
    assert abs(w_uni["small"] - 1 / 3) < 1e-12  # alpha=0 is uniform
    w_half = temperature_weights(counts, alpha=0.5)
    # 0 < alpha < 1 up-samples small sources relative to natural share
    assert w_nat["small"] < w_half["small"] < w_uni["small"]
    # weights feed straight into quotas and sum exactly to total_n
    assert sum(mixture_quotas(w_half, 200).values()) == 200


def test_incremental_dedup_classification(spark):
    from pyspark.sql import functions as F

    from ecommerce_etl_pipeline_spark.llmops.dedup import incremental_dedup

    index = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # exact copy of 1
            (11, "one two three four six"),          # near-dup of 2 (4/6 shingles? jaccard via 3-shingles)
            (12, "totally different words here now"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in incremental_dedup(index, batch, hashed=False, threshold=0.4).collect()
    }
    assert out[10] == ("exact_dup", 1)
    assert out[11] == ("near_dup", 2)
    assert out[12] == ("kept", None)
