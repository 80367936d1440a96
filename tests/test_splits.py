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
