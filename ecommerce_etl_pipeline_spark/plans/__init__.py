"""Query-plan registry package.

Importing this package registers every named query (side-effect imports
below). ``__spark_entry__.py`` re-exports :func:`all_queries` /
:func:`all_oracles` for the driver.
"""

from ecommerce_etl_pipeline_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_oracles,
    all_queries,
    get,
    register,
)

# Side-effect imports: each module registers its queries on import.
from ecommerce_etl_pipeline_spark.plans import aggregates  # noqa: F401,E402

_MODULES = [aggregates]

for _optional in (
    "filters",
    "joins",
    "nested",
    "windows",
    "setops",
    "sampling",
    "llmops_queries",
    "extended",
    "temporal",
):
    try:
        _MODULES.append(
            __import__(
                f"ecommerce_etl_pipeline_spark.plans.{_optional}", fromlist=[_optional]
            )
        )
    except ModuleNotFoundError:
        pass

# ---------------------------------------------------------------------------
# Driver-window curation. The correctness driver verifies the FIRST 50
# registered queries (in dict insertion order). Round 1 proved the classic
# §2 families; round 2 promoted the LLM-data-pipeline surface. Round 3
# retires the never-verified tail: the 10 oracle-backed and 15 rows-only
# queries that never had a driver CORRECTNESS row across r1/r2, plus the
# 17 operators NEW this round (PNG decode, chunking, shard manifest,
# quality logit, k-means step/train, random projection + rerank,
# weighted sampling, span excision, SemDeDup, dataset card, CDC merge,
# vocab encoding, source scorecard, label centroids, funnel) and 8
# flex slots (late-round-3 operators, changed implementations, and one
# rotated-back green). Every pre-round-3 query except j11 already has
# >=1 driver row across r1/r2; after r3 the new operators do too.
# ROUND-4 ROTATION QUEUE (registered after this window filled; all green
# in the local dual-scale sweep + determinism audit, awaiting their
# first driver row): txt_bpe_merges, a26_rfm_segments,
# j12_association_rules, g1_pagerank_copurchase,
# w14_last_touch_attribution, u6_snapshot_diff, dq_psi_drift,
# sk_cms_token_counts, sm10_epoch_shuffle, a27_pareto_revenue. Names
# listed here but not (yet) registered are skipped harmlessly;
# everything not listed keeps its original relative order after the
# curated block.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW = [
    # -- 10 oracle-backed queries never driver-checked in r1/r2
    "dd_dedup_summary",
    "sm6_mixture_sample",
    "txt_char_entropy",
    "txt_fingerprints",
    "txt_freq_spectrum",
    "mm_frame_sample",
    "a19_collect_sorted",
    "a25_price_histogram",
    "sc_string_functions",
    "sc_date_arithmetic",
    # -- 15 rows-only queries never driver-checked in r1/r2
    "dd_curation_minhash",
    "dd_dup_clusters",
    "dd_minhash_pairs",
    "dd_simhash_pairs",
    "sim_cosine_topk_arrow",
    "sim_ivf_recall",
    "sim_ivf_topk",
    "sim_lsh_topk",
    "sk_approx_quantiles",
    "sk_hll_user_reach",
    "sm1_seeded_sample",
    "sm2_exact_n_sample",
    "sm3_ri_cascade_sample",
    "sm4_generated_transactions",
    "txt_compression_ratio",
    # -- 17 new round-3 operators (16 oracle-backed + 1 rows-only trainer)
    "mm_png_decode",
    "txt_chunk_overlap",
    "txt_shard_manifest",
    "txt_quality_logit",
    "ml_kmeans_step",
    "ml_kmeans_train",
    "sim_rp_topk",
    "sm8_weighted_sample",
    "dd_span_excision",
    "dd_semantic_dedup",
    "txt_dataset_card",
    "sim_rp_rerank",
    "u5_cdc_merge",
    "txt_vocab_encode",
    "txt_source_scorecard",
    "sim_label_centroids",
    "w12_funnel_conversion",
    # -- 8 flex slots: the 5 operators added late in round 3, plus
    # j11 (its bloom hashing changed this round and it never had a
    # driver row — its build side is empty at sf0.01, so the row
    # certifies the probe path), the source-overlap matrix, and the
    # Gopher repetition battery (both added after the first window
    # curation). Queries with existing r1/r2 rows (dd_curation_pipeline,
    # sim_lsh_recall) yield their slots to the never-checked ones; the
    # changed lsh/assignment implementations are locally re-verified at
    # both scales (CORRECTNESS_LOCAL_SF01.md)
    "dd_bloom_decontam",
    "sm9_importance_resample",
    "sim_hard_negatives",
    "sim_knn_label_audit",
    "w13_retention_cohorts",
    "j11_bloom_pruned_join",
    "dd_source_overlap",
    "txt_repetition_battery",
]


def _curate_window() -> None:
    from ecommerce_etl_pipeline_spark.plans.registry import _REGISTRY

    promoted = {n: _REGISTRY[n] for n in _DRIVER_WINDOW if n in _REGISTRY}
    rest = {n: s for n, s in _REGISTRY.items() if n not in promoted}
    _REGISTRY.clear()
    _REGISTRY.update(promoted)
    _REGISTRY.update(rest)


_curate_window()
