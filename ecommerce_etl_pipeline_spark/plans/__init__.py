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
# registered queries (in dict insertion order). Rounds 1-4 proved the
# full surface (every registered query has >=1 driver row); round 5
# started the standing staleness rotation. Round 10 (this list; entering
# cert histogram r9:50/r8:48/r7:47/r6:11 + 2 never-certified + 5
# rows-only at r3 which carry no oracle to age): per the r9 VERDICT
# brief #1, the window LEADS with the 13 queued claims — the two
# oracle-backed queries with no driver row yet (txt_perplexity_prune,
# ml_logreg_calibration — registered r9 post-window, the
# ml_logreg_holdout_d64 precedent) and the 11 r6-latest certs at age 4.
# Then the SAME-ROUND registrations (r9 brief #5: 2-3 slots reserved so
# a query registered mid-round gets its driver row in the round that
# introduced it — this list carries them IN the window, not queued):
# dd_curation_classifier_ppjoin (the 100 TB composition pin, r9 brief
# #2), txt_bm25_topk, and sim_mmr_diversify. Then the touched-code
# re-certs: curate() grew
# the classifier_threshold parameter this round (r9 brief #6 — the
# calibration-derived operating point), so all four registered curation
# queries re-certify (their default paths are plan-identical —
# threshold=0.5 builds the same lit(0.5) — but touched-code = re-cert,
# the r9 doctrine). Then 30 of the 47 r7-latest certs.
# The 16 deferred r7 certs (age 4 at r11 — they MUST lead the r11
# window) all carry standing per-round signal while they wait:
# dd_exact_dedup + j4_pair_names_lookup + n2_hof_array_aggregate +
# sim_cosine_topk + txt_quality_scores (BENCH headline + sf1 gate
# bands), dd_jaccard_df_capped (BENCH extended + sf1 band),
# sm1_seeded_sample + sm2_exact_n_sample + sm3_ri_cascade_sample
# (tests/test_sampling.py + scripts/check_determinism.py),
# o1_global_topk (test_plans TakeOrderedAndProject plan gate),
# p1_projection_filter (test_plans PushedFilters plan gate),
# j2_customer_geo_broadcast (test_plans BroadcastHashJoin plan gate),
# j6_semi_cascade (test_plans LeftSemi plan gate),
# j11_bloom_pruned_join (test_plans bloom-prune plan gate),
# u4_unpivot (test_plans unpivot gate),
# sim_lsh_topk (tests/test_similarity_recall.py LSH recall floor +
# L-monotonicity gates over the same lsh_topk operator).
# Honest steady-state arithmetic:
# 161 oracle-backed queries vs 50 slots/round, of which new-query
# promotions and touched-code re-certs also claim slots (7 this round)
# — so the staleness tail runs at age <= 4, not <= 3, whenever a round
# spends slots on new work; the deferral choice above always parks the
# excess on machine-gated queries.
# RULE (caught by the r4 self-review): any NEW query
# registered in a future round MUST be added to this list (or queued
# with a comment) or it silently gets no driver row. Names listed here
# but not (yet) registered are skipped harmlessly; everything not listed
# keeps its original relative order after the curated block.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW = [
    # -- the r9 queue head: the two oracle-backed queries with no driver
    # row yet, then the 11 r6 certs at age 4 (r9 VERDICT brief #1)
    "txt_perplexity_prune",
    "ml_logreg_calibration",
    "dd_span_excision",
    "g1_pagerank_copurchase",
    "ml_kmeans_step",
    "mm_frame_sample",
    "mm_png_decode",
    "sim_rp_rerank",
    "sm5_stratified_sample",
    "sm6_mixture_sample",
    "sm7_temperature_mixture",
    "sm8_weighted_sample",
    "sm9_importance_resample",
    # -- round-10 same-round registrations (r9 brief #5: reserved slots;
    # both registered AND windowed this round)
    "dd_curation_classifier_ppjoin",
    "txt_bm25_topk",
    "sim_mmr_diversify",
    # -- touched-code re-certs: curate() grew classifier_threshold
    "dd_curation_classifier",
    "dd_curation_minhash",
    "dd_curation_pipeline",
    "dd_curation_ppjoin",
    # -- 30 of the 47 round-7-latest certs (age 3 -> re-certed); the 16
    # deferred are listed in the header comment with their standing
    # gates
    "a22_cube",
    "a26_rfm_segments",
    "a27_pareto_revenue",
    "dq_psi_drift",
    "j12_association_rules",
    "n1_json_scalar_extract",
    "n4_pair_expansion_hof",
    "p7_lossy_cast",
    "sc_age_tenure_segments",
    "sc_market_position",
    "sc_string_functions",
    "sim_knn_label_audit",
    "sim_label_centroids",
    "sim_rp_topk",
    "sk_cms_token_counts",
    "sm10_epoch_shuffle",
    "sql_grouping_sets",
    "txt_char_entropy",
    "txt_fingerprints",
    "txt_freq_spectrum",
    "txt_repetition_battery",
    "txt_shard_manifest",
    "txt_source_scorecard",
    "txt_vocab_encode",
    "u1_union_chunks",
    "u6_snapshot_diff",
    "w14_last_touch_attribution",
    "w2_balance_segments",
    "w3_top_orders_per_customer",
    "w8_gapfill_ffill",
]


def _curate_window() -> None:
    from ecommerce_etl_pipeline_spark.plans.registry import _REGISTRY

    promoted = {n: _REGISTRY[n] for n in _DRIVER_WINDOW if n in _REGISTRY}
    rest = {n: s for n, s in _REGISTRY.items() if n not in promoted}
    _REGISTRY.clear()
    _REGISTRY.update(promoted)
    _REGISTRY.update(rest)


_curate_window()
