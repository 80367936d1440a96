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
# §2 families; round 2 promoted the LLM-data-pipeline surface; round 3
# retired the never-verified tail; round 4 closed the coverage bar (every
# registered query has >=1 driver row across r1-r4). Round 5 rotates by
# STALENESS, per the r4 brief: (a) every query whose semantics or shared
# helpers changed in round 5 — the shingle builder (zip_with rewrite),
# explode_nonnull, the MinHash aggregate-form signature, the SimHash
# multi-block banding + NULL-text oracle fix, the PageRank venue pick,
# the kmeans division-order fix, the BPE persist, and the let1-bound
# chunk/segment HOFs — is re-certified; (b) the remaining slots take the
# queries with the OLDEST driver cert (all 26 whose latest row is r1,
# plus the 3 stalest r2 picks), so after this round no query's latest
# cert is older than 3 rounds. RULE (caught by the r4 self-review): any
# NEW query registered in a future round MUST be added to this list (or
# queued with a comment) or it silently gets no driver row. Names listed
# here but not (yet) registered are skipped harmlessly; everything not
# listed keeps its original relative order after the curated block.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW = [
    # -- 21 round-5-changed queries (re-certification required)
    "dd_simhash_pairs",
    "dd_minhash_pairs",
    "dd_dup_clusters",
    "dd_curation_minhash",
    "dd_curation_pipeline",
    "dd_jaccard_pairs",
    "dd_jaccard_clusters",
    "dd_contamination_report",
    "dd_eval_decontam",
    "dd_incremental_dedup",
    "dd_bloom_decontam",
    "dd_source_overlap",
    "dd_winnow_overlap_pairs",
    "g1_pagerank_copurchase",
    "ml_kmeans_train",
    "txt_bpe_merges",
    "txt_bpe_token_counts",
    "txt_chunk_overlap",
    "txt_sequence_packing",
    "dd_segment_dup_ratio",
    "dd_semantic_dedup",
    # -- all 26 queries whose latest driver cert is round 1
    "a2_priority_analysis",
    "a3_discount_effectiveness",
    "a5_nation_stats",
    "a6_user_behavior",
    "a7_returnflag_performance",
    "a10_product_rollup",
    "a11_brand_price_stats",
    "a12_price_band_performance",
    "a13_type_value_counts",
    "a14_table_profile",
    "a15_event_time_range",
    "a16_rollup_hierarchy",
    "j3_parts_with_sales",
    "j8_customers_without_orders",
    "n3_build_explode_roundtrip",
    "n5_to_json_render",
    "n6_variant_metadata",
    "o3_year_histogram",
    "p6_null_defaults",
    "sc_currency_roundtrip",
    "u2_intersect_keys",
    "u3_except_keys",
    "w5_cumulative_daily_sales",
    "w6_event_gaps",
    "w9_sliding_window",
    "w10_scd2_intervals",
    # -- NOT re-certified here: the round-5 ensure_parallelism widens touch
    # nine registered queries. Three (txt_chunk_overlap,
    # dd_segment_dup_ratio, mm_asset_features) are in this window and get a
    # driver re-cert. The other six (txt_winnow_fingerprints,
    # txt_char_entropy, txt_repetition_battery, txt_bigram_logprob,
    # mm_png_decode, mm_frame_sample) are physical-plan-only — values are
    # partition-order-independent (integer-micro sums, per-row
    # deterministic payloads) — and all were re-proven oracle-exact under a
    # vanilla ANSI session in-round (CORRECTNESS_LOCAL_SF01.md, final-tree
    # 152/152 at both SFs); the window stays on its staleness picks.
    # -- 3 stalest round-2 certs, spanning families (a17_percentiles gave
    # its slot to dd_semantic_dedup when a self-review caught that query's
    # round-5 cache change missing from the re-cert block)
    "j10_range_band_join",
    "sim_lsh_recall",
    "mm_asset_features",
]


def _curate_window() -> None:
    from ecommerce_etl_pipeline_spark.plans.registry import _REGISTRY

    promoted = {n: _REGISTRY[n] for n in _DRIVER_WINDOW if n in _REGISTRY}
    rest = {n: s for n, s in _REGISTRY.items() if n not in promoted}
    _REGISTRY.clear()
    _REGISTRY.update(promoted)
    _REGISTRY.update(rest)


_curate_window()
