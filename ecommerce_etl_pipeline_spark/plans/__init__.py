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
# started the standing staleness rotation. Round 8 (this list; entering
# cert histogram r7:50/r6:49/r5:45/r4:7 + this round's new/touched):
# the 7 age-3 BENCH headliners lead (r7 VERDICT brief #1 — last
# certified r4), then this round's claims — the NEW d=64 classifier
# variant, the two IVF queries upgraded from rows-only to oracle-backed,
# and the three d=5 logreg queries whose training loop was restaged this
# round (projection-staged residual + array-literal weights; same math,
# new plan => re-cert) — then 37 of the 45 r5-latest certs. The 8
# deferred r5 certs all carry standing per-round signal while they wait:
# a10_product_rollup / dd_minhash_pairs (BENCH headline),
# dd_semantic_dedup / dd_bloom_decontam / dd_simhash_pairs /
# txt_chunk_overlap (BENCH extended + sf1 gate), sim_lsh_recall
# (recall>=threshold pytest battery), dd_incremental_dedup (streaming-
# twin pytest parity). Honest steady-state arithmetic: 154 oracle-backed
# queries vs 50 slots/round, of which new-query promotions and
# touched-code re-certs also claim slots (6 this round) — so the
# staleness tail runs at age <= 4, not <= 3, whenever a round spends
# slots on new work; the deferral choice above always parks the excess
# on machine-gated queries.
# RULE (caught by the r4 self-review): any NEW query
# registered in a future round MUST be added to this list (or queued
# with a comment) or it silently gets no driver row. Names listed here
# but not (yet) registered are skipped harmlessly; everything not listed
# keeps its original relative order after the curated block.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW = [
    # -- the 7 BENCH headliners, deferred since r4 and age-3 entering
    # this round (r7 VERDICT "Next round" #1: these MUST lead r8)
    "a1_daily_sales",
    "a4_customer_ltv",
    "a8_pricing_summary",
    "j1_order_lineitem_join",
    "j9_asof_join",
    "w4_sessionize",
    "w7_moving_avg_7d",
    # -- round-8 claims: NEW query (window rule: new query => slot),
    # rows-only -> oracle upgrades (first-ever oracle driver rows), and
    # touched-code re-certs (the restaged GD loop feeds all three).
    # QUEUED for r9 (window full; the r6-trio precedent):
    # ml_logreg_holdout_d64 — registered late in r8, locally
    # oracle-verified at sf0.001+sf0.01, shares the trainer/oracle
    # machinery with the two certified d64/holdout queries; MUST take a
    # slot in the r9 rotation.
    "ml_logreg_train_d64",
    "sim_ivf_topk",
    "sim_ivf_recall",
    "ml_logreg_train",
    "ml_logreg_eval",
    "ml_logreg_holdout",
    # -- 37 of the 45 round-5-latest certs (age 3 -> re-certed); the 8
    # deferred are listed in the header comment with their standing
    # gates. ml_kmeans_train stays in-window: _kmeans_train_oracle_sql
    # was refactored this round onto the shared _kmeans_ctes prefix
    # (same SQL semantics, new text => re-cert with the IVF pair).
    "a11_brand_price_stats",
    "a12_price_band_performance",
    "a13_type_value_counts",
    "a14_table_profile",
    "a15_event_time_range",
    "a16_rollup_hierarchy",
    "a2_priority_analysis",
    "a3_discount_effectiveness",
    "a5_nation_stats",
    "a6_user_behavior",
    "a7_returnflag_performance",
    "dd_curation_minhash",
    "dd_dup_clusters",
    "dd_eval_decontam",
    "dd_segment_dup_ratio",
    "dd_source_overlap",
    "dd_winnow_overlap_pairs",
    "j10_range_band_join",
    "j3_parts_with_sales",
    "j8_customers_without_orders",
    "ml_kmeans_train",
    "mm_asset_features",
    "n3_build_explode_roundtrip",
    "n5_to_json_render",
    "n6_variant_metadata",
    "o3_year_histogram",
    "p6_null_defaults",
    "sc_currency_roundtrip",
    "txt_bpe_merges",
    "txt_bpe_token_counts",
    "txt_sequence_packing",
    "u2_intersect_keys",
    "u3_except_keys",
    "w10_scd2_intervals",
    "w5_cumulative_daily_sales",
    "w6_event_gaps",
    "w9_sliding_window",
]


def _curate_window() -> None:
    from ecommerce_etl_pipeline_spark.plans.registry import _REGISTRY

    promoted = {n: _REGISTRY[n] for n in _DRIVER_WINDOW if n in _REGISTRY}
    rest = {n: s for n, s in _REGISTRY.items() if n not in promoted}
    _REGISTRY.clear()
    _REGISTRY.update(promoted)
    _REGISTRY.update(rest)


_curate_window()
