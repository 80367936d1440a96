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
# started the standing staleness rotation. Round 7 (this list; entering
# cert histogram r6:50/r5:45/r4:41/r3-oracle:11 + 7 rows-only + 3
# queued): the r6-queued trio, the NEW r7 holdout query, 1 re-cert for
# r7-touched code, the 11 oracle-backed r3-latest certs (exactly age 3),
# and 34 of the 41 r4-latest; the 7 deferred r4 certs (all BENCH
# headliners) lead r8 together with the r5 set as it ages. Honest
# steady-state arithmetic: 151 oracle-backed queries vs 50 slots/round,
# of which new-query promotions and touched-code re-certs also claim
# slots (5 this round) — so the staleness tail runs at age <= 4, not
# <= 3, whenever a round spends slots on new work; the deferral choice
# above always parks the excess on BENCH-covered queries, which carry
# bench + dual-scale sweep signal every round while they wait.
# RULE (caught by the r4 self-review): any NEW query
# registered in a future round MUST be added to this list (or queued
# with a comment) or it silently gets no driver row. Names listed here
# but not (yet) registered are skipped harmlessly; everything not listed
# keeps its original relative order after the curated block.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW = [
    # -- round-6 trio, registered after r6's window rotated (r6 VERDICT
    # brief #1: these MUST lead r7) + the NEW r7 query (window rule:
    # new query => window slot)
    "ml_logreg_train",
    "ml_logreg_eval",
    "dd_curation_ppjoin",
    "ml_logreg_holdout",
    # -- round-7-touched re-certification: jaccard_similarity_join's
    # max_df branch now caches the inverted index (ADVICE r6 #3) and the
    # logreg oracle widened its gradient sums to HUGEINT with the n=0
    # guard (ADVICE r6 #1/#2) — the two train/eval certs above cover the
    # oracle change; this covers the cache change on the capped branch
    "dd_jaccard_df_capped",
    # -- the 11 oracle-backed round-3-latest certs (exactly age 3 —
    # the other 7 r3-latest are the rows-only set that stays out of
    # windows by design: sk_hll, sk_approx, sim_ivf_recall/topk,
    # sim_cosine_topk_arrow, sm4_generated_transactions,
    # txt_compression_ratio — pytest parity/error-bound gated instead)
    "sc_string_functions",
    "sim_knn_label_audit",
    "sim_label_centroids",
    "sim_rp_topk",
    "txt_char_entropy",
    "txt_fingerprints",
    "txt_freq_spectrum",
    "txt_repetition_battery",
    "txt_shard_manifest",
    "txt_source_scorecard",
    "txt_vocab_encode",
    # -- 34 of the 41 round-4-latest certs (age 2 -> re-certed before
    # they hit the age-3 boundary). The 7 deferred to lead r8 are
    # exactly the BENCH headline set (a1_daily_sales, a4_customer_ltv,
    # a8_pricing_summary, j1_order_lineitem_join, j9_asof_join,
    # w4_sessionize, w7_moving_avg_7d): they run every round in bench +
    # the local dual-scale sweep, so they carry the strongest
    # non-driver signal while waiting. Steady state: 151 oracle-backed
    # queries / 50 slots ~= age <= 3 for everything.
    "a22_cube",
    "a26_rfm_segments",
    "a27_pareto_revenue",
    "dd_exact_dedup",
    "dq_psi_drift",
    "j11_bloom_pruned_join",
    "j12_association_rules",
    "j2_customer_geo_broadcast",
    "j4_pair_names_lookup",
    "j6_semi_cascade",
    "n1_json_scalar_extract",
    "n2_hof_array_aggregate",
    "n4_pair_expansion_hof",
    "o1_global_topk",
    "p1_projection_filter",
    "p7_lossy_cast",
    "sc_age_tenure_segments",
    "sc_market_position",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sk_cms_token_counts",
    "sm10_epoch_shuffle",
    "sm1_seeded_sample",
    "sm2_exact_n_sample",
    "sm3_ri_cascade_sample",
    "sql_grouping_sets",
    "txt_quality_scores",
    "u1_union_chunks",
    "u4_unpivot",
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
