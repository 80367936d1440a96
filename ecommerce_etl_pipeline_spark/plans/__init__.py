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
# retired the never-verified tail plus its own new operators. Round 4
# closes the coverage bar: the 10 queries registered after the round-3
# window filled get their first driver row, plus round 4's one NEW query
# (after that, EVERY registered query has >=1 driver CORRECTNESS row
# across r1-r4); the queries whose semantics changed this round are
# re-certified (j11's de-vacuated threshold now carries rows; eleven
# queries moved from rows-only to full oracles via engine-portable
# arithmetic; a26/dq_psi edges are now 4dp-rounded; u6 re-keys inserts
# by negation); and the remaining 29 slots rotate back r1/r2-green
# queries spanning every §2 family so the window stays a representative
# regression sweep. Names listed here but not (yet) registered are
# skipped harmlessly; everything not listed keeps its original relative
# order after the curated block.
# ---------------------------------------------------------------------------
_DRIVER_WINDOW = [
    # -- 10 queries awaiting their FIRST driver row (registered after the
    # r3 window filled; plans/__init__.py:54-62 at 421df92 documents the
    # queue). All 10 are now oracle-backed: txt_bpe_merges and
    # g1_pagerank were rows-only when queued, but round 4 attached full
    # oracles to both (unrolled-CTE replays of the iterative loops).
    "txt_bpe_merges",
    "a26_rfm_segments",
    "j12_association_rules",
    "g1_pagerank_copurchase",
    "w14_last_touch_attribution",
    "u6_snapshot_diff",
    "dq_psi_drift",
    "sk_cms_token_counts",
    "sm10_epoch_shuffle",
    "a27_pareto_revenue",
    # -- 1 NEW round-4 query: trained-tokenizer application (registered
    # this round, so it needs its first driver row like the queued 10)
    "txt_bpe_token_counts",
    # -- 10 re-certifications of round-4-changed semantics: j11's
    # de-vacuated threshold, and the 9 queries whose draws/hashes/trainers
    # moved to engine-portable forms with full DuckDB oracles (rows-only
    # before; g1's conversion sits in the queued block above)
    "j11_bloom_pruned_join",
    "dd_minhash_pairs",
    "sm1_seeded_sample",
    "sm2_exact_n_sample",
    "sm3_ri_cascade_sample",
    "dd_simhash_pairs",
    "dd_dup_clusters",
    "dd_curation_minhash",
    "sim_lsh_topk",
    "ml_kmeans_train",
    # -- 29 rotated-back greens spanning every §2 family (all have r1/r2
    # driver hash-matches; unchanged since)
    "a1_daily_sales",
    "a4_customer_ltv",
    "a8_pricing_summary",
    "a22_cube",
    "j1_order_lineitem_join",
    "j2_customer_geo_broadcast",
    "j4_pair_names_lookup",
    "j6_semi_cascade",
    "j9_asof_join",
    "w2_balance_segments",
    "w3_top_orders_per_customer",
    "w4_sessionize",
    "w7_moving_avg_7d",
    "w8_gapfill_ffill",
    "n1_json_scalar_extract",
    "n2_hof_array_aggregate",
    "n4_pair_expansion_hof",
    "u1_union_chunks",
    "u4_unpivot",
    "p1_projection_filter",
    "p7_lossy_cast",
    "o1_global_topk",
    "sc_age_tenure_segments",
    "sc_market_position",
    "sql_grouping_sets",
    "dd_exact_dedup",
    "dd_jaccard_pairs",
    "sim_cosine_topk",
    "txt_quality_scores",
]


def _curate_window() -> None:
    from ecommerce_etl_pipeline_spark.plans.registry import _REGISTRY

    promoted = {n: _REGISTRY[n] for n in _DRIVER_WINDOW if n in _REGISTRY}
    rest = {n: s for n, s in _REGISTRY.items() if n not in promoted}
    _REGISTRY.clear()
    _REGISTRY.update(promoted)
    _REGISTRY.update(rest)


_curate_window()
