"""The composed query registry: core reference-surface queries +
extension ops + deeper analytics, one dict for ``__spark_entry__``.

Importing THIS module (never the sub-registries' merge side effects)
keeps the module graph acyclic: each query module only imports
helpers, and composition happens here.
"""

from __future__ import annotations

from .analytics_queries import REGISTRY_ANALYTICS
from .extension_queries import REGISTRY_EXT
from .testdata_queries import REGISTRY as REGISTRY_CORE
from .tpch_queries import REGISTRY_TPCH

REGISTRY: dict = {}
REGISTRY.update(REGISTRY_CORE)
REGISTRY.update(REGISTRY_EXT)
REGISTRY.update(REGISTRY_ANALYTICS)
REGISTRY.update(REGISTRY_TPCH)

# The driver's correctness gate checks the FIRST 50 registry keys, so
# ordering is load-bearing: queries whose plans changed this round are
# promoted to the front (maximum external verification), long-stable
# queries ride in the tail, which stays covered by
# scripts/selfcheck.py (cell-exact, all keys). Keep this list in sync
# with the round's riskiest changes; BUILD_NOTES.md records which keys
# the driver did not see.
_PRIORITY: list[str] = [
    # VERDICT r01 action items — MUST stay inside the driver's first-50
    # window: the two oracle-cast hash-fail fixes and the four
    # de-broadcast fact-scaled-join queries
    "train_val_split",
    "lang_distribution",
    "revenue_by_region",
    "tpch_q5_local_supplier",
    "top_revenue_customers",
    "revenue_percentiles",
    # round 6: brand-new queries — first external check
    "dedup_containment",
    "rfm_segmentation",
    "basket_affinity_lift",
    "funnel_time_to_step",
    "stickiness_ratios",
    "new_vs_returning",
    "ma_crossover",
    "pareto_concentration",
    "psi_drift",
    "winsorized_stats",
    "benford_audit",
    "gaps_and_islands",
    "cumulative_unique_users",
    "ratio_to_report",
    "lsh_quality",
    "quality_weighted_sample",
    "domain_mixture_temperature",
    "bag_set_ops",
    "triangle_count",
    "check_unique",
    "collation_group",
    "null_safe_join_counts",
    "second_highest_daily",
    "scan_python_datasource",
    "recursive_cte_reach",
    "multi_band_single_scan",
    "scd2_asof_lookup",
    "top_event_paths",
    "chi_square_independence",
    "bm25_search",
    "full_outer_reconciliation",
    "histogram_bins",
    "copurchase_reach",
    "ewma_daily_revenue",
    "peak_concurrency",
    "robust_anomalies",
    "ab_test_zscores",
    "asof_join_forward",
    "ann_recall",
    # round 5: brand-new queries — first external check
    "sessionize_native",
    "daily_anomalies",
    "gapfill_daily",
    "hopping_windows",
    "hopping_windows_approx",
    "cohort_retention",
    "time_weighted_value",
    "event_transitions",
    "copurchase_pairs",
    "pseudonymize_users",
    "k_anonymity",
    "sample_per_key",
    "revenue_trend",
    "pagerank_copurchase",
    "entity_resolution",
    # round 4: brand-new queries — first external check
    "quantile_sketch_rollup",
    "cms_frequency",
    "funnel_conversion",
    "variant_props_stats",
    "lateral_top_orders",
    "zorder_values",
    "key_skew_profile",
    "corpus_shuffle",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    # round 4: MinHash index rewrite (hashed shingles) — re-verify the
    # whole family whose verify stage / oracle changed
    "dedup_minhash",
    "dedup_clusters",
    "dedup_clusters_twophase",
    "dedup_canonical",
    "training_corpus",
    # round 4: events.parquet reader changed (ts physical type) —
    # re-verify every events-backed query
    "hourly_kpis",
    "sessionize_events",
    "daily_active_users",
    "event_interarrival",
    "customer_retention",
    "rolling_7day_revenue",
    "asof_join_signup",
    "range_join_windows",
    # round 2-3 additions that have had exactly one external check
    "revenue_percentiles_approx",
    "snapshot_diff",
    "locf_fill",
    "profile_table",
    "duplicate_spans",
    "semdedup",
    "continuous_aggregate",
    "scd2_user_state",
    "salted_skew_count",
    "bucketed_join_revenue",
    "domain_top_docs",
    "pack_sequences",
    "ref_pipeline_genre_kpis",
    "unpivot_metrics",
    "fuzzy_name_pairs",
    "similarity_topk_ivf_kmeans",
    "pii_redaction",
    "quality_filter",
    "doc_chunks",
    "repetition_stats",
    "contamination_check",
    "unigram_commonness",
    "embedding_centroids",
    "scan_xml_roundtrip",
    "scan_binary_ingest",
    "domain_mixture",
    "tfidf_top_terms",
]
assert all(k in REGISTRY for k in _PRIORITY), "stale _PRIORITY key"
REGISTRY = {
    **{k: REGISTRY[k] for k in _PRIORITY},
    **{k: v for k, v in REGISTRY.items() if k not in _PRIORITY},
}
