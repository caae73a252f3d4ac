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
    # round 2: de-broadcast fact-scaled joins
    "revenue_by_region",
    "tpch_q5_local_supplier",
    "top_revenue_customers",
    "revenue_percentiles",
    # round 2: new approx variant (rows-only check)
    "revenue_percentiles_approx",
    # round 2: fused multi-distinct aggregation
    "hourly_kpis",
    # round 2: asof seq_col + sessionizer chunk-sort fixes
    "asof_join_signup",
    # round 1 driver hash-fails, now cast fixed — must re-verify
    "train_val_split",
    "lang_distribution",
    # round 2: new operators — first external check
    "dedup_clusters",
    "dedup_canonical",
    "range_join_windows",
    "unpivot_metrics",
    "fuzzy_name_pairs",
    "similarity_topk_ivf_kmeans",
    "pii_redaction",
    "quality_filter",
    "training_corpus",
    "tpch_q19_disjunctive",
    "tpch_q21_waiting_supplier",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q13_order_distribution",
    "tpch_q16_supplier_counts",
    "tpch_q20_dominant_supplier",
    "doc_chunks",
    "repetition_stats",
    "contamination_check",
    "unigram_commonness",
    "embedding_centroids",
    "scan_xml_roundtrip",
    "scan_binary_ingest",
    "domain_mixture",
    "tfidf_top_terms",
    "ref_pipeline_genre_kpis",
    "pack_sequences",
    "dedup_clusters_twophase",
    "salted_skew_count",
    "bucketed_join_revenue",
    "domain_top_docs",
    "scd2_user_state",
    # round 2b: CDC / time-series / profiling / LLM-dedup additions
    "snapshot_diff",
    "locf_fill",
    "profile_table",
    "duplicate_spans",
    "semdedup",
    "continuous_aggregate",
]
assert all(k in REGISTRY for k in _PRIORITY), "stale _PRIORITY key"
REGISTRY = {
    **{k: REGISTRY[k] for k in _PRIORITY},
    **{k: v for k, v in REGISTRY.items() if k not in _PRIORITY},
}
