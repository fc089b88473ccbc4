"""Query-plan inventory. Importing this package registers every query
module into the shared registry."""

from .queries import (
    QuerySpec,
    all_oracles,
    all_queries,
    bench_queries,
    promote,
    registry,
)

# registration side-effects (each module adds its queries to the registry)
from . import flow_queries as _flow_queries  # noqa: F401, E402
from . import event_queries as _event_queries  # noqa: F401, E402
from . import extension_queries as _extension_queries  # noqa: F401, E402
from . import corpus_queries as _corpus_queries  # noqa: F401, E402
from . import tpch_queries as _tpch_queries  # noqa: F401, E402

# Driver-coverage rotation: the correctness driver verifies only the first
# 50 registry entries each round.  Round 1 proved entries 1-50 (relational
# core, flows, events, dedup); promote the 30 names that had no driver row
# (similarity / text / multimodal / sampling / TF-IDF / k-means and TPC-H
# q7-q22) so round 2's window covers them, with 20 already-proven names
# filling the remainder.
promote([
    # round-2 additions (no driver row yet) first
    "corpus_curation_funnel",
    "text_dupngram_fraction",
    "pii_scan_stats",
    "corpus_vocab_topk",
    "doc_length_deciles",
    "bigram_pmi_top",
    "doc_packing_stats",
    "flows_site_traffic",
    "events_funnel_pairs",
    "matview_flows_rollup",
    "text_repetition_stats",
    "text_denylist_scrub",
    "text_bigram_logprob",
    "orders_asof_next_event",
    "stratified_sample_per_source",
    "embedding_quantize_error",
    "similarity_topk_bruteforce",
    "similarity_ivf_ann",
    "similarity_lsh_ann",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "ch_dialect_sampler_profile",
    "flows_protocol_pivot",
    "decontamination_stats",
    "text_word_entropy",
    "flows_protocol_unpivot",
    "flows_private_traffic_matrix",
    "text_quality_stats",
    "text_langid",
    "text_token_counts",
    "doc_fingerprint_dups",
    "multimodal_features",
    "multimodal_blob_schema",
    "corpus_quality_filter",
    "dataset_split_counts",
    "deterministic_sample_stats",
    "top_terms_tfidf",
    "embedding_label_centroids",
    "kmeans_refined_cells",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q9_product_profit",
    "grouping_sets_revenue",
    # q11_important_stock, q16_parts_supplier_relationship and
    # q20_promotion_suppliers rotate
    # to the next round: the window holds 50 and the round-2 additions
    # above take precedence (both stay green in the local oracle rerun
    # meanwhile)
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
