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
# 50 registry entries each round.  The r1-r4 windows together proved every
# registered name (union over CORRECTNESS_r1..r4).  Round 5's window, per
# the r4 verdict's staleness ask: (a) queries NEW this round
# (doc_packing_assign, filtered_ann_ivf, filtered_ann_recall); (b) queries
# whose implementation or oracle CHANGED this round — the broadcast-bound
# audit (q17/q20/PMI/TF-IDF/bigram-LM/funnel/windowed-CMS), the salt-fold
# fix (both salted queries), the cluster_pairs checkpoint-release change
# (all three cluster consumers), the weighted-sample oracle fix, and the
# dup_span_coverage signature change — a prior green row does not cover
# changed code; (c) ALL 36 names whose newest green row is still round 2,
# draining the r2-stale pool to zero.  3 + 11 + 36 = 50 exactly.
#
# Changed-but-NOT-windowed (the 50-name cap forces three exclusions, named
# here so the policy stays honest): filtered_ann_topk (body routed through
# the _filtered_eligible helper — result-identical refactor) and
# deterministic_sample_stats / dataset_split_counts (consume the half-up
# _threshold rounding — output-identical for every in-repo fraction).
# All three were re-proven this round against their oracles at sf0.01 on
# a vanilla session (r5 pre-flight) and run in the local differential
# suite at sf0.001; they rotate into the r6 window.
promote([
    # (a) new this round
    "doc_packing_assign",
    "filtered_ann_ivf",
    "filtered_ann_recall",
    # (b) changed this round (not already in the stale pool below)
    "q20_promotion_suppliers",
    "bigram_pmi_top",
    "corpus_curation_funnel",
    "events_windowed_cms",
    "weighted_sample_orders",
    "flows_top_talkers_salted",
    "salted_priority_revenue",
    "dedup_cluster_sizes",
    "embedding_cluster_sizes",
    "leakage_free_split",
    "text_dup_span_coverage",
    # (c) the 36 remaining r2-stale names — pool drained
    "doc_length_deciles",
    "doc_packing_stats",
    "embedding_label_centroids",
    "embedding_neardup_lsh",
    "embedding_neardup_pairs",
    "embedding_quantize_error",
    "flows_private_traffic_matrix",
    "flows_protocol_pivot",
    "flows_protocol_unpivot",
    "grouping_sets_revenue",
    "kmeans_refined_cells",
    "matview_flows_rollup",
    "multimodal_features",
    "pii_scan_stats",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "similarity_ivf_ann",
    "similarity_lsh_ann",
    "similarity_topk_bruteforce",
    "stratified_sample_per_source",
    "text_bigram_logprob",
    "text_denylist_scrub",
    "text_langid",
    "text_quality_stats",
    "text_repetition_stats",
    "text_token_counts",
    "text_word_entropy",
    "top_terms_tfidf",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
