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
# 50 registry entries each round.  After round 7 every registered name is
# driver-green and nothing is staler than r5 (newest-green histogram:
# 50 r5 / 50 r6 / 50 r7, computed from the CORRECTNESS_r1-r7 union).
# Round 8's window, per the r7 verdict item 2:
# (a) the five queries NEW this round — the persisted-PQ probe
#     (pq_index_probe, r7 verdict item 3), the driver-gated persisted
#     SemDeDup (semdedup_persisted, item 5), the composed IVF-PQ
#     serving path (ivfpq_probe), and the incremental appends for both
#     PQ layouts (pq_append_probe, ivfpq_append_probe). New queries
#     MUST take window slots (the r6 lesson: a query registered
#     outside the window has no driver row until the next round);
# (b) 45 of the 50 r5-green names — each (a) entry displaces one fill
#     (displaced: top_terms_tfidf, weighted_sample_orders,
#     doc_length_deciles, doc_packing_stats, text_word_entropy — they
#     keep their r5-green rows and rejoin the rotation FIRST in r9).
# 5 + 45 = 50 exactly; after r8 the stale pool for r9 is the 50
# r6-green names plus the five displaced r5 names (they go FIRST).
#
# Changed-but-NOT-windowed (named so the policy stays honest). The r8
# hardening pass touched code consumed by windowed/green queries:
#   - oracle.py exact big-Decimal canonicalization (r7 advice): affects
#     the COMPARISON of every query; re-proven by the full local
#     differential after the change.
#   - ivf_index_probe private query persist + empty-append guards
#     (plans/storage.py): consumers ivf_index_probe / ivf_append_probe /
#     incremental_dedup_indexed are r7-green and result-identical
#     (probe parity + crawl-loop differentials re-proven locally);
#     their next window is r9 by rotation order.
#   - pq_adc_topk single-query guard + shared pq_lut_row/pq_adc_dist
#     extraction: result-identical (oracle differential re-proven at
#     sf0.001/0.01); pq_index_probe (same arithmetic) IS windowed.
#   - dsir_importance_topk: bucket-count pipeline extracted to
#     _dsir_doc_bucket_counts for the boundary-margin test —
#     plan-identical (same expressions), r7-green, re-proven locally.
#   - late-r8 operator review pass (dedup/sketch/sampling/packing/
#     streaming): hist_quantiles round-before-ceil rank guard
#     (price_quantile_sketch, r6-green), cluster_pairs type-agnostic
#     change-count convergence probe (dedup_cluster_sizes IS windowed;
#     embedding_cluster_sizes r5→windowed too), bigstar self-pair-node
#     fix (dedup_cluster_sizes_bigstar, r7-green), exact_dedup nested-
#     key canonicalization (no registry query uses nested keys), HLL
#     null-safe key joins (events_windowed_hll windowed,
#     hll_distinct_customers uses the sketch relation, unaffected).
#     Every named consumer re-proven on the vanilla sf0.01 contract
#     after the pass; sf0.1 targeted re-soak in the round notes.
promote([
    # (a) new this round — persisted-index serving paths through the gate
    "semdedup_persisted",
    "pq_index_probe",
    "ivfpq_probe",
    "pq_append_probe",
    "ivfpq_append_probe",
    # (b) 45 of the 50 r5-stale names — pool drained minus the five
    #     displaced fills
    "bigram_pmi_top",
    "corpus_curation_funnel",
    "dedup_cluster_sizes",
    "doc_packing_assign",
    "embedding_cluster_sizes",
    "embedding_label_centroids",
    "embedding_neardup_lsh",
    "embedding_neardup_pairs",
    "embedding_quantize_error",
    "events_windowed_cms",
    "filtered_ann_ivf",
    "filtered_ann_recall",
    "flows_private_traffic_matrix",
    "flows_protocol_pivot",
    "flows_protocol_unpivot",
    "flows_top_talkers_salted",
    "grouping_sets_revenue",
    "kmeans_refined_cells",
    "leakage_free_split",
    "matview_flows_rollup",
    "multimodal_features",
    "pii_scan_stats",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q20_promotion_suppliers",
    "q22_global_sales_opportunity",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "salted_priority_revenue",
    "similarity_ivf_ann",
    "similarity_lsh_ann",
    "similarity_topk_bruteforce",
    "stratified_sample_per_source",
    "text_bigram_logprob",
    "text_denylist_scrub",
    "text_dup_span_coverage",
    "text_langid",
    "text_quality_stats",
    "text_repetition_stats",
    "text_token_counts",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
