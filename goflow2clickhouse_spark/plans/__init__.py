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
# 50 registry entries each round.  After round 8 every registered name is
# driver-green (newest-green histogram: 5 r5 / 50 r6 / 50 r7 / 50 r8,
# computed from the CORRECTNESS_r1-r8 union; the 5 r5 names are the fills
# r8's new queries displaced).  Round 9's window, per the r8 verdict
# items 1/2/5:
# (a) the seven queries NEW this round — the recall@k gates for the two
#     newest (and most compressed) approximate indexes (pq_index_recall,
#     ivfpq_recall — r8 verdict item 2), the batch probes served from
#     stored codes (pq_batch_probe, item 5; ivfpq_batch_probe, its
#     composed sibling), and the compaction-served probe
#     (pq_compacted_probe, item 3 through the driver gate), and the
#     residual-IVFADC layout pair (ivfpq_residual_probe /
#     ivfpq_residual_recall — Jégou §V residual encoding with per-cell
#     query LUTs). New queries
#     MUST take window slots (the r6 lesson: a query registered
#     outside the window has no driver row until the next round);
# (b) the five r5-displaced names FIRST (item 1: top_terms_tfidf,
#     weighted_sample_orders, doc_length_deciles, doc_packing_stats,
#     text_word_entropy — r5-green is 4 rounds old, the stalest rows);
# (c) 38 of the 50 r6-green names, alphabetical — each (a) entry
#     displaces one fill (spilled to r10, FIRST there:
#     q1_pricing_summary, q3_shipping_priority,
#     q5_local_supplier_volume, q6_forecast_revenue,
#     quality_classifier_scores, reservoir_sample_per_source,
#     rollup_pricing, running_total_per_customer, similarity_ann_recall,
#     similarity_batch_topk, text_dupngram_fraction,
#     top_customer_per_nation).
# 7 + 5 + 38 = 50 exactly; after r9 the stale pool for r10 is those 12
# spilled r6 names plus the 50 r7-green names.
#
# Changed-but-NOT-windowed (named so the policy stays honest). The r9
# round touched code consumed by green queries:
#   - oracle.py branch type tags (r8 advice): affect the COMPARISON of
#     every query; re-proven by the full local differential after the
#     change.
#   - hist_quantiles integer-exact rank predicate (r8 advice):
#     consumer price_quantile_sketch IS windowed (r6 fill).
#   - pq_adc_topk private-projection persist (r8 advice): result-
#     identical (oracle differential re-proven); pq_index_recall
#     (same arithmetic through the persisted probe) IS windowed.
#   - append_to_ivfpq_index `extra` + empty-batch gate advance (the
#     streaming maintenance twin): consumers ivfpq_probe /
#     ivfpq_append_probe are r8-green and result-identical (append
#     parity re-proven by tests + the local differential); their next
#     window is r10+ by rotation order.
#   - latent rounding-tie hardening (r9 review): price_percentiles now
#     replays exact order-statistics over integer cents (both engines
#     compute ONE identical IEEE expression — ROUND(quantile, 2) sat
#     on .xx5 ties where the engines' round rules disagree);
#     order_value_buckets / part_brand_stats avg_price likewise became
#     exact-cents means divided once; flows_protocol_breakdown /
#     flows_duration_histogram / matview_flows_rollup (avg_bytes,
#     bytes_per_sec, avg_flow_bytes) likewise became exact integer
#     ratios divided once, unrounded. events_windowed_hll/_cms persist
#     their shared projection (scan-once, results unchanged). All
#     eight re-proven on the vanilla sf0.01 contract + the full
#     differential + the sf0.1 soak after the change; their next
#     window is r10+ by rotation order (none are r9-windowed).
promote([
    # (a) new this round — index quality gates, batch code probes,
    #     compaction-served probe
    "pq_index_recall",
    "ivfpq_recall",
    "pq_batch_probe",
    "ivfpq_batch_probe",
    "pq_compacted_probe",
    "ivfpq_residual_probe",
    "ivfpq_residual_recall",
    # (b) the five r5-displaced fills, stalest first
    "top_terms_tfidf",
    "weighted_sample_orders",
    "doc_length_deciles",
    "doc_packing_stats",
    "text_word_entropy",
    # (c) 38 of the 50 r6-green names
    "approx_distinct_customers",
    "big_spender_customers_semi",
    "corpus_quality_filter",
    "cube_order_counts",
    "customer_order_gaps",
    "customers_without_orders",
    "dataset_split_counts",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "deterministic_sample_stats",
    "documents_profile",
    "embedding_knn_graph",
    "events_funnel_pairs",
    "events_json_extract",
    "events_json_variant",
    "events_minutely",
    "events_sessionization",
    "events_sliding_windows",
    "events_stream_dedup",
    "events_user_funnel",
    "filtered_ann_topk",
    "flows_site_traffic",
    "flows_zorder_tiles",
    "global_shuffle_shards",
    "ipv6_address_classes",
    "ipv6_site_traffic",
    "multimodal_blob_schema",
    "multimodal_decode_audio",
    "multimodal_decode_image",
    "orders_asof_last_event",
    "orders_asof_next_event",
    "orders_asof_union_timeline",
    "price_quantile_sketch",
    "q10_returned_items",
    "q11_important_stock",
    "q16_parts_supplier_relationship",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
