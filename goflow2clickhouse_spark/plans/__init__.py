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
# 50 registry entries each round.  After round 10 every registered name is
# driver-green (newest-green histogram: 26 r7 / 49 r8 / 48 r9 / 50 r10,
# computed from the CORRECTNESS_r1-r10 union).  Round 11's window, per the
# r10 verdict items 1-6:
# (a) the 26 r7-STALE spill names FIRST (verdict item 1 — the oldest rows
#     in the registry at 4 rounds stale, listed in the r10 header);
# (b) the queries NEW this round — ivfsq_batch_probe (Q-query batch
#     serving for the composed SQ layout, verdict item 6),
#     ivfsq_trained_recall (Lloyd-trained COARSE centroids vs the seed
#     figure at the same geometry, verdict item 2), pq_deleted_probe
#     (tombstone deletion through the driver gate, verdict item 3), and
#     multimodal_decode_jpeg420 (4:2:0 chroma-subsampled JPEG, verdict
#     item 4), ivf_batch_probe (completes the batch-serving matrix
#     across all five persisted vector layouts), and
#     ivfpq_fully_trained_recall (IVFADC with BOTH quantizers trained —
#     the deepest replayed pipeline in the registry), and
#     incremental_dedup_deleted (the band layout's deletion gate —
#     takedown hits the old corpus, the increment classifies against
#     what remains, oracle replays the exclusion). The three extras
#     displace flows_protocol_pivot, flows_private_traffic_matrix and
#     events_windowed_cms — the alphabetically-last (d) fills NOT
#     exercising code changed this round (the filtered_ann_* fills
#     exercise the changed write_filtered_ivf_index, so they stay) —
#     which rejoin FIRST at r12. New queries MUST take window slots
#     (the r6 lesson);
# (c) six names whose CONSUMED CODE changed this round:
#     incremental_dedup_indexed + events_stream_dedup (the band sha leg
#     now stores (doc_id, _sha) pairs so deletion can address a doc's
#     content hash; both read it through band_index_sha_set / the
#     indexed pair probe), ivf_index_probe + ivf_append_probe
#     (append_to_ivf_index gained the shared `extra` replay-gate commit
#     for the generic maintenance fold's new `ivf` dispatch row, verdict
#     item 5), ivfsq_probe + ivfsq_recall (write_ivfsq_index gained
#     coarse_train_iterations + records coarse_train_iters; their oracle
#     CTEs were refactored through _ivfsq_assign_ctes);
# (d) 11 of the 12 alphabetically-first r8-green names (oldest rows
#     after the r7 spill): bigram_pmi_top .. filtered_ann_recall,
#     minus the displaced events_windowed_cms.
# 26 + 7 + 6 + 11 = 50 exactly.  The remaining 38 r8-green names spill to
# r12, FIRST there (alphabetical: events_windowed_cms,
# flows_private_traffic_matrix,
# flows_protocol_pivot, flows_protocol_unpivot, flows_top_talkers_salted,
# grouping_sets_revenue, ivfpq_append_probe, ivfpq_probe,
# kmeans_refined_cells, leakage_free_split, matview_flows_rollup,
# multimodal_features, pii_scan_stats, pq_append_probe, pq_index_probe,
# q13_customer_distribution, q14_promo_revenue, q17_small_quantity_revenue,
# q18_large_volume_customers, q19_discounted_revenue,
# q20_promotion_suppliers, q22_global_sales_opportunity, q7_volume_shipping,
# q8_market_share, q9_product_profit, salted_priority_revenue,
# semdedup_persisted, similarity_ivf_ann, similarity_lsh_ann,
# similarity_topk_bruteforce, stratified_sample_per_source,
# text_bigram_logprob, text_denylist_scrub, text_dup_span_coverage,
# text_langid, text_quality_stats, text_repetition_stats,
# text_token_counts), then the r9-green pool.
#
# Changed-but-NOT-windowed (named so the policy stays honest). r11 touched
# code consumed by green queries beyond the six windowed in (c):
#   - tombstone deletion (plans/storage._drop_tombstoned inside
#     _read_index_cells/_read_index_codes): for an index with ZERO
#     tombstones the guard no-ops at plan-build time, so every existing
#     probe's plan is byte-identical; all 29 persisted-index-family
#     queries were re-proven against their oracles at sf0.01 in-session
#     after the change. Consumers pq_*/sq_*/ivfpq_* rejoin by rotation
#     order at r12.
#   - coarse_train_iterations default-0 on write_filtered_ivf_index /
#     write_ivfpq_index (a new recorded meta key, results identical;
#     filtered_ann_ivf and filtered_ann_recall are windowed via (d),
#     ivfpq consumers re-proven by the same in-session differential).
promote([
    # (a) the 26 r7-stale spill names, FIRST
    "flows_ingest_transform",
    "flows_maintenance_overlap",
    "flows_port_fanout",
    "flows_protocol_breakdown",
    "flows_sampler_utilization",
    "flows_tcp_syn_only",
    "flows_top_talkers",
    "flows_tumbling_traffic",
    "hll_distinct_customers",
    "incremental_dedup_newbatch",
    "jl_projection_recall",
    "nation_balance_full_outer",
    "nation_coverage_set_ops",
    "order_value_buckets",
    "orders_above_global_avg",
    "part_brand_stats",
    "pq_adc_topk",
    "price_percentiles",
    "priority_revenue_union",
    "q12_shipmode_priority",
    "q21_suppliers_kept_waiting",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "semdedup_prune",
    "source_mixture_weights",
    "token_budget_selection",
    # (b) new this round
    "ivfsq_batch_probe",
    "ivfsq_trained_recall",
    "pq_deleted_probe",
    "multimodal_decode_jpeg420",
    "ivf_batch_probe",
    "ivfpq_fully_trained_recall",
    "incremental_dedup_deleted",
    # (c) consumed-code-changed this round
    "incremental_dedup_indexed",
    "events_stream_dedup",
    "ivf_index_probe",
    "ivf_append_probe",
    "ivfsq_probe",
    "ivfsq_recall",
    # (d) 11 of the 12 alphabetically-first r8-green fills
    "bigram_pmi_top",
    "corpus_curation_funnel",
    "dedup_cluster_sizes",
    "doc_packing_assign",
    "embedding_cluster_sizes",
    "embedding_label_centroids",
    "embedding_neardup_lsh",
    "embedding_neardup_pairs",
    "embedding_quantize_error",
    "filtered_ann_ivf",
    "filtered_ann_recall",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
