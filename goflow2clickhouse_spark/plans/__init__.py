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
# 50 registry entries each round.  After round 9 every registered name is
# driver-green (newest-green histogram: 12 r6 / 50 r7 / 50 r8 / 50 r9,
# computed from the CORRECTNESS_r1-r9 union; the 12 r6 names are the
# window-spill fills the r9 verdict schedules FIRST for r10).  Round 10's
# window, per the r9 verdict items 1/2:
# (a) the queries NEW this round — the Lloyd-trained-codebook recall
#     gates (pq_trained_recall: batch mean recall@10 through a trained PQ
#     index; ivfpq_trained_recall: trained residual IVFADC — r9 verdict
#     item 2), multimodal_decode_png (the r10 PNG codec's round-trip
#     gate), the SQ8 layout's probe + recall + batch-probe gates
#     (sq_index_probe, sq_recall, sq_batch_probe — the fifth persisted
#     index layout, new in r10), knn_pagerank (fixed-iteration
#     PageRank centrality over the kNN graph, new in r10), and the
#     compressed-codec gates multimodal_decode_gif (hand-written LZW)
#     and multimodal_decode_jpeg (baseline JPEG: hand-written Huffman
#     + DCT, exact-DC block-constant oracle, RSTn path), plus the
#     IVF-SQ8 layout's probe + recall gates (ivfsq_probe,
#     ivfsq_recall — the sixth persisted layout, new in r10).
#     New queries MUST take window slots (the r6 lesson);
# (b) the twelve r6-stale spill names FIRST (item 1 — the oldest rows in
#     the registry at 3 rounds stale);
# (b') q10_returned_items (r9-green), q15_top_supplier and
#     q11_important_stock (r8-green), CHANGED this round — the tie
#     canary found their revenue sums sitting on live half-cent ties
#     (q11: three emitted per-part ties at sf0.01, plus a float HAVING
#     cut), so all three were converted to the exact-cents pattern;
#     changed queries must take window slots;
# (c) 24 of the 50 r7-green names — alphabetical EXCEPT that
#     incremental_dedup_newbatch is displaced ahead of the ivf probes:
#     ivf_index_probe / ivf_append_probe exercise the r10 probe-serving
#     rework, so dropping them would leave changed code unwindowed
#     (hll_distinct_customers, flows_ingest_transform,
#     flows_maintenance_overlap, flows_port_fanout,
#     flows_protocol_breakdown, flows_sampler_utilization,
#     flows_tcp_syn_only, flows_top_talkers and flows_tumbling_traffic
#     — alphabetically inside the fill run but UNTOUCHED this round —
#     are the names the r10 additions displace). The remaining 26
#     spill to r11, FIRST there:
#     flows_ingest_transform, flows_maintenance_overlap,
#     flows_port_fanout, flows_protocol_breakdown, flows_sampler_utilization,
#     flows_tcp_syn_only, flows_top_talkers, flows_tumbling_traffic,
#     hll_distinct_customers, incremental_dedup_newbatch, jl_projection_recall,
#     nation_balance_full_outer, nation_coverage_set_ops,
#     order_value_buckets, orders_above_global_avg, part_brand_stats,
#     pq_adc_topk, price_percentiles, priority_revenue_union,
#     q12_shipmode_priority, q21_suppliers_kept_waiting,
#     q2_min_cost_supplier, q4_order_priority, semdedup_prune,
#     source_mixture_weights, token_budget_selection.
# 11 + 12 + 3 + 24 = 50 exactly; after r10 the stale pool for r11 is those
# 26 spilled r7 names plus the 50 r8-green names.
#
# Changed-but-NOT-windowed (named so the policy stays honest). The r10
# round touched code consumed by green queries:
#   - probe meta-cache + guard rework (plans/storage._version_artifacts;
#     in-plan _single_query on pq_index_probe; collect-validated contract
#     + literal-vector LUTs on ivfpq_probe / ivf_index_probe; cached
#     quantizer reads in both batch probes and semdedup_persisted):
#     result-identical by construction (the collected vector feeds the
#     same arithmetic; A/B'd byte-equal at sf0.01 + re-proven by the full
#     differential). Consumers pq_index_probe/ivfpq_probe are r8-green,
#     windowed again by rotation order at r11+; pq_batch_probe /
#     ivfpq_batch_probe / pq_compacted_probe are r9-green.
#   - _require_unique_qids NULL/wrong-dim qvec gate (r9 advice): pure
#     guard-path addition, green results unchanged.
#   - hist_quantiles Python-side overflow guard (r9 advice): consumer
#     price_quantile_sketch unchanged on legal q values (r6 fill, last
#     green r9's window... r8) — re-proven by the differential.
promote([
    # (a) new this round — trained-codebook recall gates + PNG codec
    "pq_trained_recall",
    "ivfpq_trained_recall",
    "multimodal_decode_png",
    "sq_index_probe",
    "sq_recall",
    "sq_batch_probe",
    "knn_pagerank",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "ivfsq_probe",
    "ivfsq_recall",
    # (b) the twelve r6-stale spill fills, stalest first
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "quality_classifier_scores",
    "reservoir_sample_per_source",
    "rollup_pricing",
    "running_total_per_customer",
    "similarity_ann_recall",
    "similarity_batch_topk",
    "text_dupngram_fraction",
    "top_customer_per_nation",
    # (b') changed this round (exact-cents conversion)
    "q10_returned_items",
    "q15_top_supplier",
    "q11_important_stock",
    # (c) 24 of the 50 r7-green names (alphabetical, minus the
    #     displaced incremental_dedup_newbatch — see header)
    "bloom_seen_filter",
    "bm25_topk",
    "ch_dialect_port_profile",
    "ch_dialect_sampler_profile",
    "ch_dialect_top_talkers",
    "cms_heavy_hitters",
    "corpus_vocab_topk",
    "customer_order_value_windows",
    "decontamination_stats",
    "dedup_cluster_sizes_bigstar",
    "dedup_simhash",
    "distinct_customers_per_priority",
    "doc_chunk_offsets",
    "doc_fingerprint_dups",
    "dsir_importance_topk",
    "events_stream_neardup",
    "events_windowed_hll",
    "flows_bitrate_timeseries",
    "flows_conversation_matrix",
    "flows_conversation_sessions",
    "flows_duration_histogram",
    "incremental_dedup_indexed",
    "ivf_append_probe",
    "ivf_index_probe",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
