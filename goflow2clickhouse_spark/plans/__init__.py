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

# Driver-coverage rotation: the correctness driver verifies only the
# first 50 registry entries each round. After round 12 every
# registered name is driver-green (newest-green histogram:
# 45 r9 / 45 r10 / 50 r11 / 50 r12, computed from the
# CORRECTNESS_r1-r12 union). Round 13's window, per the r12 verdict
# item 1:
# (a) the 45 r9-STALE spill names FIRST (the oldest rows in the
#     registry at 4 rounds stale: the 43 names the r12 header listed
#     plus pq_batch_probe and pq_index_recall, displaced from r12's
#     window by that round's new-query gate);
# (b) the 4 queries NEW this round, which MUST take window slots (the
#     r6 lesson): text_bpe_token_counts_trained (the production-scale
#     BPE tier — trained 2000-merge table, mapInPandas encoder,
#     recursive-CTE min-rank oracle; verdict item 2),
#     bpe_train_merges_demo (BPE TRAINING replayed end to end as
#     unrolled CTEs — the trainer meets the Lloyd-quantizer standard),
#     multimodal_phash_neardup (DCT perceptual-hash image near-dup —
#     the codec family composed with the dedup family's
#     never-all-pairs band join; verdict item 3), and pq_opq_recall
#     (OPQ via trained variance-balancing dimension permutation,
#     plain 0.375 vs permuted 0.6375 mean recall@10 on the
#     anisotropic fixture; verdict item 6);
# (c) one name from the next-oldest (r10-green) pool:
#     bloom_seen_filter (alphabetically first of the 45).
# 45 + 4 + 1 = 50 exactly.
#
# Changed-but-NOT-windowed (the policy's honesty clause): NO query
# changed RESULTS this round. Code touched with results UNCHANGED —
# every name re-proven against its oracle at sf0.01 on a vanilla
# session in-round after the change:
#   - the rerank-capable probe bodies (r12-advice fixes: pq_index_probe
#     now collects the validated query vector once and feeds LUT +
#     exact tier the same literal; _batch_rerank_exact gained the
#     loud missing-id fetch): pq_index_probe, pq_batch_probe,
#     ivfpq_probe, ivfpq_batch_probe, ivfpq_rerank_probe,
#     ivfpq_rerank_recall, pq_rerank_recall, ivfpq_batch_rerank,
#     ivfpq_residual_batch_probe, ivfpq_residual_batch_rerank,
#     ivfpq_rerank_batch_recall — all compared OK in-session;
#   - meta_mutex acquire/release (atomic rename-with-token) touches
#     no query plan.
# The remaining 44 r10-green names spill to r14, FIRST there
# (alphabetical: bm25_topk, ch_dialect_port_profile,
# ch_dialect_sampler_profile, ch_dialect_top_talkers,
# cms_heavy_hitters, corpus_vocab_topk, customer_order_value_windows,
# decontamination_stats, dedup_cluster_sizes_bigstar, dedup_simhash,
# distinct_customers_per_priority, doc_chunk_offsets,
# doc_fingerprint_dups, dsir_importance_topk, events_stream_neardup,
# events_windowed_hll, flows_bitrate_timeseries,
# flows_conversation_matrix, flows_conversation_sessions,
# flows_duration_histogram, ivfpq_trained_recall, knn_pagerank,
# multimodal_decode_gif, multimodal_decode_jpeg,
# multimodal_decode_png, pq_trained_recall, q10_returned_items,
# q11_important_stock, q15_top_supplier, q1_pricing_summary,
# q3_shipping_priority, q5_local_supplier_volume,
# q6_forecast_revenue, quality_classifier_scores,
# reservoir_sample_per_source, rollup_pricing,
# running_total_per_customer, similarity_ann_recall,
# similarity_batch_topk, sq_batch_probe, sq_index_probe, sq_recall,
# text_dupngram_fraction, top_customer_per_nation), then the r11
# pool.
promote([
    # (a) the 45 r9-stale spill names, FIRST
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
    "doc_length_deciles",
    "doc_packing_stats",
    "documents_profile",
    "embedding_knn_graph",
    "events_funnel_pairs",
    "events_json_extract",
    "events_json_variant",
    "events_minutely",
    "events_sessionization",
    "events_sliding_windows",
    "events_user_funnel",
    "filtered_ann_topk",
    "flows_site_traffic",
    "flows_zorder_tiles",
    "global_shuffle_shards",
    "ipv6_address_classes",
    "ipv6_site_traffic",
    "ivfpq_residual_probe",
    "ivfpq_residual_recall",
    "multimodal_blob_schema",
    "multimodal_decode_audio",
    "multimodal_decode_image",
    "orders_asof_last_event",
    "orders_asof_next_event",
    "orders_asof_union_timeline",
    "pq_batch_probe",
    "pq_compacted_probe",
    "pq_index_recall",
    "price_quantile_sketch",
    "q16_parts_supplier_relationship",
    "text_word_entropy",
    "top_terms_tfidf",
    "weighted_sample_orders",
    # (b) new this round
    "bpe_train_merges_demo",
    "multimodal_phash_neardup",
    "pq_opq_recall",
    "text_bpe_token_counts_trained",
    # (c) first of the r10-green pool
    "bloom_seen_filter",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
