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
# first 50 registry entries each round.  After round 11 every registered
# name is driver-green (newest-green histogram: 38 r8 / 47 r9 / 45 r10 /
# 50 r11, computed from the CORRECTNESS_r1-r11 union).  Round 12's
# window, per the r11 verdict items 2-6:
# (a) the 38 r8-STALE spill names FIRST (verdict item 2 — the oldest
#     rows in the registry at 4 rounds stale, listed in the r11 header);
# (b) the 10 queries NEW this round: ivfpq_rerank_probe +
#     ivfpq_rerank_recall (the IVFADC+R exact re-rank tier, verdict
#     item 3 — recall@10 0.3 -> 0.6 at R=40 on the fully-trained
#     fixture), pq_rerank_recall (the pruning-free refine ladder:
#     0.3 -> 0.7/0.9/1.0 at R=40/80/160 trained), ivfpq_batch_rerank
#     (the batch refine tier, fully relational),
#     multimodal_decode_jpeg422 (the second most common wild-JPEG
#     shape, verdict item 6), text_bpe_token_counts (exact BPE counts
#     as pure column expressions, verdict item 8) and
#     token_budget_selection_bpe (the budget selection billed in BPE
#     units), ivfpq_residual_batch_probe (the serving matrix's missing
#     residual-batch composition — per-(qid, cell) residual LUTs now
#     oracle-replayed in batch form) and ivfpq_residual_batch_rerank
#     (the registry's deepest composition: both trainings + residual
#     + batch + exact re-rank — Faiss's production IVFPQ+Refine shape
#     end to end), and ivfpq_rerank_batch_recall (the DENOISED gauge
#     for the refine tier: Q=16 seed-disjoint queries, ADC 0.3875 vs
#     re-ranked 0.55625 mean recall@10 at sf0.01). New queries MUST
#     take window slots (the r6 lesson);
# (c) two names whose RESULTS changed with the trained-by-default
#     serving flip (verdict item 4 — the shared pq/ivfsq/ivfpq/fivf
#     fixtures now build Lloyd-trained, every expect pin records the
#     regime, oracles replay training): ivfpq_batch_probe (also the
#     round's most-changed probe body — the relational batch rerank
#     tier) and ivfpq_recall (r9-green, the oldest rows of the
#     family). The new-gate additions displaced ivfsq_probe
#     (r11-green, the freshest result-changed name), pq_batch_probe
#     and pq_index_recall (r9-green; rejoin FIRST at r13 with the r9
#     pool) — all re-proven in-session, see below.
# 38 + 10 + 2 = 50 exactly.
#
# Changed-but-NOT-windowed (named so the policy stays honest); every
# name below was re-proven against its oracle at sf0.01 on a vanilla
# session in-round after the change:
#   - results CHANGED by the trained flip but out of window space:
#     ivfsq_probe, pq_batch_probe, pq_index_recall (displaced by the
#     new-gate additions, see (c)), ivf_index_probe, ivf_batch_probe (the
#     filtered-IVF fixture joined the trained default late in the
#     round; semdedup_persisted, which SHARES that fixture and whose
#     results also changed, IS windowed via (a)), ivfsq_recall,
#     ivfsq_batch_probe (r11-green, the freshest rows in that
#     family), ivfsq_trained_recall (fixture
#     sources swapped —
#     the shared fixture is now its trained side, a new ivfsq_seed
#     fixture its seed side — same configs, identical results);
#   - results UNCHANGED, code touched: ivfpq_probe-family consumers of
#     the rerank-capable probe bodies (ivfpq_residual_probe/_recall,
#     ivfpq_trained_recall, ivfpq_fully_trained_recall,
#     pq_append_probe, ivfpq_append_probe, pq_compacted_probe,
#     pq_deleted_probe — plan-identical, the rerank branch is inert at
#     rerank=0), multimodal_decode_jpeg + _jpeg420 (decoder keys
#     Y/Cb/Cr roles off JFIF component ids now), token_budget_selection
#     (selection body factored into _budget_select, plan-identical),
#     incremental_dedup_deleted (delete_from_index gained id-type
#     gates).
# The 43 remaining r9-green names spill to r13, FIRST there
# (alphabetical: approx_distinct_customers, big_spender_customers_semi,
# corpus_quality_filter, cube_order_counts, customer_order_gaps,
# customers_without_orders, dataset_split_counts, dedup_exact,
# dedup_exact_normalized, dedup_minhash_lsh, dedup_ngram_jaccard,
# deterministic_sample_stats, doc_length_deciles, doc_packing_stats,
# documents_profile, embedding_knn_graph, events_funnel_pairs,
# events_json_extract, events_json_variant, events_minutely,
# events_sessionization, events_sliding_windows, events_user_funnel,
# filtered_ann_topk, flows_site_traffic, flows_zorder_tiles,
# global_shuffle_shards, ipv6_address_classes, ipv6_site_traffic,
# ivfpq_residual_probe, ivfpq_residual_recall, multimodal_blob_schema,
# multimodal_decode_audio, multimodal_decode_image,
# orders_asof_last_event, orders_asof_next_event,
# orders_asof_union_timeline, pq_compacted_probe, price_quantile_sketch,
# q16_parts_supplier_relationship, text_word_entropy, top_terms_tfidf,
# weighted_sample_orders), then the r10-green pool.
promote([
    # (a) the 38 r8-stale spill names, FIRST
    "events_windowed_cms",
    "flows_private_traffic_matrix",
    "flows_protocol_pivot",
    "flows_protocol_unpivot",
    "flows_top_talkers_salted",
    "grouping_sets_revenue",
    "ivfpq_append_probe",
    "ivfpq_probe",
    "kmeans_refined_cells",
    "leakage_free_split",
    "matview_flows_rollup",
    "multimodal_features",
    "pii_scan_stats",
    "pq_append_probe",
    "pq_index_probe",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q20_promotion_suppliers",
    "q22_global_sales_opportunity",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "salted_priority_revenue",
    "semdedup_persisted",
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
    # (b) new this round
    "ivfpq_rerank_probe",
    "ivfpq_rerank_recall",
    "pq_rerank_recall",
    "ivfpq_batch_rerank",
    "multimodal_decode_jpeg422",
    "text_bpe_token_counts",
    "token_budget_selection_bpe",
    "ivfpq_residual_batch_probe",
    "ivfpq_residual_batch_rerank",
    "ivfpq_rerank_batch_recall",
    # (c) results changed by the trained-by-default flip
    "ivfpq_batch_probe",
    "ivfpq_recall",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
