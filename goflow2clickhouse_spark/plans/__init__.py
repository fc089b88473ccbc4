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
# 50 registry entries each round.  The r1-r5 windows together proved every
# name registered through r5 except similarity_batch_topk (added after the
# r5 window ran).  Round 6's window, per the r5 verdict item 1:
# (a) similarity_batch_topk — the only name with no driver row;
# (b) the three r5 named exclusions rotating in as promised
#     (filtered_ann_topk, deterministic_sample_stats, dataset_split_counts);
# (c) approx_distinct_customers — restructured this round to an
#     oracle-checked (exact count + error-bound flag) output, retiring the
#     registry's last no_oracle row;
# (d) the three queries NEW this round (embedding_knn_graph,
#     quality_classifier_scores, global_shuffle_shards);
# (e) ALL 42 names whose newest green row is round 3 — the entire stale
#     pool drains, leaving nothing older than r4.
# 1 + 3 + 1 + 3 + 42 = 50 exactly.
#
# Changed-but-NOT-windowed (named so the policy stays honest): the r6
# cluster_pairs change (checkpoint RDD ids read from the checkpointed
# DataFrame's own plan instead of diffing the shared persistent-RDD map)
# is release-lifecycle-only — result-identical for its consumers
# dedup_cluster_sizes / embedding_cluster_sizes / leakage_free_split (all
# green r5); likewise pack_greedy only gained an input-name validation
# (doc_packing_assign, green r5). All four re-proven this round in the
# local differential suite and the sf0.01 pre-flight.
promote([
    # (a) no driver row yet
    "similarity_batch_topk",
    # (b) r5 named exclusions
    "filtered_ann_topk",
    "deterministic_sample_stats",
    "dataset_split_counts",
    # (c) restructured this round
    "approx_distinct_customers",
    # (d) new this round
    "embedding_knn_graph",
    "quality_classifier_scores",
    "global_shuffle_shards",
    # (e) the 42 r3-stale names — pool drained
    "big_spender_customers_semi",
    "corpus_quality_filter",
    "cube_order_counts",
    "customer_order_gaps",
    "customers_without_orders",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "documents_profile",
    "events_funnel_pairs",
    "events_json_extract",
    "events_json_variant",
    "events_minutely",
    "events_sessionization",
    "events_sliding_windows",
    "events_stream_dedup",
    "events_user_funnel",
    "flows_site_traffic",
    "flows_zorder_tiles",
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
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "reservoir_sample_per_source",
    "rollup_pricing",
    "running_total_per_customer",
    "similarity_ann_recall",
    "text_dupngram_fraction",
    "top_customer_per_nation",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
