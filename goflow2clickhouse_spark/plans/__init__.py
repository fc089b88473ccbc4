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
# 50 registry entries each round.  Rounds 1+2 proved 100 distinct rows.
# Round 3's window: (a) the three TPC-H queries that have never had a
# driver row; (b) everything whose implementation or oracle CHANGED this
# round (sha2 dedup keys, hashed shingle keys, TIMESTAMP_NTZ event
# handling on Spark 4.1, new multimodal codecs/oracles, new IPv6 query) —
# a prior green row does not cover changed code — plus the queries NEW
# this round (dup-span coverage, streaming-dedup twin, CMS, reservoir,
# salted join, bloom, z-order tiles, Variant JSON, quantile sketch,
# profiler); (c) rotating re-proof of the oldest round-1 names in the
# remaining slots. All 50 have oracles — no rows-only entries in the
# window.
promote([
    # (a) never driver-proven
    "q11_important_stock",
    "q16_parts_supplier_relationship",
    "q20_promotion_suppliers",
    # (b) new this round
    "multimodal_decode_image",
    "multimodal_decode_audio",
    "ipv6_address_classes",
    "multimodal_blob_schema",     # gained a real oracle (was rows-only)
    # (b) changed this round: sha2 exact-dedup keys
    "dedup_exact",
    "dedup_exact_normalized",
    "corpus_curation_funnel",
    "corpus_quality_filter",
    # (b) changed this round: hash31 shingle join keys
    "dedup_ngram_jaccard",
    "text_dupngram_fraction",
    "dedup_minhash_lsh",
    "dedup_cluster_sizes",
    # (b) changed this round: NTZ event-time handling
    "events_minutely",
    "events_sliding_windows",
    "events_sessionization",
    "events_funnel_pairs",
    "events_json_extract",
    "events_user_funnel",
    "events_json_variant",
    "orders_asof_next_event",
    "orders_asof_last_event",
    "orders_asof_union_timeline",
    # (b) changed this round: stride-key validation in the fast path
    "flows_site_traffic",
    # (b) new this round: ANN recall evaluation + v6 site enrichment
    "similarity_ann_recall",
    "ipv6_site_traffic",
    # (b) new this round: dup-span coverage, streaming dedup twin,
    # CMS heavy hitters, fixed-k reservoir
    "text_dup_span_coverage",
    "events_stream_dedup",
    "cms_heavy_hitters",
    "reservoir_sample_per_source",
    "salted_priority_revenue",
    "bloom_seen_filter",
    "flows_zorder_tiles",
    "price_quantile_sketch",
    "documents_profile",
    "embedding_cluster_sizes",
    # (c) rotating re-proof — oldest round-1 names
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "top_customer_per_nation",
    "running_total_per_customer",
    "customer_order_gaps",
    "rollup_pricing",
    "cube_order_counts",
    "customers_without_orders",
    "big_spender_customers_semi",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
