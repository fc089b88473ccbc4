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
# 50 registry entries each round.  The r1+r2+r3 windows together proved
# all 119 then-registered names.  Round 4's window (per the r3 verdict's
# staleness ask): (a) queries NEW this round (the four remaining TPC-H
# shapes, the registered streaming near-dup twin, HLL / BM25 /
# token-budget / weighted-sample / mixture-weights) and queries whose
# implementation CHANGED this round (tokenize-once CMS/Bloom, the
# funnel's distinct-free decontamination branch, flag_contaminated) —
# a prior green row does not cover changed code; (b) ALL 26 names whose
# newest green row is still round 1 — after this window no query's most
# recent driver proof is more than two rounds old; (c) the
# alphabetically-first 6 of the 43 names last proven in round 2 (the
# remaining 36 r2-stale names are the priority pool for round 5's
# window).
promote([
    # (a) new this round
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q12_shipmode_priority",
    "q21_suppliers_kept_waiting",
    "events_stream_neardup",
    "hll_distinct_customers",
    "bm25_topk",
    "token_budget_selection",
    "weighted_sample_orders",
    "source_mixture_weights",
    "events_windowed_hll",
    "leakage_free_split",
    "filtered_ann_topk",
    "events_windowed_cms",
    # (a) changed this round
    "cms_heavy_hitters",
    "bloom_seen_filter",
    "corpus_curation_funnel",
    "decontamination_stats",
    # (b) the 26 round-1-stale names
    "approx_distinct_customers",
    "ch_dialect_port_profile",
    "ch_dialect_top_talkers",
    "customer_order_value_windows",
    "dedup_simhash",
    "distinct_customers_per_priority",
    "flows_bitrate_timeseries",
    "flows_conversation_matrix",
    "flows_conversation_sessions",
    "flows_duration_histogram",
    "flows_ingest_transform",
    "flows_maintenance_overlap",
    "flows_port_fanout",
    "flows_protocol_breakdown",
    "flows_sampler_utilization",
    "flows_tcp_syn_only",
    "flows_top_talkers",
    "flows_top_talkers_salted",
    "flows_tumbling_traffic",
    "nation_balance_full_outer",
    "nation_coverage_set_ops",
    "order_value_buckets",
    "orders_above_global_avg",
    "part_brand_stats",
    "price_percentiles",
    "priority_revenue_union",
    # (c) oldest round-2 names (first 6 alphabetically)
    "bigram_pmi_top",
    "ch_dialect_sampler_profile",
    "corpus_vocab_topk",
    "dataset_split_counts",
    "deterministic_sample_stats",
    "doc_fingerprint_dups",
])

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
