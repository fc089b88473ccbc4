"""Flow-analytics queries over the `flows` fact table — the workload the
reference's ClickHouse deployment exists to serve (SURVEY.md §2.B over
the schema of initdb/create_tables.sql:1-35).

The flows table is derived deterministically from lineitem (see
flows_view.py) so every query here is hash-checked against DuckDB
running the identical CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .flows_view import FLOWS_WITH, flows_df, register_sf_view
from .queries import query


@query(
    "flows_top_talkers",
    oracle=FLOWS_WITH + """
    SELECT src_addr,
           CAST(SUM(bytes) AS BIGINT)   AS total_bytes,
           CAST(SUM(packets) AS BIGINT) AS total_packets,
           COUNT(*) AS n_flows
    FROM flows
    WHERE proto = 6
    GROUP BY src_addr
    ORDER BY total_bytes DESC, src_addr
    LIMIT 10
    """,
    bench=True,
)
def flows_top_talkers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top talkers: the canonical flow query (filter → agg → top-k).
    Scale: partial agg collapses per-partition before the shuffle; the
    final sort sees only |distinct src_addr| rows, and LIMIT is pushed
    into a TakeOrdered — no global sort of the fact table."""
    fl = flows_df(spark, sf_dir)
    return (
        fl.filter(F.col("proto") == 6)
        .groupBy("src_addr")
        .agg(
            F.sum("bytes").alias("total_bytes"),
            F.sum("packets").alias("total_packets"),
            F.count("*").alias("n_flows"),
        )
        .orderBy(F.desc("total_bytes"), "src_addr")
        .limit(10)
    )


@query(
    "flows_protocol_breakdown",
    oracle=FLOWS_WITH + """
    SELECT proto, flow_direction,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           COUNT(*) AS n_flows,
           SUM(bytes) / (COUNT(*) * 1.0) AS avg_bytes
    FROM flows
    GROUP BY proto, flow_direction
    """,
)
def flows_protocol_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg_bytes = exact integer sum divided once — bit-identical IEEE
    division of identical integers on both engines (r9 review:
    ROUND(AVG, 2) sat on .xx5 half-way ties where the engines' round
    rules disagree — the order_value_buckets class)."""
    fl = flows_df(spark, sf_dir)
    return fl.groupBy("proto", "flow_direction").agg(
        F.sum("bytes").alias("total_bytes"),
        F.count("*").alias("n_flows"),
        (F.sum("bytes") / (F.count("*") * F.lit(1.0))).alias("avg_bytes"),
    )


@query(
    "flows_bitrate_timeseries",
    oracle=FLOWS_WITH + """
    SELECT (time_received - (time_received % 300)) AS bucket_start,
           CAST(SUM(bytes) * 8 AS BIGINT) AS bits,
           COUNT(*) AS n_flows
    FROM flows
    GROUP BY (time_received - (time_received % 300))
    """,
)
def flows_bitrate_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute traffic buckets (ClickHouse toStartOfInterval ≡ epoch
    modular truncation — kept in epoch-seconds so the oracle is exact)."""
    fl = flows_df(spark, sf_dir)
    bucket = (F.col("time_received") - (F.col("time_received") % 300)).alias(
        "bucket_start")
    return fl.groupBy(bucket).agg(
        (F.sum("bytes") * 8).alias("bits"),
        F.count("*").alias("n_flows"),
    )


@query(
    "flows_tcp_syn_only",
    oracle=FLOWS_WITH + """
    SELECT dst_addr, COUNT(*) AS syn_count
    FROM flows
    WHERE proto = 6 AND (tcp_flags & 2) != 0 AND (tcp_flags & 16) = 0
    GROUP BY dst_addr
    ORDER BY syn_count DESC, dst_addr
    LIMIT 20
    """,
)
def flows_tcp_syn_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-ops on tcp_flags (ClickHouse bitAnd): SYN set, ACK clear —
    the SYN-scan detection shape."""
    fl = flows_df(spark, sf_dir)
    return (
        fl.filter(
            (F.col("proto") == 6)
            & (F.col("tcp_flags").bitwiseAND(2) != 0)
            & (F.col("tcp_flags").bitwiseAND(16) == 0)
        )
        .groupBy("dst_addr")
        .agg(F.count("*").alias("syn_count"))
        .orderBy(F.desc("syn_count"), "dst_addr")
        .limit(20)
    )


@query(
    "flows_port_fanout",
    oracle=FLOWS_WITH + """
    SELECT src_addr,
           COUNT(DISTINCT dst_port) AS n_ports,
           COUNT(DISTINCT dst_addr) AS n_dsts
    FROM flows
    GROUP BY src_addr
    ORDER BY n_ports DESC, src_addr
    LIMIT 15
    """,
)
def flows_port_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Port-scan fan-out: multiple exact distincts per key (Catalyst
    expands to grouping-id aggregation; at 100 TB swap to
    approx_count_distinct — see approx_distinct_customers)."""
    fl = flows_df(spark, sf_dir)
    return (
        fl.groupBy("src_addr")
        .agg(
            F.count_distinct("dst_port").alias("n_ports"),
            F.count_distinct("dst_addr").alias("n_dsts"),
        )
        .orderBy(F.desc("n_ports"), "src_addr")
        .limit(15)
    )


@query(
    "flows_sampler_utilization",
    oracle=FLOWS_WITH + """
    SELECT sampler_address, type,
           CAST(SUM(bytes * sampling_rate) AS BIGINT) AS est_bytes,
           CAST(MIN(time_flow_start) AS BIGINT) AS first_seen,
           CAST(MAX(time_flow_end) AS BIGINT)   AS last_seen
    FROM flows
    GROUP BY sampler_address, type
    """,
)
def flows_sampler_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-exporter rollup with sampling-rate extrapolation (the
    `bytes * sampling_rate` estimator standard for sampled NetFlow)."""
    fl = flows_df(spark, sf_dir)
    return fl.groupBy("sampler_address", "type").agg(
        F.sum(F.col("bytes") * F.col("sampling_rate")).alias("est_bytes"),
        F.min("time_flow_start").alias("first_seen"),
        F.max("time_flow_end").alias("last_seen"),
    )


@query(
    "flows_duration_histogram",
    oracle=FLOWS_WITH + """
    SELECT CASE WHEN time_flow_end - time_flow_start < 10  THEN '0-10s'
                WHEN time_flow_end - time_flow_start < 60  THEN '10-60s'
                ELSE '60s+' END AS duration_bucket,
           COUNT(*) AS n_flows,
           SUM(bytes) / (COUNT(*) * 1.0) AS avg_bytes,
           SUM(bytes) * 1.0 /
               SUM(CASE WHEN time_flow_end > time_flow_start
                        THEN time_flow_end - time_flow_start
                        ELSE 1 END) AS bytes_per_sec
    FROM flows
    GROUP BY 1
    """,
)
def flows_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow-duration histogram + aggregate bitrate (arithmetic projection
    over two epoch columns; CASE bucketing). Both ratios are EXACT
    integer sums divided once (r9 review): the earlier
    double-accumulated AVG/SUM carried both accumulation-order ulps
    and the ROUND(x, 2) .xx5 tie class; identical integers into one
    IEEE division are bit-identical across engines with no rounding."""
    fl = flows_df(spark, sf_dir)
    dur = F.col("time_flow_end") - F.col("time_flow_start")
    bucket = (
        F.when(dur < 10, "0-10s").when(dur < 60, "10-60s").otherwise("60s+")
    )
    safe_dur = F.when(dur > 0, dur).otherwise(F.lit(1))
    return (
        fl.groupBy(bucket.alias("duration_bucket"))
        .agg(
            F.count("*").alias("n_flows"),
            (F.sum("bytes") / (F.count("*") * F.lit(1.0))).alias("avg_bytes"),
            (F.sum("bytes") * F.lit(1.0) / F.sum(safe_dur))
            .alias("bytes_per_sec"),
        )
    )


@query(
    "flows_conversation_matrix",
    oracle=FLOWS_WITH + """
    SELECT src_addr, dst_addr, proto,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           COUNT(*) AS n_flows
    FROM flows
    GROUP BY src_addr, dst_addr, proto
    HAVING COUNT(*) >= 2
    ORDER BY total_bytes DESC, src_addr, dst_addr, proto
    LIMIT 25
    """,
)
def flows_conversation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation (src,dst) matrix with HAVING — the widest flow
    grouping; at 100 TB this is the query that needs AQE skew handling
    (hot talker pairs)."""
    fl = flows_df(spark, sf_dir)
    return (
        fl.groupBy("src_addr", "dst_addr", "proto")
        .agg(F.sum("bytes").alias("total_bytes"), F.count("*").alias("n_flows"))
        .filter(F.col("n_flows") >= 2)
        .orderBy(F.desc("total_bytes"), "src_addr", "dst_addr", "proto")
        .limit(25)
    )


@query(
    "flows_tumbling_traffic",
    oracle=FLOWS_WITH + """
    SELECT (time_received - (time_received % 300)) AS window_start,
           proto,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           COUNT(*) AS n_flows
    FROM flows
    GROUP BY (time_received - (time_received % 300)), proto
    """,
)
def flows_tumbling_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/windows.py tumbling_traffic — the same
    expressions run with a watermark on the live stream (stream/batch
    parity asserted in tests/test_streaming_windows.py)."""
    from ..streaming.windows import tumbling_traffic

    out = tumbling_traffic(flows_df(spark, sf_dir), streaming=False)
    return out.select(
        F.col("window_start").cast("long").alias("window_start"),
        "proto", "total_bytes", "n_flows",
    )


@query(
    "ch_dialect_top_talkers",
    oracle=FLOWS_WITH + """
    SELECT src_addr,
           CAST(SUM(bytes * sampling_rate) AS BIGINT) AS est_bytes,
           COUNT(DISTINCT dst_addr) AS n_peers,
           (time_received - (time_received % 60)) AS minute_bucket
    FROM flows
    WHERE (tcp_flags & 16) != 0
    GROUP BY src_addr, (time_received - (time_received % 60))
    ORDER BY est_bytes DESC, src_addr, minute_bucket
    LIMIT 10
    """,
)
def ch_dialect_top_talkers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A query written in ClickHouse dialect (uniqExact, bitAnd,
    toUInt64, modulo), run through the dialect shim's translate() and
    executed by Spark SQL — the portability path for existing
    ClickHouse query inventories (SURVEY.md §2.B shim row)."""
    from ..functions.dialect import translate

    view = register_sf_view(flows_df(spark, sf_dir), "flows", sf_dir)
    ch_sql = """
    SELECT src_addr,
           toUInt64(SUM(bytes * sampling_rate)) AS est_bytes,
           uniqExact(dst_addr) AS n_peers,
           (time_received - modulo(time_received, 60)) AS minute_bucket
    FROM flows
    WHERE bitAnd(tcp_flags, 16) != 0
    GROUP BY src_addr, (time_received - modulo(time_received, 60))
    ORDER BY est_bytes DESC, src_addr, minute_bucket
    LIMIT 10
    """
    return spark.sql(translate(ch_sql.replace("FROM flows", f"FROM {view}")))


@query(
    "flows_ingest_transform",
    oracle="""
    WITH raw AS (
        SELECT l_orderkey * 8 + l_linenumber AS rid,
               l_partkey % 256 AS o2, l_suppkey % 251 AS o3,
               (l_orderkey * 8 + l_linenumber) % 253 AS o4,
               40 + CAST(FLOOR(l_extendedprice) AS BIGINT) AS bytes
        FROM lineitem
    )
    SELECT concat('10.', CAST(o2 AS STRING), '.', CAST(o3 AS STRING), '.',
                  CAST(o4 AS STRING)) AS src_addr,
           COUNT(*) AS n_flows,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes
    FROM raw
    GROUP BY 1
    ORDER BY total_bytes DESC, src_addr
    LIMIT 20
    """,
)
def flows_ingest_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest projection itself (main.go:127-150) under oracle
    check: raw 4-byte addresses are synthesized from lineitem keys,
    pushed through flow_transform (including the Arrow ip_to_string
    UDF, main.go:138), and the resulting dotted-quad strings must match
    the oracle's pure string arithmetic."""
    from ..operators.flows import flow_transform

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rid = F.col("l_orderkey") * 8 + F.col("l_linenumber")

    def byte_bin(c):
        return F.unhex(F.lpad(F.hex(c), 2, "0"))

    raw = li.select(
        F.lit(1).cast("long").alias("Type"),
        F.lit(1700000000).cast("long").alias("TimeReceived"),
        rid.cast("long").alias("SequenceNum"),
        F.lit(1).cast("long").alias("SamplingRate"),
        F.lit(0).cast("long").alias("FlowDirection"),
        F.unhex(F.lit("0a000001")).alias("SamplerAddress"),
        F.lit(1700000000).cast("long").alias("TimeFlowStart"),
        F.lit(1700000000).cast("long").alias("TimeFlowEnd"),
        (F.lit(40) + F.floor("l_extendedprice").cast("long")).alias("Bytes"),
        F.lit(1).cast("long").alias("Packets"),
        F.concat(
            byte_bin(F.lit(10)),
            byte_bin(F.col("l_partkey") % 256),
            byte_bin(F.col("l_suppkey") % 251),
            byte_bin(rid % 253),
        ).alias("SrcAddr"),
        F.unhex(F.lit("ac100001")).alias("DstAddr"),
        F.lit(2048).cast("long").alias("Etype"),
        F.lit(6).cast("long").alias("Proto"),
        F.lit(40000).cast("long").alias("SrcPort"),
        F.lit(443).cast("long").alias("DstPort"),
        F.lit(64).cast("long").alias("ForwardingStatus"),
        F.lit(18).cast("long").alias("TCPFlags"),
        F.lit(0).cast("long").alias("IcmpType"),
        F.lit(0).cast("long").alias("IcmpCode"),
        F.lit(0).cast("long").alias("FragmentId"),
        F.lit(0).cast("long").alias("FragmentOffset"),
    )
    flows = flow_transform(raw)
    return (
        flows.groupBy("src_addr")
        .agg(F.count("*").alias("n_flows"), F.sum("bytes").alias("total_bytes"))
        .orderBy(F.desc("total_bytes"), "src_addr")
        .limit(20)
    )


@query(
    "flows_conversation_sessions",
    oracle=FLOWS_WITH + """
    , per_t AS (
        SELECT sampler_address, time_received AS t,
               CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(bytes) AS BIGINT) AS b
        FROM flows GROUP BY sampler_address, time_received
    ), marked AS (
        SELECT sampler_address, t, n, b,
               CASE WHEN LAG(t) OVER w IS NULL
                     OR t - LAG(t) OVER w > 2 THEN 1 ELSE 0 END AS new_s
        FROM per_t
        WINDOW w AS (PARTITION BY sampler_address ORDER BY t)
    ), sess AS (
        SELECT sampler_address, t, n, b,
               SUM(new_s) OVER (PARTITION BY sampler_address ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT sampler_address,
           MIN(t) AS session_start, MAX(t) AS session_end,
           CAST(SUM(n) AS BIGINT) AS n_flows,
           CAST(SUM(b) AS BIGINT) AS total_bytes
    FROM sess GROUP BY sampler_address, sid
    ORDER BY sampler_address, session_start
    """,
    bench=True,
)
def flows_conversation_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the applyInPandasWithState conversation tracker
    (streaming/stateful.py) under oracle check: idle-gap sessionization
    per sampler. The per-instant pre-aggregation makes tie handling
    deterministic in both engines; the streaming operator shares the
    exact semantics (tests/test_stateful.py proves stream/batch
    parity)."""
    from ..streaming.stateful import conversations_batch

    out = conversations_batch(
        flows_df(spark, sf_dir), key_cols=["sampler_address"], gap_s=2
    )
    return out.select(
        "sampler_address",
        F.col("session_start").cast("long").alias("session_start"),
        F.col("session_end").cast("long").alias("session_end"),
        "n_flows",
        "total_bytes",
    ).orderBy("sampler_address", "session_start")


@query(
    "flows_protocol_pivot",
    oracle=FLOWS_WITH + """
    SELECT flow_direction,
           CAST(COALESCE(SUM(CASE WHEN proto = 6  THEN bytes END), 0) AS BIGINT) AS tcp_bytes,
           CAST(COALESCE(SUM(CASE WHEN proto = 17 THEN bytes END), 0) AS BIGINT) AS udp_bytes,
           CAST(COALESCE(SUM(CASE WHEN proto = 1  THEN bytes END), 0) AS BIGINT) AS icmp_bytes
    FROM flows
    GROUP BY flow_direction
    ORDER BY flow_direction
    """,
)
def flows_protocol_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT: per-direction traffic spread across protocol
    columns via Spark SQL's native PIVOT clause (the oracle replays it
    as conditional aggregation — PIVOT's relational definition). Plan:
    single hash aggregate keyed on flow_direction with pivoted partial
    aggregates — one shuffle, identical shape to the CASE formulation,
    so the sugar costs nothing at scale."""
    view = register_sf_view(flows_df(spark, sf_dir), "flows", sf_dir)
    return spark.sql(f"""
        SELECT flow_direction,
               coalesce(tcp_bytes, 0)  AS tcp_bytes,
               coalesce(udp_bytes, 0)  AS udp_bytes,
               coalesce(icmp_bytes, 0) AS icmp_bytes
        FROM (SELECT flow_direction, proto, bytes FROM {view})
        PIVOT (SUM(bytes) FOR proto IN (6 AS tcp_bytes, 17 AS udp_bytes,
                                        1 AS icmp_bytes))
        ORDER BY flow_direction
    """)


@query(
    "flows_private_traffic_matrix",
    oracle=FLOWS_WITH + """
    , num AS (
        SELECT bytes,
               (CAST(string_split(src_addr, '.')[1] AS BIGINT) * 16777216
                + CAST(string_split(src_addr, '.')[2] AS BIGINT) * 65536
                + CAST(string_split(src_addr, '.')[3] AS BIGINT) * 256
                + CAST(string_split(src_addr, '.')[4] AS BIGINT)) AS s,
               (CAST(string_split(dst_addr, '.')[1] AS BIGINT) * 16777216
                + CAST(string_split(dst_addr, '.')[2] AS BIGINT) * 65536
                + CAST(string_split(dst_addr, '.')[3] AS BIGINT) * 256
                + CAST(string_split(dst_addr, '.')[4] AS BIGINT)) AS d
        FROM flows
    ),
    cls AS (
        SELECT bytes,
               ((s & 4278190080) = 167772160 OR (s & 4293918720) = 2886729728
                OR (s & 4294901760) = 3232235520) AS src_private,
               ((d & 4278190080) = 167772160 OR (d & 4293918720) = 2886729728
                OR (d & 4294901760) = 3232235520) AS dst_private
        FROM num
    )
    SELECT src_private, dst_private,
           CAST(COUNT(*) AS BIGINT) AS n_flows,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes
    FROM cls
    GROUP BY src_private, dst_private
    ORDER BY src_private, dst_private
    """,
)
def flows_private_traffic_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR classification (functions/ip.ipv4_in_cidr): every flow
    bucketed by whether src/dst fall in RFC 1918 space — the
    internal/external traffic matrix every flow deployment wants. The
    network/mask fold to literals at plan time so each membership test
    is one codegen'd AND+compare; no join, no UDF. The oracle replays
    the identical mask arithmetic."""
    from ..functions.ip import ipv4_is_private

    f = flows_df(spark, sf_dir)
    return (
        f.select(
            ipv4_is_private("src_addr").alias("src_private"),
            ipv4_is_private("dst_addr").alias("dst_private"),
            "bytes",
        )
        .groupBy("src_private", "dst_private")
        .agg(
            F.count("*").alias("n_flows"),
            F.sum("bytes").alias("total_bytes"),
        )
        .orderBy("src_private", "dst_private")
    )


@query(
    "ipv6_address_classes",
    bench=True,
    oracle="""
    SELECT CASE event_id % 5
                WHEN 0 THEN 'ula'
                WHEN 1 THEN 'link_local'
                WHEN 2 THEN 'documentation'
                WHEN 3 THEN 'multicast'
                ELSE 'global' END AS ip_class,
           COUNT(*) AS n_addrs,
           CAST(SUM(event_id % 997) AS BIGINT) AS id_checksum
    FROM events
    GROUP BY 1
    ORDER BY ip_class
    """,
)
def ipv6_address_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv6 analytics path (the reference formats v6 addresses with
    net.IP.String() at main.go:133,138,139): plant one v6 address per
    event in a well-known range chosen by event_id % 5, format it to an
    RFC 5952 string (Arrow pandas UDF, Go parity), PARSE the string
    back to (hi, lo) halves, and classify with pure-column
    ip6_in_cidr prefix compares. The oracle replays only the planting
    rule — the count/checksum per class match iff the full
    format → parse → 128-bit CIDR classification pipeline is exact.
    Scale: one projection chain, no shuffle before the 5-group agg."""
    from ..functions.ip import (
        ipv6_bits_to_string,
        ipv6_classify,
        ipv6_halves,
        ipv6_string_to_bits,
    )
    from ..schema import load_table, spread_small_scan

    h_ula, _ = ipv6_halves("fd00::")
    h_ll, _ = ipv6_halves("fe80::")
    h_doc, _ = ipv6_halves("2001:db8::")
    h_mc, _ = ipv6_halves("ff02::")
    h_gl, _ = ipv6_halves("2600::")
    # spread the two Arrow-UDF passes (format + parse) — the events
    # fixture is one row group, so they otherwise run on one core
    ev = spread_small_scan(
        spark, sf_dir,
        load_table(spark, sf_dir, "events").select("event_id"),
        table="events",
    )
    m = F.col("event_id") % 5
    hi = (
        F.when(m == 0, F.lit(h_ula) + F.col("event_id") % 65536)
        .when(m == 1, F.lit(h_ll) + F.col("event_id") % 4096)
        .when(m == 2, F.lit(h_doc) + F.col("event_id") % 100000)
        .when(m == 3, F.lit(h_mc))
        .otherwise(F.lit(h_gl) + F.col("event_id") % 65536)
    ).cast("long")
    planted = ev.select(
        "event_id", hi.alias("hi"), F.col("event_id").alias("lo")
    )
    formatted = planted.select(
        "event_id", ipv6_bits_to_string("hi", "lo").alias("addr")
    )
    parsed = formatted.select(
        "event_id", ipv6_string_to_bits("addr").alias("b")
    )
    return (
        parsed.select(
            "event_id",
            ipv6_classify(F.col("b.hi"), F.col("b.lo")).alias("ip_class"),
        )
        .groupBy("ip_class")
        .agg(
            F.count("*").alias("n_addrs"),
            F.sum(F.col("event_id") % 997).alias("id_checksum"),
        )
        .orderBy("ip_class")
    )


@query(
    "ipv6_site_traffic",
    oracle="""
    SELECT CASE event_id % 4
                WHEN 0 THEN 'pod-a'
                WHEN 1 THEN 'pod-b'
                WHEN 2 THEN 'lab'
                ELSE 'external' END AS site,
           COUNT(*) AS n_flows,
           CAST(SUM(event_id % 499) AS BIGINT) AS traffic_units
    FROM events
    GROUP BY 1
    ORDER BY site
    """,
)
def ipv6_site_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv6 site enrichment via the per-half stride fast path: the v6
    twin of flows_site_traffic. Sites are /48 (and one /32) prefixes
    expanded to 48-bit stride keys (ip6_stride_sites, driver-side over
    the broadcast dim); the fact side's key is ONE unsigned shift of
    the hi half — a broadcast HASH equi-join, no BroadcastNestedLoop,
    no UDF on the hot path. Addresses are planted per event (one /48
    pod each for m=0/1, a ULA lab /32 for m=2, global for m=3); the
    oracle replays only the planting rule, so the stride expansion,
    shift key, and join must all be exact for the per-site counts to
    match."""
    from ..functions.ip import (
        ip6_stride_key,
        ip6_stride_sites,
        ipv6_halves,
    )
    from ..schema import load_table

    sites = ip6_stride_sites(
        spark,
        {
            "pod-a": "2001:db8:a::/48",
            "pod-b": "2001:db8:b::/48",
            "lab": "fd42:dead::/32",
        },
        key_bits=48,
    )
    h_a, _ = ipv6_halves("2001:db8:a::")
    h_b, _ = ipv6_halves("2001:db8:b::")
    h_lab, _ = ipv6_halves("fd42:dead::")
    h_gl, _ = ipv6_halves("2620:1ec::")
    ev = load_table(spark, sf_dir, "events").select("event_id")
    m = F.col("event_id") % 4
    # offsets stay below the /48 (resp. /32) boundary: the planted
    # address lands inside its site's prefix
    hi = (
        F.when(m == 0, F.lit(h_a) + F.col("event_id") % 65536)
        .when(m == 1, F.lit(h_b) + F.col("event_id") % 65536)
        .when(m == 2, F.lit(h_lab) + F.col("event_id") % 4294967296)
        .otherwise(F.lit(h_gl) + F.col("event_id") % 65536)
    ).cast("long")
    planted = ev.select("event_id", hi.alias("hi"))
    return (
        planted.withColumn("ip6key", ip6_stride_key("hi", 48))
        .join(F.broadcast(sites), "ip6key", "left")  # bcast bound: config dim
        .withColumn("site", F.coalesce(F.col("site"), F.lit("external")))
        .groupBy("site")
        .agg(
            F.count("*").alias("n_flows"),
            F.sum(F.col("event_id") % 499).alias("traffic_units"),
        )
        .orderBy("site")
    )


@query(
    "flows_protocol_unpivot",
    oracle=FLOWS_WITH + """
    , wide AS (
        SELECT flow_direction,
               CAST(COALESCE(SUM(CASE WHEN proto = 6  THEN bytes END), 0) AS BIGINT) AS tcp,
               CAST(COALESCE(SUM(CASE WHEN proto = 17 THEN bytes END), 0) AS BIGINT) AS udp
        FROM flows GROUP BY flow_direction
    )
    SELECT flow_direction, 'tcp' AS protocol, tcp AS proto_bytes FROM wide
    UNION ALL
    SELECT flow_direction, 'udp' AS protocol, udp AS proto_bytes FROM wide
    ORDER BY flow_direction, protocol
    """,
)
def flows_protocol_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational UNPIVOT (the inverse of flows_protocol_pivot): a wide
    per-direction protocol aggregate melted back to long form via Spark
    SQL's native UNPIVOT clause; the oracle replays it as the UNION ALL
    it desugars to. Plan: one aggregate + an Expand node — no join, no
    extra shuffle."""
    view = register_sf_view(flows_df(spark, sf_dir), "flows", sf_dir)
    return spark.sql(f"""
        WITH wide AS (
            SELECT flow_direction,
                   coalesce(sum(CASE WHEN proto = 6  THEN bytes END), 0) AS tcp,
                   coalesce(sum(CASE WHEN proto = 17 THEN bytes END), 0) AS udp
            FROM {view} GROUP BY flow_direction
        )
        SELECT flow_direction, protocol, proto_bytes
        FROM wide UNPIVOT (proto_bytes FOR protocol IN (tcp, udp))
        ORDER BY flow_direction, protocol
    """)


@query(
    "ch_dialect_sampler_profile",
    oracle=FLOWS_WITH + """
    SELECT sampler_address,
           ROUND(MEDIAN(bytes), 1)                            AS median_bytes,
           MAX_BY(dst_port, bytes * 65536 + dst_port)         AS busiest_port,
           CAST(MIN(time_received) AS BIGINT)                 AS first_seen,
           CAST(COUNT(*) AS BIGINT)                           AS n_flows
    FROM flows
    GROUP BY sampler_address
    ORDER BY sampler_address
    """,
)
def ch_dialect_sampler_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-combinator family of the dialect shim (medianExact,
    argMax, min, count) — a ClickHouse per-exporter profile run
    verbatim through translate(). The DuckDB oracle replays with its
    own spellings: exact median interpolates identically on both
    engines (rounded to kill ulps), and the argMax payload carries a
    unique tie-breaker so MAX_BY agrees."""
    from ..functions.dialect import translate

    view = register_sf_view(flows_df(spark, sf_dir), "flows", sf_dir)
    ch_sql = """
    SELECT sampler_address,
           round(medianExact(bytes), 1)                 AS median_bytes,
           argMax(dst_port, bytes * 65536 + dst_port)   AS busiest_port,
           toUInt64(min(time_received))                 AS first_seen,
           count(*)                                     AS n_flows
    FROM flows
    GROUP BY sampler_address
    ORDER BY sampler_address
    """
    return spark.sql(translate(ch_sql.replace("FROM flows", f"FROM {view}")))


@query(
    "ch_dialect_port_profile",
    oracle=FLOWS_WITH + """
    SELECT dst_port,
           (time_received - (time_received % 300)) AS bucket,
           CAST(SUM(CASE WHEN proto = 6 THEN 1 ELSE 0 END) AS BIGINT) AS tcp_flows,
           CAST(SUM(CASE WHEN proto = 17 THEN 1 ELSE 0 END) AS BIGINT) AS udp_flows,
           CAST(SUM(CASE WHEN flow_direction = 0 THEN bytes ELSE 0 END) AS BIGINT)
               AS ingress_bytes
    FROM flows
    GROUP BY dst_port, (time_received - (time_received % 300))
    ORDER BY dst_port, bucket
    LIMIT 50
    """,
)
def ch_dialect_port_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate family of the dialect shim (countIf /
    sumIf / toStartOfInterval / toDateTime / toUInt64) — a ClickHouse
    per-port traffic profile run verbatim through translate()."""
    from ..functions.dialect import translate

    view = register_sf_view(flows_df(spark, sf_dir), "flows", sf_dir)
    ch_sql = """
    SELECT dst_port,
           toUInt64(toStartOfInterval(toDateTime(time_received),
                                      INTERVAL 5 MINUTE)) AS bucket,
           countIf(proto = 6) AS tcp_flows,
           countIf(proto = 17) AS udp_flows,
           sumIf(bytes, flow_direction = 0) AS ingress_bytes
    FROM flows
    GROUP BY dst_port, toUInt64(toStartOfInterval(toDateTime(time_received),
                                                  INTERVAL 5 MINUTE))
    ORDER BY dst_port, bucket
    LIMIT 50
    """
    return spark.sql(translate(ch_sql.replace("FROM flows", f"FROM {view}")))


@query(
    "flows_maintenance_overlap",
    oracle=FLOWS_WITH + """
    , windows AS (
        SELECT * FROM (VALUES
            (1, 1700000300, 1700000600),
            (2, 1700001500, 1700001800),
            (3, 1700002700, 1700003300)
        ) AS w(win_id, w_start, w_end)
    )
    SELECT win_id,
           CAST(COUNT(*) AS BIGINT) AS n_flows,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT sampler_address) AS n_samplers
    FROM flows JOIN windows
      ON time_flow_start <= w_end AND time_flow_end >= w_start
    GROUP BY win_id
    ORDER BY win_id
    """,
)
def flows_maintenance_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (SURVEY.md §2.B joins row): flows whose [start,end]
    interval overlaps a maintenance window — non-equi join condition.
    Scale: the window list is tiny and broadcast, so the non-equi
    predicate evaluates as a BroadcastNestedLoopJoin over 3 rows — a
    narrow pass, never an all-pairs shuffle."""
    from ..schema import local_rel

    wins = F.broadcast(  # bcast bound: fixed 3-row window list
        local_rel(
            spark,
            [(1, 1_700_000_300, 1_700_000_600),
             (2, 1_700_001_500, 1_700_001_800),
             (3, 1_700_002_700, 1_700_003_300)],
            "win_id int, w_start long, w_end long",
        )
    )
    f = flows_df(spark, sf_dir)
    cond = (F.col("time_flow_start") <= F.col("w_end")) & (
        F.col("time_flow_end") >= F.col("w_start")
    )
    return (
        f.join(wins, cond)
        .groupBy("win_id")
        .agg(
            F.count("*").alias("n_flows"),
            F.sum("bytes").alias("total_bytes"),
            F.count_distinct("sampler_address").alias("n_samplers"),
        )
        .orderBy("win_id")
    )


@query(
    "flows_top_talkers_salted",
    oracle=FLOWS_WITH + """
    SELECT src_addr,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_flows
    FROM flows
    GROUP BY src_addr
    ORDER BY total_bytes DESC, src_addr
    LIMIT 10
    """,
)
def flows_top_talkers_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top talkers via the salted two-phase aggregate (operators/
    skew.py) — identical result to the plain groupBy, skew-safe plan:
    a hot src_addr spreads over n_salt reducers in phase one, and the
    phase-two shuffle moves one row per (key, salt)."""
    from ..operators.skew import salted_agg

    f = flows_df(spark, sf_dir)
    agg = salted_agg(
        f.select("src_addr", "bytes"),
        ["src_addr"],
        {
            "total_bytes": ("sum", F.sum("bytes")),
            "n_flows": ("sum", F.count("*")),
        },
        n_salt=16,
    )
    return agg.orderBy(F.desc("total_bytes"), "src_addr").limit(10)


@query(
    "matview_flows_rollup",
    oracle=FLOWS_WITH + """
    SELECT proto, dst_port,
           CAST(SUM(bytes) AS BIGINT)   AS total_bytes,
           CAST(SUM(packets) AS BIGINT) AS total_packets,
           COUNT(*)                     AS n_flows,
           CAST(MAX(bytes) AS BIGINT)   AS max_flow_bytes,
           SUM(bytes) / (COUNT(*) * 1.0) AS avg_flow_bytes
    FROM flows
    GROUP BY proto, dst_port
    """,
)
def matview_flows_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view merge-on-read (streaming/matview.py): the
    reference's Null-engine + SummingMergeTree model
    (initdb/create_tables.sql:35). Flows are split into synthetic
    micro-batches, each reduced to a per-batch PARTIAL aggregate (the
    parquet "part" a streaming deployment would append), then the read
    path merges parts — and must equal the direct one-shot aggregation
    the oracle computes. avg is derived after the merge (sumMerge/
    countMerge style), never stored as a state.

    Scale: each part is key-sized (|proto × dst_port|), so the merge
    aggregates |batches| × |keys| rows regardless of fact-table size."""
    from ..streaming.matview import MatView

    v = MatView(
        name="traffic_by_proto_port",
        keys=("proto", "dst_port"),
        aggs=(
            ("total_bytes", "sum", "bytes"),
            ("total_packets", "sum", "packets"),
            ("n_flows", "count", "*"),
            ("max_flow_bytes", "max", "bytes"),
        ),
        path="<unused-batch-replay>",
    )
    f = flows_df(spark, sf_dir).withColumn(
        "_batch", F.col("time_received") % F.lit(8)
    )
    merged = v.merge(v.partial_agg(f, extra_keys=("_batch",)))
    return merged.select(
        "proto", "dst_port", "total_bytes", "total_packets", "n_flows",
        "max_flow_bytes",
        # exact integer ratio divided once, unrounded (r9 review —
        # the ROUND-tie class): identical integers → identical IEEE
        # quotient on both engines
        (F.col("total_bytes") / (F.col("n_flows") * F.lit(1.0))).alias(
            "avg_flow_bytes"
        ),
    )


_SITES_SQL = """
sites(site, net_lo, net_hi) AS (VALUES
    ('dc-a', 3232235520, 3232239615),
    ('dc-b', 3232239616, 3232243711),
    ('dc-c', 3232243712, 3232247807))
"""
# dc-a = 192.168.0.0/20, dc-b = 192.168.16.0/20, dc-c = 192.168.32.0/20;
# flows src pool is 192.168.{0-63}.x, so .48-.63 fall through to 'external'


@query(
    "flows_site_traffic",
    bench=True,
    oracle=FLOWS_WITH.rstrip() + f""",
    {_SITES_SQL},
    tagged AS (
        SELECT COALESCE(s.site, 'external') AS site, f.proto, f.bytes
        FROM flows f
        LEFT JOIN sites s
          ON (CAST(string_split(f.src_addr, '.')[1] AS BIGINT) * 16777216
              + CAST(string_split(f.src_addr, '.')[2] AS BIGINT) * 65536
              + CAST(string_split(f.src_addr, '.')[3] AS BIGINT) * 256
              + CAST(string_split(f.src_addr, '.')[4] AS BIGINT))
             BETWEEN s.net_lo AND s.net_hi
    )
    SELECT site, proto,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_flows
    FROM tagged GROUP BY site, proto
    """,
)
def flows_site_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension enrichment (batch twin of
    streaming.windows.enriched_site_traffic): broadcast range join of
    flows against a (site, net_lo, net_hi) CIDR table, then traffic per
    site × proto. The enrichment the reference leaves to ClickHouse
    dictionaries (ip_trie); in Spark the dimension broadcasts — prefix
    tables stay O(1M) rows at any deployment scale — so the fact side
    never shuffles for the join, only for the aggregate."""
    from ..functions.ip import cidr_stride_keys, ipv4_string_to_num
    from ..streaming.windows import sites_table

    sites = sites_table(
        spark,
        {
            "dc-a": "192.168.0.0/20",
            "dc-b": "192.168.16.0/20",
            "dc-c": "192.168.32.0/20",
        },
    )
    # stride-key expansion turns the CIDR range join into a broadcast
    # HASH equi-join (codegen) — a BroadcastNestedLoopJoin on the same
    # data measured ~10x slower; the ip projection happens once per row
    keys = cidr_stride_keys(sites, stride_bits=12)
    f = flows_df(spark, sf_dir).select(
        "proto", "bytes",
        (ipv4_string_to_num("src_addr") / (1 << 12)).cast("long").alias("ipkey"),
    )
    tagged = f.join(F.broadcast(keys), "ipkey", "left").select(  # bcast bound: stride-expanded config dim, <= O(1M) rows
        F.coalesce(F.col("site"), F.lit("external")).alias("site"),
        "proto",
        "bytes",
    )
    return tagged.groupBy("site", "proto").agg(
        F.sum("bytes").alias("total_bytes"),
        F.count("*").alias("n_flows"),
    )


# ---------------------------------------------------------------------------
# Z-order tiles (plans/storage.zorder_value parity check)
# ---------------------------------------------------------------------------

def _zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The zorder_value expression as DuckDB SQL (identical bit
    arithmetic, generated from the same parameters)."""
    mask = (1 << bits) - 1
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"((({c} & {mask}) >> {i}) & 1) * {1 << (i * n + j)}"
            )
    return " + ".join(terms)


@query(
    "flows_zorder_tiles",
    oracle=FLOWS_WITH + f"""
    SELECT CAST(({_zorder_sql(['src_port', 'dst_port'])}) >> 26 AS BIGINT)
               AS tile,
           COUNT(*) AS n_flows,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes
    FROM flows
    GROUP BY 1
    ORDER BY tile
    """,
)
def flows_zorder_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-curve tiling of the (src_port, dst_port) plane: the Morton
    key that `plans/storage.write_zordered` sorts by, bucketed into 64
    coarse tiles — histogramming it both exercises the interleave
    arithmetic end-to-end against DuckDB (32 shift/mask terms, all
    codegen) and shows the layout's balance before committing a
    cluster-on-write job to it. Plan: narrow projection + 64-group
    aggregate, one tiny shuffle."""
    from .storage import zorder_value

    f = flows_df(spark, sf_dir)
    return (
        f.select(
            F.shiftright(
                zorder_value(["src_port", "dst_port"]), 26
            ).alias("tile"),
            "bytes",
        )
        .groupBy("tile")
        .agg(
            F.count("*").alias("n_flows"),
            F.sum("bytes").alias("total_bytes"),
        )
        .orderBy("tile")
    )
