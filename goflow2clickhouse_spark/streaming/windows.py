"""Streaming windowed aggregations over the flow stream — the
materialized-view layer the reference delegates to ClickHouse
(ENGINE=Null + attached MVs, initdb/create_tables.sql:35). Each
function works on BOTH a batch and a streaming flows DataFrame (same
expressions), so every streaming aggregate has a batch twin the oracle
can check (SURVEY.md §7.4: keep streaming state expressible in batch).

Late data: the reference inserts late rows as-is (no event-time
processing anywhere in main.go). Here late rows are handled properly:
`withWatermark` bounds state and drops rows later than the allowed
lateness — a documented semantic upgrade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(flows: DataFrame, col: str = "time_received") -> DataFrame:
    """Epoch-seconds → TimestampType event-time column `ts`."""
    return flows.withColumn("ts", F.timestamp_seconds(F.col(col)))


def tumbling_traffic(
    flows: DataFrame,
    width: str = "5 minutes",
    watermark: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Per-protocol traffic in tumbling windows. Streaming: partial
    aggregates live in the state store keyed by (window, proto) —
    state size is bounded by watermark horizon × key cardinality,
    independent of input volume (the 100 TB-safe design)."""
    df = with_event_time(flows)
    if streaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", width).alias("w"), "proto")
        .agg(
            F.sum("bytes").alias("total_bytes"),
            F.count("*").alias("n_flows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "proto",
            "total_bytes",
            "n_flows",
        )
    )


def sliding_top_talker_bytes(
    flows: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Per-source bytes in sliding windows (each row feeds
    width/slide windows)."""
    df = with_event_time(flows)
    if streaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", width, slide).alias("w"), "src_addr")
        .agg(F.sum("bytes").alias("total_bytes"))
        .select(F.col("w.start").alias("window_start"), "src_addr", "total_bytes")
    )


def session_conversations(
    flows: DataFrame,
    gap: str = "30 seconds",
    watermark: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Conversation sessions per (src,dst): flows closer than `gap`
    merge into one session — `session_window` is the stateful custom
    operator ClickHouse has no native equivalent for."""
    df = with_event_time(flows)
    if streaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(
            F.session_window("ts", gap).alias("w"), "src_addr", "dst_addr"
        )
        .agg(F.sum("bytes").alias("total_bytes"), F.count("*").alias("n_flows"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "src_addr",
            "dst_addr",
            "total_bytes",
            "n_flows",
        )
    )


def sites_table(spark, mapping: dict[str, str]) -> DataFrame:
    """Static site dimension from {site: cidr}: (site, net_lo, net_hi)
    rows, range-joinable against any IPv4 numeric column.

    Built as a SQL VALUES LocalRelation, not createDataFrame: the
    Python-RDD conversion path (applySchemaToPythonRDD) costs ~0.5 s
    per plan execution even for 3 rows — measured as the dominant cost
    of the whole enrichment query — while a LocalRelation is free and
    broadcasts directly."""
    from ..functions.ip import cidr_bounds

    def esc(s: str) -> str:
        # Spark's parser processes backslash escapes inside string
        # literals, so backslashes must double BEFORE quote-doubling —
        # 'corp\hq' silently mutated and a trailing backslash escaped
        # the closing quote (r6 review)
        return s.replace("\\", "\\\\").replace("'", "''")

    rows = ", ".join(
        "('{}', {}, {})".format(esc(site), *cidr_bounds(c))
        for site, c in sorted(mapping.items())
    )
    return spark.sql(
        f"SELECT site, CAST(net_lo AS BIGINT) AS net_lo, "
        f"CAST(net_hi AS BIGINT) AS net_hi "
        f"FROM (VALUES {rows}) AS t(site, net_lo, net_hi)"
    )


def enriched_site_traffic(
    flows: DataFrame,
    sites: DataFrame,
    width: str = "5 minutes",
    watermark: str = "10 minutes",
    streaming: bool = True,
    validate: bool = True,
) -> DataFrame:
    """Stream-static enrichment: tag each flow with the site owning its
    source prefix (broadcast range join against the static dimension),
    then aggregate traffic per (window, site). Unmatched sources fall
    into 'external'.

    The production enrichment pattern the reference leaves to
    ClickHouse dictionaries: the static side re-reads per micro-batch,
    stays broadcast (prefix tables are ≤ O(1M) rows at any deployment
    size), and the stream side never shuffles before the window
    aggregate. Stream-static joins need no watermark themselves; the
    watermark here bounds the downstream window state.

    Site ranges MUST be disjoint — a flow matching two ranges would be
    emitted twice by the join and counted in BOTH sites' aggregates
    (unlike the longest-prefix-match of a ClickHouse dictionary, which
    a streaming plan cannot replicate: picking the best match needs a
    per-row window, illegal before a streaming aggregate). `validate`
    (default) enforces it with one tiny job over the broadcast-sized
    dim, catching nested prefixes AND duplicated rows; deployments
    with genuinely nested prefixes should split them into disjoint
    ranges (or use the stride-key dictionary form) first."""
    from ..functions.ip import ipv4_string_to_num

    if validate:
        # Deterministic tag: monotonically_increasing_id() is
        # partition-dependent, and a self-join executes the expression
        # independently per branch — the same row could get different
        # ids on each side and "overlap itself", raising a spurious
        # error on disjoint sites. row_number() over the natural key is
        # stable across both branches (dim is broadcast-sized, so the
        # single-task window is fine here).
        from pyspark.sql import Window

        tagged = sites.withColumn(
            "_i", F.row_number().over(Window.orderBy("net_lo", "net_hi", "site"))
        )
        a, b = tagged.alias("a"), tagged.alias("b")
        clash = (
            a.join(
                b,
                (F.col("a._i") < F.col("b._i"))
                & (F.col("a.net_lo") <= F.col("b.net_hi"))
                & (F.col("b.net_lo") <= F.col("a.net_hi")),
            )
            .select(F.col("a.site"), F.col("b.site"))
            .limit(1)
            .collect()
        )
        if clash:
            raise ValueError(
                f"site ranges overlap ({clash[0][0]!r} vs {clash[0][1]!r})"
                " — overlapping/nested prefixes would double-count flows"
            )

    df = with_event_time(flows)
    if streaming:
        df = df.withWatermark("ts", watermark)
    ip = ipv4_string_to_num("src_addr")
    joined = df.join(
        F.broadcast(sites),  # bcast bound: config dim <= O(1M) rows
        (ip >= sites["net_lo"]) & (ip <= sites["net_hi"]),
        "left",
    ).withColumn("site", F.coalesce(F.col("site"), F.lit("external")))
    return (
        joined.groupBy(F.window("ts", width).alias("w"), "site")
        .agg(
            F.sum("bytes").alias("total_bytes"),
            F.count("*").alias("n_flows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "site",
            "total_bytes",
            "n_flows",
        )
    )


def dedup_stream(
    flows: DataFrame,
    key_cols: tuple[str, ...] = ("sampler_address", "sequence_num"),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop re-delivered flow records (UDP
    duplicates, exporter resends) on their identity key.
    dropDuplicatesWithinWatermark keeps one state row per key only
    until the watermark passes — state is bounded by horizon x key
    rate, never by stream length (the 100 TB-safe streaming dedup;
    plain dropDuplicates on a stream grows state forever)."""
    return (
        with_event_time(flows)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark([*key_cols])
    )
