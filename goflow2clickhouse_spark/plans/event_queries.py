"""Event-stream analytics over the `events` fixture: time bucketing,
JSON extraction, sessionization — the batch twins of the streaming
windowed aggregations (SURVEY.md §2.B time-bucketing/streaming rows).
Batch/stream parity for these shapes is asserted in
tests/test_streaming_windows.py, test_stream_join.py,
test_stream_dedup.py, and test_stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..schema import load_table
from .queries import query


def _epoch_seconds(c) -> "F.Column":
    """Session-tz-independent epoch seconds of a TIMESTAMP_NTZ column.
    A direct ntz→long cast interprets the wall-clock in the session
    zone; ntz-minus-ntz interval arithmetic does not, matching DuckDB's
    epoch() over naive timestamps under any session timezone."""
    c = F.col(c) if isinstance(c, str) else c
    return (c - F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))).cast("long")


@query(
    "events_minutely",
    oracle="""
    SELECT date_trunc('minute', ts) AS minute,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY date_trunc('minute', ts), event_type
    """,
    bench=True,
)
def events_minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time bucket (ClickHouse toStartOfMinute). This exact
    groupBy runs unchanged on a streaming DataFrame with a watermark —
    see streaming/windows.py."""
    ev = load_table(spark, sf_dir, "events")
    # F.window keeps TIMESTAMP_NTZ native (date_trunc would coerce it
    # through the session zone — tz-dependent results)
    return (
        ev.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("minute"), "event_type", "n", "total_value")
    )


@query(
    "events_sliding_windows",
    oracle="""
    WITH e AS (
        SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS tse, value FROM events
    ), w AS (
        SELECT tse - (tse % 300) AS window_start, value FROM e
        UNION ALL
        SELECT tse - (tse % 300) - 300 AS window_start, value FROM e
    )
    SELECT window_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM w GROUP BY window_start
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min width, 5 min slide) via F.window — each
    event lands in exactly two windows. The oracle reproduces the two
    overlapping tumbling grids with epoch arithmetic; window_start is
    exposed as epoch seconds so both engines hash identically."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(_epoch_seconds(F.col("w.start")).alias("window_start"), "n",
                "total_value")
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           COUNT(*) AS n,
           ROUND(AVG(value), 4) AS avg_value
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS INT) % 10
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column: get_json_object (ClickHouse
    JSONExtract*). At scale prefer from_json once into a struct column
    rather than repeated path extraction."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy((k % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


@query(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                            - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + cumulative sum —
    the batch twin of session_window streaming aggregation. One shuffle
    on user_id serves both window passes."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = _epoch_seconds("ts") - _epoch_seconds(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0),
    )
    return (
        flagged.withColumn("session_id", F.sum("new_session").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "events_user_funnel",
    oracle="""
    SELECT e1.user_id,
           COUNT(DISTINCT e2.event_id) AS purchases_after_signup
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.event_type = 'purchase'
    WHERE e1.event_type = 'signup'
    GROUP BY e1.user_id
    """,
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join funnel (signup → later purchase). The range predicate
    rides on the user_id equi-join, so it stays a hash join with a
    post-filter — no cartesian blow-up."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"))
    return (
        signups.join(purchases, "user_id")
        .filter(F.col("purchase_ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.count_distinct("purchase_id").alias("purchases_after_signup"))
    )


@query(
    "orders_asof_last_event",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, e.event_id AS last_event_id
    FROM orders o
    ASOF LEFT JOIN (
        -- pre-dedupe equal-ts events to max event_id: DuckDB ASOF
        -- picks an UNSPECIFIED tied row, the operator picks max
        -- event_id (same guard the sibling asof oracles carry)
        SELECT user_id, ts, event_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                         ORDER BY event_id DESC) AS rn
            FROM events
        ) d WHERE rn = 1
    ) e
      ON o.o_custkey % 150 = e.user_id
     AND e.ts <= o.o_orderdate + INTERVAL 30 YEAR
    """,
)
def orders_asof_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: latest event per user at or before a probe
    time, via the linear union-timeline operator (operators/asof.py).
    Oracle uses DuckDB's native ASOF JOIN. (Order dates predate event
    ts, so the probe time is shifted; the join-shape is what's under
    test.)

    The equi-join + row_number formulation that used to live here
    materializes every probe x candidate row per key before ranking —
    quadratic per key, a scale-killer; it survives only as the
    reference implementation inside tests/test_asof.py.

    Deterministic tie-break: DuckDB ASOF picks the max ts ≤ probe; ties
    on ts broken by max event_id to make both engines agree."""
    from ..operators.asof import asof_join_backward

    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    probe = o.select(
        "o_orderkey", "o_custkey",
        (F.col("o_custkey") % 150).alias("user_id"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 YEAR")).alias("probe_ts"),
    )
    out = asof_join_backward(
        probe, ev.select("user_id", "ts", "event_id"),
        key="user_id", probe_ts="probe_ts", ref_ts="ts",
        value_cols=["event_id"], tie_break="event_id",
    )
    return out.select(
        "o_orderkey", "o_custkey", F.col("event_id").alias("last_event_id")
    )


@query(
    "orders_asof_union_timeline",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           e.event_id AS last_event_id,
           ROUND(e.value, 4) AS last_event_value
    FROM orders o
    ASOF LEFT JOIN (
        SELECT user_id, ts, value,
               event_id
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                         ORDER BY event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ) e
      ON o.o_custkey % 150 = e.user_id
     AND e.ts <= o.o_orderdate + INTERVAL 30 YEAR
    """,
)
def orders_asof_union_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The union-timeline as-of operator (operators/asof.py) against
    DuckDB's native ASOF JOIN, carrying a second value column through
    the fill. The oracle pre-dedupes equal-ts events to the max
    event_id, the operator's tie-break contract."""
    from ..operators.asof import asof_join_backward

    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    probes = o.select(
        "o_orderkey", "o_custkey",
        (F.col("o_custkey") % 150).alias("user_id"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 YEAR")).alias("probe_ts"),
    )
    out = asof_join_backward(
        probes, ev,
        key="user_id", probe_ts="probe_ts", ref_ts="ts",
        value_cols=["event_id", "value"], tie_break="event_id",
    )
    return out.select(
        "o_orderkey", "o_custkey",
        F.col("event_id").alias("last_event_id"),
        F.round("value", 4).alias("last_event_value"),
    )


@query(
    "orders_asof_next_event",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           e.event_id AS next_event_id,
           ROUND(e.value, 4) AS next_event_value
    FROM orders o
    ASOF LEFT JOIN (
        SELECT user_id, ts, value, event_id
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                         ORDER BY event_id ASC) AS rn
            FROM events
        ) WHERE rn = 1
    ) e
      ON o.o_custkey % 150 = e.user_id
     AND o.o_orderdate + INTERVAL 30 YEAR <= e.ts
    """,
)
def orders_asof_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/asof.asof_join_forward): the
    earliest event at or after each order's probe time — the "next
    reading after the fact" lookup (ClickHouse ASOF >= direction).
    Same single-shuffle union-timeline plan as the backward operator,
    walked in descending time. Ties on ts resolve to the SMALLEST
    event_id (the forward mirror of backward's largest); the oracle
    pre-dedupes equal-ts events accordingly."""
    from ..operators.asof import asof_join_forward

    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    probes = o.select(
        "o_orderkey", "o_custkey",
        (F.col("o_custkey") % 150).alias("user_id"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 YEAR")).alias("probe_ts"),
    )
    out = asof_join_forward(
        probes, ev,
        key="user_id", probe_ts="probe_ts", ref_ts="ts",
        value_cols=["event_id", "value"], tie_break="event_id",
    )
    return out.select(
        "o_orderkey", "o_custkey",
        F.col("event_id").alias("next_event_id"),
        F.round("value", 4).alias("next_event_value"),
    )


@query(
    "events_funnel_pairs",
    bench=True,
    oracle="""
    WITH v AS (
        SELECT user_id, ts AS lead_ts FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT user_id, ts AS follow_ts FROM events
        WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT v.user_id,
               epoch_us(p.follow_ts) - epoch_us(v.lead_ts) AS delay_us
        FROM v JOIN p ON v.user_id = p.user_id
         AND p.follow_ts > v.lead_ts
         AND p.follow_ts <= v.lead_ts + INTERVAL '1 hour'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(delay_us) AS BIGINT) AS total_delay_us,
           CAST(MIN(delay_us) AS BIGINT) AS min_delay_us,
           CAST(MAX(delay_us) AS BIGINT) AS max_delay_us
    FROM pairs GROUP BY user_id
    """,
)
def events_funnel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel attribution: view → purchase pairs per user within one
    hour (batch twin of streaming.joins.funnel_pairs — the IDENTICAL
    join expression runs as a watermarked stream-stream join; parity
    asserted in tests/test_stream_join.py).

    Scale: the join shuffles both sides on user_id; per-key match
    windows are time-bounded, so no key explodes beyond rate × horizon
    — the same bound that caps streaming state."""
    ev = load_table(spark, sf_dir, "events")
    from ..streaming.joins import funnel_pairs

    pairs = funnel_pairs(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        within="1 hour",
        streaming=False,
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.sum("delay_us").alias("total_delay_us"),
        F.min("delay_us").alias("min_delay_us"),
        F.max("delay_us").alias("max_delay_us"),
    )


@query(
    "events_stream_dedup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(event_id % 997) AS BIGINT) AS id_checksum,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time exact dedup (batch twin of
    streaming.dedupe.stream_exact_dedup; streaming parity asserted in
    tests/test_stream_dedup.py): every 4th event is planted AGAIN as an
    exact copy — the re-sent-datagram / re-crawled-page case — then
    deduped on event_id and aggregated per type. The oracle aggregates
    the ORIGINAL table: count/checksum/total match iff dedup removed
    exactly the planted copies and nothing else.

    Scale: dedup is one hash aggregate on the key (map-side combine
    drops same-partition copies before the exchange); the streaming
    form replaces it with watermark-bounded state."""
    from ..streaming.dedupe import stream_exact_dedup

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    planted = ev.unionByName(ev.filter(F.col("event_id") % 4 == 0))
    deduped = stream_exact_dedup(planted, ["event_id"], streaming=False)
    return deduped.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("event_id") % 997).alias("id_checksum"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "events_json_variant",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 7 AS k7,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
                AS BIGINT) AS k_sum,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY k7
    """,
)
def events_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path #2, the Spark-4 form: parse the JSON ONCE
    into a VariantType column, then read fields with variant_get —
    the parse cost is paid once per row regardless of how many paths
    are read, unlike repeated get_json_object (each call re-parses the
    string; `events_json_extract` keeps that form for comparison).
    The oracle replays the same paths via DuckDB's JSON functions —
    parity shows Variant is a storage/CPU optimization, not a
    semantics change."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "value", F.parse_json("props").alias("p")
    ).select(
        F.variant_get("p", "$.k", "int").alias("k"), "value"
    )
    return (
        v.groupBy((F.col("k") % 7).alias("k7"))
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("k7")
    )


# ---------------------------------------------------------------------------
# windowed HLL distinct users (r4) — the streamable cardinality sketch
# ---------------------------------------------------------------------------

def _windowed_hll_oracle() -> str:
    from ..operators.sketch import HLL_M, hll_estimate_sql, hll_rho_sql
    from .extension_queries import _H31

    h = _H31.format(x="CAST(user_id AS VARCHAR)")
    return f"""
    WITH e AS (
        SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS tse, user_id
        FROM events
    ),
    hv AS (
        SELECT tse - (tse % 3600) AS hour_epoch,
               h % {HLL_M} AS bucket,
               CAST(FLOOR(h / {HLL_M}) AS BIGINT) AS v
        FROM (SELECT tse, {h} AS h FROM e) t
    ),
    reg AS (
        SELECT hour_epoch, bucket, MAX({hll_rho_sql()}) AS rho
        FROM hv GROUP BY hour_epoch, bucket
    ),
    agg AS (
        SELECT hour_epoch, COUNT(*) AS n_used,
               SUM(POWER(2.0, -rho)) AS inv_sum
        FROM reg GROUP BY hour_epoch
    ),
    est AS (
        SELECT hour_epoch, n_used,
               {hll_estimate_sql("n_used", "inv_sum")} AS est
        FROM agg
    ),
    ex AS (
        SELECT tse - (tse % 3600) AS hour_epoch,
               COUNT(DISTINCT user_id) AS n_exact
        FROM e GROUP BY 1
    )
    SELECT est.hour_epoch,
           CAST(est.n_used AS BIGINT) AS n_used,
           ROUND(est.est, 1) AS est,
           ex.n_exact
    FROM est JOIN ex USING (hour_epoch)
    ORDER BY est.hour_epoch
    """


@query("events_windowed_hll", bench=True, oracle=_windowed_hll_oracle())
def events_windowed_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per hour via HLL registers — the STREAMABLE form
    of windowed COUNT(DISTINCT): exact distinct is not an incremental
    aggregate (streaming would buffer every user id per window), but
    the register relation is a plain (window, bucket) → MAX(rho)
    aggregate, which Structured Streaming runs under a watermark with
    m-bounded state per window; registers also merge across restarts /
    late partials by the same max. Streaming parity of the register
    aggregation is asserted in tests/test_streaming_windows.py; here
    the batch twin is differentially proven, estimator included, with
    the exact count alongside (batch can afford it) to expose error.

    Time bucketing uses ntz-interval epoch arithmetic (not date_trunc)
    so results are session-timezone-independent — same convention as
    events_sliding_windows. (The streaming form watermarks on a
    tz-aware TIMESTAMP column — Spark rejects watermarks on
    TIMESTAMP_NTZ — so an NTZ ingest column is cast at the stream
    boundary; the parity test covers the tz-aware path.)"""
    from ..operators.sketch import HLL_M, hll_estimate_expr, hll_rho
    from ..operators.dedup import hash31

    from ..operators.dedup import tie_cache

    ev = load_table(spark, sf_dir, "events")
    tse = _epoch_seconds("ts")
    h = hash31(F.col("user_id").cast("string"))
    # persisted: the register path and the exact path both consume hv
    # — uncached, each ran its own full events scan + hash (r9 review;
    # the scan-once shape cms_heavy_hitters was reshaped to in r4)
    hv = ev.select(
        (tse - tse % 3600).alias("hour_epoch"),
        (h % HLL_M).alias("bucket"),
        hll_rho(F.floor(h / HLL_M).cast("long")).alias("rho"),
        "user_id",
    ).persist()
    reg = hv.groupBy("hour_epoch", "bucket").agg(F.max("rho").alias("rho"))
    agg = reg.groupBy("hour_epoch").agg(
        F.count("*").alias("n_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("inv_sum"),
    )
    est = hll_estimate_expr(F.col("n_used"), F.col("inv_sum"))
    exact = hv.groupBy("hour_epoch").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    out = (
        agg.select("hour_epoch", "n_used", F.round(est, 1).alias("est"))
        .join(exact, "hour_epoch")
        .orderBy("hour_epoch")
    )
    return tie_cache(out, hv)


# ---------------------------------------------------------------------------
# windowed CMS heavy hitters (r4) — the streamable frequency sketch
# ---------------------------------------------------------------------------

def _windowed_cms_oracle() -> str:
    from ..operators.sketch import CMS_ROWS, CMS_WIDTH
    from .extension_queries import _H31

    h = _H31.format(x="CAST(user_id AS VARCHAR)")
    build = "\n            UNION ALL\n".join(
        f"            SELECT hour_epoch, {i} AS row,"
        f" (({a} * h + {b}) % 2147483647) % {CMS_WIDTH} AS bucket"
        f" FROM hv"
        for i, (a, b) in enumerate(CMS_ROWS)
    )
    probe = "\n            UNION ALL\n".join(
        f"            SELECT c.hour_epoch, c.user_id, cells.c FROM ch c"
        f" JOIN cells ON cells.hour_epoch = c.hour_epoch"
        f" AND cells.row = {i}"
        f" AND cells.bucket = (({a} * c.h + {b}) % 2147483647) % {CMS_WIDTH}"
        for i, (a, b) in enumerate(CMS_ROWS)
    )
    return f"""
    WITH e AS (
        SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS tse, user_id
        FROM events
    ),
    hv AS (
        SELECT tse - (tse % 3600) AS hour_epoch, user_id, {h} AS h
        FROM e
    ),
    cells AS (
        SELECT hour_epoch, row, bucket, COUNT(*) AS c FROM (
{build}
        ) rb GROUP BY hour_epoch, row, bucket
    ),
    ch AS (
        SELECT DISTINCT hour_epoch, user_id, h FROM hv
    ),
    est AS (
        SELECT hour_epoch, user_id, MIN(c) AS est FROM (
{probe}
        ) p GROUP BY hour_epoch, user_id
    ),
    ex AS (
        SELECT hour_epoch, user_id, COUNT(*) AS exact
        FROM hv GROUP BY hour_epoch, user_id
    ),
    ranked AS (
        SELECT est.hour_epoch, est.user_id,
               CAST(est.est AS BIGINT) AS est_events,
               CAST(ex.exact AS BIGINT) AS exact_events,
               ROW_NUMBER() OVER (PARTITION BY est.hour_epoch
                                  ORDER BY est.est DESC, est.user_id) AS rn
        FROM est JOIN ex ON est.hour_epoch = ex.hour_epoch
                        AND est.user_id = ex.user_id
    )
    SELECT hour_epoch, user_id, est_events, exact_events
    FROM ranked WHERE rn <= 3
    ORDER BY hour_epoch, est_events DESC, user_id
    """


@query("events_windowed_cms", bench=True, oracle=_windowed_cms_oracle())
def events_windowed_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour heavy hitters via a WINDOWED count-min sketch — the
    streamable form of per-window top-k frequency: the cell build is a
    plain (window, row, bucket) -> COUNT aggregate, which Structured
    Streaming runs under a watermark with depth x width state per
    window (a per-window exact top-k would buffer every key). Top-3
    users per hour by CMS estimate, exact counts alongside so the
    differential test verifies est >= exact per (window, user) under
    identical hashing — same contract as cms_heavy_hitters, lifted to
    event-time windows. Completes the streamable-sketch pair with
    events_windowed_hll (distinct) — this one is frequency.

    At 100 TB the sketch is fixed-size PER WINDOW (depth x width
    ≤ 2048 cells) but the batch probe joins candidates against cells
    for ALL windows at once — a relation that grows linearly with
    history (a year of hourly windows ≈ 18M cells). So the probe join
    is a plain equi-join on (window, row, bucket) with NO broadcast
    hint: AQE broadcasts it while small and shuffles once it isn't,
    which scales window-linearly; a forced broadcast would be a
    scale-killer as history accumulates (r4 verdict finding —
    tests/test_plans.py asserts the optimized plan carries no
    broadcast HINT; a stats/AQE-chosen broadcast while the relation
    is genuinely small remains allowed and expected). Candidates here
    are the in-window users (batch can enumerate them), in production
    the watchlist you track."""
    from ..operators.dedup import hash31
    from ..operators.sketch import CMS_ROWS, CMS_WIDTH, cms_bucket

    from ..operators.dedup import tie_cache

    ev = load_table(spark, sf_dir, "events")
    tse = _epoch_seconds("ts")
    h = hash31(F.col("user_id").cast("string"))
    # persisted: cells build, candidate distinct AND exact counts all
    # consume hv — uncached, three full events scans per run (r9
    # review; the r4 scan-once rule). NOT spread (r14 optimization
    # round): an A/B with schema.spread_small_scan measured the
    # repartition exchange + wider persist COSTING 0.3-0.4 s against
    # the ~0.1 s the parallelized per-row md5 saves — one short
    # user_id hash per row is too little map work to buy an exchange.
    hv = ev.select(
        (tse - tse % 3600).alias("hour_epoch"),
        "user_id",
        h.alias("h"),
    ).persist()
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    cms_bucket(F.col("h"), a, b, CMS_WIDTH).alias("bucket"),
                )
                for i, (a, b) in enumerate(CMS_ROWS)
            ]
        )
    ).alias("rb")
    cells = (
        hv.select("hour_epoch", rb)
        .select("hour_epoch", "rb.row", "rb.bucket")
        .groupBy("hour_epoch", "row", "bucket")
        .agg(F.count("*").alias("c"))
    )
    cand = hv.select("hour_epoch", "user_id", "h").distinct()
    probe = (
        cand.select("hour_epoch", "user_id", rb)
        .select("hour_epoch", "user_id", "rb.row", "rb.bucket")
        .join(cells, ["hour_epoch", "row", "bucket"])
        .groupBy("hour_epoch", "user_id")
        .agg(F.min("c").alias("est"))
    )
    exact = hv.groupBy("hour_epoch", "user_id").agg(
        F.count("*").alias("exact")
    )
    w = Window.partitionBy("hour_epoch").orderBy(
        F.desc("est"), "user_id"
    )
    out = (
        probe.join(exact, ["hour_epoch", "user_id"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "hour_epoch", "user_id",
            F.col("est").alias("est_events"),
            F.col("exact").alias("exact_events"),
        )
        .orderBy("hour_epoch", F.desc("est_events"), "user_id")
    )
    return tie_cache(out, hv)
