"""Stream-stream joins: event correlation within a bounded time range.

The last Structured Streaming join mode the engine exercises (stream-
static is in windows.enriched_site_traffic): two watermarked streams
inner-joined on an equi-key plus an event-time range. Spark buffers
each side in the state store only until the watermark passes the range
bound, so state is O(key-rate × horizon) — the 100 TB-safe shape — and
matches emit incrementally in append mode.

The same plan expression runs on batch DataFrames (a plain range self-
join), which is how the oracle checks it: plans/event_queries.py
registers the batch twin `events_funnel_pairs`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INTERVAL_RE = re.compile(
    r"^\s*\d+\s+(microsecond|millisecond|second|minute|hour|day|week)s?\s*$",
    re.IGNORECASE,
)

_UNIT_SECONDS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
    "minute": 60.0, "hour": 3600.0, "day": 86400.0, "week": 604800.0,
}


def _interval_seconds(spec: str) -> float:
    """Parse a simple 'N unit' interval, rejecting anything else before
    it reaches an F.expr interpolation."""
    m = _INTERVAL_RE.match(spec)
    if not m:
        raise ValueError(
            f"interval must be 'N unit' (unit in {sorted(_UNIT_SECONDS)}): "
            f"{spec!r}"
        )
    return float(spec.split()[0]) * _UNIT_SECONDS[m.group(1).lower()]


def funnel_pairs(
    lead: DataFrame,
    follow: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """All (lead, follow) event pairs per key where the follow event
    lands strictly after the lead and within `within` — the funnel /
    attribution join (view → purchase, request → error, …).

    Returns (key, lead_ts, follow_ts, delay_us). Streaming: both sides
    MUST carry the watermark so the state store can evict buffered
    rows once no future match is possible. `watermark` governs LATE-
    ARRIVAL tolerance only — Spark derives each side's state retention
    from the range condition itself (lead state is held for the full
    `within` window past the event-time watermark), so
    watermark < within is a VALID low-lateness/wide-window config and
    is no longer rejected (r6 review; the old guard conflated the two
    and blocked it — parity across that config is pinned in
    tests/test_stream_join.py). Both intervals are still validated as
    'N unit' before any F.expr interpolation."""
    _interval_seconds(watermark)
    _interval_seconds(within)
    l = lead.select(F.col(key), F.col(ts_col).alias("lead_ts"))
    f = follow.select(
        F.col(key).alias("_fk"), F.col(ts_col).alias("follow_ts")
    )
    if streaming:
        l = l.withWatermark("lead_ts", watermark)
        f = f.withWatermark("follow_ts", watermark)
    cond = (
        (F.col(key) == F.col("_fk"))
        & (F.col("follow_ts") > F.col("lead_ts"))
        & (F.expr(f"follow_ts <= lead_ts + INTERVAL '{within}'"))
    )
    # interval arithmetic, not unix_micros: works for TIMESTAMP and
    # TIMESTAMP_NTZ alike and never routes through the session zone
    delay_us = (
        (F.col("follow_ts") - F.col("lead_ts")).cast("decimal(25,6)")
        * F.lit(1_000_000)
    ).cast("long")
    return l.join(f, cond).select(
        key,
        "lead_ts",
        "follow_ts",
        delay_us.alias("delay_us"),
    )
