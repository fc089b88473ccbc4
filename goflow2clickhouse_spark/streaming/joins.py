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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    rows once no future match is possible; `watermark` should be ≥
    `within` plus the allowed lateness."""
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
    return l.join(f, cond).select(
        key,
        "lead_ts",
        "follow_ts",
        (F.unix_micros("follow_ts") - F.unix_micros("lead_ts")).alias(
            "delay_us"
        ),
    )
