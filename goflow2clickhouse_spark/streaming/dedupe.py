"""Streaming exact deduplication — the ingest-time dedup stage of a
training-data pipeline (drop exact re-crawls / re-sends as they
arrive, before they ever hit storage).

The reference inserts whatever the collector emits (no dedup anywhere
in main.go); this is one of the capabilities its ClickHouse deployment
would bolt on with ReplacingMergeTree. Spark-first form: the built-in
`dropDuplicatesWithinWatermark` operator — state-store keyed by the
dedup key, entries evicted once the watermark passes, so state is
O(key-rate × watermark horizon), not O(stream length). That bounded
window is the semantic difference from batch exact dedup (a key
re-appearing after the horizon is re-emitted); at 100 TB/day you
choose the horizon, because unbounded streaming state is the thing
that falls over.

Batch twin: `dropDuplicates` over the same keys (one hash aggregate).
Both paths keep an arbitrary representative per key — callers needing
a deterministic pick (and a deterministic oracle) should either dedup
exact-copy rows or aggregate afterwards; operators/dedup.exact_dedup
is the deterministic min-id batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_exact_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Keep the first-arriving row per `keys`. Streaming: requires the
    event-time column `ts_col`; duplicates arriving within the
    watermark horizon of the first occurrence are dropped, and the
    per-key state entry is evicted once the watermark passes its
    event time. Batch: plain dropDuplicates (full-history dedup).

    A TIMESTAMP_NTZ event-time column (what parquet TIMESTAMP(NANOS)
    fixtures read as on Spark 4.1) is cast to TIMESTAMP in the
    streaming path — watermarks only accept the instant type; the cast
    pins the wall-clock in the session zone, which only shifts the
    eviction clock, never which rows are duplicates."""
    if streaming:
        from pyspark.sql import functions as F
        from pyspark.sql.types import TimestampNTZType

        if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return df.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
