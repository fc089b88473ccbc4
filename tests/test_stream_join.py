"""Stream-stream join (streaming/joins.py): watermarked funnel join
emits the same pairs as the batch range self-join, incrementally in
append mode."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from goflow2clickhouse_spark.streaming.joins import funnel_pairs

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "ts timestamp, user_id long, event_type string"


def _ev(minutes: float, user: int, etype: str):
    return (BASE + dt.timedelta(minutes=minutes), user, etype)


def _fixture_rows():
    return [
        # user 1: view at 0, purchases at +10m (match) and +90m (outside 1h)
        _ev(0, 1, "view"),
        _ev(10, 1, "purchase"),
        _ev(90, 1, "purchase"),
        # user 2: two views, one purchase matching both
        _ev(5, 2, "view"),
        _ev(20, 2, "view"),
        _ev(40, 2, "purchase"),
        # user 3: purchase BEFORE the view — no pair
        _ev(0, 3, "purchase"),
        _ev(30, 3, "view"),
    ]


def _expected_pairs():
    # (user_id, lead_min, follow_min)
    return sorted([(1, 0, 10), (2, 5, 40), (2, 20, 40)])


def test_funnel_batch(spark):
    ev = spark.createDataFrame(_fixture_rows(), SCHEMA)
    got = funnel_pairs(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        streaming=False,
    ).collect()
    pairs = sorted(
        (r.user_id,
         int((r.lead_ts - BASE).total_seconds() // 60),
         int((r.follow_ts - BASE).total_seconds() // 60))
        for r in got
    )
    assert pairs == _expected_pairs()
    assert all(r.delay_us > 0 for r in got)


def test_funnel_stream_stream_parity(spark, tmp_path):
    """Chunked delivery through a real stream-stream join: same pairs
    as batch. Events arrive across micro-batches, so matches span
    state-store-buffered rows from earlier triggers."""
    d = tmp_path / "ev"
    rows = _fixture_rows()
    # deliver in three time-ordered chunks so pairs cross micro-batches
    for chunk in (rows[:3], rows[3:6], rows[6:]):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    joined = funnel_pairs(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        streaming=True,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("funnel_stream").collect()
    pairs = sorted(
        (r.user_id,
         int((r.lead_ts - BASE).total_seconds() // 60),
         int((r.follow_ts - BASE).total_seconds() // 60))
        for r in got
    )
    assert pairs == _expected_pairs()


def test_funnel_watermark_shorter_than_within(spark, tmp_path):
    """watermark < within is a valid low-lateness/wide-window config:
    state retention comes from the range condition (Spark holds lead
    state for the full `within` past the watermark), so on-time pairs
    spanning micro-batches are still all found (r6 review — the old
    guard rejected this)."""
    d = tmp_path / "ev"
    rows = _fixture_rows()
    for chunk in (rows[:3], rows[3:6], rows[6:]):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    joined = funnel_pairs(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        within="1 hour",
        watermark="2 minutes",
        streaming=True,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("funnel_short_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = sorted(
        (r.user_id,
         int((r.lead_ts - BASE).total_seconds() // 60),
         int((r.follow_ts - BASE).total_seconds() // 60))
        for r in spark.table("funnel_short_wm").collect()
    )
    assert pairs == _expected_pairs()
