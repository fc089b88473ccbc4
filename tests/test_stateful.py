"""Custom stateful streaming operator (applyInPandasWithState
conversation tracker): stream/batch parity, timeout emission, tie
handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goflow2clickhouse_spark.operators.flows import flow_transform
from goflow2clickhouse_spark.schema import RAW_FLOW_SCHEMA
from goflow2clickhouse_spark.streaming.stateful import (
    conversation_tracker,
    conversations_batch,
)
from tests.test_flows_transform import _raw_row

BASE = 1_700_000_000
KEY = ["src_addr", "dst_addr", "proto"]


def _rows(start_s: int, n: int, seq0: int, bytes_: int = 100, step: int = 5):
    return [
        _raw_row(
            TimeReceived=start_s + i * step,
            SequenceNum=seq0 + i,
            Bytes=bytes_,
        )
        for i in range(n)
    ]


@pytest.fixture()
def session_chunks(spark, tmp_path):
    """Three time-ordered chunks for one conversation key:
    chunk 0: 5 flows 5s apart   (session A)
    chunk 1: gap 300s, 3 flows  (session B), incl. a duplicate timestamp
    chunk 2: gap 600s, 1 far-future flush flow on a different key so the
             watermark passes every real session's end.
    """
    d = tmp_path / "conv"
    c0 = _rows(BASE, 5, 0)
    c1 = _rows(BASE + 1000, 3, 100)
    c1.append(_raw_row(TimeReceived=BASE + 1000, SequenceNum=999, Bytes=7))
    c2 = [
        _raw_row(
            TimeReceived=BASE + 100_000,
            SequenceNum=5000,
            SrcAddr=bytes([10, 9, 9, 9]),
        )
    ]
    for chunk in (c0, c1, c2):
        spark.createDataFrame(chunk, RAW_FLOW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
    return d


def _run_stream(spark, path, ckpt, gap_s=30, watermark="10 seconds"):
    raw = (
        spark.readStream.schema(RAW_FLOW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(path))
    )
    out = conversation_tracker(
        flow_transform(raw), key_cols=KEY, gap_s=gap_s, watermark=watermark
    )
    q = (
        out.writeStream.format("memory")
        .queryName("conv_stream")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table("conv_stream")


def test_stream_batch_parity(spark, tmp_path, session_chunks):
    """Every closed session the stateful operator emits must equal the
    batch twin's sessions on the same input (excluding the flush key,
    whose trailing session never times out)."""
    streamed = _run_stream(spark, session_chunks, tmp_path / "ck")
    got = sorted(
        (r.src_addr, r.dst_addr, r.proto,
         int(r.session_start.timestamp()), int(r.session_end.timestamp()),
         r.n_flows, r.total_bytes)
        for r in streamed.collect()
        if r.src_addr != "10.9.9.9"
    )

    batch_raw = spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(session_chunks))
    twin = conversations_batch(flow_transform(batch_raw), key_cols=KEY, gap_s=30)
    want = sorted(
        (r.src_addr, r.dst_addr, r.proto,
         int(r.session_start.timestamp()), int(r.session_end.timestamp()),
         r.n_flows, r.total_bytes)
        for r in twin.filter(F.col("src_addr") != "10.9.9.9").collect()
    )
    assert got == want
    assert len(got) == 2  # sessions A and B


def test_sessions_content(spark, tmp_path, session_chunks):
    streamed = _run_stream(spark, session_chunks, tmp_path / "ck2")
    rows = sorted(
        (r for r in streamed.collect() if r.src_addr != "10.9.9.9"),
        key=lambda r: r.session_start,
    )
    a, b = rows
    assert a.n_flows == 5 and a.total_bytes == 500
    assert int((a.session_end - a.session_start).total_seconds()) == 20
    # session B: 3 flows + 1 duplicate-timestamp flow folded in
    assert b.n_flows == 4 and b.total_bytes == 307


def test_late_event_cannot_regress_session_end(spark, tmp_path):
    """A later micro-batch delivering an in-watermark late event (t below
    the carried session end) must not move the session end backwards —
    regression would fire the event-time timeout early and break parity
    with the batch twin."""
    d = tmp_path / "late"
    # batch 0: 5 flows BASE..BASE+20 → state end = BASE+20, wm = BASE+10
    c0 = _rows(BASE, 5, 0)
    # batch 1: one late event at BASE+15 — inside the watermark, below end
    c1 = [_raw_row(TimeReceived=BASE + 15, SequenceNum=50, Bytes=9)]
    # batch 2: far-future flush on another key so the session times out
    c2 = [
        _raw_row(
            TimeReceived=BASE + 100_000,
            SequenceNum=5000,
            SrcAddr=bytes([10, 9, 9, 9]),
        )
    ]
    for chunk in (c0, c1, c2):
        spark.createDataFrame(chunk, RAW_FLOW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))

    streamed = _run_stream(spark, d, tmp_path / "ck_late")
    rows = [r for r in streamed.collect() if r.src_addr != "10.9.9.9"]
    assert len(rows) == 1
    (s,) = rows
    assert int(s.session_end.timestamp()) == BASE + 20  # not BASE+15
    assert s.n_flows == 6 and s.total_bytes == 509

    batch_raw = spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(d))
    twin = conversations_batch(flow_transform(batch_raw), key_cols=KEY, gap_s=30)
    t = twin.filter(F.col("src_addr") != "10.9.9.9").collect()
    assert len(t) == 1
    assert int(t[0].session_end.timestamp()) == BASE + 20
    assert t[0].n_flows == 6 and t[0].total_bytes == 509


def test_late_event_before_session_start(spark, tmp_path):
    """A late in-watermark event BEFORE the carried session start must
    lower session_start when within the gap, matching the batch twin."""
    d = tmp_path / "late_pre"
    # batch 0: 3 flows BASE+20..BASE+30 → state [BASE+20, BASE+30]
    c0 = _rows(BASE + 20, 3, 0)
    # batch 1: late event at BASE+12 — within gap (30s) of the carried
    # start BASE+20, and above the 60s watermark (wm = BASE+30-60)
    c1 = [_raw_row(TimeReceived=BASE + 12, SequenceNum=50, Bytes=9)]
    c2 = [
        _raw_row(
            TimeReceived=BASE + 100_000,
            SequenceNum=5000,
            SrcAddr=bytes([10, 9, 9, 9]),
        )
    ]
    for chunk in (c0, c1, c2):
        spark.createDataFrame(chunk, RAW_FLOW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))

    streamed = _run_stream(spark, d, tmp_path / "ck_late_pre",
                           watermark="60 seconds")
    rows = [r for r in streamed.collect() if r.src_addr != "10.9.9.9"]

    batch_raw = spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(d))
    twin = conversations_batch(flow_transform(batch_raw), key_cols=KEY, gap_s=30)
    want = sorted(
        (int(r.session_start.timestamp()), int(r.session_end.timestamp()),
         r.n_flows, r.total_bytes)
        for r in twin.filter(F.col("src_addr") != "10.9.9.9").collect()
    )
    got = sorted(
        (int(r.session_start.timestamp()), int(r.session_end.timestamp()),
         r.n_flows, r.total_bytes)
        for r in rows
    )
    assert got == want
    assert got[0][0] == BASE + 12  # start lowered by the late event


def test_batch_twin_tie_determinism(spark):
    """Duplicate event times at a session boundary must land in one
    session regardless of row order (the per-instant pre-aggregation)."""
    rows = (
        _rows(BASE, 2, 0)
        + [_raw_row(TimeReceived=BASE + 100, SequenceNum=10, Bytes=1)] * 3
    )
    df = flow_transform(spark.createDataFrame(rows, RAW_FLOW_SCHEMA))
    out = conversations_batch(df, key_cols=KEY, gap_s=30).collect()
    assert len(out) == 2
    by_start = sorted(out, key=lambda r: r.session_start)
    assert by_start[1].n_flows == 3 and by_start[1].total_bytes == 3
