"""Custom stateful streaming operator: conversation tracking over the
flow stream with `applyInPandasWithState`.

The reference has no stateful processing at all (SURVEY.md §2.A: late
data is inserted as-is, no event-time handling anywhere in main.go);
`session_window` (streaming/windows.py) covers the built-in gap-session
shape. This operator is the *custom* variant for semantics the built-in
can't express — per-conversation state with arbitrary transition logic
(merge policy, per-session derived fields, early emission), the
`applyInPandasWithState` pattern from the PySpark Structured Streaming
API.

Semantics (identical in the streaming operator and the batch twin):
- flows are pre-aggregated per (key, second): ties on the event time
  always land in the same session regardless of row order — without
  this, lag()-based sessionization is nondeterministic under ties;
- consecutive per-second rows whose gap exceeds `gap_s` start a new
  session; a session emits (key, session_start, session_end, n_flows,
  total_bytes);
- streaming: the trailing (still-open) session per key lives in the
  state store and emits when the event-time watermark passes its end +
  gap (GroupStateTimeout.EventTimeTimeout). Sessions closed *within* a
  batch emit immediately. State per key is one fixed-width row —
  state size is O(active conversations), independent of input volume.

At 100 TB: the shuffle is one exchange on the conversation key; the
pandas handler sees per-key batches via Arrow. Skewed keys (one hot
conversation) bound the handler's batch to that key's rows per trigger,
not the whole partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from .windows import with_event_time

_KEY_COLS = ["src_addr", "dst_addr", "proto"]

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_flows", LongType()),
        StructField("total_bytes", LongType()),
    ]
)


def _output_schema(key_cols: list[str], key_types: list[Any]) -> StructType:
    return StructType(
        [StructField(c, t) for c, t in zip(key_cols, key_types)]
        + [
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_flows", LongType()),
            StructField("total_bytes", LongType()),
        ]
    )


def _session_frames(
    key: tuple,
    key_cols: list[str],
    sessions: list[tuple[int, int, int, int]],
    tz: str,
) -> pd.DataFrame:
    recs = []
    for start_ms, end_ms, n, b in sessions:
        rec = dict(zip(key_cols, key))
        # instants are TRUE epoch ms; the output TimestampType column
        # is interpreted naive-in-session-tz, so render each instant
        # in the session zone (identity under UTC)
        rec["session_start"] = (
            pd.Timestamp(start_ms, unit="ms", tz="UTC")
            .tz_convert(tz).tz_localize(None)
        )
        rec["session_end"] = (
            pd.Timestamp(end_ms, unit="ms", tz="UTC")
            .tz_convert(tz).tz_localize(None)
        )
        rec["n_flows"] = n
        rec["total_bytes"] = b
        recs.append(rec)
    return pd.DataFrame(recs)


def _make_tracker(key_cols: list[str], gap_s: int, tz: str):
    gap_ms = gap_s * 1000

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_ms, end_ms, n, b = state.get
            state.remove()
            yield _session_frames(
                key, key_cols, [(start_ms, end_ms, n, b)], tz
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        # pre-aggregate per event-time instant: tie-safe sessionization.
        # ts_ms is TRUE epoch millis computed JVM-side (unix_millis) —
        # the pandas `ts` column arrives session-tz-naive, so deriving
        # millis from it under a non-UTC session would shift the clock
        # against getCurrentWatermarkMs()/setTimeoutTimestamp (both
        # true epoch) and close sessions hours early/late
        ts_ms = rows["ts_ms"]
        per_t = (
            pd.DataFrame({"t": ts_ms, "bytes": rows["bytes"]})
            .groupby("t", sort=True)
            .agg(n=("bytes", "size"), b=("bytes", "sum"))
            .reset_index()
        )

        # Interval fold over the carried session + this batch's instants,
        # sorted by interval start. A later micro-batch can deliver an
        # in-watermark late event ANYWHERE relative to the carried
        # session: inside it (must not regress end_ms — early
        # EventTimeTimeout — nor miss lowering start_ms), or before it
        # by more than the gap (must become its own earlier session, not
        # be glued on). Treating state as one interval item in the same
        # sorted fold handles every ordering with the batch twin's
        # semantics. Residual divergence (inherent to append-mode
        # emission): a session closed by a same-batch gap is emitted
        # immediately; an extremely late future event could have bridged
        # it while the watermark still allowed — the watermark delay is
        # the knob that bounds this window.
        items: list[list[int]] = []
        if state.exists:
            items.append(list(state.get))
        items.extend(
            [int(t), int(t), int(n), int(b)]
            for t, n, b in per_t.itertuples(index=False)
        )
        items.sort(key=lambda x: (x[0], x[1]))

        sessions: list[tuple[int, int, int, int]] = []
        cur = None
        for it in items:
            if cur is None:
                cur = it[:]
            elif it[0] - cur[1] > gap_ms:
                sessions.append(tuple(cur))
                cur = it[:]
            else:
                cur[1] = max(cur[1], it[1])
                cur[2] += it[2]
                cur[3] += it[3]

        wm = state.getCurrentWatermarkMs()
        if cur is not None and cur[1] + gap_ms <= wm:
            # trailing session already expired relative to the watermark
            sessions.append(tuple(cur))
            cur = None
        if cur is None:
            if state.exists:
                state.remove()
        else:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(cur[1] + gap_ms)
        if sessions:
            yield _session_frames(key, key_cols, sessions, tz)

    return track


def conversation_tracker(
    flows: DataFrame,
    key_cols: list[str] | None = None,
    gap_s: int = 30,
    watermark: str = "2 minutes",
    time_col: str = "time_received",
) -> DataFrame:
    """Streaming conversation sessions via applyInPandasWithState.

    `flows` is the transformed 22-column stream; the event time is
    `time_col` (epoch seconds). Output appends one row per closed
    session."""
    key_cols = key_cols or _KEY_COLS
    df = with_event_time(flows, time_col).withWatermark("ts", watermark)
    key_types = [df.schema[c].dataType for c in key_cols]
    tz = flows.sparkSession.conf.get("spark.sql.session.timeZone")
    return (
        df.select(
            *key_cols, "ts",
            F.unix_millis("ts").alias("ts_ms"), "bytes",
        )
        .groupBy(*key_cols)
        .applyInPandasWithState(
            _make_tracker(key_cols, gap_s, tz),
            _output_schema(key_cols, key_types),
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def conversations_batch(
    flows: DataFrame,
    key_cols: list[str] | None = None,
    gap_s: int = 30,
    time_col: str = "time_received",
) -> DataFrame:
    """Batch twin of `conversation_tracker` — identical session
    semantics expressed with window functions, so the stateful operator
    has an oracle-checkable equivalent (SURVEY.md §7.4).

    Plan: pre-aggregate per (key, instant) → lag/cumsum boundary
    detection → session aggregation. Two shuffles on the key; the
    window runs over per-instant rows, not raw flows."""
    key_cols = key_cols or _KEY_COLS
    df = with_event_time(flows, time_col)
    per_t = df.groupBy(*key_cols, "ts").agg(
        F.count("*").alias("n"), F.sum("bytes").alias("b")
    )
    w = Window.partitionBy(*key_cols).orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = per_t.withColumn(
        "new_s", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    )
    sid = F.sum("new_s").over(
        Window.partitionBy(*key_cols).orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.withColumn("sid", sid)
        .groupBy(*key_cols, "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum("n").alias("n_flows"),
            F.sum("b").alias("total_bytes"),
        )
        .drop("sid")
    )
