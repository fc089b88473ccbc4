"""Streaming exact dedup (streaming/dedupe.py): the watermarked
dropDuplicatesWithinWatermark path must emit exactly the batch-dedup
row set when duplicates are exact copies inside the horizon."""

from __future__ import annotations

import pyspark.sql.functions as F

from goflow2clickhouse_spark.schema import load_table
from goflow2clickhouse_spark.streaming.dedupe import stream_exact_dedup

SF = "/root/testdata/sf0.001"


def _planted(spark):
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    return ev.unionByName(ev.filter(F.col("event_id") % 4 == 0))


def test_stream_dedup_matches_batch(spark, tmp_path):
    batch = _planted(spark)
    src = str(tmp_path / "src")
    batch.write.parquet(src)

    stream_in = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        stream_exact_dedup(stream_in, ["event_id"], streaming=True)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        tuple(r)
        for r in spark.table("dedup_out")
        .select("event_id", "event_type", "value")
        .collect()
    }
    want = {
        tuple(r)
        for r in stream_exact_dedup(batch, ["event_id"], streaming=False)
        .select("event_id", "event_type", "value")
        .collect()
    }
    assert got == want
    # and dedup actually removed the planted copies
    n_src = batch.count()
    assert len(got) < n_src


def test_stream_dedup_state_bounded_semantics(spark, tmp_path):
    """A duplicate arriving AFTER the watermark horizon re-emits: the
    documented divergence from batch (state eviction is the point)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    batches = [
        # batch 1: first occurrence of key 1 (+ a second key)
        [(1, t0, "a"), (2, t0 + dt.timedelta(minutes=1), "b")],
        # batch 2: filler advances the watermark to ~t0+50m, past key
        # 1's eviction point (t0 + 10m horizon)
        [(3, t0 + dt.timedelta(hours=1), "filler")],
        # batch 3: duplicate of key 1 long after eviction
        [(1, t0 + dt.timedelta(hours=3), "a-again")],
    ]
    schema = "event_id long, ts timestamp_ntz, tag string"
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")
    # one availableNow pass per file against a shared checkpoint: the
    # watermark (and dedup state) persist across restarts, so each file
    # is its own micro-batch regardless of file-batching heuristics
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream_in = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_exact_dedup(
                stream_in, ["event_id"], watermark="10 minutes",
                streaming=True,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    tags = sorted(
        r.tag for r in spark.read.parquet(out).select("tag").collect()
    )
    # both occurrences of key 1 survive: state for it was evicted long
    # before the 3-hour-later duplicate arrived
    assert tags == ["a", "a-again", "b", "filler"]
