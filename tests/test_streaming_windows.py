"""Streaming windowed aggregations (SURVEY.md §7.1 step 6):
stream/batch parity for tumbling windows, watermark semantics
(in-horizon windows emitted, late rows dropped), session windows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goflow2clickhouse_spark.operators.flows import flow_transform
from goflow2clickhouse_spark.schema import RAW_FLOW_SCHEMA
from goflow2clickhouse_spark.streaming.windows import (
    session_conversations,
    tumbling_traffic,
)
from tests.test_flows_transform import _raw_row

BASE = 1_700_000_000
W0 = BASE - BASE % 300  # start of the 5-min window containing BASE


def _chunk(spark, start_s: int, n: int, proto: int = 6):
    rows = [
        _raw_row(
            TimeReceived=start_s + i,
            SequenceNum=start_s + i,
            Proto=proto,
            Bytes=100,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, RAW_FLOW_SCHEMA)


@pytest.fixture()
def flow_chunks(spark, tmp_path):
    """Three time-ordered chunk files spanning 3 five-minute windows,
    plus one very-late row (2 hours behind) in the last chunk."""
    d = tmp_path / "chunks"
    for i in range(3):
        df = _chunk(spark, BASE + i * 300, 50)
        if i == 2:
            late = _chunk(spark, BASE - 7200, 1)  # beyond any watermark
            df = df.unionByName(late)
        df.coalesce(1).write.mode("append").parquet(str(d))
    return d


def test_tumbling_stream_batch_parity_complete(spark, tmp_path, flow_chunks):
    """Complete-mode streaming result == batch result on same input."""
    raw_stream = (
        spark.readStream.schema(RAW_FLOW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flow_chunks))
    )
    agg = tumbling_traffic(flow_transform(raw_stream), streaming=False)
    q = (
        agg.writeStream.format("memory")
        .queryName("tumble_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        map(tuple, spark.table("tumble_complete").collect())
    )

    batch_raw = spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(flow_chunks))
    batch = sorted(
        map(tuple, tumbling_traffic(flow_transform(batch_raw), streaming=False).collect())
    )
    assert streamed == batch
    assert len(streamed) == 4  # 3 on-time windows + 1 late-row window


def test_watermark_append_drops_late(spark, tmp_path, flow_chunks):
    """Append mode with watermark: windows sealed by the advancing
    watermark are emitted; the 2-hour-late row is dropped (never
    appears), and the final still-open window is not emitted — the
    documented upgrade over the reference's insert-late-rows-as-is."""
    raw_stream = (
        spark.readStream.schema(RAW_FLOW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flow_chunks))
    )
    agg = tumbling_traffic(
        flow_transform(raw_stream), width="5 minutes", watermark="1 minute"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumble_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("tumble_append").collect()
    starts = sorted(r.window_start.timestamp() for r in rows)

    late_w = (BASE - 7200) - (BASE - 7200) % 300
    assert late_w not in starts  # late row's window never appears
    # the first two windows sealed as the watermark advanced past them
    assert W0 in starts and W0 + 300 in starts
    # final window still open at termination → not emitted in append
    assert W0 + 600 not in starts


def test_session_windows_batch(spark):
    """session_window merges flows within the gap into one session."""
    rows = (
        [_raw_row(TimeReceived=BASE + i * 10, SequenceNum=i) for i in range(5)]
        # > 30s gap → second session
        + [_raw_row(TimeReceived=BASE + 200 + i, SequenceNum=100 + i) for i in range(3)]
    )
    df = flow_transform(spark.createDataFrame(rows, RAW_FLOW_SCHEMA))
    out = session_conversations(df, gap="30 seconds", streaming=False).collect()
    assert len(out) == 2
    by_start = sorted(out, key=lambda r: r.session_start)
    assert by_start[0].n_flows == 5 and by_start[1].n_flows == 3


def test_session_windows_streaming(spark, tmp_path):
    """The stateful streaming session operator end-to-end (append mode
    requires watermark; sessions close when the watermark passes)."""
    d = tmp_path / "sess"
    for i in range(3):
        _chunk(spark, BASE + i * 600, 5).coalesce(1).write.mode("append").parquet(
            str(d)
        )
    raw_stream = (
        spark.readStream.schema(RAW_FLOW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    agg = session_conversations(
        flow_transform(raw_stream), gap="30 seconds", watermark="1 minute"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("sessions_stream").collect()
    # first two sessions sealed by the advancing watermark
    assert len(rows) == 2
    assert all(r.n_flows == 5 for r in rows)


def test_stream_static_site_enrichment(spark, tmp_path):
    """Stream-static broadcast range join: flows tagged with the site
    owning their source prefix, aggregated per window+site; streaming
    result equals the batch twin, unmatched sources land in
    'external'."""
    from goflow2clickhouse_spark.streaming.windows import (
        enriched_site_traffic,
        sites_table,
    )

    sites = sites_table(
        spark, {"dc-east": "192.168.0.0/16", "dc-west": "172.16.0.0/12"}
    )
    d = tmp_path / "enrich"
    rows = (
        # 192.168.1.5 (default) → dc-east
        [_raw_row(TimeReceived=BASE + i, SequenceNum=i) for i in range(4)]
        # 172.16.0.9 → dc-west
        + [
            _raw_row(
                TimeReceived=BASE + 10 + i,
                SequenceNum=100 + i,
                SrcAddr=bytes([172, 16, 0, 9]),
            )
            for i in range(3)
        ]
        # 8.8.8.8 → external
        + [
            _raw_row(
                TimeReceived=BASE + 20,
                SequenceNum=200,
                SrcAddr=bytes([8, 8, 8, 8]),
            )
        ]
    )
    spark.createDataFrame(rows, RAW_FLOW_SCHEMA).coalesce(1).write.parquet(str(d))

    raw_stream = (
        spark.readStream.schema(RAW_FLOW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        enriched_site_traffic(flow_transform(raw_stream), sites, streaming=False)
        .writeStream.format("memory")
        .queryName("site_traffic")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.table("site_traffic").collect()))

    batch_raw = spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(d))
    batch = sorted(
        map(
            tuple,
            enriched_site_traffic(
                flow_transform(batch_raw), sites, streaming=False
            ).collect(),
        )
    )
    assert streamed == batch
    by_site = {t[1]: (t[2], t[3]) for t in streamed}
    assert by_site["dc-east"] == (4 * 1234, 4)
    assert by_site["dc-west"] == (3 * 1234, 3)
    assert by_site["external"] == (1234, 1)


def test_streaming_dedup_drops_redelivered(spark, tmp_path):
    """Duplicate flow records across micro-batches (same identity key,
    within the watermark horizon) are emitted exactly once, and the
    surviving set equals batch dropDuplicates on the same input."""
    from goflow2clickhouse_spark.streaming.windows import dedup_stream

    d = tmp_path / "dup"
    c0 = [_raw_row(TimeReceived=BASE + i, SequenceNum=i) for i in range(5)]
    # chunk 1 re-delivers two records and adds one new
    c1 = [
        _raw_row(TimeReceived=BASE + 1, SequenceNum=1),
        _raw_row(TimeReceived=BASE + 3, SequenceNum=3),
        _raw_row(TimeReceived=BASE + 60, SequenceNum=100),
    ]
    for chunk in (c0, c1):
        spark.createDataFrame(chunk, RAW_FLOW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
    raw = (
        spark.readStream.schema(RAW_FLOW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        dedup_stream(flow_transform(raw), watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.sequence_num for r in spark.table("dedup_stream").collect())
    batch = flow_transform(
        spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(d))
    ).dropDuplicates(["sampler_address", "sequence_num"])
    want = sorted(r.sequence_num for r in batch.collect())
    assert got == want == [0, 1, 2, 3, 4, 100]


def test_stream_static_site_enrichment_watermarked_append(spark, tmp_path):
    """The streaming=True branch (watermark + append mode): windows
    sealed by the advancing watermark are emitted and match the batch
    twin restricted to those windows; unsealed windows stay buffered."""
    from goflow2clickhouse_spark.streaming.windows import (
        enriched_site_traffic,
        sites_table,
    )

    sites = sites_table(spark, {"dc-east": "192.168.0.0/16"})
    d = tmp_path / "enrich_append"
    # group A at BASE seals once group B (BASE + 20 min) advances the
    # 10-min watermark past A's 5-min window end
    rows = [
        _raw_row(TimeReceived=BASE + i, SequenceNum=i) for i in range(4)
    ] + [
        _raw_row(
            TimeReceived=BASE + 1200,
            SequenceNum=200,
            SrcAddr=bytes([8, 8, 8, 8]),
        )
    ]
    spark.createDataFrame(rows, RAW_FLOW_SCHEMA).coalesce(1).write.parquet(str(d))

    raw_stream = (
        spark.readStream.schema(RAW_FLOW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        enriched_site_traffic(flow_transform(raw_stream), sites, streaming=True)
        .writeStream.format("memory")
        .queryName("site_traffic_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.table("site_traffic_append").collect()))

    batch_raw = spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(d))
    full_batch = enriched_site_traffic(
        flow_transform(batch_raw), sites, streaming=False
    ).collect()
    sealed = sorted(
        tuple(r) for r in full_batch
        if r.window_start.timestamp() + 300 <= BASE + 1200 - 600
    )
    assert streamed == sealed
    assert len(streamed) == 1 and streamed[0][1] == "dc-east"


def test_windowed_hll_registers_stream_batch_parity(spark, tmp_path):
    """The windowed-HLL register aggregation (events_windowed_hll's
    core) is a plain (window, bucket) -> MAX(rho) — it must run as a
    streaming aggregation with identical registers to the batch form,
    across multi-micro-batch splits. Estimation is then a pure
    function of the registers, so register parity IS estimator
    parity."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from goflow2clickhouse_spark.operators.dedup import hash31
    from goflow2clickhouse_spark.operators.sketch import HLL_M, hll_rho

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
    ])
    import datetime

    base = datetime.datetime(2024, 1, 1)
    d = tmp_path / "ev"
    for chunk in range(3):
        rows = [
            (base + datetime.timedelta(minutes=chunk * 60 + (i % 90)),
             (chunk * 37 + i) % 25)
            for i in range(60)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))

    def registers(df):
        h = hash31(F.col("user_id").cast("string"))
        return (
            df.withWatermark("ts", "10 hours")
            .groupBy(
                F.window("ts", "1 hour").alias("w"),
                (h % HLL_M).alias("bucket"),
            )
            .agg(F.max(hll_rho(F.floor(h / HLL_M).cast("long"))).alias("rho"))
            .select(F.col("w.start").alias("hour"), "bucket", "rho")
        )

    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        registers(stream_in)
        .writeStream.format("memory")
        .queryName("hll_reg_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.table("hll_reg_stream").collect()))
    batch = sorted(
        map(tuple, registers(spark.read.parquet(str(d))).collect())
    )
    assert streamed == batch and len(batch) > 0


def test_windowed_cms_cells_stream_batch_parity(spark, tmp_path):
    """The windowed-CMS cell build (events_windowed_cms's core) is a
    plain (window, row, bucket) -> COUNT — it must run as a streaming
    aggregation with identical cells to the batch form across
    micro-batch splits. Estimation is a pure function of the cells,
    so cell parity IS estimator parity."""
    import datetime

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from goflow2clickhouse_spark.operators.dedup import hash31
    from goflow2clickhouse_spark.operators.sketch import (
        CMS_ROWS,
        CMS_WIDTH,
        cms_bucket,
    )

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
    ])
    base = datetime.datetime(2024, 1, 1)
    d = tmp_path / "evcms"
    for chunk in range(3):
        rows = [
            (base + datetime.timedelta(minutes=chunk * 60 + (i % 90)),
             (chunk * 31 + i) % 40)
            for i in range(60)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))

    def cells(df):
        h = hash31(F.col("user_id").cast("string"))
        rb = F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                cms_bucket(h, a, b, CMS_WIDTH).alias("bucket"),
            )
            for i, (a, b) in enumerate(CMS_ROWS)
        ])).alias("rb")
        return (
            df.withWatermark("ts", "10 hours")
            .select(F.window("ts", "1 hour").alias("w"), rb)
            .groupBy("w", "rb.row", "rb.bucket")
            .agg(F.count("*").alias("c"))
            .select(F.col("w.start").alias("hour"), "row", "bucket", "c")
        )

    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        cells(stream_in)
        .writeStream.format("memory")
        .queryName("cms_cells_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.table("cms_cells_stream").collect()))
    batch = sorted(map(tuple, cells(spark.read.parquet(str(d))).collect()))
    assert streamed == batch and len(batch) > 0


def test_sites_table_escapes_backslashes_and_quotes(spark):
    from goflow2clickhouse_spark.streaming.windows import sites_table

    t = sites_table(spark, {
        "corp\\hq": "10.0.0.0/8",
        "dmz\\": "192.168.0.0/16",
        "o'brien": "172.16.0.0/12",
    })
    assert sorted(r["site"] for r in t.collect()) == [
        "corp\\hq", "dmz\\", "o'brien",
    ]
