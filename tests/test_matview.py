"""Materialized-view fan-out (streaming/matview.py): the reference's
Null-engine + materialized-view data model (initdb/create_tables.sql:35
— inserts vanish unless MVs aggregate them elsewhere).

Contract under test:
1. stream → N views maintained by ONE query; merged read-back of each
   view equals the same aggregation computed directly over the full
   batch input (stream/batch parity of the merge algebra);
2. a replayed micro-batch (foreachBatch retry) overwrites its own part
   — view contents unchanged (idempotence / effective exactly-once);
3. partial parts are key-sized, not batch-sized (the map-side-combine
   guarantee that makes the fan-out cheap at 100 TB).
"""

from __future__ import annotations

import pytest

from goflow2clickhouse_spark.schema import RAW_FLOW_SCHEMA
from goflow2clickhouse_spark.streaming.ingest import IngestConfig, IngestPipeline
from goflow2clickhouse_spark.streaming.matview import (
    MatView,
    attach_views,
    read_view,
)
from tests.test_flows_transform import _raw_row


def _views(base) -> list[MatView]:
    return [
        MatView(
            name="traffic_by_proto",
            keys=("proto",),
            aggs=(
                ("total_bytes", "sum", "bytes"),
                ("n_flows", "count", "*"),
                ("max_bytes", "max", "bytes"),
            ),
            path=str(base / "mv_traffic_by_proto"),
        ),
        MatView(
            name="flows_by_sampler",
            keys=("sampler_address",),
            aggs=(
                ("n_flows", "count", "*"),
                ("first_seen", "min", "time_received"),
                ("last_seen", "max", "time_received"),
            ),
            path=str(base / "mv_flows_by_sampler"),
        ),
    ]


@pytest.fixture()
def raw_dir(spark, tmp_path):
    d = tmp_path / "raw"
    for chunk in range(3):
        rows = [
            _raw_row(
                SequenceNum=chunk * 100 + i,
                SrcPort=2000 + i,
                Bytes=100 + chunk * 7 + i,
                Proto=(6, 17, 1)[i % 3],
            )
            for i in range(40)
        ]
        spark.createDataFrame(rows, RAW_FLOW_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
    return d


def test_matview_stream_equals_batch(spark, tmp_path, raw_dir):
    views = _views(tmp_path)
    cfg = IngestConfig(
        listen=f"file://{raw_dir}?maxFilesPerTrigger=1",
        checkpoint=str(tmp_path / "ckpt"),
    )
    pipe = IngestPipeline(spark, cfg, lambda df, bid: None)
    q = attach_views(pipe.stream(), views, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    from goflow2clickhouse_spark.streaming.ingest import run_batch_etl

    full = run_batch_etl(
        spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(raw_dir))
    )
    for v in views:
        got = sorted(map(tuple, read_view(spark, v).collect()))
        want = sorted(map(tuple, v.partial_agg(full).collect()))
        assert got == want, v.name
    # multiple micro-batches actually happened (fan-out ran per batch)
    import glob

    parts = glob.glob(f"{views[0].path}/batch=*")
    assert len(parts) == 3


def test_matview_replay_idempotent(spark, tmp_path, raw_dir):
    views = _views(tmp_path)
    full = spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(raw_dir))
    v = views[0]
    # apply batch 0 twice (simulated foreachBatch retry): same part dir
    # overwritten, not appended
    v.partial_agg(full).write.mode("overwrite").parquet(f"{v.path}/batch=0")
    before = sorted(map(tuple, read_view(spark, v).collect()))
    v.partial_agg(full).write.mode("overwrite").parquet(f"{v.path}/batch=0")
    after = sorted(map(tuple, read_view(spark, v).collect()))
    assert before == after


def test_matview_parts_are_key_sized(spark, tmp_path, raw_dir):
    """A part holds one row per key (3 protos), not one per input row."""
    from goflow2clickhouse_spark.streaming.ingest import run_batch_etl

    v = _views(tmp_path)[0]
    full = run_batch_etl(
        spark.read.schema(RAW_FLOW_SCHEMA).parquet(str(raw_dir))
    )
    part = v.partial_agg(full)
    assert part.count() == 3  # one row per proto, from 120 input rows


def test_matview_rejects_non_decomposable():
    with pytest.raises(ValueError, match="not .*decomposable|decomposable"):
        MatView("bad", ("k",), (("a", "avg", "x"),), "/tmp/x")
