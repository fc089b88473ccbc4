"""Contract test for the ClickHouse JDBC sink adapter.

No ClickHouse server exists in this environment, so the sink's writer
plumbing (option spelling, append mode, empty-batch elision, batchsize
wiring) is executed for real against an embedded in-memory JDBC target:
Derby ships in Spark's jars for the Hive metastore, and Spark has a
DerbyDialect, so `df.write.jdbc` exercises the exact same code path the
ClickHouse driver would take — only the driver class and URL differ,
and both are injectable through the sink's public parameters."""

from __future__ import annotations

from goflow2clickhouse_spark.schema import RAW_FLOW_SCHEMA
from goflow2clickhouse_spark.sinks import clickhouse_jdbc_sink
from goflow2clickhouse_spark.streaming.ingest import run_batch_etl
from tests.test_flows_transform import _raw_row

_DERBY = {
    "url": "jdbc:derby:memory:chsink;create=true",
    "props": {"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
}


def _flows(spark, n=20):
    rows = [_raw_row(SequenceNum=i, Bytes=100 + i) for i in range(n)]
    return run_batch_etl(spark.createDataFrame(rows, RAW_FLOW_SCHEMA))


def test_jdbc_sink_executes_and_appends(spark):
    sink = clickhouse_jdbc_sink(
        _DERBY["url"], table="flows_contract", batchsize=500,
        properties=_DERBY["props"],
    )
    df = _flows(spark, 20)
    sink(df, 0)
    back = spark.read.jdbc(
        _DERBY["url"], "flows_contract", properties=_DERBY["props"]
    )
    assert back.count() == 20
    # full 22-column flows row survives the JDBC round trip
    assert sorted(c.lower() for c in back.columns) == sorted(
        c.lower() for c in df.columns
    )
    got = back.filter("sequence_num = 3").first()
    assert got.bytes == 103 and got.sampler_address == "10.0.0.1"

    # append semantics: a second batch adds, never truncates
    sink(_flows(spark, 5), 1)
    assert spark.read.jdbc(
        _DERBY["url"], "flows_contract", properties=_DERBY["props"]
    ).count() == 25


def test_jdbc_sink_empty_batch_elision(spark):
    """main.go:156 parity: an empty micro-batch must not pay the
    per-batch JDBC round trip (and must not error)."""
    sink = clickhouse_jdbc_sink(
        _DERBY["url"], table="flows_elide", properties=_DERBY["props"],
    )
    sink(_flows(spark, 4), 0)
    empty = _flows(spark, 4).limit(0)
    sink(empty, 1)
    assert spark.read.jdbc(
        _DERBY["url"], "flows_elide", properties=_DERBY["props"]
    ).count() == 4


def test_jdbc_sink_default_driver_is_clickhouse():
    """Without an override the adapter must request the ClickHouse JDBC
    driver class — the production spelling the reference's deployment
    would load."""
    import inspect

    sink = clickhouse_jdbc_sink("jdbc:ch://localhost:8123/default")
    props = inspect.getclosurevars(sink).nonlocals["props"]
    assert props["driver"] == "com.clickhouse.jdbc.ClickHouseDriver"


def test_fanout_does_not_evict_caller_cache(spark):
    """Nested fanout / caller-persisted batch: the inner group must
    not unpersist a cache it didn't create (r8 review — the
    clickhouse_jdbc_sink owned-guard, applied to fanout)."""
    from goflow2clickhouse_spark.sinks import fanout

    df = spark.createDataFrame([(1,), (2,)], "x long").persist()
    df.count()
    states = []

    def probe(batch, _bid):
        states.append(batch.is_cached)

    inner = fanout(probe, probe)
    outer = fanout(inner, probe)
    outer(df, 0)
    # every sink — including the one AFTER the nested group — saw the
    # batch still cached
    assert states == [True, True, True]
    assert df.is_cached  # caller's persist untouched
    df.unpersist()
