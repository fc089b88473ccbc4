"""Sink adapters for the ingest pipeline's foreachBatch.

The reference's only sink is a ClickHouse bulk insert over the native
protocol (/root/reference/main.go:156-173, conn at main.go:83-99).
Here sinks are functions (DataFrame, batch_id) -> None, so foreachBatch
can fan one micro-batch out to several (the ENGINE=Null + materialized
views pattern of initdb/create_tables.sql:35 becomes: one stream, many
sink fns).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

SinkFn = Callable[[DataFrame, int], None]


def parquet_sink(path: str, partition_by: Sequence[str] = ()) -> SinkFn:
    """Append each micro-batch to a parquet dataset. Idempotence note:
    with a checkpoint, replays of a failed batch CAN DUPLICATE rows —
    append mode never overwrites, whatever the partitioning. When
    replays must be no-ops use `idempotent_parquet_sink`, which writes
    each batch to its own batch_id-keyed directory in overwrite mode
    (exactly-once); `partition_by` here is purely a layout choice."""

    def sink(df: DataFrame, batch_id: int) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    return sink


def idempotent_parquet_sink(path: str) -> SinkFn:
    """Exactly-once parquet: each batch writes (overwrite) its own
    subdirectory keyed by batch_id, so checkpoint replays are no-ops."""

    def sink(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return sink


def clickhouse_jdbc_sink(
    url: str,
    table: str = "flows",
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> SinkFn:
    """ClickHouse over JDBC — the production twin of the reference's
    native-protocol insert (main.go:157-169). `batchsize` mirrors
    -batchsize (main.go:36). Requires the ClickHouse JDBC driver on the
    executor classpath; no ClickHouse server exists in the test
    environment, so the writer plumbing is contract-tested against an
    embedded Derby JDBC target (tests/test_jdbc_sink.py) — same Spark
    JDBC write path, injectable driver/URL."""
    props = {"driver": "com.clickhouse.jdbc.ClickHouseDriver"}
    props.update(properties or {})

    def sink(df: DataFrame, batch_id: int) -> None:
        # persist before the emptiness probe: isEmpty() runs a job, and
        # without the cache the upstream transform would execute twice
        # (once for the probe, once for the write) on every non-empty
        # batch. Only unpersist what THIS sink persisted: persist/
        # unpersist is not refcounted, so unconditionally unpersisting
        # inside fanout() evicted the shared batch cache and every
        # later sink recomputed the upstream transform (r6 review)
        owned = not df.is_cached
        if owned:
            df.persist()
        try:
            if df.isEmpty():  # empty-batch elision (main.go:156)
                return
            (
                df.write.mode("append")
                .option("batchsize", str(batchsize))
                .jdbc(url, table, properties=props)
            )
        finally:
            if owned:
                df.unpersist()

    return sink


def fanout(*sinks: SinkFn) -> SinkFn:
    """Send each micro-batch to several sinks (materialized-view
    pattern). The batch is persisted once so sinks don't recompute.
    Only unpersists what it persisted (the clickhouse_jdbc_sink owned
    guard, r8 review): a nested fanout / caller-persisted batch would
    otherwise lose its cache after the inner group's first pass and
    every later sink would recompute the upstream transform."""

    def sink(df: DataFrame, batch_id: int) -> None:
        owned = not df.is_cached
        if owned:
            df.persist()
        try:
            for s in sinks:
                s(df, batch_id)
        finally:
            if owned:
                df.unpersist()

    return sink


def partitioned_flows_sink(path: str) -> SinkFn:
    """Append each micro-batch into the date-partitioned flows layout
    (plans/storage.py): the streaming equivalent of the reference's
    ENGINE=Null + persisted materialized view, laid out so time-ranged
    queries prune at the directory level."""

    def sink(df: DataFrame, batch_id: int) -> None:
        from ..plans.storage import write_flows_partitioned

        write_flows_partitioned(df, path, mode="append")

    return sink
