"""CLI entry point — flag parity with the reference binary
(/root/reference/main.go:31-40):

  python -m goflow2clickhouse_spark \\
      --listen sflow://:6343,netflow://:2055 \\
      --sink parquet:///data/flows \\
      --batchsize 10000 --batchmaxtime "10 seconds"

reference flag (main.go)        here
-listen  (go:31)                --listen (same comma-separated URL list;
                                 sflow:// netflow:// udp:// native with
                                 in-process binary sFlow-v5/NetFlow-v5
                                 decode, file://, rate://, kafka://)
-db      (go:33)                --sink  (parquet://<path>,
                                 partitioned://<path>, jdbc:<url>)
-batchsize (go:36)              --batchsize (per-trigger source cap)
-batchmaxtime (go:37)           --batchmaxtime (trigger interval)
-workers (go:35)                Spark parallelism (SPARK_GRAFT_CPUS)
-metrics.addr (go:39)           --metrics-addr host:port → Prometheus
                                 /metrics endpoint (empty = disabled;
                                 snapshot dict always available via
                                 FlowMetricsListener.metrics.snapshot())
"""

from __future__ import annotations

import argparse
import sys

from .sinks import (
    SinkFn,
    clickhouse_jdbc_sink,
    idempotent_parquet_sink,
    parquet_sink,
    partitioned_flows_sink,
)


def make_sink(spec: str) -> SinkFn:
    """parquet://<path> | parquet-idempotent://<path> |
    partitioned://<path> | jdbc:<jdbc-url>#<table>"""
    if spec.startswith("parquet://"):
        return parquet_sink(spec[len("parquet://"):])
    if spec.startswith("parquet-idempotent://"):
        return idempotent_parquet_sink(spec[len("parquet-idempotent://"):])
    if spec.startswith("partitioned://"):
        return partitioned_flows_sink(spec[len("partitioned://"):])
    if spec.startswith("jdbc:"):
        url, _, table = spec.partition("#")
        return clickhouse_jdbc_sink(url, table or "flows")
    raise ValueError(f"unknown sink spec: {spec!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="goflow2clickhouse_spark",
        description="PySpark-native flow ingest pipeline",
    )
    p.add_argument("--listen", default="sflow://:6343,netflow://:2055",
                   help="comma-separated source URLs (main.go:31 default "
                        "and parity)")
    p.add_argument("--sink", default="parquet:///tmp/flows-out",
                   help="sink spec: parquet://, parquet-idempotent://, "
                        "partitioned://, jdbc:...#table")
    p.add_argument("--batchsize", type=int, default=10_000,
                   help="per-trigger row cap (main.go:36 parity)")
    p.add_argument("--batchmaxtime", default="10 seconds",
                   help="trigger interval (main.go:37 parity)")
    p.add_argument("--checkpoint", default="/tmp/goflow2spark-ckpt")
    p.add_argument("--available-now", action="store_true",
                   help="drain available input then exit (replay mode)")
    p.add_argument("--metrics-addr", default="",
                   help="host:port for the Prometheus /metrics endpoint "
                        "(main.go:39 parity; empty = disabled)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    # imports deferred so --help works without a JVM
    from .session import get_spark
    from .streaming.ingest import IngestConfig, IngestPipeline
    from .streaming.metrics import FlowMetricsListener, MetricsHttpServer

    spark = get_spark(app_name="goflow2clickhouse-spark-ingest")
    listener = FlowMetricsListener()
    spark.streams.addListener(listener)
    server = (
        MetricsHttpServer(listener.metrics, args.metrics_addr)
        if args.metrics_addr else None
    )
    if server:
        print(f"serving /metrics on port {server.port}", file=sys.stderr)
    cfg = IngestConfig(
        listen=args.listen,
        batch_max_time=args.batchmaxtime,
        batch_size=args.batchsize,
        checkpoint=args.checkpoint,
    )
    pipe = IngestPipeline(spark, cfg, make_sink(args.sink))
    query = pipe.start(available_now=args.available_now)
    try:
        query.awaitTermination()
    finally:
        if server:
            server.close()
    snap = listener.metrics.snapshot()
    print(f"ingested {int(snap['flows_rows_total'])} rows "
          f"in {int(snap['flows_batches_total'])} batches", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
