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
                                 decode, file://, jsonl:// goflow2
                                 JSON-lines replay, rate://, kafka://)
-db      (go:33)                --sink  (parquet://<path>,
                                 partitioned://<path>, jdbc:<url>)
-batchsize (go:36)              --batchsize (per-trigger source cap)
-batchmaxtime (go:37)           --batchmaxtime (trigger interval)
-workers (go:35)                Spark parallelism (SPARK_GRAFT_CPUS)
-metrics.addr (go:39)           --metrics-addr host:port → Prometheus
                                 /metrics endpoint (empty = disabled;
                                 snapshot dict always available via
                                 FlowMetricsListener.metrics.snapshot())
-loglevel (go:28)               --loglevel trace|debug|info|warn|error
                                 → Spark log4j level AND the package
                                 logger's stderr handler level (gates
                                 the CLI's own status records)
-logfmt (go:29)                 --logfmt normal|json → plain or
                                 structured one-object-per-line
                                 stderr status output
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

# reference levels (logrus, main.go:28) → (log4j, python logging)
LOG_LEVELS: dict[str, tuple[str, int]] = {
    "trace": ("TRACE", logging.DEBUG),
    "debug": ("DEBUG", logging.DEBUG),
    "info": ("INFO", logging.INFO),
    "warn": ("WARN", logging.WARNING),
    "error": ("ERROR", logging.ERROR),
}

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
    p.add_argument("--loglevel", default="info",
                   choices=sorted(LOG_LEVELS),
                   help="log level (main.go:28 parity) — applied to the "
                        "Spark context's log4j level and this process's "
                        "Python logging")
    p.add_argument("--logfmt", default="normal",
                   choices=["normal", "json"],
                   help="log formatter (main.go:29 parity): 'normal' = "
                        "plain stderr lines, 'json' = one structured "
                        "object per line")
    return p


class _JsonLogFormatter(logging.Formatter):
    """One JSON object per line — the structured form log aggregators
    ingest (the logrus-JSON analog of main.go:29's 'json' choice)."""

    def format(self, rec: logging.LogRecord) -> str:
        d = {"msg": rec.getMessage(), "level": rec.levelname.lower()}
        d.update(getattr(rec, "fields", None) or {})
        return json.dumps(d, sort_keys=True)


class _PlainLogFormatter(logging.Formatter):
    def format(self, rec: logging.LogRecord) -> str:
        fields = getattr(rec, "fields", None) or {}
        extra = " ".join(f"{k}={v}" for k, v in sorted(fields.items()))
        return f"{rec.getMessage()} {extra}".rstrip()


def configure_logging(loglevel: str, logfmt: str) -> logging.Logger:
    """Wire the package logger to stderr at the mapped level with the
    chosen formatter. This is what makes --loglevel OBSERVABLE on the
    Python side: the CLI's own status records (serving /metrics,
    ingested N rows) go through this logger, so `--loglevel error`
    demonstrably silences them and `--logfmt json` demonstrably
    restructures them."""
    log = logging.getLogger("goflow2clickhouse_spark")
    log.setLevel(LOG_LEVELS[loglevel][1])
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        _JsonLogFormatter() if logfmt == "json" else _PlainLogFormatter()
    )
    log.handlers = [handler]
    log.propagate = False
    return log


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    # imports deferred so --help works without a JVM
    from .session import get_spark
    from .streaming.ingest import IngestConfig, IngestPipeline
    from .streaming.metrics import FlowMetricsListener, MetricsHttpServer

    log = configure_logging(args.loglevel, args.logfmt)
    log4j_level, _ = LOG_LEVELS[args.loglevel]

    spark = get_spark(app_name="goflow2clickhouse-spark-ingest")
    spark.sparkContext.setLogLevel(log4j_level)
    listener = FlowMetricsListener()
    spark.streams.addListener(listener)
    server = (
        MetricsHttpServer(listener.metrics, args.metrics_addr)
        if args.metrics_addr else None
    )
    if server:
        log.info("serving /metrics", extra={"fields": {"port": server.port}})
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
    # StreamingQueryListener events are delivered asynchronously —
    # after a fast --available-now drain the progress events may still
    # be in flight, so the final status line would under-report. The
    # driver already holds the authoritative progress list
    # (query.recentProgress), so wait — bounded — until the listener
    # has seen that many batches; a zero-batch drain skips the wait
    # entirely.
    import time

    expected_batches = len(query.recentProgress)
    deadline = time.time() + 15
    snap = listener.metrics.snapshot()
    while (
        snap["flows_batches_total"] < expected_batches
        and time.time() < deadline
    ):
        time.sleep(0.2)
        snap = listener.metrics.snapshot()
    log.info(
        "ingested",
        extra={"fields": {
            "rows": int(snap["flows_rows_total"]),
            "batches": int(snap["flows_batches_total"]),
            "decode_dropped": int(snap["flows_decode_dropped_total"]),
        }},
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
