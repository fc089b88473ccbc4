"""Observability — the engine's equivalent of the reference's
Prometheus /metrics endpoint (/root/reference/main.go:39-40,177-180):
a StreamingQueryListener accumulating rows/sec + batch counts, exposed
as a plain dict (scrapeable by any exporter; Spark's own
spark.metrics Prometheus servlet covers executor-level metrics).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class IngestMetrics:
    batches: int = 0
    input_rows: int = 0
    last_input_rows_per_sec: float = 0.0
    last_processed_rows_per_sec: float = 0.0
    last_batch_duration_ms: float = 0.0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            return {
                "flows_batches_total": float(self.batches),
                "flows_rows_total": float(self.input_rows),
                "flows_input_rows_per_sec": self.last_input_rows_per_sec,
                "flows_processed_rows_per_sec": self.last_processed_rows_per_sec,
                "flows_batch_duration_ms": self.last_batch_duration_ms,
            }


class FlowMetricsListener(StreamingQueryListener):
    """Attach with spark.streams.addListener(listener); read
    listener.metrics.snapshot() (≡ scraping /metrics)."""

    def __init__(self) -> None:
        self.metrics = IngestMetrics()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        with self.metrics._lock:
            self.metrics.batches += 1
            self.metrics.input_rows += int(p.numInputRows)
            self.metrics.last_input_rows_per_sec = float(p.inputRowsPerSecond or 0.0)
            self.metrics.last_processed_rows_per_sec = float(
                p.processedRowsPerSecond or 0.0
            )
            self.metrics.last_batch_duration_ms = float(
                (p.durationMs or {}).get("triggerExecution", 0)
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
