"""Materialized-view fan-out — the reference's intended data model,
Spark-first.

The reference's `flows` table is `ENGINE = Null()`
(initdb/create_tables.sql:35): every insert is DISCARDED unless the
operator attaches ClickHouse materialized views that route inserts into
aggregating tables (SummingMergeTree / AggregatingMergeTree), whose
parts hold PARTIAL aggregate states merged at read time
(`GROUP BY ... sum(...)`). That model — append-only stream, derived
incremental aggregates, merge-on-read — is re-expressed here as:

    ingest stream → foreachBatch fan-out → per-view partial aggregate
    of the micro-batch, written as one parquet "part" per batch →
    read path re-aggregates parts (the merge).

Scale design:
- each view's per-batch output is ONE small partial-aggregate relation
  (|keys| rows, not |batch| rows); the map-side combine happens inside
  the batch's groupBy, so executor→sink traffic is key-bounded;
- the batch is persisted once and shared by all views, so N views cost
  one source materialization + N cheap aggregations;
- a batch's part lands under `batch=<id>/` with mode=overwrite: a
  replayed batch (foreachBatch is at-least-once on retry) replaces its
  own output — idempotent, i.e. effective exactly-once per view, an
  upgrade over the reference's at-most-once (main.go:158-172);
- merge-on-read is a key-grouped aggregation over part files that are
  each already key-aggregated; for a long-running deployment, parts
  can be compacted by rewriting `read_view()`'s result as a new single
  part (same contract as a ClickHouse background merge).

Merge algebra: each view column carries (fn, source) where fn ∈
{sum, count, min, max}; partial = fn over the batch, merge = the fn's
combiner (sum→sum, count→sum, min→min, max→max) over parts. Non-
decomposable reads (avg = sum/count) are derived AFTER the merge, the
same way ClickHouse's `sumMerge(...)/countMerge(...)` is.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_PARTIAL = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": lambda _c: F.count(F.lit(1)),
}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


@dataclass(frozen=True)
class MatView:
    """One materialized view: GROUP BY `keys`, maintaining decomposable
    aggregate states `aggs` = ((out_col, fn, src_col), ...)."""

    name: str
    keys: tuple[str, ...]
    aggs: tuple[tuple[str, str, str], ...]
    path: str

    def __post_init__(self) -> None:
        for out, fn, _src in self.aggs:
            if fn not in _PARTIAL:
                raise ValueError(
                    f"view {self.name}: column {out}: fn {fn!r} is not "
                    f"decomposable (supported: {sorted(_PARTIAL)})"
                )

    def partial_agg(
        self, batch: DataFrame, extra_keys: tuple[str, ...] = ()
    ) -> DataFrame:
        """The per-part (per-micro-batch) aggregate state."""
        return batch.groupBy(*extra_keys, *self.keys).agg(
            *[_PARTIAL[fn](src).alias(out) for out, fn, src in self.aggs]
        )

    def merge(self, parts: DataFrame) -> DataFrame:
        """Merge-on-read over any union of partial states."""
        return parts.groupBy(*self.keys).agg(
            *[_COMBINE[fn](out).alias(out) for out, fn, _src in self.aggs]
        )


def attach_views(
    stream: DataFrame,
    views: list[MatView],
    checkpoint: str,
    query_name: str = "flows_matviews",
    available_now: bool = True,
    batch_max_time: str = "10 seconds",
) -> StreamingQuery:
    """Start ONE streaming query that maintains every view — the Spark
    equivalent of attaching N materialized views to the Null-engine
    funnel. One checkpoint governs all views, so a batch is either
    applied to all of them or replayed to all of them."""

    def _fan_out(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for v in views:
                v.partial_agg(batch_df).write.mode("overwrite").parquet(
                    f"{v.path}/batch={batch_id}"
                )
        finally:
            batch_df.unpersist()

    writer = stream.writeStream.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=batch_max_time)
    return (
        writer.option("checkpointLocation", checkpoint)
        .foreachBatch(_fan_out)
        .start()
    )


def read_view(spark: SparkSession, view: MatView) -> DataFrame:
    """The view's current contents: merge-on-read over all parts."""
    parts = spark.read.option("basePath", view.path).parquet(
        f"{view.path}/batch=*"
    )
    return view.merge(parts.drop("batch"))
