"""Storage layouts — how the engine persists the flows fact table and
the IVF index so that Catalyst prunes at the directory level.

The reference's ClickHouse table is ENGINE=Null (a funnel,
create_tables.sql:35); the persisted artifacts live in operator-attached
materialized views. Here the equivalents are explicit parquet layouts:

- flows: partitioned by event date (epoch seconds → date), so any
  time-ranged query (the dominant flow-analytics predicate) scans only
  the matching day directories — PartitionFilters, zero data read
  outside the range.
- IVF index: embeddings + assigned cell, partitioned by cell, so an
  nprobe probe reads nprobe directories of ~N/K vectors each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_flows_partitioned(flows: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist flows partitioned by event date. At 100 TB add a second
    level (hour) if day directories exceed a few hundred GB."""
    (
        flows.withColumn(
            "event_date", F.to_date(F.timestamp_seconds(F.col("time_received")))
        )
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_flows(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist the IVF-assigned embeddings partitioned by cell; probes
    then read only the probed cells' directories."""
    from ..operators.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(embeddings, n_cells, vec_col, id_col)
    assigned = ivf_assign(embeddings, cents, vec_col)
    assigned.write.mode(mode).partitionBy("cell").parquet(path)
