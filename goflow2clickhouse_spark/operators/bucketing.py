"""Bucketed (co-located) joins — pre-shuffling the shuffle away.

A fact⋈fact equi-join (orders⋈lineitem on orderkey) shuffles BOTH
sides every query. Bucketing pays that shuffle once at write time:
`bucketBy(n, key)` hash-partitions files on disk so that matching keys
land in the same bucket number; a join between two tables bucketed the
same way (same key, same n) reads bucket i against bucket i with NO
exchange — at 100 TB this converts every repeated fact join from a
full-network shuffle into a local merge.

Rules the helper enforces (Spark silently falls back to shuffling
otherwise):
- both sides bucketed on the join key with the same bucket count;
- `sortBy` the key too, so the join is a zero-sort SortMergeJoin;
- `spark.sql.sources.bucketing.enabled` (default true) and bucketed
  scan not disabled by AQE coalescing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed+sorted managed table (parquet)."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
