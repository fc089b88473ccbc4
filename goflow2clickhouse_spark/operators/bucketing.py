"""Bucketed (co-located) joins — pre-shuffling the shuffle away.

A fact⋈fact equi-join (orders⋈lineitem on orderkey) shuffles BOTH
sides every query. Bucketing pays that shuffle once at write time:
`bucketBy(n, key)` hash-partitions files on disk so that matching keys
land in the same bucket number; a join between two tables bucketed the
same way (same key, same n) reads bucket i against bucket i with NO
exchange — at 100 TB this converts every repeated fact join from a
full-network shuffle into a local merge.

Rules the CALLER must uphold (Spark silently falls back to shuffling
when they don't hold — use `assert_cobucketed` to check a pair before
relying on the exchange-free plan):
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


def assert_cobucketed(
    spark: SparkSession, table_a: str, table_b: str, key: str
) -> None:
    """Raise unless both tables are bucketed on `key` with the same
    bucket count — the preconditions for an exchange-free join. Spark
    itself silently shuffles when they don't hold; this makes the
    failure loud at plan time instead of a performance mystery at
    run time."""
    def spec(table: str) -> tuple[list[str], int]:
        cat = spark.catalog
        cols = [c.name for c in cat.listColumns(table) if c.isBucket]
        n = -1
        for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
            if row.col_name == "Num Buckets":
                n = int(row.data_type)
        return cols, n

    specs = {t: spec(t) for t in (table_a, table_b)}
    for t, (cols, _n) in specs.items():
        # EXACT spec match, not membership: HashPartitioning on
        # (key, other) does NOT satisfy clustering on (key) — a table
        # bucketed on a superset passed the old `key in cols` check
        # and the join silently shuffled anyway, the precise failure
        # this assert exists to make loud (r6 review)
        if cols != [key]:
            raise ValueError(
                f"{t} is not bucketed on exactly [{key!r}] "
                f"(bucket spec: {cols}) — the join will silently shuffle"
            )
    # one DESCRIBE + listColumns per table (r8 review: spec() ran twice)
    (_, na), (_, nb) = specs[table_a], specs[table_b]
    if na != nb or na <= 0:
        raise ValueError(
            f"bucket counts differ: {table_a}={na}, {table_b}={nb} — "
            "the join will silently shuffle"
        )
