"""SparkSession factory for the engine.

Defaults are chosen for correctness-at-scale first:
- AQE on (runtime coalesce / skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong for some stage; AQE fixes it.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow enabled so the few pandas UDFs (ip formatting, multimodal decode)
  move data in columnar batches, not row-at-a-time pickles.

On a real cluster the same builder is used with `master` unset (picked up
from spark-submit) and `shuffle_partitions` sized ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "goflow2clickhouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Local test/bench default: ``local[$SPARK_GRAFT_CPUS]`` with 32 shuffle
    partitions, matching the driver harness.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-based coalescing: without this AQE keeps >= default
        # parallelism partitions even for KB-sized shuffles, so a
        # multi-stage plan schedules 32 tasks per stage of tiny data
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # advisory size is the post-shuffle task granularity knob
        # (guide §2.2): 64m is right for the KB-scale bench shuffles
        # (fewer, larger tasks) and for TB-scale production shuffles;
        # the r15 sf1-scale gauge showed MB-scale shuffles coalesce to
        # ONE task under it, so mid-size deployments tune it via env
        # (SCALING_r15.json records the same operators scaling once
        # the advisory matches the data)
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-mode sizing; harmless when overridden by spark-submit
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
