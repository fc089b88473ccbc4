"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (flows top-talkers) at sf0.001.
queries()       — every implemented query from SURVEY.md §2 (registry in
                  goflow2clickhouse_spark/plans/).
oracle_sql()    — matching DuckDB SQL per query (omitted only for ops
                  whose results are engine-specific sketches / ML).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from goflow2clickhouse_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: flows top-talkers over sf0.001 (scan → filter → agg →
    top-k, the reference's canonical delegated query)."""
    specs = _registry()
    return specs["flows_top_talkers"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _registry().items()
        if spec.oracle is not None
    }
