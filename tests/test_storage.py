"""Partitioned storage layouts: time-ranged flow queries and IVF probes
must prune at the directory level (PartitionFilters), reading none of
the out-of-range data."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from goflow2clickhouse_spark.plans.flows_view import flows_df
from goflow2clickhouse_spark.plans.storage import (
    read_flows,
    write_flows_partitioned,
    write_ivf_index,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def flows_path(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("flows_store")
    # spread synthetic flows over 3 days
    f = flows_df(spark, SF).withColumn(
        "time_received",
        F.col("time_received") + (F.col("sequence_num") % 3) * 86400,
    )
    write_flows_partitioned(f, str(p / "flows"))
    return str(p / "flows")


def test_flows_date_partition_pruning(spark, flows_path):
    df = read_flows(spark, flows_path).filter(
        F.col("event_date") == "2023-11-14"
    )
    plan = _plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    dates = {r.event_date for r in df.select("event_date").distinct().collect()}
    assert len(dates) == 1


def test_flows_partition_layout_roundtrip(spark, flows_path):
    total = read_flows(spark, flows_path).count()
    assert total == flows_df(spark, SF).count()
    days = read_flows(spark, flows_path).select("event_date").distinct().count()
    assert days == 3


def test_ivf_index_partition_pruned_probe(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    write_ivf_index(emb, str(tmp_path / "ivf"), n_cells=8)
    idx = spark.read.parquet(str(tmp_path / "ivf"))
    probe = idx.filter(F.col("cell").isin(2, 5))
    plan = _plan(probe)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan
    # every embedding landed in exactly one cell
    assert idx.count() == emb.count()
    assert idx.select("vec_id").distinct().count() == emb.count()
