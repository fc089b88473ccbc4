"""Bucketed co-located joins: same-key/same-count bucketed tables must
join with no Exchange on either side, and results must equal the plain
join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goflow2clickhouse_spark.operators.bucketing import bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(o.withColumnRenamed("o_orderkey", "okey"), "orders_b", "okey", 8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "okey"), "lineitem_b", "okey", 8)
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _joined(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # merge hint: at test SF both sides fit the broadcast threshold, but
    # the property under test is the co-located sort-merge path
    return (
        bucketed(spark, ot)
        .hint("merge")
        .join(bucketed(spark, lt), "okey")
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    """The join itself must read bucket i vs bucket i: no Exchange may
    appear below the SortMergeJoin (the only allowed exchange is the
    one for the final small groupBy)."""
    df = _joined(spark, bucketed_tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("SortMergeJoin")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(okey" not in plan, plan
    # scans must advertise the bucket layout
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = sorted(
        map(
            tuple,
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("total"))
            .collect(),
        )
    )
    buck = sorted(map(tuple, _joined(spark, bucketed_tables).collect()))
    assert buck == plain
