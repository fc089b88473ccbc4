"""Deterministic sampling/splits: reproducibility, composability,
partitioning-independence, range disjointness."""

from __future__ import annotations

import pytest

from goflow2clickhouse_spark.operators.sampling import (
    deterministic_sample,
    split_by_hash,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_sample_reproducible_and_partition_independent(spark, docs):
    a = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect())
    b = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), "doc_id", 0.2).collect()
    )
    assert a == b and 0 < len(a) < docs.count()


def test_sample_composable(spark, docs):
    small = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.05).collect()}
    big = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    assert small <= big


def test_split_disjoint_exhaustive(spark, docs):
    out = split_by_hash(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = dict(
        (r.split, r.n) for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()
    )
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts.get("val", 0) + counts.get("test", 0)


def test_split_bad_weights(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        split_by_hash(docs, "doc_id", {"a": 0.5, "b": 0.2})
