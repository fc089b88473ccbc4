"""Embedding centroid ops: column-native vs applyInPandas parity, and
sflow:// source seam error."""

from __future__ import annotations

import pytest

from goflow2clickhouse_spark.operators.similarity import (
    label_centroids,
    label_centroids_pandas,
)

SF = "/root/testdata/sf0.001"


def test_centroids_column_vs_pandas_parity(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    col_c = {
        r.label: [round(x, 9) for x in r.centroid]
        for r in label_centroids(e).collect()
    }
    pd_c = {
        r.label: [round(x, 9) for x in r.centroid]
        for r in label_centroids_pandas(e).collect()
    }
    assert col_c.keys() == pd_c.keys()
    for k in col_c:
        assert col_c[k] == pytest.approx(pd_c[k], abs=1e-9)


