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




def test_quantize_int8_error_zero_vector_and_bounds(spark):
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.similarity import quantize_int8_error

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -127.0]), (3, [0.5, 0.25, -0.125])],
        "vec_id long, embedding array<double>",
    )
    scale, rmse, max_abs = quantize_int8_error("embedding")
    out = {r.vec_id: r for r in df.select(
        "vec_id", scale.alias("s"), rmse.alias("r"), max_abs.alias("m")
    ).collect()}
    assert out[1].s == 0.0 and out[1].r == 0.0 and out[1].m == 0.0
    # max|x| = 127 -> scale exactly 1.0 -> integers quantize losslessly
    assert out[2].s == 1.0 and out[2].r == 0.0 and out[2].m == 0.0
    # reconstruction error bounded by scale/2 per element
    assert out[3].m <= out[3].s / 2 + 1e-12
    assert 0 < out[3].r <= out[3].m


def test_knn_graph_k_bound_no_self_edges(spark):
    from goflow2clickhouse_spark.operators.similarity import knn_graph_blocked

    rows = [(i, [float((i * 7 + d * 3) % 13 - 6) for d in range(64)], 0)
            for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = knn_graph_blocked(e, k=3).collect()
    per = {}
    for r in out:
        assert r["vec_id"] != r["neighbor_id"]
        assert 1 <= r["rank"] <= 3
        per.setdefault(r["vec_id"], []).append((r["rank"], r["cos_sim"]))
    for sims in per.values():
        sims.sort()
        assert len(sims) <= 3
        # cos_sim non-increasing with rank
        vals = [s for _, s in sims]
        assert vals == sorted(vals, reverse=True)


def test_knn_graph_explicit_block_matches_bruteforce_in_block(spark):
    """With a single explicit block, the graph is the exact all-pairs
    top-k — pin one vector's neighbor set against a numpy replay."""
    import numpy as np

    from goflow2clickhouse_spark.operators.similarity import knn_graph_blocked

    rng = [(i, [float(((i + 1) * (d + 2)) % 7 - 3) for d in range(8)], 1)
           for i in range(10)]
    e = spark.createDataFrame(rng, "vec_id long, embedding array<float>, label int")
    out = knn_graph_blocked(e, k=2, block_col="label")
    got = {(r["vec_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    vecs = {i: np.array(v) for i, v, _ in rng}
    for i in range(10):
        sims = sorted(
            ((round(float(vecs[i] @ vecs[j] /
                    (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j]))), 6), -j)
             for j in range(10) if j != i),
            reverse=True,
        )
        for rank, (s, nj) in enumerate(sims[:2], 1):
            assert got[(i, rank)] == -nj
