"""Planted-cluster recall fixtures (r9 verdict item 3): the driver
fixtures are i.i.d. random vectors — 4-bit quantization's worst case —
so the registry recall queries pin MEASUREMENT machinery but cannot
demonstrate that the index family discriminates. These deterministic
planted fixtures give each mechanism structure it can exploit, and the
tests assert the orderings a production tuner relies on:

  * trained > untrained      (PQ codebook Lloyd training — fixture A)
  * residual > raw           (IVFADC at the matched trained regime —
                              fixture H's shared per-cell offsets are
                              quantizable in residual space but spread
                              over 64 absolute positions in raw space)
  * trained > untrained      (residual IVF-PQ — fixture H)
  * higher nprobe > lower    (midpoint queries whose true neighbors
                              straddle two coarse cells)

All randomness is numpy `default_rng` with pinned seeds — the fixtures
are bit-reproducible, so the asserted inequalities are pinned facts,
not statistical hopes. Measured margins at authoring time are noted on
each assert.
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from goflow2clickhouse_spark.operators import similarity as S
from goflow2clickhouse_spark.plans import storage as ST

DIM = 64


def _emb_df(spark, rows):
    return spark.createDataFrame(
        sorted(rows), "vec_id long, embedding array<double>"
    ).cache()


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(r[0], 500, "en") for r in rows],
        "doc_id long, n_chars int, lang string",
    ).cache()


def _hits(emb, probe_rows, qdf, k):
    exact = {
        r["vec_id"] for r in S.topk_l2_bruteforce(emb, qdf, k=k).collect()
    }
    return sum(1 for r in probe_rows if r["vec_id"] in exact)


@pytest.fixture(scope="module")
def cluster_fixture(spark):
    """Fixture A: 8 well-separated Gaussian clusters x 12 points,
    SEQUENTIAL ids — the untrained codebook's lowest-16-id seeds all
    come from clusters 0-1, so Lloyd training (which sees every
    cluster) has headroom to win on queries from late clusters."""
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1.0, (8, DIM))
    rng2 = np.random.default_rng(11)
    rows = []
    for c in range(8):
        pts = centers[c] + rng2.normal(0, 0.05, (12, DIM))
        rows += [
            (c * 12 + i, [float(x) for x in pts[i]]) for i in range(12)
        ]
    return _emb_df(spark, rows), centers


@pytest.fixture(scope="module")
def hier_fixture(spark):
    """Fixture H: 16 macro centers x 4 SHARED sub-offsets x 3 points,
    INTERLEAVED ids (vec_id = p*64 + s*16 + m), so the coarse
    quantizer's 16 lowest-id seeds land one per macro (clean cells)
    while the PQ codebook must resolve the 4 within-cell offsets.
    Shared offsets are exactly the structure IVFADC exploits: in
    residual space the whole corpus collapses onto 4 modes (16 trained
    entries per block resolve them easily); in raw space the same
    budget must tile 64 absolute subcluster positions and cannot."""
    rng = np.random.default_rng(21)
    macro = rng.normal(0, 1.0, (16, DIM))
    delta = rng.normal(0, 0.2, (4, DIM))
    rows = []
    for m in range(16):
        for s in range(4):
            for p in range(3):
                v = macro[m] + delta[s] + rng.normal(0, 0.05, DIM)
                rows.append(
                    (p * 64 + s * 16 + m, [float(x) for x in v])
                )
    return _emb_df(spark, rows), macro


def test_pq_training_beats_untrained_seeds(spark, cluster_fixture):
    emb, _ = cluster_fixture
    k = 10
    untrained = tempfile.mkdtemp(prefix="g2cs_rec_pu_")
    trained = tempfile.mkdtemp(prefix="g2cs_rec_pt_")
    ST.write_pq_index(emb, untrained)
    ST.write_pq_index(emb, trained, train_iterations=2)
    qids = [c * 12 for c in (2, 4, 6, 7)]
    hu = ht = 0
    for qid in qids:
        q = emb.filter(F.col("vec_id") == qid)
        hu += _hits(
            emb, ST.pq_index_probe(spark, untrained, q, k=k).collect(), q, k
        )
        ht += _hits(
            emb, ST.pq_index_probe(spark, trained, q, k=k).collect(), q, k
        )
    # measured at authoring: untrained 33/40, trained 36/40
    assert ht > hu, (ht, hu)


@pytest.fixture(scope="module")
def hier_indexes(spark, hier_fixture):
    emb, _ = hier_fixture
    rows = [(int(r["vec_id"]),) for r in emb.select("vec_id").collect()]
    docs = _docs_df(spark, rows)
    paths = {}
    for tag, kw in [
        ("res_untr", dict(residual=True)),
        ("raw_train", dict(train_iterations=2)),
        ("res_train", dict(residual=True, train_iterations=2)),
    ]:
        p = tempfile.mkdtemp(prefix=f"g2cs_rec_{tag}_")
        ST.write_ivfpq_index(docs, emb, p, n_cells=16, **kw)
        paths[tag] = p
    return paths


def _hier_hits(spark, emb, path, qdfs, k, nprobe=1):
    tot = 0
    for q in qdfs:
        tot += _hits(
            emb,
            ST.ivfpq_probe(spark, path, q, k=k, nprobe=nprobe).collect(),
            q,
            k,
        )
    return tot


def test_residual_beats_raw_and_training_beats_untrained(
    spark, hier_fixture, hier_indexes
):
    emb, _ = hier_fixture
    k = 6
    qdfs = [
        emb.filter(F.col("vec_id") == 2 * 16 + m) for m in (0, 5, 9, 13)
    ] + [emb.filter(F.col("vec_id") == 3 * 16 + m) for m in (2, 11)]
    h = {
        tag: _hier_hits(spark, emb, p, qdfs, k)
        for tag, p in hier_indexes.items()
    }
    # measured at authoring (of 36): raw_train 11, res_untr 11,
    # res_train 23 — residual wins ONLY through the codebook actually
    # trained on the residual distribution, which is the IVFADC claim
    assert h["res_train"] > h["raw_train"], h
    assert h["res_train"] > h["res_untr"], h


def test_higher_nprobe_recovers_cross_cell_neighbors(
    spark, hier_fixture, hier_indexes
):
    emb, macro = hier_fixture
    k = 6
    qmids = [
        spark.createDataFrame(
            [(999999, [float(x) for x in (macro[a] + macro[b]) / 2.0])],
            "vec_id long, embedding array<double>",
        )
        for a, b in [(2, 9), (5, 12), (3, 14)]
    ]
    path = hier_indexes["res_train"]
    h = {
        np_: _hier_hits(spark, emb, path, qmids, k, nprobe=np_)
        for np_ in (1, 2, 4)
    }
    # measured at authoring (of 18): np1 7, np2 13, np4 13 — a
    # midpoint query's true neighbors straddle both parents' cells,
    # so probing one cell caps recall near half
    assert h[2] > h[1], h
    assert h[4] >= h[2], h


def test_sq8_tops_the_quantization_hierarchy(spark, cluster_fixture):
    """The capacity ordering the SQ8 layout ships to document: on the
    planted-cluster fixture, 8-bit per-dim scalar quantization sits
    strictly above 4-bit block PQ (even trained) and within one
    boundary neighbor of exact — SQ8's reconstruction error (1/256th
    of the per-dim range) is far below the 0.05-sigma within-cluster
    spread, so only a genuine near-tie at the k-th rank can flip."""
    emb, _ = cluster_fixture
    k = 10
    sq = tempfile.mkdtemp(prefix="g2cs_rec_sq_")
    pq = tempfile.mkdtemp(prefix="g2cs_rec_pq_")
    ST.write_sq_index(emb, sq)
    ST.write_pq_index(emb, pq, train_iterations=2)
    hs = hp = 0
    for qid in (0, 24, 48, 84):
        q = emb.filter(F.col("vec_id") == qid)
        hs += _hits(
            emb, ST.sq_index_probe(spark, sq, q, k=k).collect(), q, k
        )
        hp += _hits(
            emb, ST.pq_index_probe(spark, pq, q, k=k).collect(), q, k
        )
    # measured at authoring: SQ8 39/40 (one near-tie at rank 10 in a
    # 0.05-sigma cluster), trained PQ4 36/40
    assert hs >= 4 * k - 1, hs
    assert hs > hp, (hs, hp)


@pytest.fixture(scope="module")
def coarse_fixture(spark):
    """Fixture C (r11): fixture A's shape — 8 Gaussian clusters x 12
    points, SEQUENTIAL ids so the 8 lowest-id coarse seeds all come
    from cluster 0 — but with within-cluster noise 0.5 instead of
    0.05. Tight clusters defeat the purpose here: near-identical
    points all argmax to the SAME degenerate seed, so routing stays
    coherent and seeded recall is accidentally perfect (measured:
    40/40 at noise 0.05). At noise 0.5 a cluster's points split
    across the near-identical seed directions — true neighborhoods
    straddle cells — while Lloyd-trained centroids align cells with
    the planted clusters."""
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1.0, (8, DIM))
    rng2 = np.random.default_rng(11)
    rows = []
    for c in range(8):
        pts = centers[c] + rng2.normal(0, 0.5, (12, DIM))
        rows += [
            (c * 12 + i, [float(x) for x in pts[i]]) for i in range(12)
        ]
    return _emb_df(spark, rows)


def test_coarse_training_beats_seed_centroids(spark, coarse_fixture):
    """Coarse-quantizer Lloyd training (r11 — the r10 verdict's #1
    quality item): fixture C's SEQUENTIAL ids put all 8 lowest-id
    seed centroids inside cluster 0, so the seeded coarse quantizer
    splits planted neighborhoods across cells and nprobe=2 probes
    from late clusters miss; ivf_centroids_trained sees every cluster
    and aligns the cells. Pinned on the IVF-SQ8 layout (codes are
    near-exact, so any recall difference is PURE coarse-quantizer
    routing)."""
    emb = coarse_fixture
    k = 10
    seeded = tempfile.mkdtemp(prefix="g2cs_rec_cs_")
    trained = tempfile.mkdtemp(prefix="g2cs_rec_ct_")
    ST.write_ivfsq_index(emb, seeded, n_cells=8)
    ST.write_ivfsq_index(emb, trained, n_cells=8,
                         coarse_train_iterations=3)
    qids = [c * 12 for c in (2, 4, 6, 7)]
    hs = ht = 0
    for qid in qids:
        q = emb.filter(F.col("vec_id") == qid)
        hs += _hits(
            emb,
            ST.ivfsq_probe(spark, seeded, q, k=k, nprobe=2).collect(),
            q, k,
        )
        ht += _hits(
            emb,
            ST.ivfsq_probe(spark, trained, q, k=k, nprobe=2).collect(),
            q, k,
        )
    # measured at authoring: seeded 36/40, trained 40/40
    assert ht > hs, (ht, hs)


def test_coarse_trained_build_parity_and_gates(spark, cluster_fixture):
    """The three IVF-family writers' coarse_train_iterations option:
    stored centroids equal a direct ivf_centroids_trained recompute
    (same data, same iterations), cells are assigned against the
    TRAINED centroids, `coarse_train_iters` is recorded in _CURRENT,
    and probes pin/refuse the regime through `expect`."""
    import pytest as _pytest

    from goflow2clickhouse_spark.versioned import current_meta

    emb, _ = cluster_fixture
    docs = _docs_df(spark, [(r["vec_id"],) for r in
                            emb.select("vec_id").collect()])

    want = [
        (c["cid"], [round(float(x), 6) for x in c["cvec"]])
        for c in S.ivf_centroids_trained(emb, 8, 2).first()["_cents"]
    ]

    # filtered-IVF: all docs eligible, so the training corpus == emb
    ivf = tempfile.mkdtemp(prefix="g2cs_ctr_ivf_")
    ST.write_filtered_ivf_index(docs, emb, ivf, n_cells=8,
                                coarse_train_iterations=2)
    meta = current_meta(spark, ivf)
    assert meta["coarse_train_iters"] == 2
    got = [
        (c["cid"], [round(float(x), 6) for x in c["cvec"]])
        for c in spark.read.parquet(f"{ivf}/v1/centroids").first()["_cents"]
    ]
    assert got == want
    # stored cells were assigned against the TRAINED centroids
    cents = spark.read.parquet(f"{ivf}/v1/centroids")
    recomputed = {
        (r["vec_id"], r["cell"])
        for r in S.ivf_assign(emb, cents).select("vec_id", "cell").collect()
    }
    stored = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(f"{ivf}/v1/cells")
        .select("vec_id", "cell").collect()
    }
    assert stored == recomputed
    q = emb.filter(F.col("vec_id") == 0)
    assert ST.ivf_index_probe(
        spark, ivf, q, k=3,
        expect={"coarse_train_iters": 2},
    ).count() == 3
    with _pytest.raises(ValueError, match="built with"):
        ST.ivf_index_probe(spark, ivf, q, k=3,
                           expect={"coarse_train_iters": 0})

    # IVF-SQ: same parity on the composed layout
    ivfsq = tempfile.mkdtemp(prefix="g2cs_ctr_ivfsq_")
    ST.write_ivfsq_index(emb, ivfsq, n_cells=8,
                         coarse_train_iterations=2)
    assert current_meta(spark, ivfsq)["coarse_train_iters"] == 2
    got = [
        (c["cid"], [round(float(x), 6) for x in c["cvec"]])
        for c in spark.read.parquet(
            f"{ivfsq}/v1/centroids").first()["_cents"]
    ]
    assert got == want

    # IVF-PQ: trained coarse composes with the PQ codebook unchanged
    ivfpq = tempfile.mkdtemp(prefix="g2cs_ctr_ivfpq_")
    ST.write_ivfpq_index(docs, emb, ivfpq, n_cells=8,
                         coarse_train_iterations=2)
    meta = current_meta(spark, ivfpq)
    assert meta["coarse_train_iters"] == 2 and meta["pq_train_iters"] == 0
    got = [
        (c["cid"], [round(float(x), 6) for x in c["cvec"]])
        for c in spark.read.parquet(
            f"{ivfpq}/v1/centroids").first()["_cents"]
    ]
    assert got == want
    assert ST.ivfpq_probe(
        spark, ivfpq, q, k=3,
        expect={"coarse_train_iters": 2},
    ).count() == 3
