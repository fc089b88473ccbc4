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


def test_zero_norm_vector_yields_null_not_ansi_error(spark):
    """One all-zero embedding (padded/failed encode) must not kill the
    job under ANSI mode: cosine paths emit NULL (DuckDB x/0.0 parity),
    zero-norm rows drop from thresholds and never outrank real ones."""
    from goflow2clickhouse_spark.operators.similarity import (
        knn_graph_blocked,
        neardup_pairs_blocked,
        topk_bruteforce,
    )

    rows = [
        (0, [1.0] * 8, 1),
        (1, [0.0] * 8, 1),   # zero vector
        (2, [1.0] * 8, 1),
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    pairs = neardup_pairs_blocked(e, threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 2)}
    g = knn_graph_blocked(e, k=2, block_col="label").collect()
    ranked = {(r["vec_id"], r["rank"]): r["neighbor_id"] for r in g}
    assert ranked[(0, 1)] == 2 and ranked[(2, 1)] == 0
    from pyspark.sql import functions as SF

    q = e.filter(SF.col("vec_id") == 0)
    top = topk_bruteforce(e, q, k=2).collect()
    assert top[0]["vec_id"] in (0, 2)
    # the zero vector itself queries to all-NULL sims without throwing
    qz = e.filter(SF.col("vec_id") == 1)
    assert all(
        r["cos_sim"] is None for r in topk_bruteforce(e, qz, k=3).collect()
    )


def test_kmeans_refine_keeps_emptied_cells(spark):
    """A cell that loses all members during refinement must stay in the
    returned relation (previous centroid, n_members=0) — the index
    arity is n_cells by contract."""
    from goflow2clickhouse_spark.operators.similarity import kmeans_refine

    # 2 tight groups far apart + 4 seed ids: some seeds end up owning
    # nothing after one refinement step
    rows = [(i, [1000.0 + i] + [0.0] * 7, 0) for i in range(4)] + [
        (i, [-1000.0 - i] + [0.0] * 7, 0) for i in range(4, 8)
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = kmeans_refine(e, n_cells=4, iterations=2).collect()
    assert len(out) == 4, out
    assert sum(r["n_members"] for r in out) == 8


# ---------------------------------------------------------------------------
# semdedup_prune
# ---------------------------------------------------------------------------

def _evecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_prunes_nearer_to_centroid(spark):
    from goflow2clickhouse_spark.operators.similarity import semdedup_prune

    # seeds (lowest 2 ids): cell0 centroid [1,0], cell1 centroid [0,1].
    # cell0 members: 0, 3=[.5,.5] (argmax tie -> lower cid), 4=2*v3
    # (exact ccos tie with 3), 5=[.51,.49] (nearer centroid than 3).
    # cell1 members: 1, 2=[.6,.8] (no >tau neighbor there).
    e = _evecs(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.6, 0.8]),
        (3, [0.5, 0.5]),
        (4, [1.0, 1.0]),
        (5, [0.51, 0.49]),
    ])
    out = {r.vec_id: r for r in semdedup_prune(e, tau=0.999, n_cells=2).collect()}
    assert len(out) == 6
    assert {i: out[i].cell for i in out} == {0: 0, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0}
    # pairs over tau: (3,4) cos==1 scaled copy, (3,5)/(4,5) ~0.9998.
    # 4 loses the exact ccos tie with 3 (higher id); 5 is nearer the
    # centroid than both 3 and 4; 3 is dominated by nobody.
    assert {i for i in out if out[i].is_pruned} == {4, 5}
    # kept outlier keeps its centroid-cosine reported
    assert out[3].ccos == pytest.approx(0.5**0.5, abs=1e-12)


def test_semdedup_no_close_pairs_prunes_nothing(spark):
    from goflow2clickhouse_spark.operators.similarity import semdedup_prune

    e = _evecs(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.7, 0.7]),
    ])
    out = semdedup_prune(e, tau=0.999, n_cells=2).collect()
    assert len(out) == 3 and not any(r.is_pruned for r in out)


def test_semdedup_never_compares_across_cells(spark):
    from goflow2clickhouse_spark.operators.similarity import semdedup_prune

    # 2 and 3 are near-identical but land in DIFFERENT cells (each is
    # a seed's scaled copy): no within-cell neighbor -> nothing pruned
    # except each seed-vs-copy pair, which IS within-cell. Use copies
    # of distinct seeds only: 2=2*v0 (cell0), 3=2*v1 (cell1) -> the
    # only >tau pairs are (0,2) and (1,3); ccos ties prune the copies.
    e = _evecs(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [2.0, 0.0]),
        (3, [0.0, 2.0]),
    ])
    out = {r.vec_id: r for r in semdedup_prune(e, tau=0.999, n_cells=2).collect()}
    assert {i for i in out if out[i].is_pruned} == {2, 3}


def test_pq_codebook_entries_encode_to_themselves(spark):
    """A vector that IS codebook entry e must get code e in every
    block (its squared-L2 to itself is exactly 0.0) and ADC distance
    exactly 0 against itself as the query — the identity contract
    that pins subvector slicing, entry ordering, and packing."""
    from goflow2clickhouse_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_adc_topk,
        pq_codebook,
        pq_encode,
    )
    from goflow2clickhouse_spark.schema import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cb = pq_codebook(e)
    codes = {
        r.vec_id: r.pq_code for r in pq_encode(e, cb).collect()
    }
    assert len(codes) == e.count()
    assert all(0 <= c < (1 << (4 * PQ_M)) for c in codes.values())
    # the 16 lowest vec_ids are the entries, in rank order
    ids = sorted(codes)[:PQ_K]
    for rank, vid in enumerate(ids):
        expect = sum(rank << (4 * j) for j in range(PQ_M))
        assert codes[vid] == expect, (vid, rank, codes[vid])

    from pyspark.sql import functions as F

    q = e.filter(F.col("vec_id") == ids[3])
    top = pq_adc_topk(e, q, k=1).collect()[0]
    assert top.vec_id == ids[3] and top.adist == 0.0

def test_pq_adc_topk_rejects_multi_or_empty_query(spark):
    """>1 query row would interleave several queries' LUTs into one
    silently-wrong top-k; an empty query would silently return empty
    (r7 advice) — both must refuse loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.similarity import pq_adc_topk
    from goflow2clickhouse_spark.schema import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def cached_count():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = cached_count()
    with _pytest.raises(ValueError, match="one query"):
        pq_adc_topk(e, e.filter(F.col("vec_id") < 2))
    with _pytest.raises(ValueError, match="one query"):
        pq_adc_topk(e, e.filter(F.col("vec_id") < 0))
    # the private query projection (r8 advice: persisted so the
    # contract count + LUT build share one evaluation) must not leak
    # on either raise path
    assert cached_count() == base


def test_in_memory_topk_ops_enforce_single_query(spark):
    """The four in-memory single-query top-k ops must refuse multi-row
    and empty query relations (r9 review — the pq_adc_topk rule): an
    unkeyed broadcast/cross join would otherwise interleave several
    queries into one silently-wrong top-k. The guard is IN-PLAN
    (aggregate + assert, zero extra jobs), so the refusal surfaces on
    the first action, not at plan-build time — and a legal 1-row call
    must still work."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.similarity import (
        ivf_topk,
        signrp_lsh_topk,
        topk_bruteforce,
        topk_l2_bruteforce,
    )
    from goflow2clickhouse_spark.schema import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    for op in (topk_bruteforce, topk_l2_bruteforce, signrp_lsh_topk, ivf_topk):
        with _pytest.raises(Exception, match="one query"):
            op(e, e.filter(F.col("vec_id") < 2)).collect()
        with _pytest.raises(Exception, match="one query"):
            op(e, e.filter(F.col("vec_id") < 0)).collect()
        assert len(op(e, e.filter(F.col("vec_id") == 0), k=3).collect()) > 0


def test_l2_topk_sorts_null_distances_last(spark):
    """A degenerate vector (NULL element → NULL distance) must sink to
    the bottom like DuckDB's asc NULLS LAST, never top the ground
    truth (r9 review)."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.similarity import (
        topk_l2_bruteforce,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 1.0]),
        (2, [None, 0.0]),  # NULL element → NULL l2sq
        (3, [2.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = topk_l2_bruteforce(
        df, df.filter(F.col("vec_id") == 0), k=4
    ).collect()
    assert [r["vec_id"] for r in got] == [0, 1, 3, 2]
    assert got[-1]["l2sq"] is None


def test_sq_encode_null_element_yields_null_code(spark):
    """A NULL embedding element must encode a NULL code, not clamp —
    Spark's greatest/least SKIP nulls (silent 255) while SQL clamps
    NULL to 0, so only explicit propagation keeps both engines and
    the layout honest (r10 review)."""
    from goflow2clickhouse_spark.operators.similarity import (
        DIM,
        sq_encode,
        sq_quantizer,
    )

    rows = [
        (0, [float(i) for i in range(DIM)]),
        (1, [float(2 * i) for i in range(DIM)]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    broken = spark.createDataFrame(
        [(2, [None] + [1.0] * (DIM - 1)), (3, [0.5] * (DIM - 1))],
        "vec_id long, embedding array<double>",
    )
    quant = sq_quantizer(emb)
    out = {
        r["vec_id"]: r["sq_code"]
        for r in sq_encode(emb.unionByName(broken), quant).collect()
    }
    assert all(c is not None for c in out[0]) and all(
        c is not None for c in out[1]
    )
    assert out[2][0] is None and all(c is not None for c in out[2][1:])
    assert out[3][-1] is None  # short vector: zip_with pads NULL


def test_opq_dim_permutation_balances_variance(spark):
    """opq_dim_permutation (r13): the trained permutation is a true
    permutation of 0..DIM-1, it deals the variance spectrum in snake
    order (the top-M ranked dims land in M DIFFERENT subspaces), and
    apply_dim_permutation reorders vectors losslessly (L2 between any
    two rows is unchanged — an orthogonal transform)."""
    from goflow2clickhouse_spark.operators import similarity as S

    # plant anisotropy: dims 0..7 carry x4 the spread, so under the
    # NATURAL layout all eight would sit in block 0
    rows = []
    import random

    rng = random.Random(5)
    for i in range(40):
        v = [rng.uniform(-1, 1) * (4.0 if d < 8 else 1.0)
             for d in range(S.DIM)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    perm = S.opq_dim_permutation(df)
    assert sorted(perm) == list(range(S.DIM))
    # the 8 heavy dims (highest variance) spread one per subspace
    blocks = [perm[b * S.PQ_SUB:(b + 1) * S.PQ_SUB] for b in range(S.PQ_M)]
    for b in blocks:
        assert sum(1 for d in b if d < 8) == 1
    # permutation preserves pairwise L2 exactly
    out = {r["vec_id"]: r["embedding"]
           for r in S.apply_dim_permutation(df, perm).collect()}
    for i, v in rows[:5]:
        assert sorted(out[i]) == sorted(v)
        d_orig = sum((a - b) ** 2 for a, b in zip(rows[0][1], v))
        d_perm = sum((a - b) ** 2 for a, b in zip(out[0], out[i]))
        assert abs(d_orig - d_perm) < 1e-12


def test_opq_dim_permutation_empty_corpus_refuses_loudly(spark):
    """opq_dim_permutation over an empty relation (r14, r13 advice):
    the aggregate returns one all-NULL row; the trainer must raise
    the index builders' loud empty-corpus ValueError, not a TypeError
    from sorting None variances."""
    import pytest

    from goflow2clickhouse_spark.operators import similarity as S

    df = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        S.opq_dim_permutation(df)


def test_opq_pair_rotation_trains_matching_and_preserves_l2(spark):
    """opq_pair_rotation (r14): on a fixture where dim d+HALF carries
    a scaled copy of dim d, the mutual-best-|covariance| matching
    recovers every planted pair; apply_pair_rotation is orthogonal up
    to the uniform sqrt(2) scale (every squared L2 scales by EXACTLY
    2); odd dims and empty corpora refuse loudly."""
    import random

    import pytest

    from goflow2clickhouse_spark.operators import similarity as S

    rng = random.Random(11)
    half = S.DIM // 2
    rows = []
    # 300 samples: the contaminated dims carry ~17x unit variance, so
    # their cross-covariance NOISE scales ~5.7/sqrt(n) — at n=40 it
    # rivals the planted 4*var signal and the matching (correctly)
    # follows the sample covariance off the plant
    for i in range(300):
        e = [rng.uniform(-1, 1) for _ in range(S.DIM)]
        v = e[:half] + [4.0 * e[d] + e[half + d] for d in range(half)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = S.opq_pair_rotation(df)
    assert sorted(pairs) == [(d, d + half) for d in range(half)]
    out = {r["vec_id"]: r["embedding"]
           for r in S.apply_pair_rotation(df, pairs).collect()}
    for i, v in rows[:6]:
        d_orig = sum((a - b) ** 2 for a, b in zip(rows[0][1], v))
        d_rot = sum((a - b) ** 2 for a, b in zip(out[0], out[i]))
        assert abs(d_rot - 2.0 * d_orig) < 1e-9 * max(1.0, d_orig)
    with pytest.raises(ValueError, match="even dim"):
        S.opq_pair_rotation(df, dim=S.DIM - 1)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        S.opq_pair_rotation(empty)


def test_opq_pair_rotation_leftover_dims_pair_consecutively(spark):
    """Dims with no mutual best partner (three-way covariance chains)
    still end up paired — consecutively in dim order — so the
    Hadamard stays total and the uniform x2 scale holds."""
    from goflow2clickhouse_spark.operators import similarity as S

    # dim0's best is dim1; dim1's best is dim0 (mutual). dims 2..5:
    # engineered chain where 2->3, 3->2 mutual as well; with DIM=8
    # use a tiny dim override
    import random

    rng = random.Random(3)
    rows = []
    for i in range(30):
        a, b, c0 = rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-1, 1)
        # 0 and 1 strongly correlated; 2 weakly with both 0 and 1;
        # 3..7 independent
        v = [a, a + 0.01 * rng.uniform(-1, 1), 0.5 * a + 0.5 * b, b,
             c0, rng.uniform(-1, 1), rng.uniform(-1, 1),
             rng.uniform(-1, 1)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = S.opq_pair_rotation(df, dim=8)
    flat = sorted(i for pr in pairs for i in pr)
    assert flat == list(range(8))  # total: every dim in exactly one pair
    assert len(pairs) == 4


def test_opq_pair_rotation_stats_variances_bit_match_permutation(spark):
    """opq_pair_rotation_stats (r15): the diagonal cells of the merged
    aggregate must be BIT-identical to opq_dim_permutation's
    ROUND(AVG(x*x) - AVG(x)^2, 6) doubles — the single-job training
    replaces a separate variance pass only because the two expressions
    sum the same values in the same order — and the derived
    permutation must equal the direct one. The pairing must also be
    unchanged by the diagonal's presence in the aggregate."""
    import random

    from goflow2clickhouse_spark.operators import similarity as S
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) * (1 + d % 5) for d in range(S.DIM)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs, vs = S.opq_pair_rotation_stats(df)
    assert sorted(i for pr in pairs for i in pr) == list(range(S.DIM))
    direct = (
        df.select(F.posexplode(S.as_double("embedding")).alias("d", "x"))
        .groupBy("d")
        .agg(F.round(
            F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"), 6
        ).alias("v"))
        .collect()
    )
    vd = {r["d"]: r["v"] for r in direct}
    assert vd == vs  # same keys, bit-equal doubles
    assert S._variance_ranked_permutation(vs, S.PQ_M, S.DIM) == \
        S.opq_dim_permutation(df)


def test_knn_graph_subblocked_pairs_match_plain_shape(spark, monkeypatch):
    """The 2D sub-blocked bucket join (fires above _SUBBLOCK_MIN_BYTES)
    must emit the IDENTICAL edge set as the plain pinned-bucket shape —
    including on a skewed corpus where one signrp bucket holds most
    members (the hot-bucket case the sub-block exists to split)."""
    from goflow2clickhouse_spark.operators import similarity as S

    # 30 near-identical vectors (one hot bucket) + 10 scattered ones
    rows = [
        (i, [1.0 + (i * (d + 1) % 5) * 1e-3 for d in range(64)])
        for i in range(30)
    ] + [
        (100 + i, [float((i * 7 + d * 3) % 13 - 6) for d in range(64)])
        for i in range(10)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    plain = sorted(map(tuple, S.knn_graph_blocked(e, k=3).collect()))

    # force the sub-blocked path (the size gate keeps driver-built
    # relations on the plain shape, so pin the factor directly)
    monkeypatch.setattr(S, "_pair_subblock_factor", lambda *a: 4)
    sub = sorted(map(tuple, S.knn_graph_blocked(e, k=3).collect()))

    assert sub == plain and len(plain) > 0


def test_pair_subblock_factor_rule(spark):
    """B=1 for unknown-size (driver-built) inputs regardless of cores;
    when the gate opens, the smallest B lifting n_blocks*B^2 to 32x
    parallelism, capped at 8."""
    from goflow2clickhouse_spark.operators import similarity as S

    e = spark.createDataFrame(
        [(0, [1.0] * 4)], "vec_id long, embedding array<float>")
    # RDD-backed relation reports unknown size -> plain shape
    assert S._pair_subblock_factor(e, 64, 32) == 1
    # the rule's arithmetic at 64 blocks: B=4 at 32 cores (the
    # measured optimum), B=2 at 8 cores, cap at 8 for extreme cores
    for par, expect in ((32, 4), (8, 2), (4096, 8)):
        b = 1
        while 64 * b * b < 32 * par and b < 8:
            b += 1
        assert b == expect
