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


def test_stratified_sample_exact_quota(spark):
    from goflow2clickhouse_spark.operators.sampling import stratified_sample

    rows = [(f"s{g}", i) for g in range(3) for i in range(10 * (g + 1))]
    df = spark.createDataFrame(rows, "grp string, id long")
    kept = stratified_sample(df, ["grp"], "id", 0.25)
    counts = {r.grp: r.c for r in kept.groupBy("grp").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("c")
    ).collect()}
    # exact ceil(0.25 * n) per stratum: 10->3, 20->5, 30->8
    assert counts == {"s0": 3, "s1": 5, "s2": 8}


def test_stratified_sample_deterministic_under_repartition(spark):
    from goflow2clickhouse_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [("a", i) for i in range(100)], "grp string, id long")
    k1 = sorted(r.id for r in stratified_sample(df, ["grp"], "id", 0.1).collect())
    k2 = sorted(
        r.id for r in stratified_sample(
            df.repartition(13), ["grp"], "id", 0.1).collect())
    assert k1 == k2 and len(k1) == 10


def test_reservoir_topk_exact_k_and_partition_stable(spark):
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sampling import reservoir_topk

    rows = [(i, "g%d" % (i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, g string")
    s1 = reservoir_topk(df, ["g"], "id", k=4)
    per_group = {
        r.g: r.n for r in s1.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert per_group == {"g0": 4, "g1": 4, "g2": 4}
    # min(k, n) when the group is smaller than k
    tiny = reservoir_topk(df.filter(F.col("id") < 2), ["g"], "id", k=4)
    assert tiny.count() == 2
    # identical member set under a different partitioning
    s2 = reservoir_topk(df.repartition(13, "id"), ["g"], "id", k=4)
    assert {(r.g, r.id) for r in s1.collect()} == {
        (r.g, r.id) for r in s2.collect()
    }


def test_cms_estimate_upper_bounds_exact(spark):
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators import sketch as SK

    toks = spark.createDataFrame(
        [("w%d" % (i % 17),) for i in range(300)], "token string"
    )
    cells = SK.cms_build(toks, width=8)  # tiny width → forced collisions
    est = {r.token: r.est for r in SK.cms_estimate(
        toks.distinct(), cells, width=8).collect()}
    exact = {
        r.token: r.n
        for r in toks.groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert est[t] >= n  # CMS never underestimates
    # total cells bounded by depth x width
    assert cells.count() <= len(SK.CMS_ROWS) * 8


def test_cms_estimate_unseen_watchlist_token_is_zero(spark):
    """A candidate never fed to the build must estimate as 0 (empty
    cell = count 0), not vanish or inflate — the watchlist use case."""
    from goflow2clickhouse_spark.operators import sketch as SK

    toks = spark.createDataFrame(
        [("w%d" % (i % 5),) for i in range(100)], "token string"
    )
    cells = SK.cms_build(toks, width=64)
    watch = spark.createDataFrame(
        [("w0",), ("never-seen-a",), ("never-seen-b",)], "token string"
    )
    est = {
        r.token: r.est
        for r in SK.cms_estimate(watch, cells, width=64).collect()
    }
    assert set(est) == {"w0", "never-seen-a", "never-seen-b"}
    assert est["w0"] >= 20
    # wide sketch, 5 occupied buckets per row → the unseen tokens'
    # cells are empty in at least one row, so the min is exactly 0
    assert est["never-seen-a"] == 0
    assert est["never-seen-b"] == 0


def test_cms_weighted_build_equals_occurrence_build(spark):
    """cms_build(weight_col=...) over pre-aggregated (token, count)
    must produce the identical cell relation as the occurrence-stream
    build — the tokenize-once contract cms_heavy_hitters relies on."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators import sketch as SK

    toks = spark.createDataFrame(
        [("w%d" % (i % 17),) for i in range(300)], "token string"
    )
    occ = SK.cms_build(toks, width=8)
    agg = toks.groupBy("token").agg(F.count("*").alias("n"))
    wgt = SK.cms_build(agg, width=8, weight_col="n")
    assert {(r.row, r.bucket, r.c) for r in occ.collect()} == {
        (r.row, r.bucket, r.c) for r in wgt.collect()
    }


def test_bloom_no_false_negatives_under_collisions(spark):
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators import sketch as SK

    seen = spark.createDataFrame(
        [("k%d" % i,) for i in range(50)], "key string"
    )
    cand = spark.createDataFrame(
        [("k%d" % i,) for i in range(200)], "key string"
    )
    # 64 bits for 50 keys → heavy collisions, many false positives
    bloom = SK.bloom_build(seen, bits=64)
    got = {
        r.key: r.might_contain
        for r in SK.bloom_might_contain(cand, bloom, bits=64).collect()
    }
    for i in range(50):  # the Bloom guarantee: every seen key flagged
        assert got["k%d" % i] is True
    # the filter relation is bounded by the bit width
    assert bloom.count() <= 64
    # union of blooms == bloom of union (bitwise-OR as union-distinct)
    b2 = SK.bloom_build(cand, bits=64)
    merged = bloom.unionByName(b2).distinct()
    direct = SK.bloom_build(seen.unionByName(cand), bits=64)
    assert {r.pos for r in merged.collect()} == {
        r.pos for r in direct.collect()
    }


def test_cms_matches_python_reference(spark):
    """The sketch cells and estimates must equal a brute-force Python
    replay of the identical md5/affine arithmetic — the same parity
    the DuckDB oracle checks, but over adversarial tiny widths."""
    import hashlib
    from collections import Counter

    from goflow2clickhouse_spark.operators import sketch as SK
    from goflow2clickhouse_spark.operators.dedup import MERSENNE_31

    def h31(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MERSENNE_31

    toks = ["t%d" % (i % 23) for i in range(400)]
    width = 16
    ref_cells = Counter()
    for t in toks:
        for row, (a, b) in enumerate(SK.CMS_ROWS):
            ref_cells[(row, (a * h31(t) + b) % MERSENNE_31 % width)] += 1

    df = spark.createDataFrame([(t,) for t in toks], "token string")
    cells = SK.cms_build(df, width=width)
    got_cells = {(r.row, r.bucket): r.c for r in cells.collect()}
    assert got_cells == dict(ref_cells)

    ref_est = {
        t: min(
            ref_cells[(row, (a * h31(t) + b) % MERSENNE_31 % width)]
            for row, (a, b) in enumerate(SK.CMS_ROWS)
        )
        for t in set(toks)
    }
    got_est = {
        r.token: r.est
        for r in SK.cms_estimate(df.distinct(), cells, width=width).collect()
    }
    assert got_est == ref_est


def test_hist_quantiles_within_bin_width_of_exact(spark):
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sketch import hist_quantiles
    from goflow2clickhouse_spark.schema import load_table

    o = load_table(spark, "/root/testdata/sf0.01", "orders")
    est = {
        r.q: r.est
        for r in hist_quantiles(
            o, "o_totalprice", [0.5, 0.9, 0.99], 0.0, 600000.0, 1000
        ).collect()
    }
    exact = o.agg(
        F.expr(
            "percentile(o_totalprice, array(0.5, 0.9, 0.99))"
        ).alias("p")
    ).first().p
    width = 600.0
    for q, ex in zip([0.5, 0.9, 0.99], exact):
        assert abs(est[q] - ex) <= width, (q, est[q], ex)


def test_hll_registers_merge_and_estimate(spark):
    """HLL register relations must be mergeable (union+max == build of
    union) and the estimator must land within the m=64 error envelope
    on a known cardinality."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators import sketch as SK

    a = spark.createDataFrame([("a%d" % i,) for i in range(400)], "key string")
    b = spark.createDataFrame([("b%d" % i,) for i in range(300)], "key string")
    ra, rb = SK.hll_registers(a), SK.hll_registers(b)
    merged = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    direct = SK.hll_registers(a.unionByName(b))
    assert {(r.bucket, r.rho) for r in merged.collect()} == {
        (r.bucket, r.rho) for r in direct.collect()
    }
    est = SK.hll_estimate(direct).collect()[0].est
    # 700 distinct; sigma ~= 1.04/sqrt(64) = 13% — allow 3 sigma
    assert 700 * 0.6 < est < 700 * 1.4
    assert direct.count() <= SK.HLL_M


def test_weighted_topk_deterministic_and_weight_sensitive(spark):
    """A-ES weighted sampling: same winners under repartitioning; a
    heavily-upweighted row must enter the sample; zero/negative
    weights never win."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sampling import weighted_topk

    rows = [(i, 1.0) for i in range(200)] + [(500, 10000.0), (501, 0.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    s1 = {r.id for r in weighted_topk(df, "w", "id", k=20).collect()}
    s2 = {
        r.id
        for r in weighted_topk(df.repartition(13), "w", "id", k=20).collect()
    }
    assert s1 == s2 and len(s1) == 20
    assert 500 in s1      # weight 10000x the rest: essentially certain
    assert 501 not in s1  # zero weight can never win


def test_hll_rho_matches_python_bit_length(spark):
    """Property: the 25-term threshold-sum rank must equal
    W+1 - bit_length(v) for random and boundary 25-bit values — the
    integer formulation exists precisely so no engine ever disagrees
    on a register."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from goflow2clickhouse_spark.operators.sketch import _HLL_W, hll_rho
    from pyspark.sql import functions as F

    boundary = [0, 1, 2, 3, (1 << 24), (1 << 25) - 1] + [
        (1 << k) - 1 for k in range(1, 25)
    ] + [1 << k for k in range(25)]

    @settings(deadline=None, max_examples=5)
    @given(st.lists(st.integers(0, (1 << _HLL_W) - 1),
                    min_size=1, max_size=200))
    def check(vals):
        allv = sorted(set(vals + boundary))
        df = spark.createDataFrame([(v,) for v in allv], "v long")
        got = {
            r.v: r.rho
            for r in df.select("v", hll_rho(F.col("v")).alias("rho")).collect()
        }
        for v in allv:
            expect = _HLL_W + 1 - v.bit_length()
            assert got[v] == expect, (v, got[v], expect)

    check()


def test_hll_params_derivation(spark):
    """Non-default register counts must derive correct alpha and rank
    bits; invalid counts raise instead of silently biasing."""
    import pytest as _pytest

    from goflow2clickhouse_spark.operators import sketch as SK

    assert SK._hll_params(16) == (0.673, 27)
    assert SK._hll_params(32) == (0.697, 26)
    assert SK._hll_params(64) == (SK.HLL_ALPHA, 25)
    alpha256, w256 = SK._hll_params(256)
    assert abs(alpha256 - 0.7213 / (1 + 1.079 / 256)) < 1e-12
    assert w256 == 23
    for bad in (0, 8, 63, 100):
        with _pytest.raises(ValueError, match="power of 2"):
            SK._hll_params(bad)

    # a non-default m produces a sane estimate end-to-end
    keys = spark.createDataFrame(
        [("k%d" % i,) for i in range(1000)], "key string"
    )
    reg = SK.hll_registers(keys, m=256)
    assert reg.count() <= 256
    est = SK.hll_estimate(reg, m=256).collect()[0].est
    assert 1000 * 0.75 < est < 1000 * 1.3  # sigma ~= 6.5% at m=256


def test_stratified_quota_float_exactness(spark):
    """15 rows at fraction 0.2 must keep exactly ceil(3.0)=3, not 4 —
    binary-float 15*0.2 overshoots to 3.0000000000000004 and a naive
    ceil inflates the documented EXACT quota."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [("a", i) for i in range(15)], "grp string, id long"
    )
    kept = stratified_sample(df, ["grp"], "id", 0.2)
    assert kept.count() == 3


def test_weighted_topk_underfull_excludes_nonpositive(spark):
    """With fewer than k positive-weight rows the sample holds only
    those rows — zero/negative weights are excluded, never padding."""
    from goflow2clickhouse_spark.operators.sampling import weighted_topk

    rows = [(1, 5.0), (2, 3.0), (3, 0.0), (4, -1.0), (5, 0.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r.id for r in weighted_topk(df, "w", "id", k=5).collect())
    assert got == [1, 2]


def test_split_boundary_rounding(spark):
    """A 0.7/0.3 split must cut at bucket 7000, not 6999 (int()
    truncation of 6999.999... biased the boundary one bucket low)."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sampling import (
        sample_bucket,
        split_by_hash,
    )

    df = spark.createDataFrame([(i,) for i in range(3000)], "id long")
    out = split_by_hash(df, "id", {"train": 0.7, "test": 0.3}).withColumn(
        "bucket", sample_bucket("id")
    )
    # every bucket < 7000 is train; >= 7000 is test — exact boundary
    bad = out.filter(
        ((F.col("bucket") < 7000) & (F.col("split") != "train"))
        | ((F.col("bucket") >= 7000) & (F.col("split") != "test"))
    ).count()
    assert bad == 0


def test_global_shuffle_stable_under_append(spark):
    """Appending new docs must not move an existing doc's shard, and
    must preserve existing docs' relative order within each shard."""
    from goflow2clickhouse_spark.operators.sampling import global_shuffle

    base = spark.createDataFrame([(i,) for i in range(200)], "id long")
    more = spark.createDataFrame([(i,) for i in range(200, 260)], "id long")
    a = {r["id"]: (r["shard"], r["position"])
         for r in global_shuffle(base, "id", 8).collect()}
    b = {r["id"]: (r["shard"], r["position"])
         for r in global_shuffle(base.union(more), "id", 8).collect()}
    for i in range(200):
        assert a[i][0] == b[i][0], f"doc {i} changed shard on append"
    # relative order within each shard preserved (positions may slide)
    for s in range(8):
        olda = sorted((p, i) for i, (sh, p) in a.items() if sh == s)
        oldb = sorted((p, i) for i, (sh, p) in b.items() if sh == s and i < 200)
        assert [i for _, i in olda] == [i for _, i in oldb]


def test_global_shuffle_positions_dense_per_shard(spark):
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    out = global_shuffle(df, "id", 4)
    stats = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("position").alias("lo"),
        F.max("position").alias("hi"),
    ).collect()
    assert {r["shard"] for r in stats} == {0, 1, 2, 3}
    for r in stats:
        assert (r["lo"], r["hi"]) == (0, r["n"] - 1)


def test_global_shuffle_partitioning_invariance(spark):
    from goflow2clickhouse_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    a = sorted(map(tuple, global_shuffle(df, "id", 8).collect()))
    b = sorted(map(tuple, global_shuffle(df.repartition(13), "id", 8).collect()))
    assert a == b


def test_hist_quantiles_ignore_nulls(spark):
    """NULL values must not count into n (percentile parity): 10 reals
    1..10 plus 10 NULLs, q=0.5 must estimate ~5, not ~9."""
    from goflow2clickhouse_spark.operators.sketch import hist_quantiles

    rows = [(float(i),) for i in range(1, 11)] + [(None,)] * 10
    df = spark.createDataFrame(rows, "v double")
    est = {r["q"]: r["est"] for r in
           hist_quantiles(df, "v", [0.5], 0.0, 10.0, buckets=10).collect()}
    assert abs(est[0.5] - 5.0) <= 1.0


def test_hll_estimate_empty_registers_is_zero_not_null(spark):
    from goflow2clickhouse_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    empty = spark.createDataFrame([], "k string, uid long")
    row = hll_estimate(hll_registers(empty, "uid")).collect()[0]
    assert row["n_used"] == 0
    assert row["est"] == 0.0


def test_internal_column_clash_guards(spark):
    import pytest as _pytest

    from goflow2clickhouse_spark.operators.sampling import (
        reservoir_topk,
        stratified_sample,
        weighted_topk,
    )
    from goflow2clickhouse_spark.operators.skew import with_salt

    df_rn = spark.createDataFrame([(1, "s", 2)], "id long, src string, _rn long")
    with _pytest.raises(ValueError, match="_rn"):
        stratified_sample(df_rn, ["src"], "id", 0.5)
    with _pytest.raises(ValueError, match="_rn"):
        reservoir_topk(df_rn, ["src"], "id", 1)
    df_w = spark.createDataFrame([(1, 1.0, 2)], "id long, w double, _wkey long")
    with _pytest.raises(ValueError, match="_wkey"):
        weighted_topk(df_w, "w", "id", 1)
    df_s = spark.createDataFrame([(1, 2)], "id long, _salt long")
    with _pytest.raises(ValueError, match="_salt"):
        with_salt(df_s)


def test_hist_quantiles_rank_not_inflated_by_double_ceil(spark):
    """ceil(0.017 * 3000) must be 51 (the exact decimal value), not 52
    (the binary-double overshoot 51.00000000000001 → CEIL) — the
    round-before-ceil guard stratified_sample got in r6, applied to
    the histogram rank (r8 review)."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sketch import hist_quantiles

    df = spark.range(1, 3001).select(F.col("id").cast("double").alias("v"))
    out = {
        r.q: r.est
        for r in hist_quantiles(
            df, "v", [0.017], lo=0.0, hi=3000.0, buckets=3000
        ).collect()
    }
    # value v lands in bucket v; cum reaches 51 at bucket 51
    assert out[0.017] == 51.0


def test_hist_quantiles_rank_is_integer_exact_ceil(spark):
    """The rank predicate must select exactly the ceil(q*n)-th value
    for ANY decimal q — the r8-advice class: the earlier
    round(q*n, 9)-before-CEIL only absorbed double error below 5e-10
    absolute, so huge n could still land one bucket off. The fix
    compares cum*den >= num*n in integer/decimal arithmetic (q =
    num/den exactly), which this sweep pins against Python's exact
    Fraction ceil on boundary-heavy q values, including q=1.0 and a
    17-digit repr float (1/3)."""
    import math
    from decimal import Decimal
    from fractions import Fraction

    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sketch import hist_quantiles

    n = 12
    # 1e-19 pins the r9 review fix: its exact denominator (10^19)
    # overflows a long literal, so num/den must ride DECIMAL literals
    qs = [1e-19, 0.25, 1 / 3, 0.5, 0.75, 0.9, 0.99, 1.0]
    df = spark.range(1, n + 1).select(F.col("id").cast("double").alias("v"))
    out = {
        r.q: r.est
        for r in hist_quantiles(
            df, "v", qs, lo=0.0, hi=float(n), buckets=n
        ).collect()
    }
    for q in qs:
        rank = math.ceil(Fraction(Decimal(str(q))) * n)
        # value v lands in bucket v (v < n) and n clamps into the last
        # bucket n-1, so the selected bucket is min(rank, n-1)
        assert out[q] == float(min(rank, n - 1)), (q, rank, out[q])


def test_bloom_might_contain_rejects_reserved_columns(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators import sketch as SK

    seen = spark.createDataFrame([("a",)], "key string")
    bloom = SK.bloom_build(seen, bits=64)
    for bad in ("might_contain", "_m"):
        cand = seen.withColumn(bad, F.lit(True))
        with _pytest.raises(ValueError, match="rename"):
            SK.bloom_might_contain(cand, bloom, bits=64)


def test_salted_join_null_fact_key_matches_plain_join(spark):
    """A NULL fact_id_col salted to NULL and could never match an
    exploded dim salt — silently dropped/unmatched rows, breaking the
    plain-join parity contract (r8 review)."""
    from goflow2clickhouse_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 3)], "k string, oid long"
    )
    dim = spark.createDataFrame([("a", "A"), ("b", "B")], "k string, lab string")
    def key(r):
        return tuple((x is None, x) for x in r)

    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(fact, dim, "k", "oid", 4, how).collect()),
            key=key,
        )
        want = sorted(
            map(tuple, fact.join(dim, "k", how).collect()), key=key
        )
        assert got == want, how
    # and the clash guard is loud
    import pytest as _pytest
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError, match="__salt"):
        salted_join(fact.withColumn("__salt", F.lit(1)), dim, "k", "oid")


def test_hist_quantiles_ignore_nan(spark):
    """NaN is the NULL class (r9 review): floor(NaN) clamped into
    bucket 0 and counted into n, shifting every estimate. 10 reals
    1..10 plus 10 NaNs: q=0.5 must still estimate ~5."""
    from goflow2clickhouse_spark.operators.sketch import hist_quantiles

    rows = [(float(i),) for i in range(1, 11)] + [(float("nan"),)] * 10
    df = spark.createDataFrame(rows, "v double")
    est = {r["q"]: r["est"] for r in
           hist_quantiles(df, "v", [0.5], 0.0, 10.0, buckets=10).collect()}
    assert abs(est[0.5] - 5.0) <= 1.0


def test_cms_build_drops_null_tokens(spark):
    """NULL tokens must not occupy phantom (row, NULL) cells (r9
    review, the hll_registers rule): hash31(NULL) is NULL, the cells
    never equi-join, and a NULL candidate probed est=0 below its true
    count — violating the est >= true CMS contract."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sketch import cms_build

    rows = [("a",)] * 3 + [(None,)] * 5
    df = spark.createDataFrame(rows, "token string")
    cells = cms_build(df, "token").collect()
    assert all(r["bucket"] is not None for r in cells)
    # total mass = the 3 non-null occurrences per row of the sketch
    per_row = {}
    for r in cells:
        per_row[r["row"]] = per_row.get(r["row"], 0) + r["c"]
    assert set(per_row.values()) == {3}


def test_hist_quantiles_rejects_overflow_prone_q(spark):
    """Under the default spark.sql.ansi.enabled=false a decimal(38,0)
    overflow yields NULL, not an error — the rank predicate would be
    NULL on every row, the filter would drop everything, and the
    estimate would silently become NULL (r9 advice). The guard must
    therefore raise in PYTHON for any q whose exact num/den could
    overflow the cross-multiplied products, and for out-of-range q."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sketch import hist_quantiles

    df = spark.range(1, 11).select(F.col("id").cast("double").alias("v"))
    # den = 10^20 > the 1e19 bound (cum*den could exceed decimal(38,0))
    with _pytest.raises(ValueError, match="fractional digits"):
        hist_quantiles(df, "v", [1e-20], 0.0, 10.0, buckets=10)
    with _pytest.raises(ValueError, match="must be in"):
        hist_quantiles(df, "v", [0.0], 0.0, 10.0, buckets=10)
    with _pytest.raises(ValueError, match="must be in"):
        hist_quantiles(df, "v", [1.5], 0.0, 10.0, buckets=10)
    # the documented boundary stays usable: den = 10^19 exactly
    est = {r["q"]: r["est"] for r in
           hist_quantiles(df, "v", [1e-19], 0.0, 10.0, buckets=10).collect()}
    assert est[1e-19] is not None


def test_hist_quantiles_degenerate_q_gets_range_message(spark):
    """NaN/Infinity quantiles must hit the range guard's message, not
    an unrelated as_integer_ratio conversion error (r10 review: the
    guard sat BELOW the conversion)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.sketch import hist_quantiles

    df = spark.range(1, 11).select(F.col("id").cast("double").alias("v"))
    for q in (float("nan"), float("inf"), float("-inf")):
        with _pytest.raises(ValueError, match="must be in"):
            hist_quantiles(df, "v", [q], 0.0, 10.0, buckets=10)
