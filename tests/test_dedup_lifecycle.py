"""Cache-lifecycle contract of the MinHash+LSH dedup operator: the
persisted shingle relation must not outlive the returned result handle
(no session-lifetime executor memory/disk leak)."""

from __future__ import annotations

import gc

from goflow2clickhouse_spark.operators.dedup import minhash_lsh_dedup_pairs
from goflow2clickhouse_spark.schema import load_table


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_minhash_lsh_unpersists_with_result_handle(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    before = _n_persistent(spark)

    pairs = minhash_lsh_dedup_pairs(docs)
    assert pairs.count() >= 0
    # while the handle is alive the shingle cache may (and should) exist
    assert _n_persistent(spark) >= before

    del pairs
    gc.collect()
    assert _n_persistent(spark) == before, (
        "shingle relation still cached after the result handle was dropped"
    )


def test_cluster_pairs_shuffle_join_fallback(spark):
    """The `small=False` branch (edge relation above
    broadcast_max_edges → iterative shuffle-join label propagation)
    must produce the same clusters as the single-task union-find —
    forced here with broadcast_max_edges=0 so the scale path gets CI
    coverage instead of only running on >1M-edge graphs. Includes a
    4-hop chain with iterations=2 — the fixpoint loop must keep
    propagating PAST the requested floor until labels stop changing
    (a fixed 2 rounds would leave the chain's far end mislabeled)."""
    from goflow2clickhouse_spark.operators.dedup import cluster_pairs

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),      # chain, diameter 4
        (10, 11), (10, 12), (11, 12),        # triangle
        (20, 21),                            # pair
    ]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    shuffled = cluster_pairs(pairs, iterations=2, broadcast_max_edges=0)
    got = {r.id: r.cluster_id for r in shuffled.collect()}
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
              10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert got == expect

    single = cluster_pairs(pairs, iterations=2)  # default: small path
    assert {r.id: r.cluster_id for r in single.collect()} == expect


def test_cluster_pairs_checkpoint_released_and_composition_safe(spark):
    """cluster_pairs checkpoints its edge relation (lineage truncation
    for the iterative loop): a composed plan built on top must still
    execute after the intermediate handle is dropped (pin contract),
    and the checkpoint blocks must release with the final handle."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.dedup import cluster_pairs, pin

    before = _n_persistent(spark)
    # dense components (the near-dup shape cluster_pairs targets):
    # a triangle, a pair, and a 4-star
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (20, 22), (20, 23)],
        "id_a long, id_b long",
    )
    labels = cluster_pairs(pairs, iterations=2)
    sizes = pin(
        labels.groupBy("cluster_id").agg(F.count("*").alias("n")), labels
    )
    del labels  # composed plan must survive this (the pin holds it)
    gc.collect()
    got = {r.cluster_id: r.n for r in sizes.collect()}
    assert got == {1: 3, 10: 2, 20: 4}

    del sizes
    gc.collect()
    assert _n_persistent(spark) == before, (
        "edge checkpoint still held after the final handle was dropped"
    )


# ---------------------------------------------------------------------------
# hot-bucket cap (the documented k²/2 LSH hazard)
# ---------------------------------------------------------------------------


def test_lsh_hot_bucket_cap(spark):
    """A degenerate bucket (many identical docs → every band key equal)
    must be droppable via max_bucket_size, with the skipped work
    observable through oversize_lsh_buckets."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        oversize_lsh_buckets,
        word_shingles,
    )

    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    docs = [(i, boiler) for i in range(40)] + [
        (100, "a unique document with its own words entirely"),
        (101, "another unique document sharing nothing with others"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = minhash_signatures(word_shingles(df)).persist()

    uncapped = lsh_candidate_pairs(sigs)
    n_uncapped = uncapped.count()
    assert n_uncapped >= 40 * 39 // 2  # the degenerate k²/2 blow-up

    capped = lsh_candidate_pairs(sigs, max_bucket_size=10)
    assert capped.count() == 0  # every pair came from oversize buckets

    audit = oversize_lsh_buckets(sigs, max_bucket_size=10).collect()
    assert audit and all(r.n_ids == 40 for r in audit)
    assert all(r.n_pairs_avoided == 40 * 39 // 2 for r in audit)

    # a cap above the bucket size is a no-op
    assert lsh_candidate_pairs(sigs, max_bucket_size=100).count() == n_uncapped
    sigs.unpersist()


def test_exact_dedup_null_keys(spark):
    """NULL-keyed rows must dedup like GROUP BY treats them (NULL is a
    key value), in BOTH paths: the raw path's null-safe join must not
    drop them, and the prehash must not collide ('x', NULL) with
    (NULL, 'x')."""
    from goflow2clickhouse_spark.operators.dedup import exact_dedup

    rows = [
        (1, "x", None), (2, "x", None),      # same key → keep id 1
        (3, None, "x"),                       # different key → kept
        (4, None, None), (5, None, None),     # same key → keep id 4
        (6, "y", "z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, a string, b string")
    for prehash in (True, False):
        got = sorted(
            r.doc_id
            for r in exact_dedup(df, ["a", "b"], prehash=prehash).collect()
        )
        assert got == [1, 3, 4, 6], (prehash, got)


def test_simhash_radius_guard(spark):
    import pytest as _pytest

    from goflow2clickhouse_spark.operators.dedup import simhash_near_pairs

    sigs = spark.createDataFrame([(1, 0), (2, 1)], "doc_id long, simhash long")
    with _pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs(sigs, max_hamming=4)


def test_exact_dedup_null_ids_keep_one_per_group(spark):
    """A key group whose ids are ALL NULL must keep exactly one row —
    min(id)=NULL + join-back silently deleted the whole group (r6
    review); non-null ids in a mixed group still win (NULLS LAST)."""
    from goflow2clickhouse_spark.operators.dedup import exact_dedup

    rows = [
        (None, "k1"), (None, "k1"),   # all-null ids: keep exactly 1
        (None, "k2"), (7, "k2"),      # mixed: keep id 7
        (3, "k3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    for prehash in (True, False):
        out = exact_dedup(df, ["key"], prehash=prehash).collect()
        by_key = {}
        for r in out:
            by_key.setdefault(r.key, []).append(r.doc_id)
        assert {k: len(v) for k, v in by_key.items()} == {
            "k1": 1, "k2": 1, "k3": 1,
        }, (prehash, by_key)
        assert by_key["k2"] == [7] and by_key["k3"] == [3], (prehash, by_key)


def test_exact_dedup_prehash_not_separator_injectable(spark):
    """('a\\x1f', 'b') and ('a', '\\x1fb') are DISTINCT keys: the old
    concat_ws('\\x1f') prehash collided them and deleted one of the
    two rows (r6 review); per-column digests have no boundary to
    shift."""
    from goflow2clickhouse_spark.operators.dedup import exact_dedup

    rows = [(1, "a\x1f", "b"), (2, "a", "\x1fb")]
    df = spark.createDataFrame(rows, "doc_id long, a string, b string")
    got = sorted(r.doc_id for r in exact_dedup(df, ["a", "b"]).collect())
    assert got == [1, 2], got


# ---------------------------------------------------------------------------
# incremental_neardup_pairs (new batch vs existing corpus)
# ---------------------------------------------------------------------------

def test_incremental_neardup_old_x_new_only(spark):
    from goflow2clickhouse_spark.operators.dedup import (
        incremental_neardup_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    old = spark.createDataFrame(
        [
            (1, base),
            # near-identical PAIR inside the corpus: must never be
            # emitted — incremental compares old x new only
            (2, base + " lambda"),
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (101, base),  # verbatim copy of 1 (and near 2)
            (102, " ".join(base.split()[1:])),  # drop-first-word near-dup
            (103, "car boat plane train bike truck scooter ship sub rocket"),
        ],
        "doc_id long, text string",
    )
    pairs = incremental_neardup_pairs(old, new, threshold=0.5).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    # every pair crosses the boundary
    assert all(a <= 3 and b >= 101 for a, b in got)
    assert got[(1, 101)] == 1.0
    assert got[(1, 102)] >= 0.5
    # the old-old near pair (1,2) is absent by construction
    assert not any(a == 1 and b == 2 for a, b in got)
    # the novel doc matches nothing
    assert not any(b == 103 for _, b in got)


def test_incremental_neardup_batch_internal_dups_not_reported(spark):
    from goflow2clickhouse_spark.operators.dedup import (
        incremental_neardup_pairs,
    )

    old = spark.createDataFrame(
        [(1, "one two three four five six seven")],
        "doc_id long, text string",
    )
    dup = "red orange yellow green blue indigo violet"
    new = spark.createDataFrame(
        [(101, dup), (102, dup)], "doc_id long, text string"
    )
    pairs = incremental_neardup_pairs(old, new, threshold=0.5).collect()
    assert pairs == []  # 101~102 is within-batch, not old x new


def test_cluster_pairs_bigstar_matches_union_find(spark):
    """Large-star/small-star contraction must produce the identical
    (id, cluster_id) relation as the union-find path on chains (the
    high-diameter case it exists for), triangles, pairs, and a
    random graph."""
    import random

    from goflow2clickhouse_spark.operators.dedup import (
        cluster_pairs,
        cluster_pairs_bigstar,
    )

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),
        (10, 11), (10, 12), (11, 12),
        (20, 21),
    ]
    # a 60-hop chain: min-label propagation would need 60 rounds;
    # the contraction converges in O(log) rounds (max_rounds=12 is
    # the proof — a propagation-shaped implementation would raise)
    edges += [(100 + i, 101 + i) for i in range(60)]
    rng = random.Random(7)
    nodes = list(range(1000, 1080))
    edges += [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    got = {
        r.id: r.cluster_id
        for r in cluster_pairs_bigstar(pairs, max_rounds=12).collect()
    }
    want = {
        r.id: r.cluster_id for r in cluster_pairs(pairs).collect()
    }
    assert got == want


def test_cluster_pairs_bigstar_releases_checkpoints(spark):
    from goflow2clickhouse_spark.operators.dedup import cluster_pairs_bigstar

    before = _n_persistent(spark)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    labels = cluster_pairs_bigstar(pairs)
    assert labels.count() == 5
    del labels
    gc.collect()
    assert _n_persistent(spark) == before, (
        "bigstar round checkpoints still cached after handle drop"
    )


def test_cluster_pairs_shuffle_path_string_ids_converge(spark):
    """The shuffle path's old convergence probe summed lbl cast to
    decimal — NULL for string ids, so the loop silently stopped at
    exactly `iterations` rounds and far-chain nodes kept wrong labels
    (r8 review). The change-count probe must converge string-id chains
    past the floor."""
    from goflow2clickhouse_spark.operators.dedup import cluster_pairs

    # chain d00-d01-...-d09: min label d00 is 9 hops from d09
    pairs = spark.createDataFrame(
        [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(9)],
        "id_a string, id_b string",
    )
    got = {
        r.id: r.cluster_id
        for r in cluster_pairs(
            pairs, iterations=2, broadcast_max_edges=0
        ).collect()
    }
    assert got == {f"d{i:02d}": "d00" for i in range(10)}


def test_cluster_pairs_bigstar_keeps_self_pair_only_nodes(spark):
    """A node whose ONLY pair is the self-pair must appear in the
    output labeled with itself — cluster_pairs emits it, and the
    operators' documented contract is an identical relation (r8
    review: bigstar derived nodes after the self-edge filter and
    dropped it)."""
    from goflow2clickhouse_spark.operators.dedup import (
        cluster_pairs,
        cluster_pairs_bigstar,
    )

    pairs = spark.createDataFrame(
        [(7, 7), (1, 2)], "id_a long, id_b long"
    )
    big = sorted(map(tuple, cluster_pairs_bigstar(pairs).collect()))
    uf = sorted(map(tuple, cluster_pairs(pairs).collect()))
    assert big == uf == [(1, 1), (2, 1), (7, 7)]


def test_exact_dedup_array_keys_not_mergeable(spark):
    """cast-to-string renders ['a, b'] and ['a','b'] identically
    (', ' join, no quoting) — the prehash key must not merge distinct
    nested-type rows (r8 review; the r6 separator fix's sibling)."""
    from goflow2clickhouse_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, ["a, b"]), (2, ["a", "b"]), (3, ["a", "b"])],
        "doc_id long, tags array<string>",
    )
    kept = sorted(
        r.doc_id for r in exact_dedup(df, ["tags"], "doc_id").collect()
    )
    assert kept == [1, 2]  # 3 is a true dup of 2; 1 stays distinct
