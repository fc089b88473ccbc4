"""pack_greedy: budget invariant, oversize handling, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goflow2clickhouse_spark.operators.packing import pack_greedy


def _docs(spark, rows):
    return spark.createDataFrame(rows, "shard string, id long, n long")


def test_next_fit_assignment(spark):
    # budget 10: [4,5] fill pack 0; 3 doesn't fit -> pack 1; [3,7] fill it
    df = _docs(
        spark,
        [("a", 1, 4), ("a", 2, 5), ("a", 3, 3), ("a", 4, 7), ("a", 5, 2)],
    )
    out = {
        r["id"]: (r["pack_id"], r["offset"])
        for r in pack_greedy(df, "shard", "id", "n", 10).collect()
    }
    assert out == {1: (0, 0), 2: (0, 4), 3: (1, 0), 4: (1, 3), 5: (2, 0)}


def test_oversize_doc_gets_own_pack(spark):
    df = _docs(spark, [("a", 1, 3), ("a", 2, 25), ("a", 3, 4), ("a", 4, 5)])
    rows = pack_greedy(df, "shard", "id", "n", 10).collect()
    by_id = {r["id"]: r for r in rows}
    # the oversize doc closes pack 0, sits alone in pack 1 at offset 0,
    # and the next doc opens pack 2
    assert (by_id[2]["pack_id"], by_id[2]["offset"]) == (1, 0)
    assert by_id[3]["pack_id"] == 2
    packs = {}
    for r in rows:
        packs.setdefault(r["pack_id"], []).append(r["n_tok"])
    for pid, toks in packs.items():
        assert sum(toks) <= 10 or len(toks) == 1, (pid, toks)


def test_shards_pack_independently(spark):
    df = _docs(spark, [("a", 1, 6), ("b", 2, 6), ("a", 3, 6), ("b", 4, 6)])
    rows = pack_greedy(df, "shard", "id", "n", 10).collect()
    by = {(r["shard"], r["id"]): r["pack_id"] for r in rows}
    assert by[("a", 1)] == 0 and by[("a", 3)] == 1
    assert by[("b", 2)] == 0 and by[("b", 4)] == 1


def test_partitioning_invariance(spark):
    rows = [("s%d" % (i % 3), i, (i * 7) % 23 + 1) for i in range(200)]
    df = _docs(spark, rows)
    a = sorted(
        map(tuple, pack_greedy(df, "shard", "id", "n", 40).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_greedy(df.repartition(13, "id"), "shard", "id", "n", 40)
            .collect(),
        )
    )
    assert a == b
    # invariant over the whole random-ish fixture
    import collections

    packs = collections.defaultdict(int)
    docs = collections.defaultdict(int)
    for shard, _id, n, pack_id, _off in a:
        packs[(shard, pack_id)] += n
        docs[(shard, pack_id)] += 1
    for k, tot in packs.items():
        assert tot <= 40 or docs[k] == 1, (k, tot)


def test_offsets_are_running_sums(spark):
    df = _docs(spark, [("a", i, 5) for i in range(1, 8)])
    rows = sorted(
        pack_greedy(df, "shard", "id", "n", 12).collect(),
        key=lambda r: r["id"],
    )
    # 5+5 fits (10<=12), third 5 doesn't -> packs of two docs each
    assert [(r["pack_id"], r["offset"]) for r in rows] == [
        (0, 0), (0, 5), (1, 0), (1, 5), (2, 0), (2, 5), (3, 0),
    ]


def test_rejects_nonpositive_budget(spark):
    df = _docs(spark, [("a", 1, 1)])
    with pytest.raises(ValueError):
        pack_greedy(df, "shard", "id", "n", 0)


def test_rejects_colliding_column_names(spark):
    """shard/id columns named like the emitted (n_tok, pack_id, offset)
    would duplicate a column in the output schema — clear error."""
    df = spark.createDataFrame([("a", 1, 2)], "pack_id string, id long, n long")
    with pytest.raises(ValueError, match="pack_id"):
        pack_greedy(df, "pack_id", "id", "n", 10)
    df2 = spark.createDataFrame([("a", 1, 2)], "shard string, offset long, n long")
    with pytest.raises(ValueError, match="offset"):
        pack_greedy(df2, "shard", "offset", "n", 10)


# ---------------------------------------------------------------------------
# chunk_offsets
# ---------------------------------------------------------------------------

from goflow2clickhouse_spark.operators.packing import chunk_offsets  # noqa: E402


def _texts(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _chunks(spark, text, window, stride):
    out = chunk_offsets(
        _texts(spark, [(1, text)]), window=window, stride=stride
    )
    return sorted(
        (r.chunk_idx, r.tok_start, r.tok_end, r.n_tok) for r in out.collect()
    )


def test_chunk_short_doc_single_chunk(spark):
    # 3 tokens <= window: one chunk covering everything
    assert _chunks(spark, "a b c", window=8, stride=4) == [(0, 0, 3, 3)]


def test_chunk_exact_window_single_chunk(spark):
    assert _chunks(spark, "a b c d", window=4, stride=2) == [(0, 0, 4, 4)]


def test_chunk_overlap_and_short_tail(spark):
    # n=7, window=4, stride=2 -> chunks at 0,2,4: last runs short
    got = _chunks(spark, "a b c d e f g", window=4, stride=2)
    assert got == [(0, 0, 4, 4), (1, 2, 6, 4), (2, 4, 7, 3)]
    # consecutive chunks overlap by window - stride tokens
    for (_, s0, e0, _), (_, s1, _, _) in zip(got, got[1:]):
        assert e0 - s1 == 4 - 2
    # full coverage, no chunk starts at/past n
    assert got[-1][2] == 7 and all(s < 7 for _, s, _, _ in got)


def test_chunk_coverage_property(spark):
    # every token position of every doc is covered by >= 1 chunk and
    # the chunk-count formula never emits a chunk starting past n
    rows = [(i, " ".join(f"w{j}" for j in range(n)))
            for i, n in enumerate([1, 5, 16, 17, 31, 32, 33, 95])]
    out = chunk_offsets(_texts(spark, rows), window=16, stride=12).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    lens = dict(enumerate([1, 5, 16, 17, 31, 32, 33, 95]))
    for doc_id, chunks in by_doc.items():
        n = lens[doc_id]
        covered = set()
        for c in chunks:
            assert 0 <= c.tok_start < n
            assert c.tok_end <= n and c.n_tok == c.tok_end - c.tok_start
            covered |= set(range(c.tok_start, c.tok_end))
        assert covered == set(range(n))
    assert set(by_doc) == set(lens)


def test_chunk_rejects_bad_params(spark):
    d = _texts(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_offsets(d, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_offsets(d, window=0, stride=1)


def test_pack_greedy_null_token_count_raises_clearly(spark):
    """A NULL token count used to die as int(NaN) deep in the executor
    fold — the error must name the defect (r8 review)."""
    import pytest as _pytest

    from goflow2clickhouse_spark.operators.packing import pack_greedy

    df = spark.createDataFrame(
        [("s", 1, 10), ("s", 2, None)], "shard string, doc_id long, n_tok_in int"
    )
    with _pytest.raises(Exception, match="non-null"):
        pack_greedy(df, "shard", "doc_id", "n_tok_in", budget=100).collect()
