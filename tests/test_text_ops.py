"""Edge cases for the text operators that the corpus-level oracle
queries can't reach: degenerate documents and regex word-boundary
behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from goflow2clickhouse_spark.operators import text as T


def _one(spark, text: str, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")
    ).first().v


def test_bigrams_basic_and_degenerate(spark):
    assert _one(spark, "a b c", T.bigrams("text")) == ["a b", "b c"]
    assert _one(spark, "solo", T.bigrams("text")) == []


def test_dup_bigram_ratio(spark):
    # "x y x y x" → bigrams [x y, y x, x y, y x] → 2 distinct of 4 → 0.5
    assert _one(spark, "x y x y x", T.dup_bigram_ratio("text")) == 0.5
    assert _one(spark, "solo", T.dup_bigram_ratio("text")) is None
    assert _one(spark, "a b c", T.dup_bigram_ratio("text")) == 0.0


def test_denylist_word_bounded(spark):
    # "sparkly" must NOT be masked ("spark" is deny-listed, word-bounded)
    s = "spark sparkly vector hashing hash"
    assert _one(spark, s, T.denylist_hits("text")) == 3
    assert (
        _one(spark, s, T.denylist_scrub("text"))
        == "[X] sparkly [X] hashing [X]"
    )


def test_denylist_count_matches_scrub_delta(spark):
    """hits * (len(term)-len(mask)) accounting must reconcile on a doc
    with repeated terms."""
    s = "hash hash hash"
    hits = _one(spark, s, T.denylist_hits("text"))
    after = _one(spark, s, F.length(T.denylist_scrub("text")))
    assert hits == 3
    assert after == len("[X] [X] [X]")


# ---------------------------------------------------------------------------
# dup_span_coverage: interval-merge edge cases the corpus oracle
# can't isolate (operators/dedup.dup_span_coverage)
# ---------------------------------------------------------------------------

def _coverage(spark, docs, n=3):
    from goflow2clickhouse_spark.operators.dedup import dup_span_coverage

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: (r.n_words, r.dup_tokens)
        for r in dup_span_coverage(df, n=n).collect()
    }


def test_dup_span_overlapping_merge(spark):
    # "a b c d" shared by both docs: doc 1 has shingles (a b c) at 1 and
    # (b c d) at 2 — both duplicated, overlapping → merged island
    # covering positions 1..4 = 4 tokens, not 3+3.
    cov = _coverage(spark, [
        (1, "a b c d x y z"),
        (2, "q a b c d r s"),
    ])
    assert cov[1] == (7, 4)
    assert cov[2] == (7, 4)


def test_dup_span_disjoint_islands(spark):
    # two separate duplicated trigrams with a unique gap between them:
    # coverage = 3 + 3, two islands, not one 8-wide span.
    cov = _coverage(spark, [
        (1, "a b c GAP1 d e f"),
        (2, "a b c GAP2 d e f"),
    ])
    assert cov[1] == (7, 6)
    assert cov[2] == (7, 6)


def test_dup_span_within_doc_repeat(spark):
    # suffix-array semantics: an n-gram repeated inside ONE document
    # counts (total occurrences >= 2, not distinct-doc frequency).
    cov = _coverage(spark, [(1, "a b c z a b c")])
    assert cov[1] == (7, 6)


def test_dup_span_no_duplicates_absent(spark):
    # a doc with no duplicated n-gram yields no row (callers left-join).
    cov = _coverage(spark, [(1, "a b c d e"), (2, "v w x y z")])
    assert cov == {}


def test_dup_span_full_coverage(spark):
    # identical docs: every position covered → dup_tokens == n_words.
    cov = _coverage(spark, [(1, "p q r s t"), (2, "p q r s t")])
    assert cov[1] == (5, 5)
    assert cov[2] == (5, 5)


def test_dup_span_coverage_matches_bruteforce_random(spark):
    """Randomized (seeded) differential check of the distributed
    interval-merge against a brute-force position-set reference."""
    import random

    from goflow2clickhouse_spark.operators.dedup import dup_span_coverage

    rng = random.Random(20260813)
    vocab = ["w%d" % i for i in range(12)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))
        for d in range(60)
    }

    n = 3
    from collections import Counter

    counts = Counter()
    per_doc = {}
    for d, t in docs.items():
        w = t.split(" ")
        ps = []
        for i in range(len(w) - n + 1):
            s = " ".join(w[i:i + n])
            counts[s] += 1
            ps.append((i + 1, s))
        per_doc[d] = (len(w), ps)
    want = {}
    for d, (nw, ps) in per_doc.items():
        covered = set()
        for i, s in ps:
            if counts[s] >= 2:
                covered.update(range(i, i + n))
        if covered:
            want[d] = (nw, len(covered))

    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.dup_tokens)
        for r in dup_span_coverage(df, n=n).collect()
    }
    assert got == want


def test_dup_span_semi_join_shape_equal(spark):
    """Both physical shapes must agree exactly — pinned on the edge
    cases above AND on an adversarially skewed corpus."""
    from goflow2clickhouse_spark.operators.dedup import dup_span_coverage

    docs = [
        (1, "a b c d x y z"),
        (2, "q a b c d r s"),
        (3, "a b c GAP d e f"),
        (4, "v w x y z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = sorted(map(tuple, dup_span_coverage(df, n=3).collect()))
    alt = sorted(
        map(tuple, dup_span_coverage(df, n=3, semi_join=True).collect())
    )
    assert base == alt and base


def test_dup_span_adversarial_skew_both_shapes(spark):
    """One shingle at ~10% corpus frequency — the hot-group case where
    the window shape funnels a whole postings list into one task and
    the semi-join shape is the right call. Both must still produce
    identical coverage; the fixture also carries per-doc unique
    content and a second, rarer duplicate so the answer is nontrivial."""
    from goflow2clickhouse_spark.operators.dedup import dup_span_coverage

    docs = []
    for i in range(300):
        uniq = f"u{i}a u{i}b u{i}c u{i}d"
        if i % 10 == 0:  # ~10% of docs carry the hot trigram
            docs.append((i, f"HOT1 HOT2 HOT3 {uniq}"))
        elif i % 97 == 0:
            docs.append((i, f"{uniq} rare1 rare2 rare3"))
        else:
            docs.append((i, f"{uniq} u{i}e u{i}f u{i}g"))
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(8)
    w = sorted(map(tuple, dup_span_coverage(df, n=3).collect()))
    s = sorted(
        map(tuple, dup_span_coverage(df, n=3, semi_join=True).collect())
    )
    assert w == s
    by_id = dict((t[0], t[2]) for t in s)
    assert by_id[0] == 3 and by_id[10] == 3  # hot trigram coverage
    assert by_id[97] == 3  # rare duplicate still found
    assert 1 not in by_id  # unique doc yields no row


def _classic_bpe_count(text: str) -> int:
    """Independent second implementation of BPE encoding (the module
    rule): the textbook min-rank loop over token LISTS — find the
    lowest-rank adjacent pair present, merge all its occurrences
    left-to-right, repeat — sharing nothing with the column
    expression beyond the merge table itself."""
    import re

    ranks = {pair: i for i, pair in enumerate(T.BPE_MERGES)}
    text = text.replace(T.BPE_B0, "").replace(T.BPE_B1, "")
    total = 0
    for w in re.findall(T.BPE_PRETOKEN_RE, text):
        toks = list(w)
        while len(toks) > 1:
            r = min(
                ranks.get((toks[i], toks[i + 1]), 10**9)
                for i in range(len(toks) - 1)
            )
            if r == 10**9:
                break
            a, b = T.BPE_MERGES[r]
            out, i = [], 0
            while i < len(toks):
                if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        total += len(toks)
    return total


def test_bpe_merge_table_invariant():
    """The rank-sequential-equals-min-rank equivalence rests on the
    constituents-first invariant — the module refuses tables that
    break it."""
    import pytest

    T._check_bpe_merges()  # the shipped table passes
    with pytest.raises(ValueError, match="earlier merge"):
        T._check_bpe_merges((("th", "e"), ("t", "h")))


def test_bpe_token_count_matches_independent_bpe(spark):
    """Fuzz + adversarial pins: the column-expression encoder equals
    the classic min-rank BPE on degenerate inputs, the shared-boundary
    trap ('thththth' under-merged to th-t-h-th with a one-char
    boundary), merge-chain composition words, boundary chars embedded
    in the input, and 200 random strings over the merge alphabet."""
    import random

    texts = [
        "", "a", "the", "thththth", "tttthhhh", "ingingING",
        "internationalization 1900 2000", "nation station the and of",
        "x\x1fy the\x1eend", "aaa,bbb.the the", "19200019 ers",
    ]
    rng = random.Random(11)
    for _ in range(200):
        texts.append("".join(
            rng.choice("thein gares. o19,20abcd")
            for _ in range(rng.randint(0, 30))
        ))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", T.bpe_token_count("text").alias("n"))
        .collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _classic_bpe_count(t), (t, got[i])


def test_bpe_sql_twin_matches_independent_bpe():
    """The DuckDB chain (bpe_token_count_sql — the oracle side) equals
    the classic implementation on the same adversarial set, so BOTH
    replays are pinned to the reference, not merely to each other."""
    import random

    import duckdb

    texts = ["", "thththth", "the cat, 1900!", "x\x1fy\x1ez ing ers"]
    rng = random.Random(13)
    for _ in range(150):
        texts.append("".join(
            rng.choice("thein gares. o19,20abcd")
            for _ in range(rng.randint(0, 25))
        ))
    con = duckdb.connect()
    expr = T.bpe_token_count_sql("t.s")
    for t in texts:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS s) t", [t]
        ).fetchone()[0]
        assert got == _classic_bpe_count(t), (t, got)


def test_bpe_null_text_counts_zero(spark):
    """NULL text folds to 0, matching the SQL twin's COALESCE (r12
    review: the Spark chain propagated NULL — a per-document
    divergence inside budget selections)."""
    df = spark.createDataFrame([(None,), ("the",)], "text string")
    got = sorted(
        r["n"] for r in
        df.select(T.bpe_token_count("text").alias("n")).collect()
    )
    assert got == [0, 1]


# --------------------------------------------------------------------------
# Production-scale BPE (r13): trainer, vendored-table loader, and the
# mapInPandas encoder whose plan size is independent of table size
# --------------------------------------------------------------------------


def _rankseq_count(text: str, merges) -> int:
    """Independent second implementation of the TRAINED-table encoder
    (the module rule): rank-SEQUENTIAL exhaustive application via
    boundary-delimited string replaces — a different algorithm and a
    different representation from the min-rank token-list loop, equal
    to it exactly when the table satisfies the constituents-first
    invariant (which trained tables do by construction and
    load_bpe_merges enforces)."""
    import re

    text = text.replace(T.BPE_B0, "").replace(T.BPE_B1, "")
    total = 0
    for w in re.findall(T.BPE_PRETOKEN_RE, text):
        s = T.BPE_SEP + "".join(c + T.BPE_SEP for c in w)
        for a, b in merges:
            s = s.replace(
                T.BPE_B1 + a + T.BPE_B0 + T.BPE_B1 + b + T.BPE_B0,
                T.BPE_B1 + a + b + T.BPE_B0,
            )
        total += s.count(T.BPE_B0) - 1
    return total


def test_bpe_trainer_hand_computed():
    """Classic trainer on a corpus small enough to verify by hand:
    'abab' x3 + 'abc' x2 -> pairs ab:8? no — per-word counts: abab has
    (a,b) x2, (b,a) x1; abc has (a,b), (b,c). Weighted: (a,b) 3*2+2=8,
    (b,a) 3, (b,c) 2. First merge ('a','b'); then states ab-ab / ab-c
    give (ab,ab) 3, (ab,c) 2 -> second merge ('ab','ab'); third
    ('ab','c') at count 2 = min_count."""
    got = T.train_bpe_merges({"abab": 3, "abc": 2}, 10)
    assert got == [("a", "b"), ("ab", "ab"), ("ab", "c")]


def test_bpe_trainer_deterministic_tiebreak():
    """Equal-count pairs break lexicographically — 'ba' and 'ab' both
    count 2: ('a','b') wins over ('b','a')."""
    got = T.train_bpe_merges({"ab": 2, "ba": 2}, 1)
    assert got == [("a", "b")]


def test_bpe_trainer_output_satisfies_invariant():
    """Trained tables satisfy the constituents-first invariant BY
    CONSTRUCTION (a pair over token X is only countable once X
    exists) — the property that makes rank-sequential replay equal
    min-rank encoding. Checked for a fresh train over mixed words and
    for the vendored fixture."""
    merges = T.train_bpe_merges(
        {"the": 50, "then": 20, "there": 10, "ingestion": 5,
         "nation": 9, "station": 7, "1900": 4, "2000": 6}, 64,
    )
    T._check_bpe_merges(tuple(merges))
    vendored = T.load_bpe_merges()
    assert len(vendored) == 2000
    T._check_bpe_merges(vendored)  # loader already enforces; re-pin


def test_bpe_loader_gpt2_format(tmp_path):
    """load_bpe_merges parses the published merges.txt shape —
    '#'-prefixed headers skipped, one 'a b' pair per line — and
    refuses malformed lines loudly."""
    import pytest

    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\nt h\nth e\n")
    assert T.load_bpe_merges(str(p)) == (("t", "h"), ("th", "e"))
    bad = tmp_path / "bad.txt"
    bad.write_text("t h x\n")
    with pytest.raises(ValueError, match="malformed"):
        T.load_bpe_merges(str(bad))


def test_bpe_encoder_matches_column_chain_on_demo_table(spark):
    """The r12 verdict's cross-check: the mapInPandas encoder and the
    column-expression chain agree on the demonstration table — same
    strip/pre-tokenize/merge semantics, two implementations, one
    result — over the adversarial set plus corpus-style text."""
    texts = [
        "", "a", "the", "thththth", "tttthhhh", "ingingING",
        "internationalization 1900 2000", "nation station the and of",
        "x\x1fy the\x1eend", "aaa,bbb.the the", "19200019 ers",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    counted = T.with_bpe_token_count(
        df, T.BPE_MERGES, text_col="text", out_col="n_pandas"
    ).withColumn("n_chain", T.bpe_token_count("text"))
    for r in counted.collect():
        assert r["n_pandas"] == r["n_chain"], texts[r["i"]]


def test_bpe_encoder_trained_table_matches_independent(spark):
    """The trained-table encoder (min-rank token-list loop inside
    mapInPandas) equals the rank-sequential exhaustive-replace second
    implementation on trained-vocab words, merge compositions, OOV
    junk and 150 fuzz strings — the two coincide exactly because
    trained tables satisfy the constituents-first invariant."""
    import random

    merges = T.load_bpe_merges()
    texts = [
        "DataFrame partition shuffle the dataframe",
        "internationalization stations rationing dictionary",
        "thththth sessession 1000000007 zzzqqq",
        "select col from table where value, order by key!",
    ]
    rng = random.Random(17)
    alpha = "sparkdatafmethein0123456789"
    for _ in range(150):
        texts.append(" ".join(
            "".join(rng.choice(alpha)
                    for _ in range(rng.randint(1, 16)))
            for _ in range(rng.randint(1, 5))
        ))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["n"] for r in T.with_bpe_token_count(
            df, merges, text_col="text", out_col="n"
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _rankseq_count(t, merges), (t, got[i])


def test_bpe_merges_values_sql_refuses_unsafe_sides():
    """The SQL inliner refuses non-alphanumeric merge sides — a
    quote inside a side would corrupt the oracle replay silently."""
    import pytest

    assert T.bpe_merges_values_sql((("t", "h"),)) == "(0,'t','h')"
    with pytest.raises(ValueError, match="ASCII-alphanumeric"):
        T.bpe_merges_values_sql((("a'", "b"),))


def test_bpe_trainer_matches_naive_reference():
    """The incremental pair-index + lazy-heap trainer equals a naive
    reference (recount EVERY pair from scratch each iteration, argmax
    by (count desc, pair asc)) on 60 random vocabularies — the
    optimization layer (stale-heap entries, decrement re-pushes,
    touched-word bookkeeping) can never change WHICH merges train."""
    import random

    def naive(word_counts, n_merges, min_count=2):
        words = {w: list(w) for w in word_counts if len(w) > 1}
        merges = []
        while len(merges) < n_merges:
            counts: dict = {}
            for w, syms in words.items():
                c = word_counts[w]
                for p in zip(syms, syms[1:]):
                    counts[p] = counts.get(p, 0) + c
            best = min(
                ((-n, p) for p, n in counts.items() if n >= min_count),
                default=None,
            )
            if best is None:
                break
            a, b = best[1]
            merges.append((a, b))
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        return merges

    rng = random.Random(29)
    alpha = "abcdefth01"
    for trial in range(60):
        vocab = {}
        for _ in range(rng.randint(2, 25)):
            w = "".join(rng.choice(alpha)
                        for _ in range(rng.randint(1, 9)))
            vocab[w] = rng.randint(1, 9)
        n = rng.randint(1, 12)
        got = T.train_bpe_merges(vocab, n)
        want = naive(vocab, n)
        assert got == want, (trial, vocab, got, want)


def test_bpe_token_ids_sum_equals_count_and_ids_deterministic(spark):
    """The token-ID tier (r14): per document,
    len(with_bpe_token_ids(...)) == with_bpe_token_count(...) — the
    count tier IS the id tier's length, proven by running BOTH
    mapInPandas encoders over the same rows — and the ids themselves
    follow the deterministic scheme (codepoint for single chars,
    BPE_MERGED_ID_BASE + min-rank for merged tokens)."""
    merges = T.load_bpe_merges()
    texts = [
        "DataFrame partition shuffle the dataframe",
        "internationalization stations rationing dictionary",
        "thththth sessession 1000000007 zzzqqq",
        "select col from table where value, order by key!",
        "", "a", None, "x\x1fy the\x1eend",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = {
        r["i"]: r
        for r in T.with_bpe_token_count(
            T.with_bpe_token_ids(df, merges, out_col="ids"),
            merges, out_col="n",
        ).collect()
    }
    ranks = {p: j for j, p in enumerate(merges)}
    mids = T.bpe_merged_token_ids(merges)
    import re

    rx = re.compile(T.BPE_PRETOKEN_RE, re.ASCII)
    for i, t in enumerate(texts):
        r = rows[i]
        assert len(r["ids"]) == r["n"], (t, r)
        # independent per-word reconstruction of the expected ids
        want: list[int] = []
        for w in rx.findall((t or "").replace("\x1e", "").replace("\x1f", "")):
            for tok in T.bpe_encode_word(w, ranks):
                want.append(
                    ord(tok) if len(tok) == 1 else mids[tok]
                )
        assert list(r["ids"]) == want, (t, r["ids"], want)
        for v in r["ids"]:
            if v >= T.BPE_MERGED_ID_BASE:
                assert v - T.BPE_MERGED_ID_BASE < len(merges)
            else:
                assert 0 <= v <= 0x10FFFF


def test_bpe_merged_token_ids_min_rank_on_duplicate_strings():
    """Two merges CAN produce the same token string ((a,bc) vs
    (ab,c)); the id map must key the STRING at the LOWEST producing
    rank so the id is a function of the token, not of which merge
    fired."""
    merges = (("a", "b"), ("ab", "c"), ("a", "bc"))
    mids = T.bpe_merged_token_ids(merges)
    assert mids["ab"] == T.BPE_MERGED_ID_BASE + 0
    assert mids["abc"] == T.BPE_MERGED_ID_BASE + 1  # not rank 2
