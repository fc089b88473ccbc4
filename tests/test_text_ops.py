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
