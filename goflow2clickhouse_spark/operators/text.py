"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.C):
tokenization, quality scoring, language-ID heuristic, token counting,
document fingerprinting.

All pure column expressions (JVM whole-stage codegen, zero Python in
the hot path) and all portable: each has an exact DuckDB-SQL twin in
plans/extension_queries.py so results are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to")

# marker words per language for the n-gram/stopword language heuristic;
# checked in fixed priority order (deterministic tie-break)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "la", "y"),
    "zh": ("的", "是", "了"),
}


def words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def word_count(text: Column | str) -> Column:
    return F.size(words(text))


def stopword_count(text: Column | str) -> Column:
    return F.size(F.filter(words(text), lambda w: w.isin(*STOPWORDS)))


def distinct_word_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(words(text)))


def avg_word_len(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    no_spaces = F.length(F.replace(c, F.lit(" "), F.lit("")))
    return no_spaces / word_count(c)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals; downstream filters pick thresholds
    (e.g. stopword_ratio too low → boilerplate/gibberish)."""
    c = F.col(text_col)
    nw = word_count(c)
    return df.withColumns(
        {
            "n_words": nw,
            "n_distinct_words": distinct_word_count(c),
            "distinct_ratio": F.round(distinct_word_count(c) / nw, 4),
            "stopword_ratio": F.round(stopword_count(c) / nw, 4),
            "avg_word_len": F.round(avg_word_len(c), 4),
        }
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-word hit count per language."""
    w = words(text)
    return {
        lang: F.size(F.filter(w, lambda x: x.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(text: Column | str) -> Column:
    """argmax over language scores, ties broken by the fixed order of
    LANG_MARKERS; all-zero scores → 'unknown'."""
    scores = lang_scores(text)
    items = list(scores.items())
    # first lang (in LANG_MARKERS order) whose score equals the max
    max_score = F.greatest(*[s for _, s in items])
    expr = F.lit("unknown")
    for lang, s in reversed(items):
        expr = F.when((max_score > 0) & (s == max_score), lang).otherwise(expr)
    return expr


def bigrams(text: Column | str) -> Column:
    """Adjacent word pairs as `"w1 w2"` strings — the unit for
    repetition scoring and bigram language models. Pure column
    expression (zip of two shifted slices, JVM codegen)."""
    w = words(text)
    n = F.size(w)
    return F.zip_with(
        F.slice(w, 1, n - 1),
        F.slice(w, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def dup_bigram_ratio(text: Column | str) -> Column:
    """Fraction of repeated adjacent bigrams in the document —
    the standard boilerplate/repetition signal (high = the document
    loops over the same phrases). NULL when the document has < 2
    words."""
    b = bigrams(text)
    return F.when(
        F.size(b) > 0,
        F.round(1 - F.size(F.array_distinct(b)) / F.size(b), 4),
    )


DENYLIST = ("spark", "vector", "hash")
DENYLIST_RE = r"\b(" + "|".join(DENYLIST) + r")\b"


def denylist_hits(text: Column | str, pattern: str = DENYLIST_RE) -> Column:
    """Number of deny-listed term occurrences (word-bounded)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(pattern))


def denylist_scrub(text: Column | str, pattern: str = DENYLIST_RE,
                   mask: str = "[X]") -> Column:
    """The document with deny-listed terms redacted — the masking pass
    a training-data pipeline runs before tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(c, pattern, mask)


def token_count_regex(text: Column | str) -> Column:
    """BPE-ish token counting: runs of letters, runs of digits, single
    punctuation — the standard pre-tokenizer regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))


def fingerprint(text: Column | str, mod: int = 1_000_000_007) -> Column:
    """Deterministic position-weighted document fingerprint
    (rolling-hash family): sum_i ascii(text[i]) * i  mod  `mod`.
    Pure column expression; identical arithmetic is expressible in any
    SQL engine, so fingerprint-based dedup is oracle-checkable."""
    c = F.col(text) if isinstance(text, str) else text
    per_pos = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.ascii(F.substring(c, i, F.lit(1))).cast("long") * i.cast("long"),
    )
    # mod folded into EVERY step: the raw accumulator overflows int64
    # around ~30M-char CJK documents (codepoint x position sums past
    # 2^63) and Spark 4's default ANSI mode throws instead of wrapping
    # (r8 review — the with_salt XOR rationale's aggregate sibling).
    # Value-identical to a final mod: terms are non-negative and
    # (acc % m + x) stays far below 2^63. DuckDB oracles keep the
    # single final mod (HUGEINT never overflows) — same result.
    return F.aggregate(
        per_pos, F.lit(0).cast("long"), lambda acc, x: (acc + x) % mod
    )


def hashed_classifier_raw(text: Column | str) -> Column:
    """fastText-style hashed linear text classifier, the shape quality
    classifiers take in LLM-curation pipelines (a bag of hashed token
    features dotted with a weight vector): each whitespace token hashes
    to a deterministic integer weight in [-1000, 1000] (the stand-in
    for a trained weight table — swapping in real weights is a
    broadcast join on the same hash key), and the document's raw score
    is the exact INTEGER weight sum, computed as one in-row fold —
    no explode, no shuffle, no UDF; the weight lookup is pure
    arithmetic so any SQL engine replays it bit-for-bit.

    Scale (100 TB): this is a narrow map-only projection — score every
    document in a single scan with zero exchanges; the only shuffle in
    a scoring job is whatever aggregation the caller adds on top."""
    from .dedup import hash31

    per_tok = F.transform(
        words(text),
        lambda t: (
            hash31(F.concat(F.lit("qw:"), t)) % 2001 - 1000
        ).cast("long"),
    )
    return F.aggregate(per_tok, F.lit(0).cast("long"), lambda acc, x: acc + x)
