"""Corpus-level text-pipeline queries (SURVEY.md §2.C extensions):
duplicate-n-gram fraction (RefinedWeb-style), PII scan + redaction,
vocabulary Zipf top-k, document-length deciles, bigram PMI collocations.

Each query is a pure-DataFrame plan with a DuckDB oracle replaying the
identical arithmetic. All text math stays in JVM column expressions
(split/transform/aggregate — whole-stage codegen); the only joins are
inverted-index (shingle-keyed) or vocabulary-sized (broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import text as TX
from ..operators.text import LANG_MARKERS
from ..schema import load_table
from .extension_queries import CORPUS_SQL, _H31, _SHINGLES_SQL, corpus
from .queries import query

# ---------------------------------------------------------------------------
# duplicate-n-gram fraction (the RefinedWeb / MassiveText repetition gate)
# ---------------------------------------------------------------------------

@query(
    "text_dupngram_fraction",
    bench=True,
    oracle=f"""
    WITH {_SHINGLES_SQL},
    sh31 AS (SELECT DISTINCT doc_id, {_H31.format(x='shingle')} AS h FROM sh),
    freq AS (
        SELECT h, COUNT(*) AS df FROM sh31 GROUP BY h
    ),
    per_doc AS (
        SELECT sh31.doc_id,
               COUNT(*) AS n_sh,
               SUM(CASE WHEN freq.df > 1 THEN 1 ELSE 0 END) AS n_dup
        FROM sh31 JOIN freq USING (h)
        GROUP BY sh31.doc_id
    )
    SELECT CAST(FLOOR(CAST(n_dup AS DOUBLE) / n_sh * 10) AS INT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_sh) AS BIGINT) AS total_shingles
    FROM per_doc GROUP BY 1
    """,
)
def text_dupngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of 3-gram shingles that also occur in some
    other document, bucketed into deciles — the corpus-wide duplicate-
    n-gram filter LLM pipelines run before training (high fraction =
    boilerplate / near-copy).

    Scale shape: distinct (doc, shingle-hash) → doc-frequency as a
    COUNT window partitioned by the hash (one shuffle on h; measured
    ~33% faster than the aggregate-then-join-back formulation, same
    rows) → per-doc aggregate. Per-hash window groups are bounded by
    the duplicate count of one shingle, so the window state never
    degenerates. Shuffle keys are 8-byte hash31 values and doc ids,
    never text or shingle strings; no all-pairs anywhere. The oracle
    replays the identical hash, so 31-bit collisions (which merge
    shingles) cannot diverge the engines."""
    sh = (
        D.word_shingles(corpus(spark, sf_dir))
        .select("doc_id", D.hash31(F.col("shingle")).alias("h"))
        .distinct()
    )
    per_doc = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return (
        per_doc.select(
            F.floor(F.col("n_dup").cast("double") / F.col("n_sh") * 10)
            .cast("int")
            .alias("bucket"),
            "n_sh",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_sh").alias("total_shingles"),
        )
    )


# ---------------------------------------------------------------------------
# exact duplicated-span coverage (suffix-array dedup, Lee et al. 2022)
# ---------------------------------------------------------------------------

_SPAN_H31 = _H31.format(
    x="concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])"
)

@query(
    "text_dup_span_coverage",
    bench=True,
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    base AS (
        SELECT doc_id, len(w) AS n_words, w
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus) t
        WHERE len(w) >= 5
    ),
    pos AS (
        SELECT doc_id, n_words, i, {_SPAN_H31} AS h
        FROM (SELECT doc_id, n_words, w,
                     UNNEST(generate_series(1, n_words - 4)) AS i
              FROM base) u
    ),
    duph AS (SELECT h FROM pos GROUP BY h HAVING COUNT(*) >= 2),
    iv AS (
        SELECT doc_id, start, fin FROM (
            SELECT doc_id, i AS start, i + 4 AS fin, h FROM pos
        ) v WHERE h IN (SELECT h FROM duph)
    ),
    isl AS (
        SELECT doc_id, start, fin,
               CASE WHEN start > COALESCE(MAX(fin) OVER (
                        PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -2) + 1 THEN 1 ELSE 0 END AS brk
        FROM iv
    ),
    grp AS (
        SELECT doc_id, start, fin,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY start
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS island
        FROM isl
    ),
    spans AS (
        SELECT doc_id, MAX(fin) - MIN(start) + 1 AS span_len
        FROM grp GROUP BY doc_id, island
    ),
    cov AS (SELECT doc_id, SUM(span_len) AS dup_tokens
            FROM spans GROUP BY doc_id)
    SELECT CAST(FLOOR(CAST(COALESCE(dup_tokens, 0) AS DOUBLE)
                      / n_words * 10) AS INT)      AS bucket,
           COUNT(*)                                AS n_docs,
           CAST(SUM(COALESCE(dup_tokens, 0)) AS BIGINT) AS total_dup_tokens
    FROM base LEFT JOIN cov USING (doc_id)
    GROUP BY 1
    """,
)
def text_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SPAN coverage (operators/dedup.dup_span_coverage
    — the suffix-array dedup of Lee et al. 2022, re-expressed as
    positional shingles + interval merge): per document, the fraction
    of word positions covered by any 5-gram occurring ≥2 times in the
    corpus, bucketed into deciles. Unlike `text_dupngram_fraction`
    (which counts duplicated shingles) this measures merged COVERAGE —
    overlapping duplicated spans are not double-counted, which is the
    quantity you need to decide whether to cut the spans out.

    Scale shape: doc-frequency aggregate + inverted-index semi-join on
    hash31 keys (8-byte shuffle), then the gaps-and-islands window
    pair partitioned by doc_id — per-task state is one document's
    duplicated positions. Docs with zero duplicated spans arrive via
    the left join against the (id, n_words) relation, which carries
    two ints per doc."""
    c = corpus(spark, sf_dir)
    cov = D.dup_span_coverage(c, n=5).select("doc_id", "dup_tokens")
    docs = c.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_words")
    ).filter(F.col("n_words") >= 5)
    full = docs.join(cov, "doc_id", "left").select(
        "n_words", F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens")
    )
    return (
        full.select(
            F.floor(
                F.col("dup_tokens").cast("double") / F.col("n_words") * 10
            ).cast("int").alias("bucket"),
            "dup_tokens",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dup_tokens").alias("total_dup_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# PII scan + redaction accounting
# ---------------------------------------------------------------------------

# Planted deterministically in BOTH engines (the fixture corpus is
# synthetic words with no real PII): every 5th doc gains an email, every
# 7th an IPv4. Regexes are RE2-and-Java-compatible.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

_PII_CORPUS_SQL = """
SELECT doc_id, source,
       CASE
         WHEN doc_id % 5 = 0 THEN
           concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                  '@example.com now')
         WHEN doc_id % 7 = 0 THEN
           concat(text, ' from 10.', CAST(doc_id % 256 AS VARCHAR),
                  '.0.', CAST(doc_id % 100 AS VARCHAR), ' logged')
         ELSE text
       END AS text
FROM documents
"""


@query(
    "pii_scan_stats",
    oracle=f"""
    WITH pii AS ({_PII_CORPUS_SQL}),
    scanned AS (
        SELECT source,
               len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_email,
               len(regexp_extract_all(text, '{_IPV4_RE}')) AS n_ipv4,
               length(text)
                 - length(regexp_replace(regexp_replace(text,
                       '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_IPV4_RE}', '<IP>', 'g')) AS delta
        FROM pii
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_email,
           CAST(SUM(CASE WHEN n_ipv4 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_ipv4,
           CAST(SUM(n_email) AS BIGINT) AS total_emails,
           CAST(SUM(n_ipv4) AS BIGINT) AS total_ipv4,
           CAST(SUM(delta) AS BIGINT) AS chars_delta
    FROM scanned GROUP BY source
    """,
)
def pii_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction accounting per source: email / IPv4
    hit counts and the net character delta after masking — the audit
    table a pipeline emits before releasing a training set.

    Pure regexp column expressions (JVM codegen), one aggregate, zero
    joins; embarrassingly parallel at any scale."""
    d = load_table(spark, sf_dir, "documents")
    text = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"), F.lit(" contact user"),
                F.col("doc_id").cast("string"), F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"), F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
                (F.col("doc_id") % 100).cast("string"), F.lit(" logged"),
            ),
        )
        .otherwise(F.col("text"))
    )
    redacted = F.regexp_replace(
        F.regexp_replace(text, _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>"
    )
    scanned = d.select(
        "source",
        F.regexp_count(text, F.lit(_EMAIL_RE)).alias("n_email"),
        F.regexp_count(text, F.lit(_IPV4_RE)).alias("n_ipv4"),
        (F.length(text) - F.length(redacted)).alias("delta"),
    )
    return scanned.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_email") > 0).cast("long")).alias("docs_with_email"),
        F.sum((F.col("n_ipv4") > 0).cast("long")).alias("docs_with_ipv4"),
        F.sum("n_email").cast("long").alias("total_emails"),
        F.sum("n_ipv4").cast("long").alias("total_ipv4"),
        F.sum("delta").cast("long").alias("chars_delta"),
    )


# ---------------------------------------------------------------------------
# vocabulary Zipf top-k
# ---------------------------------------------------------------------------

@query(
    "corpus_vocab_topk",
    oracle="""
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        FROM documents
    ) w
    GROUP BY word
    ORDER BY n_occurrences DESC, word
    LIMIT 25
    """,
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 vocabulary terms by corpus frequency with document
    frequency — the Zipf head a tokenizer-training step inspects.

    explode → two-phase hash aggregate → TakeOrderedAndProject: the
    map-side partial aggregate collapses each partition to its local
    vocabulary, so the shuffle carries |vocab| rows per partition, not
    |tokens|; top-k never materializes a global sort."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "word")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# document-length deciles (ntile window)
# ---------------------------------------------------------------------------

@query(
    "doc_length_deciles",
    oracle="""
    WITH ranked AS (
        SELECT lang, n_chars,
               ntile(10) OVER (PARTITION BY lang
                               ORDER BY n_chars, doc_id) AS decile
        FROM documents
    )
    SELECT lang, decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM ranked GROUP BY lang, decile
    """,
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-decile boundaries per language — the histogram a curation
    pipeline uses to pick truncation / packing thresholds.

    ntile needs a per-language total order: one shuffle by lang, sort
    within partition. Languages are the natural parallel unit; a single
    100 TB language would need the two-pass quantile variant
    (approx_percentile boundaries + bucket join) instead."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        d.select("lang", "n_chars", F.ntile(10).over(w).alias("decile"))
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk dataset assembly)
# ---------------------------------------------------------------------------

_PACK_WINDOW = 256


@query(
    "doc_packing_stats",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    placed AS (
        SELECT source, doc_id, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_off
        FROM toks
    )
    SELECT source,
           CAST(FLOOR(start_off / {_PACK_WINDOW}) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN FLOOR(start_off / {_PACK_WINDOW})
                      <> FLOOR((start_off + n_tok - 1) / {_PACK_WINDOW})
                     THEN 1 ELSE 0 END) AS BIGINT) AS boundary_crossers
    FROM placed
    GROUP BY source, 2
    """,
)
def doc_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style dataset
    assembly step): per source shard, documents are laid head-to-tail
    in doc_id order and cut into fixed 256-token packs; reports
    docs per pack, token mass, and boundary-crossing documents.

    The running sum is a partitioned window — each source shard packs
    independently, which is exactly how a 100 TB corpus is packed in
    practice (per input shard, not one global order). One shuffle by
    source, sort within partition, then a hash aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.select(
        "source", "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).cast("long").alias("start_off"),
    )
    win = F.lit(_PACK_WINDOW)
    return (
        placed.select(
            "source", "n_tok", "start_off",
            F.floor(F.col("start_off") / win).alias("pack_id"),
            F.floor((F.col("start_off") + F.col("n_tok") - 1) / win).alias("end_pack"),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum((F.col("pack_id") != F.col("end_pack")).cast("long"))
            .alias("boundary_crossers"),
        )
    )


_PACK_BUDGET = 256


@query(
    "doc_packing_assign",
    bench=True,
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tok,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                   AS rn
        FROM documents
    ),
    packed AS (
        SELECT source, doc_id, n_tok, rn,
               CAST(0 AS BIGINT) AS pack_id,
               CAST(0 AS BIGINT) AS off,
               CAST(n_tok AS BIGINT) AS used
        FROM toks WHERE rn = 1
        UNION ALL
        SELECT t.source, t.doc_id, t.n_tok, t.rn,
               CASE WHEN p.used + t.n_tok > {_PACK_BUDGET}
                    THEN p.pack_id + 1 ELSE p.pack_id END,
               CASE WHEN p.used + t.n_tok > {_PACK_BUDGET}
                    THEN 0 ELSE p.used END,
               CASE WHEN p.used + t.n_tok > {_PACK_BUDGET}
                    THEN CAST(t.n_tok AS BIGINT)
                    ELSE p.used + t.n_tok END
        FROM packed p JOIN toks t
          ON t.source = p.source AND t.rn = p.rn + 1
    ),
    pp AS (
        SELECT source, pack_id,
               COUNT(*) AS n_docs,
               SUM(n_tok) AS pack_tokens,
               SUM((doc_id % 997) * (off + 1)) AS assign_checksum
        FROM packed GROUP BY source, pack_id
    ),
    inv AS (
        SELECT COUNT(*) AS n_over FROM pp
        WHERE pack_tokens > {_PACK_BUDGET} AND n_docs > 1
    )
    SELECT source,
           CAST(pack_id AS BIGINT) AS pack_id,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(pack_tokens AS BIGINT) AS pack_tokens,
           ROUND(pack_tokens / CAST({_PACK_BUDGET} AS DOUBLE), 4)
               AS fill_ratio,
           CAST(assign_checksum AS BIGINT) AS assign_checksum,
           CAST((SELECT n_over FROM inv) AS BIGINT) AS n_over_budget
    FROM pp ORDER BY source, pack_id
    """,
)
def doc_packing_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy whole-document packing ASSIGNMENTS
    (operators/packing.pack_greedy): per source shard, documents fold
    head-to-tail in doc_id order into 256-token packs; a doc that
    doesn't fit closes the open pack. Where `doc_packing_stats`
    reports the concat-and-chunk layout (docs may straddle packs),
    this emits the structure a keep-docs-whole pipeline consumes.

    The differential proof pins BOTH the assignment and the budget
    invariant: the per-pack `assign_checksum` folds every document's
    (id, offset) placement — the oracle replays the identical next-fit
    recurrence as a recursive CTE, so any divergence in any placement
    hash-mismatches — and `n_over_budget` (packs over budget with >1
    doc) is differentially proven zero, the same pin style as
    leakage_free_split's zero-leakage invariant.

    Scale: one shuffle on the shard key into applyInPandas (O(1) fold
    state, one row per doc), then a (shard, pack) aggregate; the
    1-row invariant aggregate broadcasts back. The recursion lives in
    the ORACLE only — depth = docs in the largest shard, fine for
    DuckDB at test SFs; Spark's side stays a linear fold."""
    from ..operators.packing import pack_greedy

    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    a = pack_greedy(d, "source", "doc_id", "n_tok", _PACK_BUDGET)
    pp = a.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("pack_tokens"),
        F.sum((F.col("doc_id") % 997) * (F.col("offset") + 1)).alias(
            "assign_checksum"
        ),
    )
    inv = pp.filter(
        (F.col("pack_tokens") > _PACK_BUDGET) & (F.col("n_docs") > 1)
    ).agg(F.count("*").alias("n_over_budget"))
    return (
        pp.join(F.broadcast(inv))  # bcast bound: 1-row invariant aggregate
        .select(
            "source", "pack_id", "n_docs", "pack_tokens",
            F.round(
                F.col("pack_tokens") / F.lit(float(_PACK_BUDGET)), 4
            ).alias("fill_ratio"),
            "assign_checksum", "n_over_budget",
        )
        .orderBy("source", "pack_id")
    )


# ---------------------------------------------------------------------------
# bigram PMI collocations
# ---------------------------------------------------------------------------

@query(
    "bigram_pmi_top",
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM corpus
    ),
    uni AS (
        SELECT word, COUNT(*) AS c FROM (
            SELECT UNNEST(w) AS word FROM toks
        ) u GROUP BY word
    ),
    bi AS (
        SELECT w1, w2, COUNT(*) AS c_xy FROM (
            SELECT UNNEST(list_transform(generate_series(1, len(w) - 1),
                          i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS s
            FROM toks
        ) t, LATERAL (SELECT s.w1 AS w1, s.w2 AS w2)
        GROUP BY w1, w2
    ),
    tot AS (
        SELECT (SELECT CAST(SUM(c) AS DOUBLE) FROM uni) AS n_uni,
               (SELECT CAST(SUM(c_xy) AS DOUBLE) FROM bi) AS n_bi
    )
    SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
           ROUND(LOG2(((CAST(c_xy AS DOUBLE) * n_uni) * n_uni)
                      / ((n_bi * ux.c) * uy.c)), 4) AS pmi
    FROM bi, tot
    JOIN uni ux ON bi.w1 = ux.word
    JOIN uni uy ON bi.w2 = uy.word
    WHERE c_xy >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 25
    """,
)
def bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 bigram collocations by pointwise mutual information —
    phrase mining over the corpus (the classic PMI = log2 p(xy) /
    (p(x)p(y)) with a min-support gate).

    Bigram and unigram counts are two-phase aggregates. The unigram
    marginal joins carry NO broadcast hint: vocabulary grows with the
    corpus (Heaps' law — unboundedly once 100 TB of junk tokens are in
    play), so the hint would eventually force an over-sized broadcast;
    unhinted, AQE broadcasts while the vocab is actually small and
    falls back to an 8-byte-string-keyed shuffle join when it is not
    (r5 broadcast-bound audit). The two corpus-total scalars stay
    hinted — 1 row each by construction. Arithmetic order is
    parenthesized identically in the oracle so both engines produce
    bit-equal doubles."""
    c = corpus(spark, sf_dir)
    toks = c.select("doc_id", F.split("text", " ").alias("w"))
    uni = (
        toks.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    w = F.col("w")
    pairs = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = (
        toks.filter(F.size(w) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
    )
    n_uni = uni.agg(F.sum("c").cast("double").alias("n_uni"))
    n_bi = bi.agg(F.sum("c_xy").cast("double").alias("n_bi"))
    ux = uni.select(F.col("word").alias("w1"), F.col("c").alias("cx"))
    uy = uni.select(F.col("word").alias("w2"), F.col("c").alias("cy"))
    return (
        bi.filter(F.col("c_xy") >= 5)
        .crossJoin(F.broadcast(n_uni))  # bcast bound: 1-row scalar
        .crossJoin(F.broadcast(n_bi))  # bcast bound: 1-row scalar
        .join(ux, "w1")  # bcast bound: vocab grows with corpus — no hint
        .join(uy, "w2")  # bcast bound: vocab grows with corpus — no hint
        .select(
            "w1", "w2", F.col("c_xy").cast("long").alias("c_xy"),
            F.round(
                F.log2(
                    ((F.col("c_xy").cast("double") * F.col("n_uni"))
                     * F.col("n_uni"))
                    / ((F.col("n_bi") * F.col("cx")) * F.col("cy"))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# the full curation funnel (flagship composition)
# ---------------------------------------------------------------------------

# derived from operators/text.LANG_MARKERS so the oracle's language
# gate can never silently diverge from the Spark side's marker set
_ALL_MARKERS = ", ".join(
    f"'{m}'"
    for m in dict.fromkeys(
        m for markers in LANG_MARKERS.values() for m in markers
    )
)


def _funnel_oracle() -> str:
    from .extension_queries import _minhash_oracle

    sh8 = """
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(generate_series(1, len(w) - 7),
                      i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                                     w[i+4], w[i+5], w[i+6], w[i+7]))) AS shingle
    """
    return f"""
    WITH corpus AS ({CORPUS_SQL}),
    flags AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) >= 10
               AND len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) >= 0.2          AS q,
               len(list_filter(string_split(text, ' '),
                   x -> x IN ({_ALL_MARKERS}))) > 0               AS l,
               doc_id = MIN(doc_id) OVER (PARTITION BY text)      AS e
        FROM corpus
    ),
    pairs AS ({_minhash_oracle()}),
    dupb AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
    csh8 AS (
        {sh8} FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus) t
        WHERE len(w) >= 8
    ),
    bsh8 AS (
        SELECT DISTINCT shingle FROM (
            {sh8} FROM (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents WHERE doc_id % 50 = 0) t
            WHERE len(w) >= 8
        ) u
    ),
    cont AS (
        SELECT DISTINCT doc_id FROM csh8
        WHERE shingle IN (SELECT shingle FROM bsh8)
    ),
    gated AS (
        SELECT f.q, f.l, f.e,
               f.doc_id NOT IN (SELECT doc_id FROM dupb) AS nd,
               f.doc_id NOT IN (SELECT doc_id FROM cont) AS nc
        FROM flags f
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus,
           CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT)
               AS n_after_quality,
           CAST(SUM(CASE WHEN q AND l THEN 1 ELSE 0 END) AS BIGINT)
               AS n_after_lang,
           CAST(SUM(CASE WHEN q AND l AND e THEN 1 ELSE 0 END) AS BIGINT)
               AS n_after_exact,
           CAST(SUM(CASE WHEN q AND l AND e AND nd THEN 1 ELSE 0 END)
               AS BIGINT) AS n_after_neardup,
           CAST(SUM(CASE WHEN q AND l AND e AND nd AND nc THEN 1 ELSE 0 END)
               AS BIGINT) AS n_after_decontam
    FROM gated
    """


@query("corpus_curation_funnel", oracle=_funnel_oracle(), bench=True)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data curation pipeline as one plan: quality
    gate → language gate → exact dedup (min-id representative) →
    MinHash-LSH near-dup (drop the larger id of every verified pair) →
    8-gram benchmark decontamination; reports the survivor count after
    each cumulative stage.

    One-pass formulation: every gate is evaluated corpus-wide as a
    boolean column (the dedup/decontamination gates arrive via id-keyed
    joins against pair/hit sets), then a single aggregate folds the
    cumulative conjunctions — the corpus is scanned once, never
    re-materialized per stage. At 100 TB each gate relation stays
    id-sized or benchmark-sized; the only corpus-wide shuffles are the
    exact-dedup window (partitioned by sha2(text) — a 64-byte key, so
    the exchange never carries the corpus) and MinHash's own bucket
    aggregates. The decontamination branch explodes shingles WITHOUT a
    distinct (word_shingles distinct=False) and joins on the 8-byte
    xxhash64 of each shingle. The semi-join carries NO broadcast hint:
    THIS query's stand-in benchmark is a corpus slice (doc_id % 50),
    which grows with the corpus — AQE broadcasts it while actually
    small and falls back to a shuffle keyed on the 8-byte hash once it
    isn't; either way no raw-8-gram-string exchange exists in the
    plan. A production benchmark is a fixed eval set, where
    `decontaminate`'s hinted broadcast is the right call (r5
    broadcast-bound audit).

    r4 profile note (BENCH_r03's 1.51x flag): standalone at sf0.1 this
    plan runs 3.3–3.5 s — BELOW its r2 bench number — with the MinHash
    substrate at 2.7 s of it; the 5.78 s r3 reading was bench-context
    inflation (cache/GC pressure from the dedup-family neighbors), now
    addressed in bench.py's per-query isolation. A scan-sharing
    variant (persist doc_id+text+split-words, derive all three gate
    branches from it) was prototyped and measured SLOWER (4.3 s vs
    3.5 s): materializing the words array costs more than the 0.24 s
    corpus re-scan it saves, so the three independent scans stand."""

    c = corpus(spark, sf_dir)
    w = F.split("text", " ")
    markers = [m for ms in LANG_MARKERS.values() for m in ms]
    nw = F.size(w)
    flags = c.select(
        "doc_id",
        ((nw >= 10)
         & (F.size(F.array_distinct(w)) / nw >= 0.2)).alias("q"),
        (F.size(F.filter(w, lambda x: x.isin(*markers))) > 0).alias("l"),
        (F.col("doc_id")
         == F.min("doc_id").over(
             Window.partitionBy(F.sha2(F.col("text"), 256)))).alias("e"),
    )
    pairs = D.minhash_lsh_dedup_pairs(c, threshold=0.5)
    dupb = (
        pairs.select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("_isdup", F.lit(True))
    )
    bench = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    )
    # 8-byte xxhash64 join key: b_sh8 grows with the corpus here (2%
    # slice), so the join is unhinted — and hash-keying makes BOTH AQE
    # outcomes safe (broadcast while small, hash-keyed shuffle once it
    # isn't — never a raw-8-gram-string exchange). Cross-string hash
    # collisions add a false "contaminated" flag with p ≈
    # n_bench·n_corpus/2^64 — negligible against MinHash's own error.
    # distinct=False here too: the default path would run the
    # slice-wide distinct keyed on RAW 8-gram strings before the hash
    # projection — hash first, then dedupe 8-byte keys
    b_sh8 = (
        D.word_shingles(bench, n=8, distinct=False)
        .select(F.xxhash64("shingle").alias("shash"))
        .distinct()
    )
    cont = (
        D.word_shingles(c, n=8, distinct=False)
        .select("doc_id", F.xxhash64("shingle").alias("shash"))
        .join(b_sh8, "shash", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_iscont", F.lit(True))
    )
    full = (
        flags.join(dupb, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select(
            "q", "l", "e",
            F.col("_isdup").isNull().alias("nd"),
            F.col("_iscont").isNull().alias("nc"),
        )
    )

    def cum(*cols):
        pred = F.lit(True)
        for x in cols:
            pred = pred & F.col(x)
        return F.sum(pred.cast("long"))

    out = full.agg(
        F.count("*").alias("n_corpus"),
        cum("q").alias("n_after_quality"),
        cum("q", "l").alias("n_after_lang"),
        cum("q", "l", "e").alias("n_after_exact"),
        cum("q", "l", "e", "nd").alias("n_after_neardup"),
        cum("q", "l", "e", "nd", "nc").alias("n_after_decontam"),
    )
    # the MinHash shingle cache must outlive this composed plan
    return D.pin(out, pairs)


# ---------------------------------------------------------------------------
# count-min sketch heavy hitters (fixed-memory frequency estimation)
# ---------------------------------------------------------------------------

def _cms_oracle() -> str:
    from ..operators.sketch import CMS_ROWS, CMS_WIDTH

    h = _H31.format(x="token")
    build = "\n        UNION ALL\n".join(
        f"        SELECT {i} AS row,"
        f" (({a} * h + {b}) % 2147483647) % {CMS_WIDTH} AS bucket FROM th"
        for i, (a, b) in enumerate(CMS_ROWS)
    )
    probe = "\n        UNION ALL\n".join(
        f"        SELECT ch.token, cells.c FROM ch JOIN cells"
        f" ON cells.row = {i}"
        f" AND cells.bucket = (({a} * ch.h + {b}) % 2147483647) % {CMS_WIDTH}"
        for i, (a, b) in enumerate(CMS_ROWS)
    )
    return f"""
    WITH corpus AS ({CORPUS_SQL}),
    tok AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM corpus),
    th AS (SELECT {h} AS h FROM tok),
    cells AS (
        SELECT row, bucket, COUNT(*) AS c FROM (
{build}
        ) rb GROUP BY row, bucket
    ),
    ch AS (SELECT token, {h} AS h FROM (SELECT DISTINCT token FROM tok) d),
    est AS (
        SELECT token, MIN(c) AS est FROM (
{probe}
        ) p GROUP BY token
    ),
    ex AS (SELECT token, COUNT(*) AS exact FROM tok GROUP BY token)
    SELECT est.token,
           CAST(est.est AS BIGINT)              AS est_count,
           CAST(ex.exact AS BIGINT)             AS exact_count,
           CAST(est.est - ex.exact AS BIGINT)   AS overcount
    FROM est JOIN ex USING (token)
    ORDER BY est_count DESC, token
    LIMIT 20
    """


@query("cms_heavy_hitters", oracle=_cms_oracle(), bench=True)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (operators/sketch.py): the
    token stream folds into a depth×width cell relation (one hash
    aggregate, map-side combine bounds every partition's exchange
    contribution at depth × width rows), then candidate tokens are
    point-estimated with a broadcast join against the sketch — min
    over rows, the CMS upper-bound estimator. Top 20 by estimate, with
    the exact count alongside so the differential test also verifies
    est ≥ exact (the sketch guarantee) under identical collisions in
    both engines.

    Tokenize-once shape (r4): the corpus is scanned and shuffled
    exactly ONCE — the exact per-token groupBy (which the query needs
    anyway to verify est ≥ exact). The sketch is then built FROM that
    vocabulary-sized relation via the weighted cms_build (identical
    cells, no second pass over occurrences) and the candidate set IS
    the same relation; it is persisted for its three consumers with
    the cache tied to the result's lifetime. At 100 TB where exact
    counts are unaffordable, drop the verification side and build the
    sketch from the occurrence stream directly — the one-corpus-pass
    path cms_build keeps."""
    from ..operators import sketch as SK

    # spread=False: same A/B evidence as bm25_topk above (min 1.24 vs
    # 0.87 s) — split+explode is too cheap to buy the exchange
    tok = corpus(spark, sf_dir, spread=False).select(
        F.explode(F.split("text", " ")).alias("token")
    )
    exact = (
        tok.groupBy("token").agg(F.count("*").alias("exact")).persist()
    )
    cells = SK.cms_build(exact, weight_col="exact")
    est = SK.cms_estimate(exact.select("token"), cells)
    out = (
        est.join(exact, "token")
        .select(
            "token",
            F.col("est").alias("est_count"),
            F.col("exact").alias("exact_count"),
            (F.col("est") - F.col("exact")).alias("overcount"),
        )
        .orderBy(F.desc("est_count"), "token")
        .limit(20)
    )
    return D.tie_cache(out, exact)


# ---------------------------------------------------------------------------
# fixed-k per-group reservoir sample
# ---------------------------------------------------------------------------

_RESV_H31 = _H31.format(x="concat('resv:', CAST(doc_id AS VARCHAR))")

@query(
    "reservoir_sample_per_source",
    oracle=f"""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY {_RESV_H31}, doc_id) AS rn
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_sampled,
           CAST(SUM(doc_id % 997) AS BIGINT) AS id_checksum,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM ranked WHERE rn <= 5
    GROUP BY source
    """,
)
def reservoir_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k sample per source
    (operators/sampling.reservoir_topk): exactly 5 docs per source,
    picked by smallest identity hash — the "pull k examples of every
    source for eval" primitive. The checksum columns pin the exact
    member set, so the differential test fails if either engine picks
    different rows."""
    from ..operators.sampling import reservoir_topk

    d = load_table(spark, sf_dir, "documents")
    s = reservoir_topk(d, ["source"], "doc_id", k=5)
    return s.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.col("doc_id") % 997).alias("id_checksum"),
        F.sum("n_chars").alias("sampled_chars"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership (the URL-seen / already-crawled gate)
# ---------------------------------------------------------------------------

def _bloom_oracle() -> str:
    from ..operators.sketch import BLOOM_BITS, BLOOM_ROWS

    h = _H31.format(x="text")
    pos_list = ", ".join(
        f"(({a} * h + {b}) % 2147483647) % {BLOOM_BITS}"
        for a, b in BLOOM_ROWS
    )
    return f"""
    WITH seen AS (
        SELECT DISTINCT text FROM documents WHERE doc_id % 7 = 0
    ),
    cand AS (SELECT DISTINCT text FROM documents),
    spos AS (
        SELECT DISTINCT p AS pos FROM (
            SELECT UNNEST([{pos_list}]) AS p
            FROM (SELECT {h} AS h FROM seen) t
        ) u
    ),
    cpos AS (
        SELECT text, len(ps) AS np, UNNEST(ps) AS pos FROM (
            SELECT text, list_distinct([{pos_list}]) AS ps
            FROM (SELECT text, {h} AS h FROM cand) t
        ) u
    ),
    hits AS (
        SELECT text, np, COUNT(*) AS kh
        FROM cpos JOIN spos USING (pos)
        GROUP BY text, np
    ),
    flag AS (
        SELECT c.text, COALESCE(h.kh = h.np, FALSE) AS mc
        FROM cand c LEFT JOIN hits h USING (text)
    )
    SELECT COUNT(*) AS n_candidates,
           CAST(SUM(CASE WHEN mc THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(CASE WHEN text IN (SELECT text FROM seen)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_seen_true,
           CAST(SUM(CASE WHEN mc AND text NOT IN (SELECT text FROM seen)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM flag
    """


@query("bloom_seen_filter", oracle=_bloom_oracle(), bench=True)
def bloom_seen_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The already-crawled gate: a Bloom filter built over the "seen"
    subset (every 7th doc's text), probed by the whole corpus
    (operators/sketch.bloom_build / bloom_might_contain — the filter
    is a ≤4096-row RELATION, so probing is a broadcast join, not a
    driver-side object behind a UDF). Output pins the exact flagged /
    true-seen / false-positive counts; the differential test therefore
    verifies both Bloom guarantees under identical hashing: every seen
    text flagged (no false negatives — n_flagged ≥ n_seen_true with
    equality exactly when n_false_pos = 0) and the same bounded
    false-positive set in both engines.

    Scan-once shape (r4): one corpus scan + one corpus-wide shuffle —
    a groupBy(text) that yields every distinct candidate WITH its
    seen-truth flag (max over the doc_id % 7 predicate), persisted for
    its three consumers (bloom build side, probe side, truth column;
    cache lifetime tied to the result). The previous shape scanned
    `documents` three times and ran the distinct-text shuffle twice."""
    from ..operators import sketch as SK

    d = load_table(spark, sf_dir, "documents")
    cand = (
        d.select(
            F.col("text").alias("key"),
            (F.col("doc_id") % 7 == 0).alias("_s"),
        )
        .groupBy("key")
        .agg(F.max("_s").alias("_seen"))
        .persist()
    )
    bloom = SK.bloom_build(cand.filter(F.col("_seen")).select("key"))
    mc = SK.bloom_might_contain(cand, bloom, assume_distinct=True)
    out = (
        mc.agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.col("might_contain").cast("long")).alias("n_flagged"),
            F.sum(F.col("_seen").cast("long")).alias("n_seen_true"),
            F.sum(
                (F.col("might_contain") & ~F.col("_seen"))
                .cast("long")
            ).alias("n_false_pos"),
        )
    )
    return D.tie_cache(out, cand)


# ---------------------------------------------------------------------------
# histogram quantile sketch (deterministic approximate percentiles)
# ---------------------------------------------------------------------------

@query(
    "price_quantile_sketch",
    bench=True,
    oracle="""
    WITH b AS (
        SELECT GREATEST(0, LEAST(999,
                   CAST(FLOOR(o_totalprice / 600000.0 * 1000) AS BIGINT)))
               AS bucket
        FROM orders
    ),
    counts AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY bucket),
    cum AS (
        SELECT bucket,
               SUM(c) OVER (ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(c) OVER () AS n
        FROM counts
    )
    SELECT CAST(q AS DOUBLE) AS q,
           ROUND(CAST(est AS DOUBLE), 2) AS est FROM (
        SELECT 0.5 AS q,
               (SELECT MIN(bucket) FROM cum WHERE cum >= CEIL(0.5 * n))
               * 600.0 AS est
        UNION ALL
        SELECT 0.9, (SELECT MIN(bucket) FROM cum WHERE cum >= CEIL(0.9 * n))
               * 600.0
        UNION ALL
        SELECT 0.99, (SELECT MIN(bucket) FROM cum WHERE cum >= CEIL(0.99 * n))
               * 600.0
    ) t
    ORDER BY q
    """,
)
def price_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of order value via the fixed-bin histogram sketch
    (operators/sketch.hist_quantiles, 1000 bins over [0, 600k) →
    ±600 error bound): the percentile formulation that survives
    100 TB — one combinable aggregate to ≤1000 rows, a window over
    those 1000, no global sort of the column (contrast
    `price_percentiles`, the exact form). Deterministic, so the oracle
    replays the identical binning and cumulative rule."""
    from ..operators.sketch import hist_quantiles

    o = load_table(spark, sf_dir, "orders")
    out = hist_quantiles(
        o, "o_totalprice", [0.5, 0.9, 0.99], lo=0.0, hi=600000.0,
        buckets=1000,
    )
    return out.select("q", F.round("est", 2).alias("est")).orderBy("q")


# ---------------------------------------------------------------------------
# one-pass column profiler (the ANALYZE TABLE primitive)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["doc_id", "lang", "n_chars", "source", "text"]

def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS col,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM documents"""
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col"


@query("documents_profile", oracle=_profile_oracle())
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in ONE scan (the data-quality / ANALYZE TABLE
    primitive every ingest pipeline runs before training): per column
    — null count, exact distinct count, min, max — computed as a
    single wide aggregate then unpivoted to long form. Spark plans the
    multiple DISTINCT aggregates via one Expand (rows × n_cols), still
    a single pass over the table; swap `countDistinct` for
    `approx_count_distinct` at 100 TB when ±2% suffices and the Expand
    must go."""
    d = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = d.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        wide.select(F.explode(rows).alias("r"))
        .select("r.col", "r.n_nulls", "r.n_distinct",
                "r.min_value", "r.max_value")
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (cardinality estimation as a relation)
# ---------------------------------------------------------------------------

def _hll_oracle() -> str:
    from ..operators.sketch import HLL_M, hll_estimate_sql, hll_rho_sql

    h = _H31.format(x="CAST(o_custkey AS VARCHAR)")
    return f"""
    WITH hv AS (
        SELECT h % {HLL_M} AS bucket,
               CAST(FLOOR(h / {HLL_M}) AS BIGINT) AS v
        FROM (SELECT {h} AS h FROM orders) t
    ),
    reg AS (
        SELECT bucket, MAX({hll_rho_sql()}) AS rho
        FROM hv GROUP BY bucket
    ),
    agg AS (
        SELECT COUNT(*) AS n_used,
               SUM(POWER(2.0, -rho)) AS inv_sum
        FROM reg
    ),
    est AS (
        SELECT n_used, {hll_estimate_sql("n_used", "inv_sum")} AS est
        FROM agg
    )
    SELECT CAST(n_used AS BIGINT) AS n_used,
           ROUND(est, 1) AS est,
           (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_exact
    FROM est
    """


@query("hll_distinct_customers", oracle=_hll_oracle(), bench=True)
def hll_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-customer cardinality via the HyperLogLog REGISTER
    RELATION (operators/sketch.hll_registers / hll_estimate): the
    declarative form of approx_count_distinct. Where Spark's built-in
    hides an opaque HLL++ blob in its aggregation buffer, this sketch
    is ≤ 64 rows any engine can replay — the DuckDB oracle recomputes
    the identical registers (rank from pure integer threshold sums, no
    float log2), the identical exact-in-binary harmonic sum, and the
    identical linear-counting correction, so the differential test
    pins the ESTIMATOR itself, not just row counts. The exact count
    rides along to expose the sketch's error.

    100 TB shape: the register build is one hash aggregate bounded at
    m=64 rows per partition exchange; registers of disjoint datasets
    merge by union + max — the mergeability the test suite checks."""
    from ..operators.sketch import HLL_M, hll_estimate, hll_registers

    o = load_table(spark, sf_dir, "orders")
    reg = hll_registers(o.select(F.col("o_custkey").alias("key")))
    est = hll_estimate(reg, HLL_M)
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return (
        est.join(F.broadcast(exact))  # bcast bound: 1-row scalar
        .select("n_used", F.round("est", 1).alias("est"), "n_exact")
    )


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (r4)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "hash", "window")
_BM25_K1, _BM25_B = 1.2, 0.75

def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH corpus AS ({CORPUS_SQL}),
    docs AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               string_split(text, ' ') AS w
        FROM corpus
    ),
    stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM docs),
    tf AS (
        SELECT doc_id, dl, token, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, UNNEST(w) AS token FROM docs) t
        WHERE token IN ({terms})
        GROUP BY doc_id, dl, token
    ),
    df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
    ),
    scored AS (
        SELECT tf.doc_id,
               SUM(LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
                   * tf.tf * ({_BM25_K1} + 1)
                   / (tf.tf + {_BM25_K1}
                      * (1 - {_BM25_B}
                         + {_BM25_B} * tf.dl / stats.avgdl))) AS score
        FROM tf JOIN df USING (token), stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 4) AS score
    FROM scored
    ORDER BY ROUND(score, 4) DESC, doc_id
    LIMIT 10
    """


@query("bm25_topk", oracle=_bm25_oracle(), bench=True)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval over the corpus for a fixed query term set — the
    lexical-retrieval primitive of every RAG / dedup-adjacent search
    stack (Robertson & Zaragoza 2009 parameterization, k1=1.2,
    b=0.75). Plan: ONE corpus scan explodes only matching tokens
    (the IN-list filters before the aggregate), per-(doc, term) TF is
    a hash aggregate, document frequencies aggregate from the same
    term-filtered relation (term-cardinality rows, broadcast back),
    and N/avgdl ride along as a broadcast scalar. Top-10 with
    doc_id tie-break; the score is rounded in BOTH engines before the
    ORDER BY so an ulp of ln() divergence cannot flip the cutoff."""
    # spread=False (r14 optimization round): an interleaved A/B
    # measured the spread exchange COSTING here (min 1.16 vs 0.74 s) —
    # one split + matching-token explode is too little map work to buy
    # a repartition of the corpus text
    c = corpus(spark, sf_dir, spread=False)
    docs = c.select(
        "doc_id",
        F.split("text", " ").alias("w"),
    ).select("doc_id", F.size("w").alias("dl"), "w")
    stats = docs.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select(
            "doc_id", "dl", F.explode("w").alias("token")
        )
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_rel = tf.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    part = (
        idf
        * F.col("tf") * (_BM25_K1 + 1)
        / (F.col("tf")
           + _BM25_K1
           * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df_rel), "token")  # bcast bound: |query terms| rows
        .join(F.broadcast(stats))  # bcast bound: 1-row scalar
        .groupBy("doc_id")
        .agg(F.sum(part).alias("raw"))
        .select("doc_id", F.round("raw", 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(10)


# ---------------------------------------------------------------------------
# token-budget greedy selection (r4)
# ---------------------------------------------------------------------------

_TOKEN_BUDGET = 20_000

@query(
    "token_budget_selection",
    bench=True,
    oracle=f"""
    WITH corpus AS ({CORPUS_SQL}),
    d AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               ROUND(CAST(len(list_distinct(string_split(text, ' ')))
                          AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS quality
        FROM corpus
    ),
    cum AS (
        SELECT doc_id, n_tokens, quality,
               SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_tokens
        FROM d
    ),
    kept AS (SELECT * FROM cum WHERE cum_tokens <= {_TOKEN_BUDGET})
    SELECT COUNT(*) AS n_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(MIN(quality), 6) AS worst_quality,
           CAST(SUM(doc_id % 997) AS BIGINT) AS id_checksum
    FROM kept
    """,
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-ranked selection under a token budget — "take the
    best documents until 100k tokens" (the data-selection step after
    scoring, before training). Selection = every document whose
    cumulative token count, in (quality DESC, doc_id) order, fits the
    budget.

    Scale shape — the global running sum WITHOUT a one-task global
    window: quality quantizes to a bucket (floor(q*1000), monotone in
    q), per-bucket token totals aggregate to ≤1001 rows, the
    cumulative OFFSET of all better buckets is a window over that tiny
    relation (broadcast back), and each document's global prefix sum =
    its bucket's offset + a running sum WITHIN its bucket — the
    per-bucket windows partition the corpus instead of serializing it.
    The oracle replays the logically-identical single-window form;
    both must select the same set (the checksum pins it)."""
    # spread=False (r15, adjudicating the r14 verdict's 1.17x flag):
    # the per-row map work is a bare split + array_distinct — the
    # class the r14 spread rule says never buys back its exchange.
    # Interleaved A/B at sf0.1 (5 alternations, bench isolation):
    # spread ON 1.14-1.44 s vs OFF 0.89-1.08 s.
    c = corpus(spark, sf_dir, spread=False)
    w = F.split("text", " ")
    d = c.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(w)).cast("double") / F.size(w), 6
        ).alias("quality"),
    )
    return _budget_select(d, _TOKEN_BUDGET)


def _budget_select(d: DataFrame, budget: int) -> DataFrame:
    """The bucketed-prefix-sum budget selection shared by the
    whitespace and exact-BPE forms (r12): `d` is (doc_id, n_tokens,
    quality); output is the selection summary. See
    token_budget_selection's docstring for the scale argument."""
    d = d.withColumn("bucket", F.floor(F.col("quality") * 1000))
    per_bucket = d.groupBy("bucket").agg(
        F.sum("n_tokens").alias("btot")
    )
    wb = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.withColumn(
        "offset", F.coalesce(F.sum("btot").over(wb), F.lit(0))
    ).select("bucket", "offset")
    win = Window.partitionBy("bucket").orderBy(
        F.desc("quality"), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    kept = (
        d.join(F.broadcast(offsets), "bucket")  # bcast bound: <= 1001 quality-bucket rows, fixed
        .withColumn(
            "cum_tokens", F.col("offset") + F.sum("n_tokens").over(win)
        )
        .filter(F.col("cum_tokens") <= budget)
    )
    return kept.agg(
        F.count("*").alias("n_selected"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.min("quality"), 6).alias("worst_quality"),
        F.sum(F.col("doc_id") % 997).alias("id_checksum"),
    )


# the BPE corpus carries ~3.7x the whitespace-word count (measured at
# sf0.01: 115k BPE vs 31k words), so the twin's budget scales to keep
# the selected fraction comparable (~60%)
_BPE_TOKEN_BUDGET = 70_000


@query(
    "token_budget_selection_bpe",
    oracle=f"""
    WITH corpus AS ({{CORPUS_SQL}}),
    d AS (
        SELECT doc_id,
               {{BPE_COUNT}} AS n_tokens,
               ROUND(CAST(len(list_distinct(string_split(text, ' ')))
                          AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS quality
        FROM corpus
    ),
    cum AS (
        SELECT doc_id, n_tokens, quality,
               SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_tokens
        FROM d
    ),
    kept AS (SELECT * FROM cum WHERE cum_tokens <= {_BPE_TOKEN_BUDGET})
    SELECT COUNT(*) AS n_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(MIN(quality), 6) AS worst_quality,
           CAST(SUM(doc_id % 997) AS BIGINT) AS id_checksum
    FROM kept
    """.replace("{CORPUS_SQL}", CORPUS_SQL)
       .replace("{BPE_COUNT}", TX.bpe_token_count_sql("text")),
)
def token_budget_selection_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token_budget_selection billed in EXACT BPE tokens (r12 — the
    r11 verdict's #8 done-criterion: with a real tokenizer the budget
    selection becomes exact): n_tokens comes from
    operators/text.bpe_token_count (the rank-ordered merge replay,
    zero Python) instead of the whitespace approximation, so "take
    the best documents until N tokens" now measures N in the unit a
    trainer actually consumes. The whitespace form measured 3.7x
    fewer units on the same corpus — a budget stated in words
    over-selects by that factor. Same bucketed-prefix-sum scale shape
    (shared _budget_select — no one-task global window); the oracle
    replays the BPE chain from the same merge table inside the
    single-window form, and the id checksum pins set equality."""
    c = corpus(spark, sf_dir)
    w = F.split("text", " ")
    d = c.select(
        "doc_id",
        TX.bpe_token_count("text").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(w)).cast("double") / F.size(w), 6
        ).alias("quality"),
    )
    return _budget_select(d, _BPE_TOKEN_BUDGET)


# the trained 2000-merge table compresses ~3x harder than the 28-merge
# demo chain (measured at sf0.01: 38.7k trained vs 115k demo tokens on
# the same corpus), so the budget scales down to keep the selected
# fraction comparable (~60%)
_BPE_TRAINED_BUDGET = 23_000


@query(
    "token_budget_selection_bpe_trained",
    oracle=r"""
    WITH RECURSIVE merges(rank, a, b) AS (VALUES {MERGES}),
    corpus AS ({CORPUS_SQL}),
    dtoks AS (
        SELECT doc_id, unnest(ws) AS w
        FROM (SELECT doc_id,
                     regexp_extract_all(
                         replace(replace(text, chr(30), ''), chr(31), ''),
                         '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]') AS ws
              FROM corpus)
    ),
    words AS (SELECT DISTINCT w FROM dtoks),
    enc(w, s) AS (
        SELECT w, chr(30) || chr(31) ||
               regexp_replace(w, '(.)', '\1' || chr(30) || chr(31), 'g')
        FROM words
      UNION ALL
        SELECT w, replace(s, chr(31) || a || chr(30) || chr(31) || b
                             || chr(30),
                          chr(31) || a || b || chr(30))
        FROM (
            SELECT e.w, e.s, m.a, m.b,
                   ROW_NUMBER() OVER (PARTITION BY e.w
                                      ORDER BY m.rank) AS rn
            FROM enc e JOIN merges m
              ON strpos(e.s, chr(31) || m.a || chr(30) || chr(31)
                             || m.b || chr(30)) > 0
        ) WHERE rn = 1
    ),
    wcount AS (
        SELECT w, length(s) - length(replace(s, chr(30), '')) - 1 AS ntok,
               ROW_NUMBER() OVER (PARTITION BY w ORDER BY length(s)) AS rn
        FROM enc
    ),
    dcount AS (
        SELECT doc_id, CAST(SUM(ntok) AS BIGINT) AS n_tokens
        FROM dtoks JOIN (SELECT w, ntok FROM wcount WHERE rn = 1)
             USING (w)
        GROUP BY doc_id
    ),
    d AS (
        SELECT c.doc_id, COALESCE(dc.n_tokens, 0) AS n_tokens,
               ROUND(CAST(len(list_distinct(string_split(text, ' ')))
                          AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS quality
        FROM corpus c LEFT JOIN dcount dc USING (doc_id)
    ),
    cum AS (
        SELECT doc_id, n_tokens, quality,
               SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_tokens
        FROM d
    ),
    kept AS (SELECT * FROM cum WHERE cum_tokens <= {BUDGET})
    SELECT COUNT(*) AS n_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(MIN(quality), 6) AS worst_quality,
           CAST(SUM(doc_id % 997) AS BIGINT) AS id_checksum
    FROM kept
    """.replace("{CORPUS_SQL}", CORPUS_SQL)
       .replace("{BUDGET}", str(_BPE_TRAINED_BUDGET))
       .replace("{MERGES}",
                TX.bpe_merges_values_sql(TX.load_bpe_merges())),
)
def token_budget_selection_bpe_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """token_budget_selection billed by the PRODUCTION tokenizer tier
    (r14, the r13 verdict's #4: the budget sibling above still billed
    with the 28-merge demo chain): n_tokens comes from
    operators/text.with_bpe_token_count under the trained 2000-merge
    table — the mapInPandas encoder whose plan size is independent of
    table size — so "take the best documents until N tokens" measures
    N in the unit the production tokenizer actually emits (the demo
    chain over-counts ~3x on this corpus). Same bucketed-prefix-sum
    scale shape (shared _budget_select); the oracle reuses the
    recursive-CTE min-rank encoder to bill every document
    independently, then replays the selection in the single-window
    form. The id checksum pins set equality of the kept documents."""
    c = corpus(spark, sf_dir)
    w = F.split("text", " ")
    billed = TX.with_bpe_token_count(
        c, TX.load_bpe_merges(), out_col="n_tokens"
    )
    d = billed.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.size(F.array_distinct(w)).cast("double") / F.size(w), 6
        ).alias("quality"),
    )
    return _budget_select(d, _BPE_TRAINED_BUDGET)


@query(
    "quality_classifier_scores",
    bench=True,
    oracle="""
    WITH s AS (
        SELECT doc_id, source,
               CAST(list_sum(list_transform(string_split(text, ' '),
                    t -> CAST(concat('0x', substring(md5(concat('qw:', t)), 1, 15))
                             AS BIGINT) % 2147483647 % 2001 - 1000)) AS BIGINT)
                   AS raw,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    )
    SELECT doc_id, source,
           CAST(FLOOR(raw * 1000.0 / n_tok) AS BIGINT) AS score_micro,
           raw > 0 AS keep
    FROM s
    """,
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality-classifier scores from the hashed linear
    model (operators/text.hashed_classifier_raw — the fastText-shaped
    scorer curation pipelines run before filtering): score_micro =
    mean token weight in millionths (range ±1e6), keep = positive raw
    sum. The weight sum is exact integer arithmetic folded in-row, so
    DuckDB replays it bit-for-bit; the score is emitted as
    FLOOR(raw*1000/n_tok) — an exact integer in both engines
    (raw*1000 ≤ 2e9 is double-exact and the quotient is ≥1e-4 from any
    integer it doesn't equal) — instead of ROUND(x, 6) of the float
    quotient, whose half-way ties in the 6th decimal broke the sf0.1
    differential (half-up vs half-even across engines; caught by the
    r6 scale soak). Map-only: scoring 100 TB is one scan with zero
    shuffles."""
    from ..operators.text import hashed_classifier_raw, word_count

    d = load_table(spark, sf_dir, "documents")
    raw = hashed_classifier_raw("text")
    return d.select(
        "doc_id",
        "source",
        F.floor(raw * 1000.0 / word_count("text")).cast("long").alias(
            "score_micro"
        ),
        (raw > 0).alias("keep"),
    )


@query(
    "global_shuffle_shards",
    bench=True,
    oracle="""
    WITH h AS (
        SELECT doc_id,
               CAST(concat('0x', substring(md5(concat('shuffle:',
                        CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                   % 2147483647 AS gh
        FROM documents
    )
    SELECT doc_id,
           CAST(gh % 8 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY gh % 8 ORDER BY gh, doc_id) - 1 AS BIGINT)
               AS position
    FROM h
    """,
)
def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards
    (operators/sampling.global_shuffle): the fixed example order a
    training run consumes — reproducible across engines and reruns,
    stable under append, one shuffle keyed on the uniform shard hash
    plus a per-shard (never global) row_number."""
    from ..operators.sampling import global_shuffle

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return global_shuffle(d, "doc_id", n_shards=8)


# ---------------------------------------------------------------------------
# sliding-window chunking (context-window prep, r6)
# ---------------------------------------------------------------------------

_CHUNK_W = 32
_CHUNK_S = 24


@query(
    "doc_chunk_offsets",
    bench=True,
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    ),
    nc AS (
        SELECT doc_id, n,
               CASE WHEN n <= {_CHUNK_W} THEN 1
                    ELSE 1 + CAST(FLOOR((n - {_CHUNK_W} + {_CHUNK_S} - 1)
                                        / {_CHUNK_S}) AS BIGINT)
               END AS n_chunks
        FROM t
    ),
    ch AS (
        SELECT doc_id, n,
               UNNEST(generate_series(0, n_chunks - 1)) AS chunk_idx
        FROM nc
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {_CHUNK_S} AS BIGINT) AS tok_start,
           CAST(LEAST(chunk_idx * {_CHUNK_S} + {_CHUNK_W}, n) AS BIGINT)
               AS tok_end,
           CAST(LEAST(chunk_idx * {_CHUNK_S} + {_CHUNK_W}, n)
                - chunk_idx * {_CHUNK_S} AS BIGINT) AS n_tok
    FROM ch ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunk_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunk assignments
    (operators/packing.chunk_offsets): every document split into
    32-token windows at stride 24 (8-token overlap), one row per
    chunk with [tok_start, tok_end) offsets — the context-window prep
    step for pipelines that split documents (`doc_packing_assign` is
    the keep-whole complement). All-integer arithmetic; the oracle
    replays the chunk-count recurrence and every offset, so one
    off-by-one in any chunk hash-mismatches. Scale: a narrow
    projection + explode — no shuffle, no UDF; parallelizes with the
    input splits and the exchange never carries document text."""
    from ..operators.packing import chunk_offsets

    d = load_table(spark, sf_dir, "documents")
    return chunk_offsets(d, window=_CHUNK_W, stride=_CHUNK_S).orderBy(
        "doc_id", "chunk_idx"
    )


# ---------------------------------------------------------------------------
# DSIR hashed importance weights (data selection, r7)
# ---------------------------------------------------------------------------

_DSIR_B = 256  # feature-hash buckets
_DSIR_TGT = "src0"  # the target domain (DSIR's "high-quality" side)


def _dsir_doc_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, bucket, cnt) — the hashed-feature bucket counts
    every DSIR stage derives from (distributions, totals, scoring).
    Extracted (r8) so the boundary-margin test below the query checks
    the REAL pipeline's counts, not a restated copy that could drift
    (tests/test_queries_oracle.py::test_dsir_quantization_boundary_margin)."""
    from ..schema import spread_small_scan

    # spread before the feature explode + per-feature md5 (the corpus
    # family's r14 rule: the fixture parquet is one row group)
    d = spread_small_scan(
        spark, sf_dir,
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", F.split("text", " ").alias("w")
        ),
    )
    w = F.col("w")
    feats = F.concat(
        F.transform(w, lambda x: F.concat(F.lit("u:"), x)),
        F.zip_with(
            F.slice(w, 1, F.size(w) - 1),
            F.slice(w, 2, F.size(w) - 1),
            lambda a, b: F.concat(F.lit("b:"), a, F.lit(" "), b),
        ),
    )
    return (
        d.select("doc_id", "source", F.explode(feats).alias("f"))
        .select(
            "doc_id", "source",
            (D.hash31(F.concat(F.lit("dsir:"), F.col("f"))) % _DSIR_B)
            .alias("bucket"),
        )
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count("*").alias("cnt"))
    )



@query(
    "dsir_importance_topk",
    bench=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    feats AS (
        SELECT doc_id, source,
               UNNEST(list_concat(
                   list_transform(w, x -> concat('u:', x)),
                   list_transform(generate_series(1, len(w) - 1),
                                  i -> concat('b:', w[i], ' ', w[i+1]))
               )) AS f
        FROM toks
    ),
    dfb AS (
        SELECT doc_id, source,
               {_H31.format(x="concat('dsir:', f)")} % {_DSIR_B} AS bucket,
               COUNT(*) AS cnt
        FROM feats GROUP BY doc_id, source, bucket
    ),
    bt AS (
        SELECT bucket,
               CAST(SUM(cnt) AS BIGINT) AS r,
               CAST(SUM(CASE WHEN source = '{_DSIR_TGT}' THEN cnt
                             ELSE 0 END) AS BIGINT) AS t
        FROM dfb GROUP BY bucket
    ),
    tot AS (
        SELECT CAST(SUM(r) AS DOUBLE) AS rr, CAST(SUM(t) AS DOUBLE) AS tt
        FROM bt
    ),
    lr AS (
        SELECT bucket,
               CAST(FLOOR((LN((t + 1.0) / (tt + {_DSIR_B}.0))
                           - LN((r + 1.0) / (rr + {_DSIR_B}.0)))
                          * 1000000.0) AS BIGINT) AS lr_micro
        FROM bt, tot
    )
    SELECT dfb.doc_id, ANY_VALUE(dfb.source) AS source,
           CAST(SUM(cnt * lr_micro) AS BIGINT) AS weight_micro
    FROM dfb JOIN lr USING (bucket)
    GROUP BY dfb.doc_id
    ORDER BY weight_micro DESC, doc_id
    LIMIT 25
    """,
)
def dsir_importance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style hashed importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how much more likely its hashed n-gram features
    are under the TARGET domain's distribution than the raw corpus's,
    then keep the top-weighted docs. Features are unigrams + bigrams
    hashed into 256 buckets; the per-bucket log-ratio
    ln(p_tgt[b]) - ln(p_raw[b]) (add-one smoothed) is quantized ONCE
    to integer micro-units, so every per-doc weight is an exact
    integer dot product — sum-order-independent and reproducible
    bit-for-bit in any engine (the rounding-tie lesson from the
    quality classifier: never hash-compare an order-dependent float
    sum).

    Scale shape: one corpus scan → (doc, bucket) counts (the only
    corpus-sized shuffle, 8-byte keys); the bucket table is 256 rows —
    the distributions and log-ratios are a broadcast, and scoring is a
    map-side join + aggregate already partitioned by doc. At 100 TB
    the target distribution comes from a small curated set (compute
    once, broadcast forever) and scoring stays one scan. The
    reference has no data-selection surface (main.go ingests
    everything); this is the §2.C training-data extension."""
    dfb = _dsir_doc_bucket_counts(spark, sf_dir).persist()
    # ^ persisted: three consumers (bt, tot, scoring) — one corpus scan
    bt = dfb.groupBy("bucket").agg(
        F.sum("cnt").alias("r"),
        F.sum(
            F.when(F.col("source") == _DSIR_TGT, F.col("cnt")).otherwise(0)
        ).alias("t"),
    )
    tot = bt.agg(
        F.sum("r").cast("double").alias("rr"),
        F.sum("t").cast("double").alias("tt"),
    )
    lr = (
        bt.crossJoin(F.broadcast(tot))  # bcast bound: 1-row scalar
        .select(
            "bucket",
            F.floor(
                (
                    F.log((F.col("t") + 1.0) / (F.col("tt") + float(_DSIR_B)))
                    - F.log((F.col("r") + 1.0) / (F.col("rr") + float(_DSIR_B)))
                )
                * 1000000.0
            ).cast("long").alias("lr_micro"),
        )
    )
    out = (
        dfb.join(F.broadcast(lr), "bucket")  # bcast bound: _DSIR_B rows
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.sum(F.col("cnt") * F.col("lr_micro")).alias("weight_micro"),
        )
        .orderBy(F.desc("weight_micro"), "doc_id")
        .limit(25)
    )
    return D.tie_cache(out, dfb)
