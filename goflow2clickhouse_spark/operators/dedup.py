"""Deduplication operators for LLM-data pipelines (SURVEY.md §2.C):
exact, normalized-exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
- exact dedup is a single hash-aggregate on the key (map-side partial
  combine; the representative is min(id), not "first seen", so the
  result is deterministic and parallel-safe);
- near-dup never compares all pairs: candidates come from an inverted
  index (shared shingle), LSH band buckets, or SimHash bands — all
  equi-joins Catalyst executes as shuffle-hash joins on the band key;
  only candidates get exact verification;
- all hashes are derived from md5 (62-bit hex prefix folded to 31 bits)
  so every stage is reproducible in any engine — the DuckDB oracles in
  plans/extension_queries.py re-run the identical pipeline in SQL.
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 31-bit Mersenne prime: permutation arithmetic stays < 2^36, safe in
# 64-bit integers under ANSI overflow checking in both engines.
MERSENNE_31 = 2_147_483_647
NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS


def hash31(col: Column) -> Column:
    """Portable 31-bit string hash: first 15 hex chars of md5 → int,
    folded into [0, 2^31-1). Same value computable in DuckDB as
    CAST(concat('0x', substring(md5(x),1,15)) AS BIGINT) % 2147483647."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % MERSENNE_31
    )


def _perm(h: Column, i: int) -> Column:
    """i-th minhash permutation: (a_i * h + b_i) mod p."""
    a, b = 2 * i + 1, i * 7919 + 1
    return (F.lit(a) * h + F.lit(b)) % MERSENNE_31


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "doc_id",
    prehash: bool = True,
) -> DataFrame:
    """Keep one row per key: the one with the minimum id (deterministic,
    unlike dropDuplicates' partition-order-dependent pick). One shuffle.

    With ``prehash`` (the default) the shuffle key is sha2-256 over the
    key columns — 64 fixed bytes instead of the document itself, so at
    100 TB the exchange carries hashes, not the corpus. Each column is
    hashed SEPARATELY first and the fixed-width per-column digests are
    concatenated before the outer hash: a raw concat_ws('\\x1f', ...)
    was separator-injectable — ('a\\x1f', 'b') and ('a', '\\x1fb')
    concatenated identically and one of two DISTINCT rows was silently
    deleted (r6 review; per-column digests have no variable-width
    boundary to shift). NULL encodes as a 1-char token, which can never
    collide with a 64-char digest. DuckDB replays the construction as
    sha256(concat(coalesce(sha256(c1), 'N'), ...)). Collisions at
    2^-128 are below hardware error rates. ``prehash=False`` keeps the
    raw columns as the key (short keys where the hash would be wider);
    both paths treat NULL as a real key value, matching GROUP BY.

    Representative pick = row_number over (key) ordered by id ASC NULLS
    LAST: one exchange of the corpus (the old aggregate+semi-join shape
    paid that same full-row exchange PLUS a narrow aggregate shuffle),
    and a group keeps exactly one row even when ids tie or are all NULL
    — min(id) over an all-NULL group was NULL and the join-back dropped
    the whole group (r6 review). With unique non-null ids (every
    in-repo caller) the kept row is exactly the min-id one,
    deterministic on any partitioning; among exactly-tied ids the pick
    is arbitrary but still exactly one."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _canon(c: str) -> Column:
        # cast-to-string is NOT injective for nested types: Spark joins
        # array elements with ', ' and no quoting, so ['a, b'] and
        # ['a','b'] rendered identically and one of two DISTINCT rows
        # was silently deleted (r8 review — the r6 separator fix's
        # nested-type sibling). to_json quotes and escapes, so it is
        # delimiter-safe for arrays/structs/maps.
        if isinstance(df.schema[c].dataType, (ArrayType, MapType, StructType)):
            return F.to_json(F.col(c))
        return F.col(c).cast("string")

    if prehash:
        key = F.sha2(
            F.concat(
                *[
                    F.coalesce(F.sha2(_canon(c), 256), F.lit("N"))
                    for c in key_cols
                ]
            ),
            256,
        )
        tagged = df.withColumn("__dedup_sha", key)
        w = Window.partitionBy("__dedup_sha").orderBy(
            F.col(id_col).asc_nulls_last()
        )
        return (
            tagged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__dedup_sha", "__rn")
        )
    w = Window.partitionBy(*key_cols).orderBy(F.col(id_col).asc_nulls_last())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def normalize_text(col: Column | str) -> Column:
    """lower → strip non-alnum → collapse whitespace (the usual exact-
    dedup canonicalization)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), F.lit("[^a-z0-9 ]"), F.lit(" ")),
            F.lit(" +"),
            F.lit(" "),
        )
    )


# ---------------------------------------------------------------------------
# shingling + n-gram Jaccard
# ---------------------------------------------------------------------------

def _shingle_expr(w: Column, n: int) -> Column:
    """The n-word shingle window as one array expression over a BOUND
    words-array column: positions 1..len-n+1, each concat_ws over an
    n-slice. Single source of truth for word_shingles,
    positional_shingles, and shingle_arrays — the construction must
    stay identical across them AND across the DuckDB oracles that
    replay it (_SHINGLES_SQL), so it lives in exactly one place."""
    return F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )


def word_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, distinct: bool = True,
) -> DataFrame:
    """N-word shingles per document: (id, shingle), distinct per doc by
    default. Documents shorter than n words yield no shingles.

    The words array is materialized in its own projection first: lambda
    bodies inside `transform` re-evaluate any outer *expression* per
    element, so deriving shingles directly from `split(text)` would
    re-split the whole document once per shingle — O(len²) per doc.
    Against a bound column reference each `slice` is O(n).

    ``distinct=False`` skips the corpus-wide (id, shingle) distinct —
    a shuffle keyed on raw n-gram STRINGS. Callers that immediately
    semi-join the shingles against a small set (decontamination) or
    re-aggregate them anyway must pass False: filtering first keeps
    the corpus-substring shuffle out of the plan entirely."""
    words = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_words")
    )
    w = F.col("_words")
    sh = _shingle_expr(w, n)
    out = (
        words.filter(F.size(w) >= n)
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
    )
    return out.distinct() if distinct else out


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    hash_key: bool = True,
) -> DataFrame:
    """All document pairs with shingle-Jaccard ≥ threshold, via the
    inverted-index join (pairs sharing ≥1 shingle) — never all-pairs.
    Returns (id_a, id_b, jaccard), id_a < id_b.

    With ``hash_key`` (the default) the inverted-index join and the
    doc-frequency aggregate run on hash31 of the shingle — an 8-byte
    shuffle key instead of the n-word string, so at 100 TB the
    exchanges carry fixed-width keys, not corpus substrings. The
    Jaccard is then over distinct shingle HASHES per document (31-bit
    collisions merge shingles identically in any engine replaying the
    same hash — the DuckDB oracles do)."""
    if hash_key:
        shingles = shingles.select(
            F.col(id_col), hash31(F.col("shingle")).alias("shingle")
        ).distinct()
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnsRenamed({id_col: "id_a", "n_sh": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "n_sh": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("na") + F.col("nb") - F.col("shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def positional_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Every n-word shingle WITH its 1-based start position:
    (id, n_words, start, h) where h = hash31(shingle). Unlike
    `word_shingles` this keeps repeats — position identity is the
    point — and emits the hash instead of the string, so everything
    downstream (doc-frequency aggregate, inverted-index join) shuffles
    8-byte keys, never corpus substrings."""
    words = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_words")
    )
    w = F.col("_words")
    sh = _shingle_expr(w, n)
    return (
        words.filter(F.size(w) >= n)
        .select(
            F.col(id_col),
            F.size(w).alias("n_words"),
            F.posexplode(sh).alias("pos0", "shingle"),
        )
        .select(
            F.col(id_col),
            "n_words",
            (F.col("pos0") + 1).alias("start"),
            hash31(F.col("shingle")).alias("h"),
        )
    )


def dup_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_count: int = 2,
    semi_join: bool = False,
) -> DataFrame:
    """Exact duplicated-substring coverage per document (the
    suffix-array dedup of Lee et al., "Deduplicating Training Data
    Makes Language Models Better", re-expressed for Spark): a word
    position is "duplicated" iff it is covered by some n-gram that
    occurs ≥ `min_count` times anywhere in the corpus (same document
    included — suffix-array semantics). Returns one row per document
    that has AT LEAST ONE duplicated n-gram: (id, n_words,
    dup_tokens), dup_tokens = number of word positions covered by a
    duplicated n-gram. Documents with zero duplicated spans produce NO
    row — recover them with a left join + coalesce(dup_tokens, 0)
    against the (id, n_words) relation, as `text_dup_span_coverage`
    does.

    Plan, 100 TB lens: positional shingles (narrow projection) → the
    occurrence count, in one of two physical shapes selected by
    `semi_join` → per-document interval merge. The merge is the
    gaps-and-islands window pair — running max of interval ends splits
    islands, a running sum numbers them — partitioned by document id,
    so state per task is one document's duplicated positions, and the
    only corpus-wide exchanges carry (hash) or (id, int, int) rows.
    No driver collect, no UDF.

    `semi_join=False` (default): occurrence count as a COUNT window
    partitioned by the 8-byte hash31 key — ONE shuffle on h, measured
    2× over the semi-join shape at sf0.1 on the benign fixture. The
    caveat: every occurrence of one shingle lands in one window
    partition on one task, so a corpus-frequent n-gram (boilerplate,
    stop-word runs at web scale) IS a hot group — its task holds that
    shingle's entire postings list.

    `semi_join=True`: groupBy(h)-count → filter(cnt >= min_count) →
    LEFT SEMI join back onto the positional shingles. Two shuffles on
    h instead of one, but the aggregate PARTIAL-COMBINES MAP-SIDE: a
    shingle at 10% corpus frequency contributes one partial row per
    map task to the exchange, never a single-task postings list, and
    the semi-join build side is only the ≥min_count hash set. Choose
    this shape whenever shingle frequency can be adversarial — the
    differential skew test
    (tests/test_text_ops.py::test_dup_span_adversarial_skew_both_shapes)
    pins both shapes equal on a one-shingle-at-10%-frequency fixture."""
    sh = positional_shingles(df, text_col, id_col, n)
    if semi_join:
        dup_h = (
            sh.groupBy("h")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= min_count)
            .select("h")
        )
        iv = sh.join(dup_h, "h", "left_semi").select(
            F.col(id_col), "n_words", "start",
            (F.col("start") + (n - 1)).alias("fin"),
        )
    else:
        iv = (
            sh.withColumn("cnt", F.count("*").over(Window.partitionBy("h")))
            .filter(F.col("cnt") >= min_count)
            .select(
                F.col(id_col), "n_words", "start",
                (F.col("start") + (n - 1)).alias("fin"),
            )
        )
    order = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.max("fin").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "brk",
        (F.col("start") > F.coalesce(prev_end, F.lit(-2)) + 1).cast("int"),
    ).withColumn(
        "island",
        F.sum("brk").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = flagged.groupBy(id_col, "island").agg(
        F.first("n_words").alias("n_words"),
        (F.max("fin") - F.min("start") + 1).alias("span_len"),
    )
    return spans.groupBy(id_col).agg(
        F.first("n_words").alias("n_words"),
        F.sum("span_len").alias("dup_tokens"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """NUM_PERM minhash values per document, one aggregation pass:
    (id, mh0..mh15). The md5-based base hash is projected once per row
    before the aggregate — all NUM_PERM update expressions then read the
    same column instead of each re-hashing the shingle."""
    h = F.col("_h31")
    return (
        shingles.select(F.col(id_col), hash31(F.col("shingle")).alias("_h31"))
        .groupBy(id_col)
        .agg(*[F.min(_perm(h, i)).alias(f"mh{i}") for i in range(NUM_PERM)])
    )


def band_key_rows(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band_no, band_key) — THE banding projection, the single
    source of truth for how mh columns fold into band keys. Shared by
    the batch bucket builder below and streaming/neardup.band_keys, so
    stream/batch banding can never drift (r6 review: the loop
    previously existed token-for-token in both files)."""
    band_structs = []
    for j in range(BANDS):
        cols = [f"mh{j * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        key = F.concat_ws("_", *[F.col(c).cast("string") for c in cols])
        band_structs.append(
            F.struct(F.lit(j).cast("long").alias("band_no"), key.alias("band_key"))
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("b")
    ).select(id_col, "b.band_no", "b.band_key")


def _band_buckets(sigs: DataFrame, id_col: str) -> DataFrame:
    """(band_no, band_key, ids) LSH buckets of ≥2 documents — the
    shared first stage of candidate generation and the hot-bucket
    monitor."""
    return (
        band_key_rows(sigs, id_col)
        .groupBy("band_no", "band_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )


def oversize_lsh_buckets(
    sigs: DataFrame, max_bucket_size: int, id_col: str = "doc_id"
) -> DataFrame:
    """The buckets a `max_bucket_size` cap would drop:
    (band_no, band_key, n_ids, n_pairs_avoided). Run this alongside a
    capped dedup to COUNT what was skipped — a capped run that reports
    nothing dropped is equivalent to the uncapped run."""
    return _band_buckets(sigs, id_col).filter(
        F.size("ids") > max_bucket_size
    ).select(
        "band_no",
        "band_key",
        F.size("ids").alias("n_ids"),
        (F.size("ids").cast("long") * (F.size("ids") - 1) / 2)
        .cast("long")
        .alias("n_pairs_avoided"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature (BANDS bands × ROWS_PER_BAND rows); documents
    agreeing on any full band become candidates.

    One shuffle total: explode each signature into BANDS
    (band_no, band_key) rows, group into buckets, expand each bucket's
    sorted id array into ordered pairs with pure array expressions —
    no self-join, so BANDS× fewer shuffles than the join-per-band
    formulation. A pathological bucket of k ids expands to k²/2 pairs
    inside one task — inherent to LSH and the reason BANDS×
    ROWS_PER_BAND is tuned so buckets stay small. `max_bucket_size`
    guards against the degenerate case (boilerplate/empty documents
    landing one giant bucket): oversize buckets are dropped — their
    contents are near-identical to each other and almost always caught
    by OTHER bands or the exact-dedup gate; audit what a cap skipped
    with `oversize_lsh_buckets` before relying on that."""
    buckets = _band_buckets(sigs, id_col)
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket_size)
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def shingle_arrays(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct n-word shingles per document as ONE array column —
    (id, shs). The packed form of word_shingles: no explode, no
    corpus-wide distinct shuffle; each document's shingle set stays in
    its own row."""
    words = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_words"))
    w = F.col("_words")
    sh = F.array_distinct(_shingle_expr(w, n))
    return words.filter(F.size(w) >= n).select(F.col(id_col), sh.alias("shs"))


def array_minhash_sigs(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, mh0..mh15) from a packed (id, shs) shingle-array relation —
    the array-native twin of `minhash_signatures` (no explode, no
    corpus-wide distinct): the per-row hash array is computed once and
    each signature slot is an array_min over a narrow transform of it.
    The single source of the signature arithmetic for every array-path
    consumer (full-corpus dedup below, incremental new-batch dedup)."""
    hs = sh.select(
        F.col(id_col),
        F.transform("shs", lambda s: hash31(s)).alias("_hs"),
    )
    return hs.select(
        F.col(id_col),
        *[
            F.array_min(F.transform("_hs", lambda h: _perm(h, i))).alias(f"mh{i}")
            for i in range(NUM_PERM)
        ],
    )


def _verify_jaccard(
    cands: DataFrame, sa: DataFrame, sb: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verify shared by the full-corpus and incremental
    near-dup operators: fetch-join candidate pairs to their per-side
    shingle arrays (`sa`/`sb` carry (id_a, shs_a) / (id_b, shs_b)),
    intersect, and keep pairs with round(jaccard, 6) >= threshold.
    ONE definition because this arithmetic is parity-critical — both
    operators' DuckDB oracles replay exactly the rounded comparison —
    and a drift between call sites would break only one differential,
    the hard-to-debug kind of mismatch."""
    shared = F.size(F.array_intersect("shs_a", "shs_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                shared / (F.size("shs_a") + F.size("shs_b") - shared), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def incremental_neardup_pairs(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Near-dup pairs BETWEEN an existing corpus and a newly arrived
    batch — the incremental shape ongoing-crawl pipelines run daily:
    is each new document a near-copy of something already ingested?
    Returns (id_a, id_b, jaccard) with id_a from `old`, id_b from
    `new`; old-vs-old and new-vs-new pairs are never generated or
    verified (dedup WITHIN the batch is `minhash_lsh_dedup_pairs` on
    `new` alone).

    Same signature arithmetic as the full-corpus operator
    (array_minhash_sigs — a drift would break the differential), but
    candidates come from an old x new equi-join on (band_no, band_key)
    instead of corpus-wide self-bucketing, so the work scales with the
    BATCH: the old side contributes only band-key rows (production
    materializes those once as the persisted index —
    plans/storage.write_band_index + incremental_neardup_pairs_indexed
    serve this exact relation without ever re-scanning old text), the
    exchange carries 16-byte keys, and verification fetches shingle
    sets for candidate ids only via per-side semi-joins. AQE broadcasts
    the new side's bands when the batch is small; no hint — batch size
    is caller-controlled, not bounded."""
    sh_old = shingle_arrays(old, text_col, id_col, n).persist()
    sh_new = shingle_arrays(new, text_col, id_col, n).persist()
    bk_old = band_key_rows(array_minhash_sigs(sh_old, id_col), id_col).select(
        F.col(id_col).alias("id_a"), "band_no", "band_key"
    )
    old_sets = sh_old.select(F.col(id_col).alias("id_a"), "shs")
    result, cands = _incremental_pairs(sh_new, bk_old, old_sets, id_col, threshold)
    return tie_cache(result, sh_old, sh_new, cands)


def _incremental_pairs(
    sh_new: DataFrame,
    bk_old: DataFrame,
    old_sets: DataFrame,
    id_col: str,
    threshold: float,
) -> tuple[DataFrame, DataFrame]:
    """Shared tail of the two incremental near-dup forms (recompute
    above / persisted-index, plans/storage.incremental_neardup_pairs_
    indexed): batch banding, old x new band-key equi-join, distinct
    candidates, per-side semi-join shingle fetch, exact-Jaccard
    verify. ONE definition — parity-critical pipelines get one home
    (r7 review: the indexed form had restated these lines, the drift
    class _verify_jaccard exists to prevent). Both old-side inputs
    arrive pre-normalized to the pair keyspace — `bk_old` carries
    (id_a, band_no, band_key), `old_sets` carries (id_a, shs) — one
    convention, nothing for a third caller to get wrong.
    Returns (pairs, cands); cands comes back persisted so callers tie
    its lifetime to the result via tie_cache."""
    bk_new = band_key_rows(array_minhash_sigs(sh_new, id_col), id_col).select(
        F.col(id_col).alias("id_b"), "band_no", "band_key"
    )
    cands = (
        bk_old.join(bk_new, ["band_no", "band_key"])
        .select("id_a", "id_b")
        .distinct()
        .persist()
    )
    # no distinct on the semi-join right sides (r15): a LEFT SEMI join
    # dedupes its build side by construction, and each distinct cost a
    # full shuffle+agg per fetch leg — interleaved A/B at sf0.1
    # measured the 3-distinct-drop variant (these two + the newbatch
    # sha gate) faster in 5/5 alternations (min 3.47 vs 4.06 s)
    sa = old_sets.join(
        cands.select("id_a"), "id_a", "left_semi"
    ).select("id_a", F.col("shs").alias("shs_a"))
    sb = sh_new.join(
        cands.select(F.col("id_b").alias(id_col)), id_col, "left_semi"
    ).select(F.col(id_col).alias("id_b"), F.col("shs").alias("shs_b"))
    return _verify_jaccard(cands, sa, sb, threshold), cands


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bands →
    candidates → exact-Jaccard verify ≥ threshold.

    Array-native formulation: shingle sets stay packed one-array-per-
    document (shingle_arrays), signatures and band keys are narrow
    array expressions over that row — the corpus is NEVER exploded into
    a (doc, shingle) relation, so the only shuffles are the LSH bucket
    groupBy, the pair distinct, and two id-keyed verify joins. The
    exact-Jaccard verify is by-fetch: candidate pairs (sized by LSH
    recall) join the per-document arrays and intersect with
    array_intersect — no inverted-index self-join, no per-shingle
    quadratic expansion.

    Caching contract: three intermediates are persisted, each feeding
    multiple consumers — the shingle relation `sh` (signatures +
    verify-fetch), the candidate-pair relation `cands` (the two
    fetch joins + the id union; an UNCACHED cands re-executes the
    whole banding plan once per consumer — measured 3x banding cost
    at sf0.1, r4), and the semi-join-reduced `sets` (read by both the
    id_a and id_b fetch sides). All three caches' lifetimes are tied
    to the RETURNED DataFrame via weakref.finalize, not to the
    session: when the caller drops the result handle they unpersist.
    No session-lifetime executor memory/disk leak; recompute after
    release is safe (Spark falls back to lineage). Cache sizes at
    100 TB: `cands`/`sets` are dup-fraction-sized (candidate pairs /
    candidate documents), standard MEMORY_AND_DISK residents; `sh` is
    corpus-sized — there you'd materialize `shingle_arrays(df)` to
    storage once and share it across dedup runs."""
    sh = shingle_arrays(df, text_col, id_col, n).persist()
    sigs = array_minhash_sigs(sh, id_col)
    cands = lsh_candidate_pairs(
        sigs, id_col, max_bucket_size=max_bucket_size
    ).persist()
    # no distinct on the id union (r15): the LEFT SEMI join below
    # dedupes its build side by construction, and the distinct was a
    # full shuffle+agg per run — interleaved A/B at sf0.1 measured
    # the drop at median 1.82 vs 2.35 s on the pair pipeline alone
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
    )
    sets = sh.join(cand_ids, id_col, "left_semi").persist()
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("shs").alias("shs_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("shs").alias("shs_b"))
    result = _verify_jaccard(cands, sa, sb, threshold)
    return tie_cache(result, sh, cands, sets)


def _safe_unpersist(df: DataFrame) -> None:
    """Best-effort unpersist for weakref.finalize callbacks (the session
    may already be stopped by the time the result handle is GC'd)."""
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass


def flag_contaminated(
    corpus_df: DataFrame,
    benchmark_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag every corpus document sharing at
    least one n-word shingle with the benchmark set (the standard
    pre-training hygiene step — n=8..13 word overlaps with eval sets).

    Scale shape: the benchmark shingle set is benchmark-sized (tiny
    next to the corpus) and broadcast; the corpus side is an exploded
    (doc, shingle) relation semi-joined against it — an inverted-index
    probe, never a doc x benchmark comparison. The corpus shingles are
    NOT deduplicated before the probe (distinct=False): the broadcast
    semi-join filters to benchmark hits first, so the only corpus-wide
    shuffle is the id-sized distinct AFTER filtering — never a
    corpus-substring exchange. Output is `corpus_df` plus a boolean
    `contaminated` column."""
    c_sh = word_shingles(corpus_df, text_col, id_col, n, distinct=False)
    b_sh = (
        word_shingles(benchmark_df, text_col, id_col, n)
        .select("shingle")
        .distinct()
    )
    hit_ids = (
        c_sh.join(F.broadcast(b_sh), "shingle", "left_semi")  # bcast bound: benchmark-sized by contract (fixed eval set)
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return corpus_df.join(hit_ids, id_col, "left").fillna(
        False, ["contaminated"]
    )


def tie_cache(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Tie persisted intermediates' lifetime to `result`: when the
    caller drops the result handle, every `cached` DataFrame
    unpersists — the one cache-lifecycle contract every dedup/
    similarity operator that persists intermediates goes through.
    Recompute-after-release is safe — Spark falls back to lineage."""
    for c in cached:
        weakref.finalize(result, _safe_unpersist, c)
    return result


def pin(df: DataFrame, *handles) -> DataFrame:
    """Keep `handles` (DataFrames whose caches/checkpoints are tied to
    their Python lifetime via weakref.finalize) alive for as long as
    `df` is. REQUIRED whenever a caller builds further plan on top of a
    finalizer-managed result and drops the intermediate handle — else
    the cache releases before the composed query ever runs."""
    df._cache_pins = handles  # noqa: SLF001 — deliberate attach
    return df


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash over word hashes: bit b is 1 iff the majority of
    the document's words have bit b set. One explode + one aggregation.
    Bit test uses modular arithmetic (h % 2^(b+1) >= 2^b) so the exact
    computation ports to any SQL engine."""
    w = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).select(F.col(id_col), hash31(F.col("word")).alias("_h31"))
    h = F.col("_h31")
    aggs = []
    for b in range(SIMHASH_BITS):
        pb = 1 << b
        bit = F.when(h % (2 * pb) >= pb, 1).otherwise(-1)
        aggs.append(F.sum(bit).alias(f"s{b}"))
    sums = w.groupBy(id_col).agg(*aggs)
    sig = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, 1 << b).otherwise(0)
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Pairs within Hamming distance ≤ max_hamming of the 16-bit
    signature. Candidates by the 4-nibble pigeonhole (distance ≤ 3 ⇒
    some nibble equal), then exact Hamming verify — both steps portable
    modular arithmetic. Returns (id_a, id_b, hamming).

    max_hamming is capped at 3 BY THE CANDIDATE SCHEME: with 4 nibble
    bands, 4 differing bits can land one per nibble and the pair never
    becomes a candidate — so a larger bound would silently miss pairs.
    Raises instead; a wider radius needs more/overlapping bands."""
    if max_hamming > 3:
        raise ValueError(
            "4-nibble pigeonhole is only complete for max_hamming <= 3; "
            f"got {max_hamming}"
        )
    cands = None
    for j in range(4):
        lo, hi = 16 ** j, 16 ** (j + 1)
        nib = (F.col("simhash") % hi) - (F.col("simhash") % lo)
        band = sigs.select(F.col(id_col), nib.alias("nib"))
        left = band.select(F.col(id_col).alias("id_a"), "nib")
        right = band.select(F.col(id_col).alias("id_b"), "nib")
        pairs = (
            left.join(right, "nib")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"))
    joined = cands.join(sa, "id_a").join(sb, "id_b")
    ham = None
    for b in range(SIMHASH_BITS):
        pb = 1 << b
        bit_a = (F.col("sig_a") % (2 * pb) >= pb).cast("int")
        bit_b = (F.col("sig_b") % (2 * pb) >= pb).cast("int")
        term = F.abs(bit_a - bit_b)
        ham = term if ham is None else ham + term
    return (
        joined.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# near-dup clustering (pairs → clusters → keep-one-per-cluster)
# ---------------------------------------------------------------------------

def cluster_pairs(
    pairs: DataFrame, iterations: int = 2,
    broadcast_max_edges: int = 1_000_000,
) -> DataFrame:
    """EXACT connected components over near-dup pairs: every node ends
    with the smallest label in its component. Returns (id, cluster_id)
    for every doc appearing in some pair; the cluster representative
    (the id to KEEP) is the cluster_id itself.

    BOTH physical paths converge to the exact fixpoint: the single-task
    union-find by construction, and the shuffle-join propagation by
    iterating until the label sum stops decreasing (labels move one
    hop per round; `iterations` is only the minimum round count, kept
    for API stability). This is what lets one recursive-CTE oracle
    verify the operator regardless of which path ran. Each propagation
    round is one join + one aggregation on the (pair-sized) edge
    relation — never touches the corpus — and near-dup components are
    dense, so the loop exits after ~2-3 rounds in practice.

    Like every iterative graph operator (GraphX does the same), this
    one has a deliberate materialization point: the edge relation is
    CHECKPOINTED once, not merely persisted — it feeds every loop
    iteration, and a persist alone keeps the upstream lineage (e.g. a
    whole MinHash plan) inside the iteration DAG, which Catalyst then
    re-analyzes once per reference (~5x for k=2; analysis time, not
    execution, dominated the wall clock). Reliable `.checkpoint()`
    when the session has a checkpoint dir (the cluster deployment —
    survives executor loss), `.localCheckpoint()` otherwise. The
    materialized count picks the physical strategy: a graph at or
    below `broadcast_max_edges` iterates with broadcast joins on one
    partition (near-dup graphs are dup-fraction-sized, overwhelmingly
    this case — shuffle-stage overhead would dominate otherwise); a
    bigger graph falls back to plain shuffle joins, the scale-correct
    path. The 1M-edge default is sized against executor task memory,
    not guessed: the single-task path holds a Python dict of parent
    pointers over ≤ 2M long ids — ~100 B/entry of dict + boxed-int
    overhead in CPython ≈ 200 MB peak, comfortably inside the
    standard `spark.executor.pyspark.memory` sandbox of 1 GB+, while
    10x that would not be; raise it only in step with executor
    memory. The `small=False` branch is exercised in CI
    (test_dedup_lifecycle) so the fallback is never dead code.
    Lifecycle: localCheckpoint blocks are released when the
    returned labels handle is dropped (same contract as
    minhash_lsh_dedup_pairs) — and unlike a plain cache,
    localCheckpoint CANNOT recompute from lineage, so a derived
    DataFrame built on the result FAILS (not: recomputes) if the
    labels handle is GC'd before the derived action runs. Any caller
    composing further plan on top MUST pin the handle:
    `out = pin(docs.join(labels, ...), labels)` — every in-repo
    caller does. Reliable checkpoint FILES are not
    registered as persistent RDDs and are owned by the checkpoint dir:
    set spark.cleaner.referenceTracking.cleanCheckpoints=true (or
    clean the dir) on cluster deployments — the handle-drop release
    cannot reach them."""
    sc = pairs.sparkSession.sparkContext
    try:
        reliable = sc.getCheckpointDir() is not None
    except Exception:
        reliable = False
    # checkpoint the PAIRS, then mirror — mirroring first would union
    # two selects over the same un-materialized subtree and execute the
    # whole upstream pipeline (e.g. MinHash) twice in the checkpoint job
    base = (
        pairs.checkpoint(eager=True) if reliable
        else pairs.localCheckpoint(eager=True)
    )
    cached = base.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        base.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    # Identify each checkpoint's persisted RDD DIRECTLY from the
    # checkpointed DataFrame (the LogicalRDD at its plan root) rather
    # than by diffing the context-wide getPersistentRDDs map — the diff
    # raced with ANY concurrent job persisting on the shared context and
    # would force-unpersist that job's unrelated cached data (r5 review).
    # Reliable checkpoints write files, not persistent blocks: no id.
    ckpt_ids = [] if reliable else _ckpt_rdd_ids(base)
    small = base.count() <= broadcast_max_edges
    if small:
        result = _cc_single_task(cached)
    else:
        # shuffle-join label propagation TO FIXPOINT: min labels are
        # monotone non-increasing, so sum(lbl) strictly decreases each
        # round that changes anything — an unchanged sum is exact
        # convergence, checked with one cheap aggregate per round (no
        # label-compare join). `iterations` is the FLOOR (kept for API
        # stability); the loop always continues to the fixpoint, so
        # this path produces the same exact components as the
        # single-task union-find and the recursive-CTE oracles — a
        # fixed k rounds diverged on components whose min-id node sits
        # more than k hops from a member (r4 plans review). Each round
        # materializes via localCheckpoint to keep the iterative
        # lineage flat; blocks release with the result handle.
        labels = cached.select(F.col("src").alias("id")).distinct().withColumn(
            "lbl", F.col("id")
        )
        rounds = 0
        prev_round_ids: list[int] = []
        while True:
            neigh = (
                cached.join(
                    labels.select(
                        F.col("id").alias("dst"), F.col("lbl").alias("nlbl")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("nlbl").alias("mn"))
            )
            # `_chg` is computed against the INPUT row's lbl, so one
            # count over the checkpointed relation is an EXACT
            # type-agnostic convergence probe: zero changes ⇔ fixpoint.
            # The earlier sum(lbl cast decimal(38,0)) probe silently
            # broke for string ids — the non-ANSI cast nulled out, the
            # sum collected as None, None == None tripped the break at
            # exactly `iterations` rounds, reintroducing the fixed-k
            # divergence this loop exists to prevent (r8 review; under
            # ANSI the cast threw instead).
            labels = labels.join(neigh, labels.id == neigh.src).select(
                "id",
                F.least(F.col("lbl"), F.col("mn")).alias("lbl"),
                (F.col("mn") < F.col("lbl")).cast("long").alias("_chg"),
            ).localCheckpoint(eager=True)
            rounds += 1
            # This round's checkpoint is materialized (eager) and its
            # lineage is truncated at the checkpoint, so the PREVIOUS
            # round's blocks are dead right now — release them eagerly
            # instead of holding O(rounds) copies of the label relation
            # in executor storage until the result handle is GC'd (a
            # real leak on high-diameter graphs).
            _release_rdds(sc, prev_round_ids)
            prev_round_ids = _ckpt_rdd_ids(labels)
            changed = labels.agg(F.sum("_chg")).collect()[0][0]
            labels = labels.drop("_chg")
            if rounds >= iterations and not changed:
                break
        # the finalizer owns base's blocks plus the LAST round's labels
        ckpt_ids = ckpt_ids + prev_round_ids
        result = labels.select("id", F.col("lbl").alias("cluster_id"))
    weakref.finalize(result, _release_rdds, sc, ckpt_ids)
    return result


def _cc_single_task(edges: DataFrame) -> DataFrame:
    """Exact connected components of a graph that fits one task:
    coalesce the edge relation to a single partition and run union-find
    (path halving + union-by-label) inside it — ONE job, converged to
    fixpoint, vs one broadcast-collect job per propagation round. The
    cluster label is the component's min id, the same representative
    the propagation path approaches; on dense near-dup components
    (diameter ≤ 2·iterations) the two paths agree exactly, and this
    path is also correct for the long chains k rounds would miss."""
    id_t = edges.schema["src"].dataType.simpleString()

    def cc(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                if s not in parent:
                    parent[s] = s
                if d not in parent:
                    parent[d] = d
                rs, rd = find(s), find(d)
                if rs != rd:
                    # union toward the smaller label so the final root
                    # IS the component min — no second relabel pass
                    if rd < rs:
                        rs, rd = rd, rs
                    parent[rd] = rs
        nodes = list(parent)
        yield pd.DataFrame(
            {"id": nodes, "cluster_id": [find(x) for x in nodes]}
        )

    return edges.coalesce(1).mapInPandas(
        cc, f"id {id_t}, cluster_id {id_t}"
    )


def _ckpt_rdd_ids(df: DataFrame) -> list[int]:
    """Persisted-RDD id(s) owned by a localCheckpoint'ed DataFrame,
    read from the LogicalRDD at its optimized-plan root — the exact
    block the checkpoint persisted, with no reference to the shared
    context-wide persistent-RDD map (diffing that map raced with
    concurrent jobs' caches). Best-effort: an unexpected plan shape
    yields [] (leak-on-miss, never evict-someone-else's-cache)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            return [int(plan.rdd().id())]
    except Exception:
        pass
    return []


def _release_rdds(sc, rdd_ids: list[int]) -> None:
    """Best-effort release of localCheckpoint RDD blocks once the result
    handle is gone (df.unpersist does not reach localCheckpoint
    storage; SparkContext.unpersistRDD does). Per-id best effort: one
    failure must not leak the remaining ids."""
    for i in rdd_ids:
        try:
            sc._jsc.sc().unpersistRDD(i, False)
        except Exception:
            continue


# ---------------------------------------------------------------------------
# connected components, O(log n) rounds: large-star / small-star
# ---------------------------------------------------------------------------

def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star contraction (Kiveris et al. 2014, "Connected
    Components in MapReduce and Beyond"): for every node v, connect
    each STRICTLY LARGER neighbor to the minimum of v's closed
    neighborhood. Input/output edges carry the src > dst invariant."""
    sym = edges.select(
        F.col("src"), F.col("dst")
    ).unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(F.min("dst").alias("_m0")).select(
        "src", F.least(F.col("_m0"), F.col("src")).alias("_m")
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star contraction: orient every edge toward its smaller
    endpoint (already the src > dst invariant), then for every node v
    re-attach v and all its smaller neighbors to the minimum of that
    set. Preserves the src > dst invariant."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("_m"))
    reattach = (
        edges.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    )
    selfedge = mins.select(F.col("src"), F.col("_m").alias("dst"))
    return (
        reattach.unionByName(selfedge)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def cluster_pairs_bigstar(
    pairs: DataFrame, max_rounds: int = 50,
) -> DataFrame:
    """EXACT connected components via alternating large-star /
    small-star contraction — the O(log n)-round scale path for HIGH-
    DIAMETER graphs, where `cluster_pairs`' min-label propagation
    needs O(diameter) rounds (a 10k-hop chain — real in embedding
    near-dup graphs, where A≈B≈C chains drift — would take 10k joins
    there and ~log²(n) here; Kiveris et al. 2014 prove the bound).
    Returns the identical (id, cluster_id) relation: every node
    labeled with its component's minimum id, so the two operators are
    interchangeable and one recursive-CTE oracle verifies both.

    Per round: two contractions, each a groupBy-min + equi-join on the
    (pair-sized) edge relation — never the corpus. Rounds materialize
    via localCheckpoint (same lifecycle contract as cluster_pairs:
    blocks release when the result handle drops; callers composing
    further plan must `pin`). Convergence = the round leaves the edge
    set EXACTLY unchanged (star forests are the joint fixpoint of both
    contractions), checked with a count + exceptAll emptiness probe on
    the materialized rounds — never a checksum that could collide.
    Raises after `max_rounds` (a cycle would mean a contraction bug;
    both steps provably preserve connectivity and never increase the
    min-reachable label)."""
    sc = pairs.sparkSession.sparkContext
    cur = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("src"),
            F.least("id_a", "id_b").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # nodes come from the UNFILTERED pairs: a node whose only pair is
    # the self-pair (x, x) — routine when an id reappears verbatim —
    # has no surviving edge in `cur`, but cluster_pairs still emits
    # (x, x) for it, and "identical relation" means this path must too
    # (r8 review: deriving nodes from `cur` silently dropped it)
    nodes = pairs.select(F.col("id_a").alias("id")).unionByName(
        pairs.select(F.col("id_b").alias("id"))
    ).distinct().localCheckpoint(eager=True)
    owned = _ckpt_rdd_ids(cur) + _ckpt_rdd_ids(nodes)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        nxt_ids = _ckpt_rdd_ids(nxt)
        same = (
            nxt.count() == cur.count()
            and nxt.exceptAll(cur).limit(1).count() == 0
        )
        if same:
            _release_rdds(sc, nxt_ids)
            break
        _release_rdds(sc, [i for i in owned if i not in _ckpt_rdd_ids(nodes)])
        owned = _ckpt_rdd_ids(nodes) + nxt_ids
        cur = nxt
    else:
        # release every block this call owns before propagating — the
        # raise path otherwise held the edge and node checkpoints in
        # executor storage for the session lifetime (r8 review; every
        # other exit routes release through the result finalizer)
        _release_rdds(sc, owned)
        raise RuntimeError(
            f"cluster_pairs_bigstar did not converge in {max_rounds} rounds"
        )
    # star forest: every non-root points at its component's min; roots
    # (no outgoing edge) label themselves
    result = (
        nodes.join(cur, nodes.id == cur.src, "left")
        .select(
            "id", F.coalesce(F.col("dst"), F.col("id")).alias("cluster_id")
        )
    )
    weakref.finalize(result, _release_rdds, sc, owned)
    return result
