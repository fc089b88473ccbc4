"""Count-min sketch: frequency estimation in fixed memory (Cormode &
Muthukrishnan 2005) — the heavy-hitters primitive a 100 TB token
stream needs when an exact per-token groupBy is too hot (the full
vocabulary doesn't fit, or one aggregation pass must serve many later
point lookups).

Spark-first shape: the sketch is a (row, bucket) → count relation of
AT MOST depth × width cells, built with one hash aggregate whose
map-side combine collapses every partition to ≤ depth × width rows
before the exchange — the shuffle is sketch-sized, not corpus-sized.
Estimation broadcast-joins candidates against the cell relation, so
querying never re-shuffles the corpus. Everything is hash31 / modular
arithmetic on 8-byte values: deterministic, JVM-codegen'd, and
replayable verbatim by a DuckDB oracle (collisions overestimate
identically in both engines — the CMS guarantee est ≥ true is part of
what the differential test checks).
"""

from __future__ import annotations

import decimal as _dec

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import MERSENNE_31, hash31

# (a, b) per sketch row: pairwise-independent-ish affine permutations
# of the 31-bit token hash. a * h stays < 2^41 — safe under ANSI
# 64-bit overflow checking in both engines.
CMS_ROWS: tuple[tuple[int, int], ...] = ((17, 94321), (131, 8191), (523, 1031))
CMS_WIDTH = 512


def cms_bucket(h: Column, a: int, b: int, width: int = CMS_WIDTH) -> Column:
    """Bucket of hash `h` in the sketch row parameterized by (a, b)."""
    return ((F.lit(a) * h + F.lit(b)) % MERSENNE_31) % width


def _row_buckets(token_col: Column, width: int) -> Column:
    h = hash31(token_col)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_bucket(h, a, b, width).alias("bucket"),
            )
            for i, (a, b) in enumerate(CMS_ROWS)
        ]
    )


def cms_build(
    tokens: DataFrame,
    token_col: str = "token",
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch from a token relation (one row per occurrence):
    returns (row, bucket, c) with ≤ len(CMS_ROWS) × width rows. One
    narrow projection + one hash aggregate; the exchange after map-side
    combine carries at most depth × width rows PER PARTITION regardless
    of corpus size.

    ``weight_col`` builds from a PRE-AGGREGATED (token, count)
    relation instead — each token contributes its count, not 1 —
    yielding the identical sketch without re-streaming occurrences.
    Use it when exact counts already exist (the heavy-hitters query
    verifies est ≥ exact, so it has them anyway): the build then
    shuffles a vocabulary-sized relation, not the corpus."""
    w = F.count("*") if weight_col is None else F.sum(weight_col)
    cols = ["rb.row", "rb.bucket"] + (
        [] if weight_col is None else [weight_col]
    )
    # NULL tokens are dropped, the hll_registers rule (r9 review):
    # hash31(NULL) is NULL, so they piled into phantom (row, NULL)
    # cells that no estimate's equi-join ever reached — a NULL
    # candidate probed est=0 while its occurrences HAD been counted,
    # violating the est >= true contract
    tokens = tokens.filter(F.col(token_col).isNotNull())
    return (
        tokens.select(
            F.explode(_row_buckets(F.col(token_col), width)).alias("rb"),
            *([] if weight_col is None else [F.col(weight_col)]),
        )
        .select(*cols)
        .groupBy("row", "bucket")
        .agg(w.cast("long").alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    cells: DataFrame,
    token_col: str = "token",
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each candidate token's frequency: min over sketch
    rows of its bucket's count (the classic CMS estimator — an upper
    bound on the true count, exact when no collision). `cells` is
    sketch-sized, so the join is a broadcast hash join; candidates
    never shuffle.

    Candidates need NOT come from the built stream: the probe is a
    LEFT join with missing cells coalesced to 0, so a never-seen
    watchlist token estimates as 0 (an empty cell means count 0 — the
    CMS definition), not an inflated min over only its occupied
    cells."""
    cand = candidates.select(
        F.col(token_col),
        F.explode(_row_buckets(F.col(token_col), width)).alias("rb"),
    ).select(token_col, "rb.row", "rb.bucket")
    return (
        cand.join(F.broadcast(cells), ["row", "bucket"], "left")  # bcast bound: fixed depth*width <= 2048 cells
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter as a relation (deterministic, engine-portable)
# ---------------------------------------------------------------------------

# k=3 affine position hashes over the 31-bit key hash; distinct
# constants from CMS_ROWS so the two sketches are independent.
BLOOM_ROWS: tuple[tuple[int, int], ...] = ((37, 1299709), (257, 15485863), (641, 49979687))
BLOOM_BITS = 4096


def _bloom_positions(key_col: Column, bits: int) -> Column:
    h = hash31(key_col)
    return F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % MERSENNE_31) % bits
            for a, b in BLOOM_ROWS
        ]
    )


def bloom_build(
    keys: DataFrame, key_col: str = "key", bits: int = BLOOM_BITS
) -> DataFrame:
    """Build a Bloom filter over `keys` AS A RELATION: the distinct set
    of occupied bit positions (≤ `bits` rows — broadcastable at any
    corpus size). Where `df.stat.bloomFilter` returns a driver-side
    object that only a UDF can probe, this form stays declarative:
    membership tests are broadcast hash joins, deterministic across
    engines (DuckDB oracles replay the identical position arithmetic),
    and the filter itself is a DataFrame you can persist, union
    (bitwise OR = plain union-distinct), and inspect."""
    return (
        keys.select(
            F.explode(_bloom_positions(F.col(key_col), bits)).alias("pos")
        )
        .distinct()
    )


def bloom_might_contain(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    bits: int = BLOOM_BITS,
    assume_distinct: bool = False,
) -> DataFrame:
    """For each candidate row: `might_contain` = all k positions
    occupied (the Bloom guarantee: never a false negative, bounded
    false positives). One explode + one broadcast semi-style join +
    one count aggregate; candidates shuffle only on their own key.
    Every non-key column of `candidates` is preserved in the output.

    A key's k positions can COLLIDE with each other, so membership
    compares hit count against that key's own distinct-position count,
    not against the constant k.

    ``assume_distinct=True`` skips the internal key dedup — pass it
    when the caller already holds one row per key (e.g. a persisted
    groupBy result) so the probe adds NO extra key-wide shuffle."""
    pos_arr = F.array_distinct(_bloom_positions(F.col(key_col), bits))
    keys = candidates.select(key_col)
    if not assume_distinct:
        keys = keys.distinct()
    cand = keys.select(
        F.col(key_col),
        F.size(pos_arr).alias("_np"),
        F.explode(pos_arr).alias("pos"),
    )
    hits = (
        cand.join(F.broadcast(bloom), "pos")  # bcast bound: <= n_bits rows, fixed by constructor
        .groupBy(key_col, "_np")
        .agg(F.count("*").alias("_k_hits"))
    )
    # clash guard (the sampling._no_clash convention, r8 review):
    # withColumn would silently REPLACE a caller's existing
    # `might_contain` (data loss, e.g. a prior probe's output fed back
    # in), and a caller `_m` column makes the post-join coalesce
    # ambiguous — refuse both loudly
    for reserved in ("might_contain", "_m"):
        if reserved in candidates.columns:
            raise ValueError(
                f"bloom_might_contain writes column {reserved!r} but the "
                "candidates input already has one — rename it first"
            )
    flags = (
        hits.withColumn("_m", F.col("_k_hits") == F.col("_np"))
        .select(key_col, "_m")
    )
    return (
        candidates.join(flags, key_col, "left")
        .withColumn("might_contain", F.coalesce("_m", F.lit(False)))
        .drop("_m")
    )


# ---------------------------------------------------------------------------
# fixed-bin histogram quantiles (deterministic approximate percentiles)
# ---------------------------------------------------------------------------

def hist_bucket(col: Column, lo: float, hi: float, buckets: int) -> Column:
    """Bucket index in [0, buckets) for a value in [lo, hi); values
    outside clamp to the edge buckets."""
    raw = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * buckets).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(buckets - 1), raw))


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    buckets: int = 1000,
) -> DataFrame:
    """Approximate quantiles from a fixed-bin histogram: one map-side-
    combinable aggregate to ≤ `buckets` rows, then a cumulative-count
    window over those rows. Error is bounded by the bin width
    (hi-lo)/buckets — the estimate is the lower edge of the first
    bucket whose cumulative count reaches ceil(q·n).

    Why not exact `percentile` / `percentile_approx`: exact needs a
    global sort of the column; percentile_approx's GK sketch is
    Spark-internal (not replayable by another engine). This histogram
    is the two-phase shape that scales — the shuffle carries at most
    `buckets` partial counts per partition — AND every step is plain
    arithmetic a DuckDB oracle reproduces bit-for-bit
    (`price_quantile_sketch`). Returns (q, est) rows."""
    counts = (
        # NULLs are ignored, matching `percentile`: hist_bucket(NULL)
        # is a NULL bucket that previously counted into n and skewed
        # every estimate beyond the documented bin-width bound (r6
        # review: 10 NULLs over values 1..10 put q=0.5 at 9.0 vs 5.5).
        # NaN is the same class (r9 review): floor(NaN)->0 clamped
        # into bucket 0, silently counting into both the histogram
        # and n — a replay over NaN-bearing data must filter
        # `NOT isnan(x)` too.
        df.filter(
            F.col(value_col).isNotNull()
            & ~F.isnan(F.col(value_col).cast("double"))
        )
        .select(
            hist_bucket(F.col(value_col), lo, hi, buckets).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy())
    )
    width = (hi - lo) / buckets
    out = None
    for q in qs:
        # integer-exact rank predicate (r8 advice — the earlier
        # round(q*n, 9)-before-CEIL only absorbed double error below
        # ~5e-10 absolute, so n beyond ~1e9 could still land one
        # bucket off the decimal oracle): for integer cum,
        # cum >= CEIL(q*n)  <=>  cum >= q*n  <=>  cum*den >= num*n
        # cross-multiplied, with q = num/den taken exactly from its
        # decimal repr — no float product, no ceil, no rounding at
        # any n. num/den ride DECIMAL literals (a plain long literal
        # capped den at 2^63, crashing for q below 1e-18 — r9
        # review); products are exact while cum*den and num*n stay
        # under 1e38. cum and n are longs (< 2^63 ≈ 9.3e18), so the
        # products cannot overflow as long as den and num stay below
        # 1e19 — validated in PYTHON below, because under the default
        # spark.sql.ansi.enabled=false a decimal(38,0) overflow
        # yields NULL, not an error: `hit` would be NULL on every
        # row, the filter would drop everything, and the estimate
        # would silently become NULL instead of raising (r9 advice).
        # Cost of the decimal-exact rank (r9 verdict item 5, r10
        # interleaved A/B at sf0.1: 0.78 s vs 0.67 s for the float
        # round-before-ceil form): a bounded ~0.12 s constant — the
        # decimal arithmetic runs over the <=buckets-row cumulative
        # relation regardless of corpus size, so the premium buys rank
        # exactness at any n and never scales with data.
        # range check FIRST (r10 review): NaN/Infinity q would raise
        # an unrelated conversion error from as_integer_ratio below,
        # making the intended message unreachable for exactly the
        # degenerate inputs a range guard exists for (NaN compares
        # False to everything, so `not (0 < q <= 1)` catches it too)
        if not (0 < q <= 1):
            raise ValueError(f"quantile q={q!r} must be in (0, 1]")
        num, den = _dec.Decimal(str(q)).as_integer_ratio()
        if den > 10**19 or num > 10**19:
            # den = 10^frac_digits of q's shortest repr; any q a user
            # types has far fewer than 19 fractional digits.
            raise ValueError(
                f"quantile q={q!r} has too many fractional digits "
                f"(den={den}): cum*den could exceed decimal(38,0) and "
                "silently NULL out under non-ANSI mode"
            )
        d38 = "decimal(38,0)"
        hit = (
            F.col("cum").cast(d38) * F.lit(_dec.Decimal(den))
            >= F.lit(_dec.Decimal(num)) * F.col("n").cast(d38)
        )
        est = (
            cum.filter(hit)
            .agg(F.min("bucket").alias("b"))
            .select(
                F.lit(q).alias("q"),
                (F.lit(lo) + F.col("b") * F.lit(width)).alias("est"),
            )
        )
        out = est if out is None else out.unionByName(est)
    return out


# ---------------------------------------------------------------------------
# HyperLogLog as a relation (deterministic, engine-portable)
# ---------------------------------------------------------------------------

# Default m = 2^6 registers; alpha per Flajolet et al. 2007
# ("HyperLogLog: the analysis of a near-optimal cardinality
# estimation algorithm"). Every m-dependent constant (alpha, the
# bucket/rank bit split of the 31-bit hash) is DERIVED from m below,
# so non-default register counts stay correct.
HLL_M = 64
HLL_ALPHA = 0.709  # alpha for the default m=64
_HLL_W = 25  # rank bits for the default m=64 (31 hash bits - 6)


def _hll_params(m: int) -> tuple[float, int]:
    """(alpha_m, rank_bits) for a power-of-two register count. Raises
    on invalid m rather than silently producing a biased sketch."""
    if m < 16 or (m & (m - 1)) != 0:
        raise ValueError(f"HLL register count must be a power of 2 >= 16, got {m}")
    bucket_bits = m.bit_length() - 1
    w = 31 - bucket_bits  # hash31 yields 31 bits
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = HLL_ALPHA
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    return alpha, w


def hll_rho(v: Column, w: int = _HLL_W) -> Column:
    """Rank of a w-bit value: position of the highest set bit from
    the top, i.e. w+1 - bit_length(v) (w+1 for v=0). Pure integer
    comparisons — no log2-on-double edge cases — so any engine
    replays it bit-for-bit as a sum of threshold CASEs."""
    bit_length = sum(
        [(v >= F.lit(1 << k)).cast("int") for k in range(w)],
        F.lit(0),
    )
    return F.lit(w + 1) - bit_length


def hll_bucket_rho_exprs(
    id_col: Column | str, m: int = HLL_M
) -> tuple[Column, Column]:
    """THE (bucket, rho) projection — the single source of truth for
    how an id hashes into a register slot and rank. Shared by the
    batch register build below and every streaming form
    (streaming/hll.py), so stream/batch register parity holds by
    construction instead of by keeping two hash layouts in sync
    (r6 review)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    _, w = _hll_params(m)
    h = hash31(c.cast("string"))
    return (h % m), hll_rho(F.floor(h / m).cast("long"), w)


def hll_registers(
    keys: DataFrame, key_col: str = "key", m: int = HLL_M
) -> DataFrame:
    """HyperLogLog register relation over `keys`: (bucket, rho) with at
    most `m` rows — the mergeable, broadcastable form of
    approx_count_distinct's sketch, but declarative: registers of two
    datasets union+max to the registers of their union (testable), and
    the whole build is ONE hash aggregate whose map-side combine
    bounds every partition's exchange at m rows. Where Spark's
    `approx_count_distinct` hides an opaque HLL++ blob in the
    aggregation buffer, this relation is replayable by any engine
    sharing the hash (the DuckDB oracle does)."""
    bucket, rho = hll_bucket_rho_exprs(key_col, m)
    return (
        # null keys are ignored — COUNT(DISTINCT) semantics; a null
        # would otherwise occupy a phantom register row
        keys.filter(F.col(key_col).isNotNull()).select(
            bucket.alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, m: int = HLL_M) -> DataFrame:
    """Cardinality estimate from a register relation: the harmonic-mean
    raw estimate with Flajolet's small-range (linear-counting)
    correction, with alpha derived from m. Empty registers contribute
    2^0 = 1 to the harmonic sum. All arithmetic on ≤ m rows; the sum
    of powers of two is EXACT in binary doubles, so both engines
    compute the identical estimate. Returns one row: (n_used, est)."""
    agg = registers.agg(
        F.count("*").alias("n_used"),
        # coalesce: over an EMPTY register relation (zero keys seen)
        # sum() is NULL and the estimator would return NULL instead of
        # the correct m*ln(m/m) = 0 (r6 review); with 0.0 the
        # linear-counting branch yields exactly 0
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)
        ).alias("inv_sum"),
    )
    # empty registers: rho=0 → 2^0 = 1 each (inside hll_estimate_expr)
    est = hll_estimate_expr(F.col("n_used"), F.col("inv_sum"), m)
    return agg.select("n_used", est.alias("est"))


def hll_estimate_expr(n_used: Column, inv_sum: Column, m: int = HLL_M) -> Column:
    """The HLL estimator as a reusable column expression over
    per-group (n_used, inv_sum) aggregates — ONE implementation shared
    by hll_estimate, the windowed query, and the streaming batch twin,
    so the estimator can never drift between them."""
    alpha, _ = _hll_params(m)
    zeros = F.lit(m) - n_used
    raw = F.lit(alpha * m * m) / (inv_sum + zeros)
    return F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)


def hll_rho_sql(m: int = HLL_M) -> str:
    """SQL replay of hll_rho over a column named `v` — the identical
    integer threshold-sum rank, generated from the same m-derived
    parameters. Shared by every HLL oracle so the rank arithmetic has
    one source of truth on the SQL side too."""
    _, w = _hll_params(m)
    bl = " + ".join(
        f"(CASE WHEN v >= {1 << k} THEN 1 ELSE 0 END)" for k in range(w)
    )
    return f"{w + 1} - ({bl})"


def hll_estimate_sql(n_used: str, inv_sum: str, m: int = HLL_M) -> str:
    """SQL replay of hll_estimate_expr over the given aggregate
    expressions — same alpha, same correction, one generator for every
    HLL oracle."""
    alpha, _ = _hll_params(m)
    zeros = f"({m} - {n_used})"
    raw = f"(({alpha} * {m} * {m}) / ({inv_sum} + {zeros}))"
    return (
        f"CASE WHEN {raw} <= {2.5 * m} AND {zeros} > 0 "
        f"THEN {float(m)} * LN({float(m)} / {zeros}) "
        f"ELSE {raw} END"
    )
