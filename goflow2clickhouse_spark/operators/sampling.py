"""Deterministic sampling and dataset splits for training-data
pipelines.

`df.sample()` / `sampleBy()` are seeded per-partition — the selected
rows change with partitioning, Spark version, and engine, so a rerun or
a different cluster silently yields a different dataset. Training
pipelines need the opposite: membership decided by a pure function of
the row's identity. Everything here keys off the md5-based hash31
(operators/dedup.py), so the same split is reproducible in any engine
(DuckDB oracles replay it exactly) and stable under repartitioning,
scale-out, and reruns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import MERSENNE_31, hash31

_BUCKETS = 10_000


def _no_clash(df: DataFrame, internal: set[str], op: str) -> None:
    """Internal working columns would silently overwrite (and then
    drop) same-named caller columns via withColumn — the defect class
    pack_greedy/global_shuffle already guard; applied uniformly (r6
    review)."""
    clash = internal & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with {op}'s internal "
            "working columns — rename upstream"
        )


def sample_bucket(id_col: Column | str) -> Column:
    """Stable bucket in [0, 10000) from the row id — the sampling /
    split domain. Uses hash31 of the id's string form (salted so
    sampling is independent of dedup's minhash permutations)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return hash31(F.concat(F.lit("sample:"), c.cast("string"))) % _BUCKETS


def _threshold(fraction: float) -> int:
    """Half-up bucket threshold. NOT Python round(): that's banker's
    rounding, so a fraction landing exactly on a .5 boundary (0.00005
    with 10000 buckets -> round(0.5) = 0) rounds to even — diverging
    from the documented ~fraction intent and from any oracle replaying
    half-up. int(x + 0.5) is half-up and engine/replay-agnostic; it
    also still fixes the truncation bias round() was chosen for
    (0.29 * 10000 -> 2899.999... + 0.5 -> 2900)."""
    return int(fraction * _BUCKETS + 0.5)


def deterministic_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, decided by identity hash: reproducible
    across engines, partitionings, and reruns; composable (a 1% sample
    is a subset of the 10% sample)."""
    return df.filter(sample_bucket(id_col) < _threshold(fraction))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    fraction: float,
) -> DataFrame:
    """EXACT per-stratum quotas (the dataset-mixing primitive: "20% of
    every source", not "each row kept with p=.2"): rank rows within
    each stratum by identity hash and keep the first ceil(fraction·n).
    Deterministic — same rows on any engine/partitioning/rerun — and
    exact where `deterministic_sample` is only exact in expectation.

    Scale: one shuffle on the strata key (the window). A pathologically
    hot stratum serializes into one reducer — when strata are that
    skewed and exactness isn't required, use `deterministic_sample`
    filtered per stratum (narrow, no window) instead; quota-exactness
    inherently needs per-stratum ranking."""
    _no_clash(df, {"_rn", "_n"}, "stratified_sample")
    h = hash31(F.concat(F.lit("strat:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col))
    n = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(n))
        # round before ceil: binary-float n*fraction overshoots the
        # exact product for fractions like 0.2 (15*0.2 ->
        # 3.0000000000000004, ceil -> 4 instead of the documented 3);
        # 9dp rounding restores the mathematical ceil for any n the
        # quota could meet. Oracles must apply the identical
        # CEIL(ROUND(n * f, 9)).
        .filter(
            F.col("_rn")
            <= F.ceil(F.round(F.col("_n") * F.lit(fraction), 9))
        )
        .drop("_rn", "_n")
    )


def split_by_hash(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Add a `split` column assigning each row to one named split
    (e.g. {"train": .9, "val": .05, "test": .05}) by consecutive hash
    ranges. Disjoint, exhaustive, deterministic — and stable under
    corpus growth: a row's split never depends on other rows."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = sample_bucket(id_col)
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name]
        cond = bucket < _threshold(edge)  # half-up: see _threshold
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def reservoir_topk(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """Fixed-SIZE per-group sample (the distributed, deterministic
    stand-in for reservoir sampling): exactly min(k, n) rows per group,
    chosen as the k smallest identity hashes. Where `stratified_sample`
    takes a fraction, this takes a count — "inspect 100 docs from every
    source", the eval/debug sampling primitive.

    Hash-uniform, deterministic stand-in for reservoir sampling: fully
    deterministic for a given dataset (the md5-derived order is fixed,
    so repeated runs can never resample), uniform only under the
    hash-as-random-oracle idealization. Reruns, engines, and
    partitionings all pick the SAME rows, and a grown corpus only
    swaps members whose hash displaces a previous top-k entry. One
    shuffle (the group window); k bounds per-group output, and the
    `rank <= k` filter lets Spark's WindowGroupLimit pushdown insert a
    per-partition top-k BEFORE the exchange — that optimizer rule, not
    anything the caller does, is what keeps hot groups map-side
    bounded (TakeOrdered does the same for the global case)."""
    _no_clash(df, {"_rn"}, "reservoir_topk")
    h = hash31(F.concat(F.lit("resv:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_topk(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sample without replacement, k rows, via
    the Efraimidis–Spirakis A-ES key (Efraimidis & Spirakis 2006,
    "Weighted random sampling with a reservoir"): each row gets key
    u^(1/w) — equivalently ln(u)/w, monotone-identical — with u drawn
    from the row's identity hash; the k LARGEST keys win, so a row's
    selection probability is proportional to its weight. Like
    `reservoir_topk` this is the hash-uniform deterministic stand-in:
    the same rows win on any engine, partitioning, or rerun.

    Scale shape: one global top-k — Spark plans ORDER BY + LIMIT as
    TakeOrderedAndProject (per-partition top-k before the single
    merge), so no global sort materializes. Rows with weight <= 0 are
    excluded before ranking, so the sample holds min(k, n_positive)
    rows.

    The key is ROUNDED to 12 decimals before ordering (with the id as
    tie-break): ln() may differ by an ulp between engines (JVM
    Math.log vs libm), and an unrounded key lets two rows straddling
    the rank-k cutoff swap between Spark and an oracle replay — the
    same hazard bm25_topk rounds away. 12 dp keeps far more
    resolution than distinct keys need while collapsing ulp noise;
    any oracle must apply the identical ROUND(key, 12)."""
    _no_clash(df, {"_wkey"}, "weighted_topk")
    u = (
        hash31(F.concat(F.lit("wsample:"), F.col(id_col).cast("string")))
        + F.lit(1)
    ) / F.lit(float(MERSENNE_31))  # (0, 1]
    key = F.round(F.log(u) / F.col(weight_col), 12)
    return (
        # weight <= 0 rows are FILTERED, not just sorted last: with
        # fewer than k positive-weight rows, a limit-only formulation
        # would pad the sample with -inf-keyed rows the docstring
        # promises can never win
        df.filter(F.col(weight_col) > 0)
        .withColumn("_wkey", key)
        .orderBy(F.desc("_wkey"), F.col(id_col))
        .limit(k)
        .drop("_wkey")
    )


def global_shuffle(
    df: DataFrame, id_col: str, n_shards: int, salt: str = "shuffle"
) -> DataFrame:
    """Deterministic global shuffle into `n_shards` training shards —
    the dataset-assembly step that fixes example order before packing /
    serving: shard = identity-hash % n_shards, position = dense 0-based
    rank of the hash within the shard. Reproducible across engines,
    partitionings, and reruns (the property `.orderBy(rand())` lacks),
    and stable under corpus append: a doc's shard never changes, and
    existing relative order within a shard is preserved (new docs
    interleave by hash).

    Scale (100 TB): ONE shuffle, keyed on `shard` (n_shards uniform
    hash cells — no skew by construction), then a per-shard SORT within
    the exchange partition; `position` is a row_number window per
    shard, never a global one-task ordering. This is exactly the
    "write each shard sorted by hash" materialization large pipelines
    use; downstream readers stream shards independently."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # the emitted shard/position (and the internal hash) would silently
    # clobber same-named input columns via withColumn — fail clearly
    clash = {"shard", "position", "_gs_h"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with global_shuffle's "
            "emitted shard/position columns — rename upstream"
        )
    c = F.col(id_col)
    h = hash31(F.concat(F.lit(f"{salt}:"), c.cast("string")))
    out = df.withColumn("_gs_h", h).withColumn(
        "shard", (F.col("_gs_h") % n_shards).cast("long")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_gs_h"), c)
    return out.withColumn(
        "position", (F.row_number().over(w) - 1).cast("long")
    ).drop("_gs_h")
