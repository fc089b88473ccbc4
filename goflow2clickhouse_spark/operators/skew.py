"""Skew mitigation: salted two-phase aggregation.

A hash-partitioned groupBy sends every row of a hot key to one reducer;
at 100 TB one viral src_addr can stall the stage. Salting splits each
key into `n_salt` sub-keys, partially aggregates, then combines the
sub-aggregates — the hot key's work spreads over `n_salt` reducers and
the second shuffle moves only one row per (key, salt).

AQE's skewedJoin/skewedPartition handling covers *joins* and post-hoc
partition splitting; explicit salting is the declarative fix for
aggregation skew and composes with any algebraic aggregate
(sum/count/min/max; avg via sum+count). The salt must differ across
rows of the SAME key — including byte-identical rows, so it cannot be
a pure hash of the row's columns."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int = 16) -> DataFrame:
    """Per-row salt in [0, n_salt), JVM-side: row-content hash folded
    with `monotonically_increasing_id()` so EXACT-DUPLICATE rows of a
    hot key still spread across salts — a content-only hash sends
    every byte-identical row (the common shape of a viral flow: same
    addr/ports/bytes repeated millions of times) to ONE (key, salt)
    reducer, recreating precisely the stall salting exists to fix.
    The id term makes salt values partitioning-dependent, which is
    irrelevant by construction: the salt only routes rows between the
    two aggregation phases, and the combine phase is salt-agnostic
    (differentially proven by flows_top_talkers_salted /
    salted_priority_revenue).

    The fold is XOR, not `+`: xxhash64 is uniform over the full signed
    64-bit range, so an additive fold can overflow a long, and Spark
    4.x defaults to ANSI mode where overflow throws
    ARITHMETIC_OVERFLOW instead of wrapping — ~id/2^64 per row,
    invisible at test scale but an expected job-killer at 100 TB. XOR
    is closed over int64 (no overflow path) and mixes the id bits just
    as well for salt routing."""
    if "_salt" in df.columns:
        raise ValueError(
            "input column '_salt' collides with with_salt's internal "
            "salt column — rename upstream (a silently replaced salt "
            "would feed the caller's values into the routing key)"
        )
    return df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*df.columns).bitwiseXOR(F.monotonically_increasing_id()),
            F.lit(n_salt),
        ),
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `aggs` maps output name → (combine_fn_name, partial_expr) where
    combine_fn is one of sum/min/max/count — the algebra that lets the
    final phase merge partials. Example:

        salted_agg(flows, ["src_addr"], {
            "total_bytes": ("sum", F.sum("bytes")),
            "n_flows": ("sum", F.count("*")),
            "max_pkt": ("max", F.max("packets")),
        })
    """
    partial = (
        with_salt(df, n_salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, (_, expr) in aggs.items()])
    )
    combine = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.sum}
    return partial.groupBy(*key_cols).agg(
        *[
            combine[fn](f"_p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_id_col: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted shuffle JOIN (the join-side sibling of `salted_agg`,
    for when AQE's runtime skew split can't fire — e.g. stats miss the
    skew, or the exchange is pinned by a downstream requirement): join
    `fact` to `dim` on column `on`, spreading each join key over
    `factor` reducers. Result columns = plain `fact.join(dim, on, how)`
    — correctness is invariant by construction, proven differentially
    by `salted_priority_revenue` (oracle replays the plain join).

    The fact side gains a deterministic salt in [0, factor) from
    hash31 of `fact_id_col` (rerun/partition-stable, unlike rand());
    the dim side is exploded factor×, so every (key, salt) pair finds
    its dim row. Cost: dim inflates factor× — use only for dims too
    big to broadcast yet far smaller than the fact side; broadcast
    beats salting whenever it fits.

    Supported `how`: inner / left — the dim side is replicated, so
    right/full-outer would duplicate unmatched dim rows per salt."""
    from .dedup import hash31

    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    for side, df in (("fact", fact), ("dim", dim)):
        if "__salt" in df.columns:
            # with_salt's clash rule, applied here too (r8 review: the
            # caller's column was silently replaced then dropped)
            raise ValueError(
                f"{side} input column '__salt' collides with "
                "salted_join's routing column — rename upstream"
            )
    # NULL-safe salt (r8 review): concat is null-intolerant, so a NULL
    # fact_id_col salted to NULL and the row could NEVER match an
    # exploded dim salt — silently dropped (inner) or left unmatched
    # (left), breaking the plain-join parity contract. NULL ids route
    # to salt 0: no spread for them, but exact parity.
    salt = F.coalesce(
        hash31(F.concat(F.lit("salt:"), F.col(fact_id_col).cast("string")))
        % factor,
        F.lit(0),
    )
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(factor)])),
    )
    return f.join(d, [on, "__salt"], how).drop("__salt")
