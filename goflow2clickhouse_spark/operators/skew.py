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
rows of the SAME key — it derives from a hash of the whole row, never
of the key."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int = 16) -> DataFrame:
    """Deterministic per-row salt in [0, n_salt): hash of all columns
    (xxhash64 — JVM-side, no Python)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salt)))


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
