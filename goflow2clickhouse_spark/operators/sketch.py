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
    tokens: DataFrame, token_col: str = "token", width: int = CMS_WIDTH
) -> DataFrame:
    """Build the sketch from a token relation (one row per occurrence):
    returns (row, bucket, c) with ≤ len(CMS_ROWS) × width rows. One
    narrow projection + one hash aggregate; the exchange after map-side
    combine carries at most depth × width rows PER PARTITION regardless
    of corpus size."""
    return (
        tokens.select(
            F.explode(_row_buckets(F.col(token_col), width)).alias("rb")
        )
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("c"))
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
    never shuffle."""
    cand = candidates.select(
        F.col(token_col),
        F.explode(_row_buckets(F.col(token_col), width)).alias("rb"),
    ).select(token_col, "rb.row", "rb.bucket")
    return (
        cand.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy(token_col)
        .agg(F.min("c").alias("est"))
    )
