"""Graph analytics over relation-shaped edge lists (SURVEY.md §2.C):
centrality for corpus curation. A kNN graph's PageRank is the standard
"importance" signal over a document/embedding corpus (well-connected =
central to a semantic neighbourhood; used for curriculum/coreset
selection) — the operator complements the connected-components family
in operators/dedup.py, which answers "which nodes are the same", where
PageRank answers "which nodes matter".

Spark-first shape: each iteration is ONE equi-join (ranks onto the
out-degree-annotated edges) plus ONE sum-by-destination — both shuffles
keyed by node id, partial-aggregated map-side. Fixed iteration count
(the kmeans_refine / pq_codebook_trained determinism rule), so a SQL
engine replays the iterations as unrolled CTEs and the result is
oracle-checkable; convergence-tested PageRank would need a driver-side
loop-until probe like operators/dedup.cluster_pairs and a weaker
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85  # Page et al. 1999's d; recorded here, replayed in oracles


def pagerank_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fixed-iteration PageRank (Page et al. 1999) over a directed
    edge relation: r_{t+1}(v) = (1-d)/n + d * Σ_{u→v} r_t(u)/outdeg(u),
    r_0 = 1/n over ALL `nodes` (isolated nodes keep the teleport term).
    Returns (id_col, pr_norm) with pr_norm = r_T * n — the score
    relative to the uniform distribution (1.0 = exactly average), so
    ROUND(·, 6) keeps ~6 significant digits regardless of corpus size.

    Deliberate simplification, shared with the oracle: NO dangling-mass
    redistribution — a sink node's mass exits the system (total mass
    drops below 1), which preserves the RANKING use of the score and
    keeps the replay to plain joins; full-spec PageRank adds a
    per-iteration dangling-sum broadcast term.

    Scale (100 TB): `n` is one COUNT scalar (the dedup convergence-probe
    precedent); the edge+outdeg relation is computed once, persisted,
    and reused by every iteration; each iteration shuffles the edge
    relation once on src (rank join) and once on dst (contribution
    sum, map-side combined) — O(iterations) shuffles total, lineage
    linear in `iterations`, no driver-side data. Popular-dst skew is
    bounded by the graph's in-degree (k per source for a kNN graph)."""
    if iterations < 1:
        raise ValueError("pagerank_fixed needs iterations >= 1")
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank_fixed over an empty node relation")
    from .dedup import tie_cache

    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    deg = e.groupBy("_src").agg(F.count("*").alias("_outdeg"))
    # persisted: the returned plan references this relation once per
    # iteration — materialized at first action, reused by the rest;
    # lifetime tied to the result handle (the tie_cache contract)
    ed = e.join(deg, "_src").persist()
    # the same literal expressions the oracle writes: 1.0/n,
    # (1.0 - 0.85)/n, 0.85 * m — each a single IEEE op chain
    n_lit = F.lit(float(n))
    ranks = nodes.select(
        F.col(id_col).alias("_id"), (F.lit(1.0) / n_lit).alias("_pr")
    )
    for _ in range(iterations):
        sums = (
            ed.join(ranks, ed["_src"] == ranks["_id"])
            .select("_dst", (F.col("_pr") / F.col("_outdeg")).alias("_c"))
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_m"))
        )
        ranks = nodes.join(
            sums, nodes[id_col] == sums["_dst"], "left"
        ).select(
            F.col(id_col).alias("_id"),
            (
                (F.lit(1.0) - F.lit(PR_DAMPING)) / n_lit
                + F.lit(PR_DAMPING) * F.coalesce(F.col("_m"), F.lit(0.0))
            ).alias("_pr"),
        )
    out = ranks.select(
        F.col("_id").alias(id_col),
        F.round(F.col("_pr") * n_lit, 6).alias("pr_norm"),
    )
    return tie_cache(out, ed)
