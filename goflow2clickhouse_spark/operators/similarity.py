"""Similarity search over embedding columns (SURVEY.md §2.C).

- `cosine` / `dot`: pure column expressions over array<double>
  (zip_with + aggregate — JVM codegen, no Python, no UDF).
- `topk_bruteforce`: broadcast the query vector, score every row,
  TakeOrdered(k) — the exact baseline. At 100 TB this is one narrow
  pass: no shuffle except the final top-k reduction.
- `signrp_lsh_*`: sign-random-projection LSH — deterministic integer
  projection matrix (portable arithmetic, so the DuckDB oracle can
  replay it), bucket by the sign bits, search only the query's bucket.
  The scale path: candidates shrink by ~2^BITS_, turning a full scan
  into a bucket-local scan; recall tunable via BITS_/multi-probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIGNRP_BITS = 6
DIM = 64


def projection_matrix(bits: int = SIGNRP_BITS, dim: int = DIM) -> list[list[int]]:
    """Deterministic pseudo-random projection vectors with integer
    entries in [-6, 6]: P[j][d] = ((j*31 + d*17) % 13) - 6."""
    return [[((j * 31 + d * 17) % 13) - 6 for d in range(dim)] for j in range(bits)]


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """try_divide, not `/`: under Spark 4's default ANSI mode a single
    all-zero vector (padded/failed embedding) in a 100 TB corpus would
    throw DIVIDE_BY_ZERO and kill the whole job (r6 review, confirmed
    empirically). NULL-on-zero-norm matches DuckDB, where float x/0.0
    is NULL — so every oracle replays the same semantics: zero-norm
    rows drop out of thresholds and sort last in top-k."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def _single_query(query: DataFrame, op: str, **cols: Column) -> DataFrame:
    """Enforce the single-query contract every unkeyed top-k shares
    (r9 review — pq_adc_topk and the persisted probes had the guard,
    their four in-memory siblings didn't): with >1 query row the
    unkeyed broadcast/cross join silently interleaves several queries
    into ONE wrong top-k, and an empty query silently returns empty.

    Enforced IN-PLAN, not by an eager count(): the projection is
    aggregated to exactly one row carrying first(col) per column plus
    the row count, and every output column asserts count == 1 — any
    action over the top-k raises loudly on a violated contract while
    a correct call costs ZERO extra jobs (the one-row aggregate folds
    into the broadcast build; an eager count() guard measured ~1.3x
    on every benched ANN query at sf0.1, re-evaluating the query
    subtree as its own job). The persisted probes (r10): pq_index_probe
    adopted this in-plan guard; the IVF-family probes validate the
    contract from the bounded ranked-cells collect they already pay
    for pruning (plans/storage.ivfpq_probe) — no probe runs an eager
    count() any more."""
    names = list(cols)
    agged = query.select(
        *[c.alias(n) for n, c in cols.items()]
    ).agg(
        *[F.first(F.col(n)).alias(n) for n in names],
        F.count("*").alias("_nq"),
    )
    msg = F.concat(
        F.lit(f"{op} serves exactly one query vector, got "),
        F.col("_nq").cast("string"),
        F.lit(" rows — use batch_topk for query batches"),
    )
    # when(assert.isNull(), col): assert_true returns NULL on success,
    # raises on failure; wrapping every output column keeps the assert
    # unprunable (a bare dropped assert column would be optimized out)
    return agged.select(*[
        F.when(
            F.assert_true(F.col("_nq") == 1, msg).isNull(), F.col(n)
        ).alias(n)
        for n in names
    ])


def topk_bruteforce(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against a 1-row query DataFrame (broadcast
    crossJoin → score → TakeOrdered). Ties broken by id. Single-query
    contract enforced in-plan (_single_query)."""
    q = _single_query(query, "topk_bruteforce", _qvec=F.col(vec_col))
    scored = embeddings.crossJoin(F.broadcast(q)).select(  # bcast: 1 row
        F.col(id_col),
        F.round(cosine(as_double(vec_col), as_double("_qvec")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def topk_l2_bruteforce(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by SQUARED L2 against a 1-row query — the ground
    truth the PQ serving paths are measured against (r8 verdict: ADC
    approximates the L2 distance, so its recall must be pinned to the
    L2-exact answer, not the cosine one). Same plan shape as
    topk_bruteforce: broadcast crossJoin → score → TakeOrdered; the
    distance is rounded to 6 places BEFORE ordering so the tie-break
    (then id) replays identically in any engine. Single-query contract
    enforced in-plan (_single_query)."""
    q = _single_query(query, "topk_l2_bruteforce", _qvec=as_double(vec_col))
    scored = embeddings.crossJoin(F.broadcast(q)).select(  # bcast: 1 row
        F.col(id_col),
        F.round(_l2sq(as_double(vec_col), F.col("_qvec")), 6).alias("l2sq"),
    )
    # asc_nulls_last (r9 review): a degenerate row (NULL element /
    # length-mismatched vector) folds to a NULL distance, which
    # Spark's asc default sorts FIRST — garbage topping the ground
    # truth — while DuckDB sorts it LAST; the desc cosine paths get
    # this for free (desc = NULLS LAST, see cosine()).
    return scored.orderBy(F.asc_nulls_last("l2sq"), F.col(id_col)).limit(k)


def topk_l2_bruteforce_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
    qid_col: str = "qid",
) -> DataFrame:
    """Batch form of `topk_l2_bruteforce` — the exact squared-L2
    ground truth for a Q-query batch (the denominator of the
    batch-served recall gates, r10): queries broadcast, ONE corpus
    scan scores every (query, vector) pair, per-query top-k via
    row_number over (rounded distance, id) — WindowGroupLimit caps
    the shuffle at Q x k rows per partition, exactly the batch_topk
    scale shape. Distance rounded to 6 BEFORE ordering, ties to id —
    the single-query form's engine-portable tie rule. Returns
    (qid, id, l2sq, rank)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(qid_col), as_double(qvec_col).alias("_qvec")
    )
    scored = embeddings.join(F.broadcast(q)).select(  # bcast: Q rows
        F.col(qid_col),
        F.col(id_col),
        F.round(_l2sq(as_double(vec_col), F.col("_qvec")), 6).alias("l2sq"),
    )
    # asc_nulls_last: the topk_l2_bruteforce rule (r9)
    w = Window.partitionBy(qid_col).orderBy(
        F.asc_nulls_last("l2sq"), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            qid_col, id_col, "l2sq", F.col("_rn").cast("int").alias("rank")
        )
    )


def batch_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k PER QUERY for a batch of query vectors — the shape
    a retrieval pipeline serving Q queries needs (one corpus pass for
    the whole batch, not Q passes): broadcast the query batch, score
    every (row, query) pair, per-query row_number <= k.

    Scale: the `rank <= k` filter over a row_number window lets
    Spark's WindowGroupLimit rule insert a per-partition top-k heap
    BEFORE the exchange (asserted in tests/test_plans.py), so the
    shuffle carries at most Q x k rows per input partition — never the
    Q x N scored relation; the scoring itself is a narrow projection
    over the broadcast batch. Q is bounded by the caller's query batch
    size (bcast bound: Q rows)."""
    from pyspark.sql import Window

    q = F.broadcast(  # bcast bound: Q query rows (caller's batch)
        queries.select(
            F.col(qid_col).alias("_qid"), as_double(qvec_col).alias("_qv")
        )
    )
    scored = embeddings.crossJoin(q).select(
        F.col("_qid").alias(qid_col),
        F.col(id_col),
        F.round(cosine(as_double(vec_col), F.col("_qv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(qid_col, id_col, "cos_sim", F.col("_rn").cast("int").alias("rank"))
    )


def signrp_bucket(vec_col: Column | str, bits: int = SIGNRP_BITS) -> Column:
    """LSH bucket id: bit j set iff dot(P_j, v) >= 0."""
    v = as_double(vec_col)
    proj = projection_matrix(bits)
    bucket = None
    for j, row in enumerate(proj):
        p = F.array(*[F.lit(float(x)) for x in row])
        term = F.when(dot(p, v) >= 0, 1 << j).otherwise(0)
        bucket = term if bucket is None else bucket + term
    return bucket.cast("long")


def signrp_lsh_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: restrict the exact cosine scan to the query's LSH bucket.
    At scale, write embeddings partitioned by bucket so the scan prunes
    to one partition (partition pruning on the bucket column).
    Single-query contract enforced in-plan (_single_query)."""
    bucketed = embeddings.withColumn("bucket", signrp_bucket(vec_col))
    q = _single_query(
        query, "signrp_lsh_topk",
        _qvec=F.col(vec_col),
        _qbucket=signrp_bucket(vec_col),
    )
    return (
        bucketed.join(  # bcast bound: 1 query row (vec + bucket)
            F.broadcast(q), F.col("bucket") == F.col("_qbucket")
        )
        .select(
            F.col(id_col),
            F.round(cosine(as_double(vec_col), as_double("_qvec")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def quantize_int8_error(
    vec_col: Column | str,
) -> tuple[Column, Column, Column]:
    """Symmetric per-vector int8 quantization (the standard embedding
    compression: scale = max|x|/127, q = round(x/scale)) evaluated by
    its reconstruction error. Returns (scale, rmse, max_abs_err) as
    pure column expressions — no Python, no UDF; the quantized form
    itself is `transform(v, x -> round(x/scale))`.

    Zero vectors quantize to themselves (error 0, scale 0)."""
    v = as_double(vec_col)
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    err = F.transform(v, lambda x: x - F.round(x / scale) * scale)
    sq_sum = F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x * x)
    rmse = F.sqrt(sq_sum / F.size(v))
    max_abs = F.array_max(F.transform(err, F.abs))
    zero = F.lit(0.0)
    return (
        scale,
        F.when(scale > 0, rmse).otherwise(zero),
        F.when(scale > 0, max_abs).otherwise(zero),
    )


def neardup_pairs_blocked(
    embeddings: DataFrame,
    block_col: str = "label",
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with blocking: only pairs
    sharing block_col are compared (equi-join on the block key — the
    100 TB pattern; unblocked all-pairs is O(n²)). Norms are computed
    once per vector in the per-side projections, not per pair inside
    cosine() — same arithmetic, a third of the per-pair fold work."""
    src = embeddings.select(
        F.col(id_col), F.col(block_col).alias("blk"),
        as_double(vec_col).alias("_v"),
    ).withColumn("_n", norm(F.col("_v")))
    a = src.select(
        F.col(id_col).alias("id_a"), "blk",
        F.col("_v").alias("va"), F.col("_n").alias("na"))
    b = src.select(
        F.col(id_col).alias("id_b"), "blk",
        F.col("_v").alias("vb"), F.col("_n").alias("nb"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(
                F.try_divide(
                    dot(F.col("va"), F.col("vb")),
                    F.col("na") * F.col("nb"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

IVF_K = 8
IVF_NPROBE = 2


def ivf_centroids(
    embeddings: DataFrame, k: int = IVF_K,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Coarse-quantizer centroids as ONE row holding an array of
    (cid, cvec) structs. Deterministic seeds (the k lowest-id vectors)
    instead of k-means so the index is replayable in any engine; a real
    deployment would plug trained centroids into the same shape."""
    cents = embeddings.orderBy(id_col).limit(k).select(
        F.col(id_col).alias("cid"), as_double(vec_col).alias("cvec")
    )
    return cents.agg(F.sort_array(F.collect_list(F.struct("cid", "cvec"))).alias("_cents"))


def _cents_with_norms(centroids_row: DataFrame) -> DataFrame:
    """(cid, cvec, cn) centroid structs: each centroid's norm folded
    ONCE here, never per (vector, centroid) compare. Shared by every
    assignment consumer so the hoisting exists in one place."""
    return centroids_row.select(
        F.transform(
            "_cents",
            lambda c: F.struct(
                c["cid"].alias("cid"),
                c["cvec"].alias("cvec"),
                norm(c["cvec"]).alias("cn"),
            ),
        ).alias("_cents")
    )


def centroid_score(cvec, v, n, cn):
    """THE hoisted-norm centroid cosine: dot(cvec, v) / (n * cn) via
    try_divide — the same arithmetic as cosine() with both norms
    hoisted to columns, so the FP result is identical to an unhoisted
    cosine() fold. One definition, three readers (_best_centroid's
    argmax, and the persisted SemDeDup form's ccos recompute in
    plans/storage.py) — a drift between them would flip prune/assign
    decisions between the in-memory and persisted forms with only a
    differential test to catch it (r7 review)."""
    return F.try_divide(dot(cvec, v), n * cn)


def _best_centroid(v_col: str, n_col: str):
    """argmax_centroid struct over (score, -cid): score is
    centroid_score (hoisted-norm cosine). Ties go to the smaller cid.
    `best["score"]` is the centroid cosine, `-best["ncid"]` the cell
    id. The ONE definition of assignment arithmetic — ivf_assign and
    semdedup_prune both read it, so index cells and SemDeDup cells can
    never drift."""
    return F.array_max(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                centroid_score(
                    c["cvec"], F.col(v_col), F.col(n_col), c["cn"]
                ).alias("score"),
                (-c["cid"]).alias("ncid"),
            ),
        )
    )


def ivf_assign(
    embeddings: DataFrame, centroids_row: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """cell = argmax_centroid cosine(cvec, v): broadcast the 1-row
    centroid array, then a pure projection — array_max over
    (score, -cid) structs (_best_centroid), ties to the smaller cid.
    Vector and centroid norms are hoisted so each centroid compare is
    one dot fold. No shuffle; at 100 TB this is the narrow index-build
    pass you'd follow with `write.partitionBy("cell")` so probes become
    partition-pruned scans."""
    best = _best_centroid("__av", "__an")
    return (
        embeddings.withColumn("__av", as_double(vec_col))
        .withColumn("__an", norm(F.col("__av")))
        .join(F.broadcast(_cents_with_norms(centroids_row)))  # bcast bound: 1 row, n_cells structs
        .withColumn("cell", (-best["ncid"]).cast("long"))
        .drop("_cents", "__av", "__an")
    )


def ivf_centroids_trained(
    embeddings: DataFrame,
    k: int = IVF_K,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd-trained COARSE centroids (r11 — the r10 verdict's #2:
    `ivf_centroids`' lowest-id seeds cap every IVF-family layout's
    recall, and the repo's own recall pair isolates the remaining
    error as coarse-quantizer miss). Same recipe as the r10
    `pq_codebook_trained`, over whole vectors with the COARSE
    assignment rule: a fixed number of Lloyd iterations seeded from
    the untrained `ivf_centroids` row, each iteration (1) assigning
    every vector to its argmax-cosine centroid — `ivf_assign` ITSELF,
    so training optimizes exactly the partition the index will use
    (ties to the smaller cid); (2) recomputing each cell's centroid
    as the member mean per dimension ROUNDED to 6 decimals (the
    cross-engine-exactness quantization: float sums accumulate in
    engine-specific order, so unrounded means could differ in the
    last ulp and flip a later argmax — rounding both engines' means
    to 6dp yields identical doubles); (3) an empty cell keeping its
    previous centroid (standard Lloyd empty-cluster handling). The
    plain per-dim mean IS the spherical-k-means update here: cosine
    scoring normalizes the centroid by its own norm, so only the mean
    DIRECTION matters. Returns the SAME 1-row `_cents` shape (cids =
    the seed vec_ids, labels stable across training), so assignment,
    probes and oracles consume it unchanged.

    Scale: per iteration one map-only corpus scan (argmax against the
    k-centroid broadcast) + one aggregation keyed (cell, dim) —
    k x DIM cells, map-side combined, so the shuffle carries ≤ k x DIM
    rows per partition. The corpus is never collected; training cost
    is paid at build time only."""
    if iterations < 1:
        raise ValueError(
            f"ivf_centroids_trained: iterations={iterations} must be >= 1 "
            "(use ivf_centroids for the untrained seeds)"
        )
    cents_row = ivf_centroids(embeddings, k, vec_col, id_col)
    for _ in range(iterations):
        members = ivf_assign(embeddings, cents_row, vec_col).select(
            "cell", F.posexplode(as_double(vec_col)).alias("pos", "x")
        )
        newv = (
            members.groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("nv")
            )
        )
        prev = cents_row.select(F.explode("_cents").alias("c")).select(
            F.col("c.cid").alias("cid"), F.col("c.cvec").alias("pv")
        )
        merged = prev.join(
            newv, prev["cid"] == newv["cell"], "left"
        ).select("cid", F.coalesce("nv", "pv").alias("cvec"))
        cents_row = merged.agg(
            F.sort_array(F.collect_list(F.struct("cid", "cvec"))).alias(
                "_cents"
            )
        )
    return cents_row


def ivf_residual(
    assigned: DataFrame,
    centroids_row: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "residual",
) -> DataFrame:
    """residual = v − centroid(cell) for an already-assigned relation
    — the encode input of residual IVF-PQ (IVFADC, Jégou et al. 2011
    §V: quantizing the residual instead of the raw vector centers the
    PQ codebook's dynamic range on the within-cell distribution, so
    the same 4-bit budget resolves finer distances). One broadcast of
    the 1-row centroid array + a map-only zip_with projection — no
    shuffle; the cell's centroid is looked up IN the array by cid
    (cids are the seed vec_ids, not dense 0..k-1)."""
    cvec = F.element_at(
        F.filter(F.col("_cents"), lambda c: c["cid"] == F.col("cell")), 1
    )["cvec"]
    return (
        assigned.join(F.broadcast(centroids_row))  # bcast bound: 1 row
        .withColumn(
            out_col,
            F.zip_with(as_double(vec_col), cvec, lambda x, y: x - y),
        )
        .drop("_cents")
    )


def rank_probe_cells(
    query: DataFrame,
    cents_row: DataFrame,
    nprobe: int | None,
    vec_col: str = "embedding",
) -> DataFrame:
    """(_qv, probe_cell, cscore): the nprobe cells whose centroids are
    nearest the query vector — the cell-ranking step shared by the
    in-memory probe (ivf_topk) and the persisted-index probes
    (plans/storage.ivf_index_probe / ivfpq_probe), so tie-breaks and
    scoring can never drift between them. `nprobe=None` (r10) returns
    ALL scored cells UNordered — the persisted probes collect that
    bounded relation (n_queries x n_cells rows) and take the top
    nprobe in the driver with the SAME (cscore desc nulls-last,
    probe_cell asc) rule (`top_probe_cells`): the row COUNT is the
    single-query contract check (exactly n_cells rows per query), and
    an in-plan limit would hide a second query whose cells all ranked
    below the first's."""
    scored = (
        query.join(F.broadcast(cents_row))  # bcast bound: 1 row, n_cells structs
        .select(F.col(vec_col).alias("_qv"), F.explode("_cents").alias("c"))
        .select(
            "_qv",
            F.col("c.cid").alias("probe_cell"),
            cosine(F.col("c.cvec"), as_double("_qv")).alias("cscore"),
        )
    )
    if nprobe is None:
        return scored
    return scored.orderBy(F.desc("cscore"), "probe_cell").limit(nprobe)


def top_probe_cells(rows, nprobe: int) -> list[int]:
    """Driver-side twin of rank_probe_cells' ordering over COLLECTED
    (probe_cell, cscore) rows: cscore desc with NULLs last (a
    zero-norm query cosine is NULL — F.desc is NULLS LAST), ties to
    the smaller cell id. One definition next to the relational form so
    the persisted probes' pruning can never drift from ivf_topk."""
    ordered = sorted(
        rows,
        key=lambda r: (
            r["cscore"] is None,
            -(r["cscore"] if r["cscore"] is not None else 0.0),
            r["probe_cell"],
        ),
    )
    return [int(r["probe_cell"]) for r in ordered[:nprobe]]


def rank_probe_cells_batch(
    queries: DataFrame,
    cents_row: DataFrame,
    nprobe: int,
    qvec_col: str = "qvec",
    qid_col: str = "qid",
) -> DataFrame:
    """(qid, probe_cell, cscore): the per-QUERY nprobe cell ranking —
    the batch twin of `rank_probe_cells`, with the identical scoring
    expression and (score desc, cid) tie-break, planned as a
    row_number window so WindowGroupLimit bounds it at Q x nprobe
    rows (the batch_topk rule); a parity test pins the 1-query batch
    equal to the single form. Q is the caller's batch bound."""
    from pyspark.sql import Window

    scored = (
        queries.select(
            F.col(qid_col).alias(qid_col), as_double(qvec_col).alias("_qv")
        )
        .join(F.broadcast(cents_row))  # bcast bound: 1 row, n_cells structs
        .select(qid_col, "_qv", F.explode("_cents").alias("c"))
        .select(
            qid_col,
            F.col("c.cid").alias("probe_cell"),
            cosine(F.col("c.cvec"), as_double("_qv")).alias("cscore"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cscore"), F.col("probe_cell")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(qid_col, "probe_cell", "cscore")
    )


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    n_cells: int = IVF_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: score only the nprobe cells nearest the query vector.
    Probe set and assignments both derive from the same broadcast
    centroid row; the candidate scan is an equi-join on cell id
    (→ partition pruning when the index is written partitioned by
    cell). Single-query contract enforced in-plan (_single_query —
    with >1 query row the GLOBAL nprobe cell ranking would mix both
    queries' cells and each candidate would score against whichever
    _qv rode its probe row)."""
    q = _single_query(query, "ivf_topk", **{vec_col: F.col(vec_col)})
    cents_row = ivf_centroids(embeddings, n_cells, vec_col, id_col)
    assigned = ivf_assign(embeddings, cents_row, vec_col)
    qcells = rank_probe_cells(q, cents_row, nprobe, vec_col)
    return (
        assigned.join(
            F.broadcast(qcells), F.col("cell") == F.col("probe_cell")  # bcast bound: nprobe rows
        )
        .select(
            F.col(id_col),
            F.round(cosine(as_double(vec_col), as_double("_qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# per-group embedding centroids (column-native + applyInPandas twin)
# ---------------------------------------------------------------------------

def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per label, pure column ops: posexplode
    the vector, average per (label, position), re-assemble with
    array_agg ordered by position. Two shuffles, all JVM-side —
    the Spark-first formulation; see `label_centroids_pandas` for the
    Arrow group-map twin."""
    from pyspark.sql import functions as F

    pos = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(as_double(vec_col)).alias("pos", "x"),
    )
    per_pos = pos.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    return (
        per_pos.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )


def label_centroids_pandas(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """applyInPandas twin of `label_centroids`: one Arrow batch per
    label group, numpy mean inside. Use when the per-group computation
    outgrows column expressions (iterative refinement, covariance);
    for a plain mean the column version wins (no Python in the path).
    tests/test_similarity.py proves both produce identical results."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("label", IntegerType()),
            StructField("centroid", ArrayType(DoubleType())),
        ]
    )

    def mean_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].map(np.asarray).values).astype("float64")
        return pd.DataFrame(
            {"label": [int(pdf[label_col].iloc[0])], "centroid": [mat.mean(axis=0)]}
        )

    return embeddings.select(label_col, vec_col).groupBy(label_col).applyInPandas(
        mean_group, schema
    )


def kmeans_refine(
    embeddings: DataFrame,
    n_cells: int = IVF_K,
    iterations: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd-style refinement of the IVF seed centroids, expressed
    entirely in DataFrame ops: assign every vector to its argmax-cosine
    centroid (broadcast, narrow), recompute each cell's element-wise
    mean (posexplode → per-(cell, pos) average → re-assemble), repeat.
    Deterministic end-to-end (seed centroids + fixed tie-breaks), so
    any engine can replay it. Returns (cell, centroid, n_members).

    Scale: per iteration, one narrow assignment pass over the corpus +
    one aggregation keyed by (cell, position) — K×dim rows out. The
    corpus is never collected; centroids travel by broadcast."""
    from pyspark.sql import functions as F

    cents_row = ivf_centroids(embeddings, n_cells, vec_col, id_col)
    for _ in range(iterations):
        assigned = ivf_assign(embeddings, cents_row, vec_col)
        pos = assigned.select(
            "cell", F.posexplode(as_double(vec_col)).alias("pos", "x")
        )
        new_cents = (
            pos.groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        # a cell with zero assigned vectors this iteration keeps its
        # PREVIOUS centroid (standard Lloyd empty-cluster handling):
        # new_cents only has rows for assigned cells, so without the
        # merge an emptied cell vanished from the index entirely and
        # the documented n_members=0 case could never surface (r6
        # review) — the relation must stay n_cells rows throughout
        prev = cents_row.select(F.explode("_cents").alias("c")).select(
            F.col("c.cid").alias("cell"), F.col("c.cvec").alias("pvec")
        )
        merged = prev.join(new_cents, "cell", "left").select(
            "cell", F.coalesce("cvec", "pvec").alias("cvec")
        )
        cents_row = merged.select(
            F.struct(F.col("cell").alias("cid"), F.col("cvec")).alias("c")
        ).agg(F.sort_array(F.collect_list("c")).alias("_cents"))
    final = ivf_assign(embeddings, cents_row, vec_col)
    sizes = final.groupBy("cell").agg(F.count("*").alias("n_members"))
    cents = cents_row.select(F.explode("_cents").alias("c")).select(
        F.col("c.cid").alias("cell"), F.col("c.cvec").alias("centroid")
    )
    return cents.join(sizes, "cell", "left").select(
        "cell", "centroid", F.coalesce("n_members", F.lit(0)).alias("n_members")
    )


_SUBBLOCK_MIN_BYTES = 4 * 1024 * 1024


def _pair_subblock_factor(df: DataFrame, n_blocks: int, par: int) -> int:
    """Sub-block factor B for a blocked pair self-join: 1 (the
    exchange-free pinned-bucket shape) while the input is small, else
    the smallest B putting n_blocks*B² join keys in the guide's
    20-100x keys-per-partition band (§2.5 — enough distinct keys that
    hash packing spreads evenly AND a single hot bucket splits into
    B² sub-tasks). The size gate reads the optimizer's sizeInBytes
    estimate — plan metadata, no job: below ~4 MB of input the pair
    folds are KB-scale and the two sub-block exchanges cost more than
    they save (measured both sides of the boundary: 0.8 MB/sf0.1
    loses, 5.9 MB/sf1 wins 1.6x — numbers at the call site). The
    target is 32x par (measured optimum at 32 cores: B=4 beat B=2
    and B=8), and B is capped at 8 — each side replicates B-fold, so
    past the measured optimum extra B buys skew-balance already
    achieved and pays pure replication."""
    try:
        est = int(
            df._jdf.queryExecution()  # noqa: SLF001 — plan metadata
            .optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        est = 0
    # Spark reports UNKNOWN size as spark.sql.defaultSizeInBytes
    # (Long.MaxValue) — e.g. RDD-backed relations from a driver-side
    # createDataFrame. Unknown means in-memory/driver-built (file
    # scans always carry true sizes): stay on the plain pinned shape
    # rather than paying replication on what is almost surely small.
    if est < _SUBBLOCK_MIN_BYTES or est >= (1 << 60):
        return 1
    b = 1
    while n_blocks * b * b < 32 * par and b < 8:
        b += 1
    return b


def knn_graph_blocked(
    embeddings: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
) -> DataFrame:
    """k-nearest-neighbor GRAPH over the whole corpus (every vector's
    top-k neighbors — the substrate for semantic-dedup clustering and
    kNN-retrieval eval), blocked to stay sub-quadratic: candidates are
    pairs sharing a block key (default: the deterministic sign-RP LSH
    bucket, so the DuckDB oracle can replay the identical blocking),
    reranked by exact cosine, top-k per source via row_number.

    Semantics are "top-k among same-block candidates" BY DESIGN — the
    contract blocked kNN-graph builders ship at scale (recall is
    LSH-limited and tunable via bits/multi-probe; similarity_ann_recall
    is the companion metric). A vector whose block holds no other
    member emits no rows.

    Scale (100 TB): one shuffle on the block key (~2^bits balanced
    cells), all-pairs only WITHIN a cell (O(sum cell²) work), then the
    rank filter plans as WindowGroupLimit — a per-partition top-k heap
    before the window exchange, so the second shuffle carries ≤ k rows
    per source vector, never the full candidate set. Each vector's
    norm is computed ONCE in the per-side projection (O(n) folds), not
    per pair inside cosine() (O(pairs) folds — 3x the per-pair
    higher-order-function work for the same bits): pair score =
    dot/(na*nb), arithmetic identical to cosine()."""
    from pyspark.sql import Window

    blk = (
        F.col(block_col)
        if block_col is not None
        else signrp_bucket(vec_col)
    )
    b = embeddings.select(
        F.col(id_col),
        as_double(vec_col).alias("_v"),
        blk.alias("_blk"),
    ).withColumn("_n", norm(F.col("_v")))
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    # Sub-block the bucket self-join when the pair volume is real
    # (r15, second pass — the sf1 gauge's residual diagnosis): signrp
    # bucket sizes are skewed (sf1: top bucket 1155 members vs 312
    # mean → the hot bucket alone holds 11% of all pair-fold work,
    # 666k of 6.0M pairs), and the bucket key alone pins that whole
    # bucket onto ONE task — partition packing cannot split a single
    # key (guide §2.5: salt the key). The semdedup 2D sub-block
    # applies unchanged to the half-join: side A replicates to
    # (_blk, s, j), side B to (_blk, i, s), the join on (_blk, i, j)
    # meets every ordered pair exactly once, so the `_src <
    # neighbor_id` filter sees the IDENTICAL pair relation, now
    # spread over n_blocks*B² keys. Adaptivity is by DATA SIZE, not
    # core count alone: at KB-scale the two extra exchanges cost more
    # than the folds (sf0.1 interleaved A/B: B=4 LOST 5/6 runs,
    # med 2.525 vs 2.283 s on knn_pagerank), so B=1 below
    # _SUBBLOCK_MIN_BYTES keeps the exchange-free shape; above it the
    # folds dominate and splitting the hot bucket wins (sf1 32c
    # interleaved A/B, graph build noop-timed: B=1 10.7 s → B=2
    # 9.0 s → B=4 6.0-6.7 s → B=8 6.4 s; 8c/32c ratio opens 1.2 →
    # ~1.6). B=1 also whenever block_col overrides the signrp bucket
    # (n_blocks unknown, and every in-repo override is test-scale).
    sub_b = (
        1 if block_col is not None
        else _pair_subblock_factor(embeddings, 1 << SIGNRP_BITS, par)
    )
    if sub_b > 1:
        blocks = F.array(*[F.lit(t) for t in range(sub_b)])
        sub = lambda col: F.pmod(F.xxhash64(F.col(col)), F.lit(sub_b))  # noqa: E731
        key = ["_blk", "_bi", "_bj"]
        a = b.select(
            F.col(id_col).alias("_src"), F.col("_v").alias("_va"),
            F.col("_n").alias("_na"), "_blk",
        ).withColumn("_bi", sub("_src")).select(
            "*", F.explode(blocks).alias("_bj")
        ).repartition(par, *key)
        c = b.select(
            F.col(id_col).alias("neighbor_id"), F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"), "_blk",
        ).withColumn("_bj", sub("neighbor_id")).select(
            "*", F.explode(blocks).alias("_bi")
        ).repartition(par, *key)
        half = a.join(c, key)
    else:
        # Pin the block partitioning EXPLICITLY (r14 optimization
        # round): the within-cell pair work is compute-heavy per byte
        # (a dim-wide dot per pair), so AQE's byte-based coalescing —
        # which sizes the post-shuffle stage by its KB of input —
        # serialized the whole O(sum cell²) rerank onto one task. A
        # user repartition is final (AQE does not coalesce it), both
        # join sides inherit it, and the self-join then needs no
        # further exchange: measured 1.4 s → 0.8 s per graph build at
        # sf0.1, identical edges. Parallelism stays bounded by the
        # cell count regardless of the constant here;
        # defaultParallelism adapts to the cluster's cores.
        b = b.repartition(par, "_blk")
        a = b.select(
            F.col(id_col).alias("_src"), F.col("_v").alias("_va"),
            F.col("_n").alias("_na"), "_blk",
        )
        c = b.select(
            F.col(id_col).alias("neighbor_id"), F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"), "_blk",
        )
        half = a.join(c, "_blk")
    # One dot fold per UNORDERED pair, mirrored into both directed
    # rows (r15): the graph needs directed edges (each source ranks
    # its neighbors), but cosine is symmetric BIT-exactly — zip_with
    # products commute per element and the fold order is identical —
    # so the `_src < neighbor_id` half-join computes every fold once
    # and an explode emits (x→y, y→x) with the same rounded value.
    # The interpreted 64-dim fold is the measured per-pair cost
    # (r15 sf1 gauge: the directed form's pair stage was 15-20 s for
    # 12M pairs; this halves it — 9.7-10.1 s, identical top-k rows).
    cs = F.round(
        F.try_divide(
            dot(F.col("_va"), F.col("_vb")),
            F.col("_na") * F.col("_nb"),
        ),
        6,
    )
    und = (
        half
        .filter(F.col("_src") < F.col("neighbor_id"))
        .select(
            F.col("_src").alias("_ia"),
            F.col("neighbor_id").alias("_ib"),
            cs.alias("_cs"),
        )
    )
    pairs = und.select(
        F.explode(F.array(
            F.struct(
                F.col("_ia").alias(id_col),
                F.col("_ib").alias("neighbor_id"),
                F.col("_cs").alias("cos_sim"),
            ),
            F.struct(
                F.col("_ib").alias(id_col),
                F.col("_ia").alias("neighbor_id"),
                F.col("_cs").alias("cos_sim"),
            ),
        )).alias("_p")
    ).select(f"_p.{id_col}", "_p.neighbor_id", "_p.cos_sim")
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return pairs.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup inside coarse-quantizer cells
# ---------------------------------------------------------------------------

def semdedup_prune(
    embeddings: DataFrame,
    tau: float,
    n_cells: int = IVF_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023) as a relational plan: cluster the
    corpus with the deterministic IVF coarse quantizer, compare vectors
    ONLY within their cell, and prune the redundant member of every
    pair whose cosine exceeds tau — keeping, per SemDeDup's rule, the
    example FARTHER from its cluster centroid (lower centroid cosine;
    the outlier carries more signal). Returns one row per vector:
    (id, cell, ccos, is_pruned).

    Prune rule as a join, not an iteration: vector x is pruned iff some
    same-cell neighbor y has cosine(x, y) > tau and y dominates x —
    y.ccos < x.ccos, ties broken to the lower id. Total order => the
    kept set is unique and both engines replay it exactly.

    Scale shape: centroids travel by one broadcast row (bcast bound:
    n_cells structs); assignment is a narrow projection; the pairwise
    compare is an equi-join on cell whose blow-up is bounded by cell
    size — at 100 TB n_cells grows ~sqrt(N) so cells stay ~constant.
    The interpreted higher-order folds are the corpus-linear cost at
    scale, so they are minimized three ways: assignment goes through
    the shared _best_centroid/_cents_with_norms helpers (vector and
    centroid norms hoisted — each centroid compare is ONE dot fold,
    FP-identical to cosine(), and the SAME definition ivf_assign
    reads, so SemDeDup cells can never drift from IVF cells); ccos
    comes straight from the argmax struct instead of a second cosine
    pass; and `m` is persisted (lifetime tied to the result via
    tie_cache) so its three consumers (both pair sides + the output
    join) never recompute the assignment. (At the test SFs the wall
    clock is stage-overhead-bound — profiled r6: the 2.4k-vector
    corpus scan itself costs more than all folds — so these savings
    show at real corpus sizes, not in bench deltas.)
    """
    cents_row = ivf_centroids(embeddings, n_cells, vec_col, id_col)
    src = embeddings.select(
        F.col(id_col), as_double(vec_col).alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    best = _best_centroid("_v", "_n")
    m = src.join(
        F.broadcast(_cents_with_norms(cents_row))  # bcast bound: 1 row, n_cells structs
    ).select(
        F.col(id_col),
        (-best["ncid"]).cast("long").alias("cell"),
        best["score"].alias("ccos"),
        "_v",
        "_n",
    )
    return _semdedup_from_assignment(m, tau, id_col, size_hint_df=embeddings)


def _semdedup_from_assignment(
    m: DataFrame, tau: float, id_col: str = "vec_id",
    n_cells: int = IVF_K,
    size_hint_df: DataFrame | None = None,
) -> DataFrame:
    """The prune itself, from an assignment relation
    (id, cell, ccos, _v, _n) — ONE definition shared by the in-memory
    form above and the persisted-layout form
    (plans/storage.semdedup_prune_persisted), so the two can never
    drift on pair arithmetic or tie-breaks. `m` is persisted here
    (lifetime tied to the result) because it feeds three consumers:
    both pair sides and the output join.

    Sub-blocked pair join (r15): the cell key alone caps the pair
    stage's parallelism at n_cells tasks — the r15 sf1-scale gauge
    measured the whole prune serialized onto IVF_K=8 cores of 32
    (66 s, 8c/32c ratio 1.36). Each member gets a deterministic
    sub-block s = pmod(xxhash64(id), B); side A replicates to the B
    pair-tasks (cell, s, j), side B to (cell, i, s), and the join on
    (cell, i, j) meets every ordered pair exactly once — the SAME
    pair relation the plain cell join produced, now spread over
    n_cells*B² tasks. B is the smallest factor lifting that product
    to >= 2x defaultParallelism (B=1 when cells alone suffice — the
    plain join shape, no replication). The explicit repartition on
    the pair-task key is the r14 pin rule: a user repartition is
    final, so AQE's byte-based coalescing cannot re-serialize the
    compute-heavy stage."""
    from .dedup import tie_cache

    par = m.sparkSession.sparkContext.defaultParallelism
    b_factor = 1
    while n_cells * b_factor * b_factor < 2 * par:
        b_factor += 1
    # Above the size gate, lift B into the 20-100x keys-per-partition
    # band (r15 second pass, same rule as knn_graph_blocked): the 2x
    # floor leaves n_cells*B² barely above the core count (8 cells,
    # B=3 → 72 keys / 32 partitions = 2.25x), so hash packing and
    # cell-size skew leave tasks ~2x unbalanced. The gate reads the
    # CALLER's scan-rooted input, not `m` — m's estimate rides a
    # centroid join whose stats multiply (~37x inflated at sf0.1).
    # Interleaved sf1 32c A/B on semdedup_prune (noop-timed, identical
    # rows): B=3 med 30.8 s → B=6 25.0 → B=8 24.1 (1.28x). Below the
    # gate the floor rule stands unchanged (sf0.1 plan identical).
    if size_hint_df is not None:
        b_factor = max(
            b_factor, _pair_subblock_factor(size_hint_df, n_cells, par)
        )
    # Pin the cell partitioning before persisting (r14 optimization
    # round, the knn_graph_blocked rule): the within-cell pair compare
    # is compute-heavy per byte, and AQE's byte-based coalescing
    # serialized it onto one task at bench scale. A user repartition is
    # final; with B=1 both pair sides read the SAME persisted
    # partitioning and the cell self-join needs no exchange at all.
    m = m.repartition(par, "cell").persist()
    a = m.select(
        F.col(id_col).alias("id_a"), "cell",
        F.col("ccos").alias("ccos_a"),
        F.col("_v").alias("va"), F.col("_n").alias("na"),
    )
    b = m.select(
        F.col(id_col).alias("id_b"), "cell",
        F.col("ccos").alias("ccos_b"),
        F.col("_v").alias("vb"), F.col("_n").alias("nb"),
    )
    # UNORDERED pairs (id_a < id_b): every >tau pair prunes exactly one
    # member — the one NEARER its centroid (higher ccos), ties to the
    # higher id. The union of per-pair losers equals the dominance
    # EXISTS (x pruned iff some neighbor is farther-from-centroid /
    # lower-id), at half the pair-fold work of a directed self-join —
    # the 64-dim dot fold is the measured cost at scale, not the
    # exchange (perf note r6).
    if b_factor > 1:
        blocks = F.array(*[F.lit(t) for t in range(b_factor)])
        sub = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(b_factor))  # noqa: E731
        key = ["cell", "_bi", "_bj"]
        a = a.withColumn("_bi", sub("id_a")).select(
            "*", F.explode(blocks).alias("_bj")
        ).repartition(par, *key)
        b = b.withColumn("_bj", sub("id_b")).select(
            "*", F.explode(blocks).alias("_bi")
        ).repartition(par, *key)
        joined = a.join(b, key).drop("_bi", "_bj")
    else:
        joined = a.join(b, "cell")
    close = (
        joined
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.try_divide(
                dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
            )
            > tau
        )
    )
    loser = (
        F.when(F.col("ccos_a") > F.col("ccos_b"), F.col("id_a"))
        .when(F.col("ccos_b") > F.col("ccos_a"), F.col("id_b"))
        .otherwise(F.greatest("id_a", "id_b"))
    )
    pruned = (
        close.select(loser.alias(id_col))
        .distinct()
        .withColumn("_pruned", F.lit(True))
    )
    result = m.join(pruned, id_col, "left").select(
        id_col,
        "cell",
        "ccos",
        F.coalesce(F.col("_pruned"), F.lit(False)).alias("is_pruned"),
    )
    return tie_cache(result, m)


# ---------------------------------------------------------------------------
# product quantization (PQ) — compressed codes + ADC probe
# ---------------------------------------------------------------------------

PQ_M = 8    # subvector blocks
PQ_SUB = DIM // PQ_M
PQ_K = 16   # codebook entries per block (4-bit codes)


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 between two equal-length double arrays — explicit
    squared-diff fold so the DuckDB oracle can replay the identical
    arithmetic (list_sum over (a-b)^2 in the same element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ codebook as ONE row: `_cb[j]` is block j's K entries in
    entry-id order, each a struct holding the PQ_SUB-dim subvector
    `sub` — the entry id is the POSITION (0-based), not a stored
    field. Entries are the K lowest-id vectors' subvectors (the
    ivf_centroids determinism pattern — replayable in any engine; a
    real deployment plugs k-means-trained codebooks into the same
    shape)."""
    entries = (
        embeddings.orderBy(id_col)
        .limit(PQ_K)
        .select(F.col(id_col).alias("_eid"), as_double(vec_col).alias("_v"))
        .select(F.struct("_eid", "_v").alias("_en"))
        .agg(F.sort_array(F.collect_list("_en")).alias("_entries"))
    )

    # NB: a one-parameter lambda per block — a two-parameter lambda
    # would be treated by PySpark as (element, index) and shadow the
    # bound block number
    def _block(j: int) -> Column:
        return F.transform(
            "_entries",
            lambda en: F.struct(
                F.slice(en["_v"], j * PQ_SUB + 1, PQ_SUB).alias("sub"),
            ),
        )

    # entry order inside each block is the vec_id rank (sort_array on
    # (_eid, _v) structs), so codes are dense 0..K-1 positions
    blocks = F.array(*[_block(j) for j in range(PQ_M)])
    return entries.select(blocks.alias("_cb"))


def opq_dim_permutation(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = PQ_M,
    dim: int = DIM,
) -> list[int]:
    """Variance-balanced dimension permutation — the OPQ family's
    relationally-trainable orthogonal transform (Ge et al., CVPR 2013:
    optimized product quantization learns an orthogonal R before PQ;
    their non-parametric solver alternates Lloyd and an SVD/Procrustes
    step, which no SQL engine can replay exactly — a PERMUTATION
    matrix is the orthogonal transform a relational engine CAN train
    bit-reproducibly, and balancing per-subspace variance is exactly
    the parametric OPQ solution's eigenvalue-allocation criterion
    applied to the coordinate basis). Rank dimensions by
    ROUND(AVG(x^2) - AVG(x)^2, 6) descending (population variance in
    the one algebraic form both engines replay; ties to the lower
    dim), then deal them to the `m` subspaces in SNAKE order
    (rank r -> subspace r % 2m, reflected), so each subspace receives
    an even slice of the variance spectrum instead of one natural
    block hoarding it. Returns the 0-based permutation: output
    position p reads input dimension perm[p].

    Bounded driver materialization: `dim` (dim, variance) rows (the
    probed-cells precedent) — the permutation must be a plan-time
    literal for the downstream projection, and the aggregate is the
    only corpus-size-dependent work. Shape (r14 optimization round):
    posexplode → narrow groupBy(d) aggregate. The former single-row
    form compiled 3 aggregate expressions per dimension (193 total at
    dim=64) and measured 1.67 s warm at sf0.1 — almost all plan
    compilation; the exploded form is 0.36 s with a 4-expression
    aggregate, produces the identical ROUND(AVG(x*x)-AVG(x)^2, 6)
    doubles, and map-side partial aggregation keeps the shuffle at
    `dim` rows per task regardless of corpus size."""
    c = as_double(vec_col)
    rows = (
        df.select(F.posexplode(c).alias("d", "x"))
        .groupBy("d")
        .agg(
            F.round(
                F.avg(F.col("x") * F.col("x"))
                - F.avg("x") * F.avg("x"),
                6,
            ).alias("v")
        )
        .collect()
    )
    if not rows:
        # nothing exploded: no rows (or only NULL/empty vectors) —
        # fail with the index builders' loud empty-corpus diagnostic
        # instead of a TypeError inside the sort key (r13 advice)
        raise ValueError(
            "opq_dim_permutation: corpus is empty — no variances to "
            "rank, nothing to index"
        )
    vs = {r["d"]: r["v"] for r in rows}
    short = [d for d in range(dim) if vs.get(d) is None]
    if short:
        # non-empty corpus, missing/NULL variance: the vectors are
        # shorter than `dim` (those positions never explode) — a
        # different defect than emptiness, named as such (r14 review)
        raise ValueError(
            f"opq_dim_permutation: dims {short[:4]}... aggregate to "
            f"NULL variance over a non-empty corpus — the vectors are "
            f"shorter than dim={dim} (or carry NULL elements)"
        )
    return _variance_ranked_permutation(vs, m, dim)


def _variance_ranked_permutation(
    vs: dict[int, float], m: int, dim: int
) -> list[int]:
    """The rank + snake-deal step of opq_dim_permutation, factored out
    (r15) so a caller holding the ROUND(var, 6) doubles from another
    training pass (opq_pair_rotation_stats' diagonal) derives the
    identical permutation without a second aggregation job."""
    ranked = sorted(range(dim), key=lambda d: (-vs[d], d))
    blocks: list[list[int]] = [[] for _ in range(m)]
    for r, d in enumerate(ranked):
        j = r % (2 * m)
        blocks[j if j < m else 2 * m - 1 - j].append(d)
    return [d for b in blocks for d in b]


def apply_dim_permutation(
    df: DataFrame,
    perm: list[int],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, vec) with the vector's dimensions reordered by `perm`
    (output position p reads input dim perm[p]) — a pure map-only
    projection, the shape an orthogonal pre-transform must keep at
    100 TB. L2 distances are permutation-invariant, so exact ground
    truth computed on the UN-permuted relation stays valid for
    recall gauges over the permuted one."""
    c = as_double(vec_col)
    out = F.array(*[F.element_at(c, p + 1) for p in perm])
    return df.select(F.col(id_col), out.alias(vec_col))


def opq_pair_rotation(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = DIM,
) -> list[tuple[int, int]]:
    """Trained PAIRING for the OPQ family's rotation member (r14):
    Ge et al.'s full non-parametric rotation alternates Lloyd with an
    SVD/Procrustes step no SQL engine can replay exactly; the
    replayable subfamily a relational engine CAN train is a
    block-diagonal scaled Hadamard over a LEARNED dimension matching
    — which pairs of dims get mixed is trained from the data's
    covariance, then every pair rotates by the same exact-integer
    2x2 [[1,1],[1,-1]] (uniform sqrt(2) scale: all squared L2
    distances scale by exactly 2, so exact ground truth computed on
    the un-rotated relation stays valid — the pq_opq_recall
    power-of-two playbook).

    Matching rule, deterministic hence oracle-replayable: per dim,
    the best partner maximizes (ROUND(|cov|, 6) desc, partner asc);
    MUTUAL best pairs are accepted (a < b); leftover dims pair
    consecutively in dim order. Returns the pair list. `id_col` is
    unused since the r14 join-free rewrite (the covariance no longer
    joins on the vector id); kept for signature stability.

    Bounded driver materialization: ONE aggregate row of dim means +
    dim*(dim+1)/2 product means (the opq_dim_permutation precedent —
    the transform must be a plan-time literal; the aggregate is the
    only corpus-dependent work, a single map-side pass)."""
    return opq_pair_rotation_stats(df, vec_col, id_col, dim)[0]


def opq_pair_rotation_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = DIM,
) -> tuple[list[tuple[int, int]], dict[int, float]]:
    """opq_pair_rotation's training pass, returning BOTH trained
    artifacts its aggregate already contains (r15): the mutual-best
    pairing AND the per-dim ROUND(variance, 6) doubles. The products
    explode includes the DIAGONAL cell (da == db), whose
    ROUND(pavg - mu*mu, 6) is literally opq_dim_permutation's
    ROUND(AVG(x*x) - AVG(x)*AVG(x), 6) over the same exploded values
    in the same order — bit-identical doubles (asserted by
    tests/test_similarity.py), so a caller training both the pairing
    and the variance permutation pays ONE aggregation job instead of
    two. Feed the variances to _variance_ranked_permutation for the
    identical permutation opq_dim_permutation returns."""
    if dim % 2:
        raise ValueError(
            f"opq_pair_rotation: pairing needs an even dim, got {dim}"
        )
    # Diagonal-inclusive product means via two chained generators — no
    # join at all (r14 optimization round; guide §2.4 "remove shuffles
    # outright"). The former shape exploded to (rid, d, x) and
    # self-joined on the vector id: 2·dim·N rows through the join
    # exchange before the aggregate. Here each row fans out to its
    # dim elements, each element to the pairs it heads
    # (posexplode of the tail slice FROM da0, db = da + off), and the
    # groupBy's map-side partial aggregation collapses everything to
    # dim·(dim+1)/2 cells per task before the only shuffle — measured
    # 1.03 s → 0.67 s at sf0.1 with the identical trained pairing.
    # (A dim*(dim-1)/2-column single aggregate compiles a
    # 2000-expression plan — measured ~40x slower than either
    # relational shape.) The rounding happens IN the Spark expression
    # (F.round is the same half-up rule the DuckDB oracle's ROUND
    # applies), so both engines compare identical 6-decimal literals.
    c = as_double(vec_col)
    heads = df.select(c.alias("_v")).select(
        F.col("_v"), F.posexplode("_v").alias("da0", "xa")
    )
    # means from the SAME exploded subtree the products read (r14
    # review): a separate posexplode duplicated the scan+explode in
    # the plan for identical values
    means = heads.groupBy(F.col("da0").alias("d")).agg(
        F.avg("xa").alias("mu")
    )
    # the tail slice starts AT da0 (r15): the diagonal cell da == db
    # rides the same aggregate for free — its ROUND(pavg - mu², 6) IS
    # the per-dim variance, saving the separate opq_dim_permutation
    # job for callers that need both trained artifacts
    elems = heads.select(
        "da0", "xa",
        F.posexplode(
            F.slice(F.col("_v"), F.col("da0") + 1, F.lit(dim))
        ).alias("off", "xb"),
    )
    prods = (
        elems.groupBy(
            F.col("da0").alias("da"),
            (F.col("da0") + F.col("off")).alias("db"),
        )
        .agg(F.avg(F.col("xa") * F.col("xb")).alias("pavg"))
    )
    covs = (
        prods.join(
            F.broadcast(means.select(F.col("d").alias("da"),
                                     F.col("mu").alias("ma"))), "da")
        .join(
            F.broadcast(means.select(F.col("d").alias("db"),
                                     F.col("mu").alias("mb"))), "db")
        .select(
            "da", "db",
            F.round(
                F.col("pavg") - F.col("ma") * F.col("mb"), 6
            ).alias("cv"),
        )
        .collect()
    )
    if not covs:
        raise ValueError(
            "opq_pair_rotation: corpus is empty — no covariances to "
            "match, nothing to index"
        )
    full = {(r["da"], r["db"]): r["cv"] for r in covs}
    vs = {a: v for (a, b), v in full.items() if a == b}
    cmat = {(a, b): v for (a, b), v in full.items() if a != b}
    if len(full) != dim * (dim + 1) // 2 or any(
        v is None for v in full.values()
    ):
        # missing pairs / NULL covariances mean the vectors are
        # shorter than `dim` (posexplode emits only real elements) —
        # name the defect instead of a KeyError in cov() (r14 review)
        raise ValueError(
            f"opq_pair_rotation: expected {dim * (dim + 1) // 2} "
            f"covariances, got {len(full)} non-NULL — the vectors "
            f"are shorter than dim={dim} (or carry NULL elements)"
        )

    def cov(a: int, b: int) -> float:
        lo, hi = min(a, b), max(a, b)
        return cmat[(lo, hi)]

    best = [
        min(
            (d2 for d2 in range(dim) if d2 != d),
            key=lambda d2: (-abs(cov(d, d2)), d2),
        )
        for d in range(dim)
    ]
    pairs = [
        (d, best[d])
        for d in range(dim)
        if d < best[d] and best[best[d]] == d
    ]
    used = {i for pr in pairs for i in pr}
    rest = [d for d in range(dim) if d not in used]
    pairs += [(rest[i], rest[i + 1]) for i in range(0, len(rest), 2)]
    return pairs, vs


def apply_pair_rotation(
    df: DataFrame,
    pairs: list[tuple[int, int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, vec) under the paired scaled Hadamard: for each trained
    pair (a, b), output position a carries x[a] + x[b] and position b
    carries x[a] - x[b] — a map-only projection (the
    apply_dim_permutation shape). Orthogonal up to the uniform
    sqrt(2) scale, so L2 rankings are preserved exactly."""
    c = as_double(vec_col)
    pos: dict[int, Column] = {}
    for a, b in pairs:
        xa, xb = F.element_at(c, a + 1), F.element_at(c, b + 1)
        pos[a] = xa + xb
        pos[b] = xa - xb
    dim = len(pos)
    out = F.array(*[pos[p] for p in range(dim)])
    return df.select(F.col(id_col), out.alias(vec_col))


def pq_codebook_trained(
    embeddings: DataFrame,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd-trained PQ codebook (Jégou et al. 2011 §II-B train their
    codebooks with k-means; the untrained `pq_codebook` is the
    replayable seed stand-in the r9 verdict flagged as capping serving
    recall). Per subvector block, a fixed number of Lloyd iterations
    over the TRAINING relation's subvectors, seeded from the untrained
    codebook (the K lowest-id vectors' subvectors — deterministic, so
    any engine replays training exactly, the kmeans_refine rule).
    Returns the SAME 1-row `_cb` shape as `pq_codebook`, so encode,
    LUTs and every probe consume it unchanged.

    Each iteration: (1) assign every (vector, block) subvector to its
    argmin-squared-L2 entry — the pq_encode argmin itself (first
    position of the minimum, ties to the smaller entry id), a map-only
    projection over the 1-row codebook broadcast; (2) recompute each
    (block, entry) as the member mean per dimension, ROUNDED to 6
    decimals — the quantization that makes cross-engine replay exact
    by construction: float sums accumulate in engine-specific order,
    so the unrounded means could differ in the last ulp and flip a
    later argmin; rounding both engines' means to 6dp yields identical
    doubles (a flip now needs the true mean within ~1 ulp of a 1e-6
    boundary); (3) an entry that attracted no members keeps its
    previous subvector (standard Lloyd empty-cluster handling, the
    kmeans_refine rule).

    Scale: per iteration one training-relation scan (map-only argmin
    against the 128-entry broadcast) and one aggregation keyed
    (block, entry, dim) — PQ_M x PQ_K x PQ_SUB = 1024 cells, map-side
    combined, so the shuffle carries ≤1024 rows per partition. The
    corpus is never collected."""
    if iterations < 1:
        raise ValueError(
            f"pq_codebook_trained: iterations={iterations} must be >= 1 "
            "(use pq_codebook for the untrained seeds)"
        )
    v = as_double(vec_col)
    cb_row = pq_codebook(embeddings, vec_col, id_col)
    for _ in range(iterations):

        def _best(j: int) -> Column:
            sv = F.slice(v, j * PQ_SUB + 1, PQ_SUB)
            dists = F.transform(
                F.col("_cb")[j], lambda en: _l2sq(sv, en["sub"])
            )
            return (F.array_position(dists, F.array_min(dists)) - 1).cast(
                "int"
            )

        assigned = embeddings.join(F.broadcast(cb_row)).select(  # 1 row
            *[
                F.struct(
                    _best(j).alias("e"),
                    F.slice(v, j * PQ_SUB + 1, PQ_SUB).alias("sv"),
                ).alias(f"_a{j}")
                for j in range(PQ_M)
            ]
        )
        pts = assigned.select(
            F.posexplode(
                F.array(*[F.col(f"_a{j}") for j in range(PQ_M)])
            ).alias("blk", "a")
        ).select(
            "blk",
            F.col("a.e").alias("entry"),
            F.posexplode("a.sv").alias("pos", "x"),
        )
        newv = (
            pts.groupBy("blk", "entry", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("blk", "entry")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("nev")
            )
        )
        prev = (
            cb_row.select(F.posexplode("_cb").alias("blk", "ents"))
            .select("blk", F.posexplode("ents").alias("entry", "en"))
            .select("blk", "entry", F.col("en.sub").alias("pev"))
        )
        cents = prev.join(newv, ["blk", "entry"], "left").select(
            "blk", "entry", F.coalesce("nev", "pev").alias("ev")
        )
        per_block = cents.groupBy("blk").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("entry", "ev"))),
                lambda s: F.struct(s["ev"].alias("sub")),
            ).alias("ents")
        )
        cb_row = per_block.select(
            F.struct("blk", "ents").alias("be")
        ).agg(
            F.transform(
                F.array_sort(F.collect_list("be")), lambda s: s["ents"]
            ).alias("_cb")
        )
    return cb_row


def pq_encode(
    embeddings: DataFrame,
    codebook_row: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector to PQ_M 4-bit codes: per block, the entry
    with the smallest squared L2 to the vector's subvector (ties to
    the smaller entry id via the (dist, e) struct min). Emits one
    packed BIGINT (`pq_code`, 4 bits per block) per vector — the
    32x-compressed representation ADC scans instead of the floats.
    One broadcast (1-row codebook) + a map-only projection: the
    encode pass is a single corpus scan, embarrassingly parallel.
    `keep` names extra input columns carried through unchanged (the
    IVF-PQ build passes its cell assignment so codes + cells land in
    ONE scan, no vec_id re-join); names colliding with the encoder's
    own columns are refused loudly — a duplicate pq_code/scratch
    column would make downstream resolution ambiguous or silently
    corrupt the packed sum (r8 review)."""
    reserved = {id_col, "pq_code", *(f"_c{j}" for j in range(PQ_M))}
    clash = sorted(set(keep) & reserved)
    if clash:
        raise ValueError(
            f"pq_encode keep={clash} collides with the encoder's own "
            "output/scratch columns — rename the carried columns"
        )
    v = as_double(vec_col)

    def _code(j: int) -> Column:
        sv = F.slice(v, j * PQ_SUB + 1, PQ_SUB)
        dists = F.transform(
            F.col("_cb")[j], lambda en: _l2sq(sv, en["sub"])
        )
        # entry id = FIRST position of the minimum distance (1-based),
        # so ties break to the smaller entry id — the same rule the
        # oracle's list_position(dl, list_min(dl)) replays
        return (
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("long")
            .alias(f"_c{j}")
        )

    code_cols = [_code(j) for j in range(PQ_M)]
    enc = (
        embeddings.join(F.broadcast(codebook_row))  # bcast bound: 1 row
        .select(F.col(id_col), *[F.col(c) for c in keep], *code_cols)
    )
    packed = sum(
        (F.col(f"_c{j}") * F.lit(1 << (4 * j)) for j in range(1, PQ_M)),
        F.col("_c0"),
    )
    return enc.select(
        F.col(id_col), *[F.col(c) for c in keep], packed.alias("pq_code")
    )


_PQ_COLUMN_CACHE: dict = {}


def _pq_lut_array() -> Column:
    """The PQ_M x PQ_K asymmetric-distance lookup table over a
    relation holding `_qv` (the query vector) and the broadcast `_cb`:
    `_lut[j][e+1]` is the exact squared L2 between the query's block-j
    subvector and codebook entry e. THE single LUT definition — the
    in-query form (pq_adc_topk), the persisted-index probes
    (plans/storage.pq_index_probe / ivfpq_probe) and the batch probe
    all build it here, so the scoring arithmetic cannot drift between
    serving paths.

    The Column is MEMOIZED (r10): it references only the fixed `_qv` /
    `_cb` names and module constants, and building its PQ_M x PQ_K x
    PQ_SUB fold tree costs ~0.35 s of py4j round trips — measured as
    the single largest slice of warm-probe latency. Columns are
    immutable unresolved expressions, safely shared across plans."""
    col = _PQ_COLUMN_CACHE.get("lut")
    if col is None:

        def _lut(j: int) -> Column:
            qsv = F.slice(F.col("_qv"), j * PQ_SUB + 1, PQ_SUB)
            return F.transform(
                F.col("_cb")[j], lambda en: _l2sq(qsv, en["sub"])
            )

        col = F.array(*[_lut(j) for j in range(PQ_M)])
        _PQ_COLUMN_CACHE["lut"] = col
    return col


def pq_lut_row(
    query: DataFrame,
    codebook_row: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """The single query's LUT as ONE row (`_lut`) — `_pq_lut_array`
    over the 1-row query × 1-row codebook join."""
    qv = as_double(vec_col)
    return (
        query.select(qv.alias("_qv"))
        .join(F.broadcast(codebook_row))  # bcast bound: 1 row
        .select(_pq_lut_array().alias("_lut"))
    )


def pq_lut_rows(
    queries: DataFrame,
    codebook_row: DataFrame,
    qvec_col: str = "qvec",
    qid_col: str = "qid",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-query LUT rows for a BATCH of query vectors: (qid, _lut),
    one row per query, built by the same `_pq_lut_array` definition as
    the single-query form. Q is bounded by the caller's batch size —
    the relation is the broadcast side of the batch ADC scan (Q rows
    of PQ_M x PQ_K doubles ≈ 1 KiB per query). `keep` carries extra
    key columns through unchanged (the residual batch probe keys its
    LUTs by (qid, cell))."""
    qv = as_double(qvec_col)
    return (
        queries.select(
            F.col(qid_col).alias("_qid"),
            *[F.col(c) for c in keep],
            qv.alias("_qv"),
        )
        .join(F.broadcast(codebook_row))  # bcast bound: 1 row
        .select(
            F.col("_qid").alias(qid_col),
            *keep,
            _pq_lut_array().alias("_lut"),
        )
    )


def pq_adc_dist() -> Column:
    """ADC distance of a packed `pq_code` against the broadcast `_lut`
    row: PQ_M element_at lookups, 4-bit nibble per block. The one
    scoring expression both PQ serving paths read. Memoized like
    _pq_lut_array (fixed column names + module constants only)."""
    col = _PQ_COLUMN_CACHE.get("adc")
    if col is not None:
        return col
    col = sum(
        (
            F.element_at(
                F.col("_lut")[j],
                (
                    F.shiftrightunsigned(F.col("pq_code"), 4 * j)
                    % F.lit(PQ_K)
                ).cast("int") + 1,
            )
            for j in range(1, PQ_M)
        ),
        F.element_at(
            F.col("_lut")[0],
            (F.col("pq_code") % F.lit(PQ_K)).cast("int") + 1,
        ),
    )
    _PQ_COLUMN_CACHE["adc"] = col
    return col


def pq_adc_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"): the query
    builds one PQ_M x PQ_K lookup table of exact subvector distances,
    and every database vector's approximate distance is PQ_M table
    lookups on its packed code — the scan never touches the floats.
    At 100 TB that is the point: the hot loop reads 8 bytes per
    vector (32x less IO than the embedding column), the LUT is a
    1-row broadcast, and the final top-k is a TakeOrdered reduction.
    Returns (vec_id, pq_code, adist): code and rounded distance both
    verifiable against an engine-independent replay.

    Single-query contract, enforced (r7 advice — the same failure
    class ivf_index_probe guards): with >1 query row the unkeyed
    broadcast join below would interleave several queries' LUT rows
    into one silently-wrong top-k, and an empty query would silently
    return an empty result. The query subtree is persisted as a
    private projection for its two consumers (the contract count and
    the LUT build) — a filter-over-a-big-table query would otherwise
    evaluate twice (r8 advice; the pq_index_probe pattern), with
    unpersist-on-raise and the cache's lifetime tied to the result."""
    from .dedup import tie_cache

    query = query.select(F.col(vec_col)).persist()
    try:
        n_q = query.count()
        if n_q != 1:
            raise ValueError(
                f"pq_adc_topk serves exactly one query vector, got {n_q} "
                "rows — use batch_topk for query batches"
            )
        cb = pq_codebook(embeddings, vec_col, id_col)
        codes = pq_encode(embeddings, cb, vec_col, id_col)
        lut_row = pq_lut_row(query, cb, vec_col)
        out = (
            codes.join(F.broadcast(lut_row))  # bcast bound: 1 row
            .select(
                F.col(id_col),
                "pq_code",
                F.round(pq_adc_dist(), 6).alias("adist"),
            )
            # asc_nulls_last: the topk_l2_bruteforce rule (r9)
            .orderBy(F.asc_nulls_last("adist"), id_col)
            .limit(k)
        )
        return tie_cache(out, query)
    except BaseException:
        query.unpersist()
        raise


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (dimensionality reduction)
# ---------------------------------------------------------------------------

def jl_matrix(out_dim: int, dim: int = DIM) -> list[list[int]]:
    """Deterministic JL projection rows with integer entries in
    [-8, 8]: P[r][d] = ((r*53 + d*29) % 17) - 8. Integer entries keep
    the arithmetic portable so any engine replays the projection
    exactly (the projection_matrix pattern); a real deployment swaps
    in Gaussian/sparse-Rademacher rows of the same shape."""
    return [
        [((r * 53 + d * 29) % 17) - 8 for d in range(dim)]
        for r in range(out_dim)
    ]


def jl_reduce(vec_col: Column | str, out_dim: int) -> Column:
    """Project a DIM-dim vector to `out_dim` dims: element r is
    dot(P_r, v). A map-only projection — at 100 TB this is the
    shrink-before-ANN pass (4-8x less vector IO for every downstream
    scan), one scan, no shuffle, no Python."""
    v = as_double(vec_col)
    return F.array(*[
        dot(F.array(*[F.lit(float(x)) for x in row]), v)
        for row in jl_matrix(out_dim)
    ])


# ---------------------------------------------------------------------------
# scalar quantization (SQ8) — 8 bits per DIMENSION (r10)
# ---------------------------------------------------------------------------

SQ_BUCKETS = 256  # 8-bit codes: one byte per dimension on disk


def sq_quantizer(
    embeddings: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension [lo, hi] training range as ONE row (`lo`/`hi`,
    DIM-element double arrays) — the whole quantizer of an SQ8 index
    (Faiss's ScalarQuantizer QT_8bit shape: per-dim affine buckets).
    min/max are EXACT aggregates (no accumulation-order sensitivity,
    unlike a mean), so any engine replays the quantizer bit-identically
    from the same corpus — the determinism rule the PQ codebooks need
    sampling tricks for, free here. One scan, partial-agg combine,
    128 scalar aggregates; no shuffle wider than the agg."""
    v = as_double(vec_col)
    return embeddings.agg(
        F.array(*[F.min(v[d]) for d in range(DIM)]).alias("lo"),
        F.array(*[F.max(v[d]) for d in range(DIM)]).alias("hi"),
    )


def _sq_range() -> Column:
    """hi - lo per dimension, from the joined 1-row quantizer."""
    return F.zip_with("hi", "lo", lambda h, x: h - x)


def sq_encode(
    df: DataFrame,
    quantizer: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: tuple = (),
) -> DataFrame:
    """Encode vectors against a quantizer: (id, sq_code array<int>)
    with code_d = clamp(floor((x_d - lo_d) * 256 / (hi_d - lo_d)),
    0, 255); a degenerate dimension (hi == lo) encodes 0. floor of a
    single IEEE division — identical in any engine, and NO round-half
    tie sites (the tie-canary rule); out-of-range values in APPENDED
    batches saturate at the clamp rather than poisoning the code.
    Codes are row-independent, so appends encode against the STORED
    quantizer and never touch old codes. A NULL element (or a short
    vector, whose tail zip_with pads with NULL) encodes a NULL code
    EXPLICITLY — Spark's greatest/least SKIP nulls, so without the
    guard a NULL element silently saturated to code 255 while the SQL
    replay clamped it to 0 (r10 review); NULL codes make the row's
    probe distance NULL, ranked last, visibly degenerate. On disk
    array<int> of 0..255 dictionary/bit-packs to about a byte per
    dim — 4-8x less probe IO than the float vectors; at 100 TB the
    encode is one broadcast join (1-row quantizer) + map, no
    shuffle."""
    diff = F.zip_with(as_double(vec_col), "lo", lambda x, m: x - m)
    code = F.zip_with(
        diff,
        _sq_range(),
        lambda d, s: F.when(
            d.isNull() | s.isNull(), F.lit(None).cast("long")
        )
        .when(s == F.lit(0.0), F.lit(0).cast("long"))
        .otherwise(
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.floor(d * F.lit(256) / s), F.lit(255).cast("long")),
            )
        )
        .cast("int"),
    )
    return df.join(F.broadcast(quantizer)).select(  # bcast bound: 1 row
        F.col(id_col), *keep, code.alias("sq_code")
    )


def sq_dequant(code_col: Column | str = "sq_code") -> Column:
    """Reconstruct bucket CENTERS from codes against the joined 1-row
    quantizer: lo_d + (code_d + 0.5) * (hi_d - lo_d) / 256. Kept as
    one shared column expression so the probe, the recall gate, and
    their oracles all score the identical reconstruction."""
    col = F.col(code_col) if isinstance(code_col, str) else code_col
    scaled = F.zip_with(
        col, _sq_range(), lambda c, s: (c + F.lit(0.5)) * s / F.lit(256)
    )
    return F.zip_with(scaled, "lo", lambda t, m: t + m)


def sq_adc_dist(qv_col: str = "_qv", code_col: str = "sq_code") -> Column:
    """Asymmetric distance: squared L2 between the raw query vector
    and the dequantized bucket centers — the SQ twin of pq_adc_dist,
    sharing _l2sq's fold order so oracles replay it exactly."""
    return _l2sq(F.col(qv_col), sq_dequant(code_col))
