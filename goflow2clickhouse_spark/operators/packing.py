"""Greedy sequence packing — the dataset-assembly operator training
pipelines actually consume: lay documents head-to-tail into fixed
token-budget packs WITHOUT splitting documents, and emit the
assignment (pack_id, doc_id, offset) each pack-building job needs.

`doc_packing_stats` (plans/corpus_queries.py) reports the
concat-and-chunk layout where documents straddle pack boundaries;
this operator is the complement for pipelines that must keep each
document whole (no attention-mask surgery): greedy next-fit in a
deterministic document order — a doc that doesn't fit the open pack
closes it and starts the next one.

Scale design (100 TB): packing is inherently sequential WITHIN a pack
stream, so the unit of parallelism is the shard (`shard_col`) — the
same contract real pipelines use (pack per input shard, never one
global order). Each shard's fold runs in one task via applyInPandas
with O(1) state (open-pack fill) and one output row per document;
throughput scales with shard count. A pathologically hot shard
serializes into its task — pre-split such shards into (shard,
hash-bucket) sub-shards upstream; packing quality is unaffected
because pack streams are independent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Greedy next-fit packing per shard: documents in ascending
    `id_col` order; a document that would push the open pack past
    `budget` closes it. Returns (shard, id, n_tok, pack_id, offset)
    with pack_id numbered 0.. per shard and offset the document's
    first token position inside its pack.

    Budget invariant: every pack's token total is <= budget, EXCEPT a
    pack whose single document alone exceeds the budget (an oversize
    doc opens its own pack and the next document never joins it —
    `used + n > budget` holds for any n >= 1). Callers that cannot
    tolerate oversize packs must truncate or split upstream.

    Deterministic by construction: the fold order is (shard, id), so
    the same input produces the same assignment on any partitioning,
    engine, or rerun — the property the differential oracle pins.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # the output schema appends these fixed names after (shard, id); a
    # shard/id column with one of these names would duplicate a column
    # in the applyInPandas schema string — fail clearly, not at runtime
    emitted = {"n_tok", "pack_id", "offset"}
    clash = {shard_col, id_col} & emitted
    if clash:
        raise ValueError(
            f"shard_col/id_col must not be named {sorted(emitted)}; "
            f"got colliding name(s) {sorted(clash)} — rename upstream"
        )
    id_t = df.schema[id_col].dataType.simpleString()
    shard_t = df.schema[shard_col].dataType.simpleString()

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort")
        pack_ids, offsets = [], []
        pack, used = 0, 0
        for n in pdf[token_col].tolist():
            if n is None or pd.isna(n):
                # the long cast keeps NULLs, Arrow delivers them as
                # NaN, and int(NaN) died as an opaque whole-stage task
                # failure (r8 review) — name the actual defect instead
                raise ValueError(
                    f"pack_greedy: NULL {token_col!r} in shard "
                    f"{pdf[shard_col].iloc[0]!r} — token counts must be "
                    "non-null; filter or impute upstream"
                )
            n = int(n)
            if used > 0 and used + n > budget:
                pack += 1
                used = 0
            pack_ids.append(pack)
            offsets.append(used)
            used += n
        return pd.DataFrame(
            {
                shard_col: pdf[shard_col].values,
                id_col: pdf[id_col].values,
                "n_tok": pdf[token_col].astype("int64").values,
                "pack_id": pd.Series(pack_ids, dtype="int64").values,
                "offset": pd.Series(offsets, dtype="int64").values,
            }
        )

    src = df.select(shard_col, id_col, F.col(token_col).cast("long").alias(token_col))
    return src.groupBy(shard_col).applyInPandas(
        fold,
        f"{shard_col} {shard_t}, {id_col} {id_t}, n_tok long, "
        "pack_id long, offset long",
    )


def chunk_offsets(
    df: DataFrame,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunk assignments over each document's token
    stream — the context-window prep step for training/RAG pipelines
    that DO split documents (the complement of `pack_greedy`): chunk i
    covers tokens [i*stride, min(i*stride + window, n)), so consecutive
    chunks overlap by window - stride tokens and the final chunk is
    allowed to run short. Emits one row per (doc, chunk):
    (id, chunk_idx, tok_start, tok_end, n_tok) — offsets, not text, so
    the exchange never carries document bodies and the caller slices
    lazily at materialization time.

    Chunk count: 1 if n <= window else 1 + ceil((n-window)/stride) —
    every token is covered, no chunk starts at or past n. All-integer
    arithmetic, so any engine replays it exactly.

    Scale shape: a pure narrow projection + explode — no shuffle, no
    UDF; at 100 TB this pipelines with the scan and parallelizes by
    input split. Row expansion is ~n/stride per doc; cap `window`/
    `stride` choices, not the operator.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        raise ValueError(
            f"stride {stride} > window {window} would skip tokens"
        )
    n = F.size(F.split(F.col(text_col), " "))
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.lit(1) + F.floor((n - window + stride - 1) / F.lit(stride))
    )
    start = F.col("chunk_idx") * stride
    return (
        df.select(
            F.col(id_col),
            n.cast("long").alias("_n"),
            F.explode(
                F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            start.cast("long").alias("tok_start"),
            F.least(start + window, F.col("_n")).cast("long").alias("tok_end"),
            (F.least(start + window, F.col("_n")) - start)
            .cast("long")
            .alias("n_tok"),
        )
    )
