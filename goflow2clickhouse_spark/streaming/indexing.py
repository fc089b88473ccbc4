"""Streaming maintenance of the persisted ANN index — the embedding
side of the crawl loop (r8 verdict item 4): where
`streaming_incremental_dedup` folds each micro-batch of DOCUMENTS into
the band index, this folds each micro-batch of EMBEDDINGS into the
persisted IVF-PQ index (`plans/storage.write_ivfpq_index`), so a
vector-serving index tracks the corpus continuously instead of waiting
for rebuilds. Since r10 the fold is LAYOUT-GENERIC
(`index_maintenance_fold` — dispatch on the committed metadata's
layout kind), so every embedding-side layout (SQ, IVF-SQ, PQ, IVF-PQ,
and since r11 the filtered IVF) shares one streaming story; the
layout-specific wrappers remain as the explicit-intent API.

Spark-first shape: foreachBatch over a Structured Streaming source —
each batch is ONE `append_to_ivfpq_index` call (gate with the RECORDED
eligibility, assign against the STORED centroids, encode against the
STORED codebook, one atomic cells delta), so the per-batch cost is a
single batch-sized scan + a metadata commit, never an index rebuild.
Exactly-once on at-least-once delivery via the shared (run_id, epoch)
replay gate (`versioned.epoch_replayed`) committed atomically with the
delta inside `_CURRENT`. Delta count is bounded operationally by
`plans/storage.compact_index` (fold deltas into a new base), and a
full rebuild remains the quantizer-refresh path after drift — the
docstring contract the r8 append operators promised.

Reference parity note: the reference ships no vector layer at all
(/root/reference/ is a flow-ingest bridge); this module is part of the
training-data-pipeline extension surface (SURVEY.md §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ivfpq_maintenance_fold(
    batch_df: DataFrame,
    documents: DataFrame,
    index_path: str,
    epoch_id: int,
    run_id: str | None = None,
    compact_over: int | None = None,
) -> bool:
    """One turn of the embedding-maintenance loop (the testable unit
    the foreachBatch wrapper below calls): fold `batch_df` — new
    (vec_id, embedding) rows — into the persisted IVF-PQ index.
    `documents` is the static metadata side of the recorded
    eligibility gate (stream-static join semantics: the batch is
    gated exactly as the build was).

    Returns False (and touches nothing) when the (run_id, epoch) gate
    says this epoch already folded — the shared `epoch_replayed`
    contract: without it a restart replay would append the same batch
    twice and every probe would serve its vectors twice. The gate
    commits ATOMICALLY with the delta (both ride the same `_CURRENT`
    rename inside append_to_ivfpq_index), so there is no torn window
    between "delta visible" and "epoch recorded". An eligible-empty
    batch advances the gate without writing a delta. Within-batch /
    cross-batch id dedup is the caller's contract, same as every
    index append.

    `compact_over` bounds the delta count operationally: after the
    fold, if more than that many append legs are committed, they are
    folded into a new single-leg base (plans/storage.compact_index —
    gate metadata carries over, so a compaction between two folds can
    never reopen a replayed epoch). A crash between append and
    compaction loses nothing: the compaction is re-attempted on the
    next fold."""
    from ..plans.storage import append_to_ivfpq_index, compact_index
    from ..versioned import current_meta, epoch_replayed

    spark = batch_df.sparkSession
    meta = current_meta(spark, index_path)
    if not meta:
        raise FileNotFoundError(
            f"no committed IVF-PQ index under {index_path}"
        )
    if epoch_replayed(meta, epoch_id, run_id):
        return False
    append_to_ivfpq_index(
        documents, batch_df, index_path,
        extra={"epoch": int(epoch_id), "run_id": run_id},
    )
    if compact_over is not None:
        compact_index(spark, index_path, min_appends=compact_over + 1)
    return True


def streaming_ivfpq_maintenance(
    stream_df: DataFrame,
    documents: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    compact_over: int | None = None,
):
    """The embedding-maintenance loop as a running stream: each
    micro-batch of (vec_id, embedding) rows folds into the persisted
    IVF-PQ index (ivfpq_maintenance_fold above). Returns the started
    StreamingQuery. run_id = the checkpoint lineage's query id
    (streaming/hll._checkpoint_run_id), so restart replays skip and a
    fresh checkpoint over a reused index folds — the
    streaming_incremental_dedup twin, differentially pinned equal to
    the same batches applied via plain append_to_ivfpq_index calls."""
    from .hll import _checkpoint_run_id

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        ivfpq_maintenance_fold(
            batch_df, documents, index_path, epoch_id,
            run_id=_checkpoint_run_id(batch_df.sparkSession, checkpoint_dir),
            compact_over=compact_over,
        )

    return (
        stream_df.writeStream.foreachBatch(_fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def sq_maintenance_fold(
    batch_df: DataFrame,
    index_path: str,
    epoch_id: int,
    run_id: str | None = None,
    compact_over: int | None = None,
) -> bool:
    """ivfpq_maintenance_fold's SQ-layout twin (r10): fold a
    (vec_id, embedding) micro-batch into the persisted SQ8 index —
    encode against the STORED quantizer, one atomic codes delta.
    No `documents` side: the SQ layout records no eligibility gate.
    Same (run_id, epoch) replay contract, committed atomically with
    the delta; an empty batch advances the gate deltalessly;
    `compact_over` bounds the append-leg count in-loop."""
    from ..plans.storage import append_to_sq_index, compact_index
    from ..versioned import current_meta, epoch_replayed

    spark = batch_df.sparkSession
    meta = current_meta(spark, index_path)
    if not meta:
        raise FileNotFoundError(
            f"no committed SQ index under {index_path}"
        )
    if epoch_replayed(meta, epoch_id, run_id):
        return False
    append_to_sq_index(
        batch_df, index_path,
        extra={"epoch": int(epoch_id), "run_id": run_id},
    )
    if compact_over is not None:
        compact_index(spark, index_path, min_appends=compact_over + 1)
    return True


def streaming_sq_maintenance(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    compact_over: int | None = None,
):
    """The SQ maintenance loop as a running stream — the
    streaming_ivfpq_maintenance twin over the scalar-quantized
    layout: each micro-batch of (vec_id, embedding) rows folds via
    sq_maintenance_fold; run_id = the checkpoint lineage's query id,
    so restart replays skip and a fresh checkpoint over a reused
    index folds."""
    from .hll import _checkpoint_run_id

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        sq_maintenance_fold(
            batch_df, index_path, epoch_id,
            run_id=_checkpoint_run_id(batch_df.sparkSession, checkpoint_dir),
            compact_over=compact_over,
        )

    return (
        stream_df.writeStream.foreachBatch(_fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def index_maintenance_fold(
    batch_df: DataFrame,
    index_path: str,
    epoch_id: int,
    run_id: str | None = None,
    compact_over: int | None = None,
    documents: DataFrame | None = None,
) -> bool:
    """Layout-generic maintenance fold (r10): read the committed
    metadata, infer the layout (plans/storage._index_kind — the same
    total inference compaction uses) and dispatch to that layout's
    append under the shared (run_id, epoch) replay gate. One fold
    definition serves every embedding-side layout — SQ, IVF-SQ, PQ,
    IVF-PQ and (since r11, closing the r10 verdict's misrouting
    finding) the filtered-IVF layout; the two gated layouts (IVF,
    IVF-PQ) additionally need the `documents` metadata side for their
    recorded eligibility gate — so a new layout's streaming story is
    its append function plus one dispatch row. The band
    (document-side) fold keeps its own loop in streaming/dedupe.py:
    its batches carry text, not vectors."""
    from ..plans.storage import (
        _index_kind,
        append_to_ivf_index,
        append_to_ivfpq_index,
        append_to_ivfsq_index,
        append_to_pq_index,
        append_to_sq_index,
        compact_index,
    )
    from ..versioned import current_meta, epoch_replayed

    spark = batch_df.sparkSession
    meta = current_meta(spark, index_path)
    if not meta:
        raise FileNotFoundError(f"no committed index under {index_path}")
    kind = _index_kind(meta)
    if epoch_replayed(meta, epoch_id, run_id):
        return False
    extra = {"epoch": int(epoch_id), "run_id": run_id}
    if kind in ("ivfpq", "ivf"):
        # both layouts record an eligibility gate at build time and
        # re-apply it per batch, so both need the documents side
        if documents is None:
            raise ValueError(
                f"{kind.upper()} maintenance needs the `documents` "
                "metadata side (the layout records an eligibility gate)"
            )
        if kind == "ivfpq":
            append_to_ivfpq_index(
                documents, batch_df, index_path, extra=extra
            )
        else:
            append_to_ivf_index(documents, batch_df, index_path, extra=extra)
    elif kind == "sq":
        append_to_sq_index(batch_df, index_path, extra=extra)
    elif kind == "ivfsq":
        append_to_ivfsq_index(batch_df, index_path, extra=extra)
    elif kind == "pq":
        append_to_pq_index(batch_df, index_path, extra=extra)
    elif kind == "band":
        raise ValueError(
            f"index at {index_path} is the document-side 'band' layout — "
            "its maintenance loop is streaming/dedupe.py's "
            "streaming_incremental_dedup (its batches carry text, "
            "not vectors)"
        )
    else:
        raise ValueError(
            f"index at {index_path} is an unrecognized '{kind}' layout — "
            "no maintenance fold is defined for it"
        )
    if compact_over is not None:
        compact_index(spark, index_path, min_appends=compact_over + 1)
    return True


def streaming_index_maintenance(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    compact_over: int | None = None,
    documents: DataFrame | None = None,
):
    """The layout-generic loop as a running stream: each (vec_id,
    embedding) micro-batch folds via index_maintenance_fold, which
    infers the layout from the committed metadata — point it at ANY
    embedding-side index. Same run_id/restart contract as the
    layout-specific wrappers."""
    from .hll import _checkpoint_run_id

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        index_maintenance_fold(
            batch_df, index_path, epoch_id,
            run_id=_checkpoint_run_id(batch_df.sparkSession, checkpoint_dir),
            compact_over=compact_over,
            documents=documents,
        )

    return (
        stream_df.writeStream.foreachBatch(_fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def index_takedown_fold(
    batch_df: DataFrame,
    index_path: str,
    epoch_id: int,
    run_id: str | None = None,
    compact_over: int | None = None,
    id_col: str | None = None,
) -> bool:
    """One turn of the TAKEDOWN loop (r11 — deletion's streaming
    half): fold a micro-batch of ids to remove into ANY committed
    index layout via plans/storage.delete_from_index — an atomic
    tombstone delta; every probe anti-joins it from this commit on.
    Layout-generic by construction (deletion is id-based), so the
    same fold serves band, filtered-IVF, PQ, SQ, IVF-SQ and IVF-PQ
    indexes — the opt-out/GDPR feed of a crawl pipeline is one stream
    pointed at each index.

    Same (run_id, epoch) replay contract as the append folds, but in
    its OWN metadata namespace (`del_epoch`/`del_run_id` —
    versioned.epoch_replayed(ns='del_')): an append stream and a
    takedown stream maintain the same index concurrently, and a
    shared gate would let either stream's commit make the other skip
    or raise. The gate commits atomically with the tombstone delta;
    an EMPTY batch advances it deltalessly. `compact_over` bounds the
    tombstone-delta count: once more than that many are committed,
    the fold compacts — which is also deletion's PHYSICAL purge, so a
    bounded takedown loop guarantees deleted rows leave disk within a
    bounded number of batches. `id_col` selects the id column when
    the batch carries more than one (default: the batch's single
    column)."""
    from ..plans.storage import compact_index, delete_from_index
    from ..versioned import current_meta, epoch_replayed

    spark = batch_df.sparkSession
    meta = current_meta(spark, index_path)
    if not meta:
        raise FileNotFoundError(f"no committed index under {index_path}")
    if epoch_replayed(meta, epoch_id, run_id, ns="del_"):
        return False
    ids = batch_df.select(id_col) if id_col else batch_df
    delete_from_index(
        ids, index_path,
        extra={"del_epoch": int(epoch_id), "del_run_id": run_id},
    )
    if compact_over is not None:
        # min_appends=0 would compact unconditionally; the tombstone
        # bound is checked here instead — compaction itself already
        # folds on tombstones alone
        refreshed = current_meta(spark, index_path)
        if int(refreshed.get("tombstones", 0)) > compact_over:
            compact_index(spark, index_path, min_appends=0)
    return True


def streaming_index_takedown(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    compact_over: int | None = None,
    id_col: str | None = None,
):
    """The takedown loop as a running stream: each micro-batch of ids
    folds into the index's tombstones via index_takedown_fold. Same
    run_id/restart contract as the maintenance wrappers; point one at
    each index a deletion feed must reach."""
    from .hll import _checkpoint_run_id

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        index_takedown_fold(
            batch_df, index_path, epoch_id,
            run_id=_checkpoint_run_id(batch_df.sparkSession, checkpoint_dir),
            compact_over=compact_over,
            id_col=id_col,
        )

    return (
        stream_df.writeStream.foreachBatch(_fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
