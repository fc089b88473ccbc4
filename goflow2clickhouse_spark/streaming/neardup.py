"""Streaming near-duplicate detection: MinHash-LSH candidates over a
document stream.

Batch near-dup (operators/dedup.minhash_lsh_dedup_pairs) answers "which
pairs in this corpus are near-dups"; the streaming form answers the
ingest-time question — "is THIS arriving document a near-dup of
anything seen so far" — without re-scanning history. Spark-first
shape:

- signature + band keys are STATELESS column expressions (identical to
  the batch path: same shingles, same hash31 permutations, same bands),
  so the stream and the batch twin can never disagree on bucketing;
- state lives per (band_no, band_key) bucket via
  `applyInPandasWithState`: the ids seen in that bucket. A new id
  pairs with every id already there — exactly the pairs the batch
  banding would emit, produced incrementally as documents arrive.

State growth: near-dup-against-ALL-history inherently keeps every
bucket's membership, like the batch pipeline keeps the whole corpus.
Production deployments bound it the same way they bound the batch
window — dedup within a horizon — by keying state per time bucket or
restarting the query per epoch; `ttl_hours` hooks are deliberately NOT
faked here. Per-bucket state is bounded by the same LSH tuning that
bounds batch bucket sizes (see lsh_candidate_pairs on hot buckets).

Parity with the batch banding is asserted in
tests/test_stream_neardup.py across multi-micro-batch splits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..operators.dedup import (
    array_minhash_sigs,
    band_key_rows,
    shingle_arrays,
)


def _out_schema(id_type) -> StructType:
    """Output/state schemas derive from the ACTUAL id column type: the
    old hardcoded LongType broke the documented id_col parameter for
    any non-long id (string event ids crashed the emitter) while the
    batch branch accepted them — the two modes silently disagreed on
    the API contract (r6 review)."""
    return StructType(
        [
            StructField("band_no", LongType()),
            StructField("id_a", id_type),
            StructField("id_b", id_type),
        ]
    )


def _state_schema(id_type) -> StructType:
    return StructType([StructField("ids", ArrayType(id_type))])


def band_keys(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Stateless doc → (id, band_no, band_key) rows; the same
    signature arithmetic as the batch pipeline, usable on batch or
    streaming DataFrames (no shuffle, no state). Null-id rows are
    dropped up front: a NULL id would reach the stateful pair emitter
    as a NaN float and crash int() — and a pair involving no identity
    is meaningless anyway."""
    sh = shingle_arrays(
        docs.filter(F.col(id_col).isNotNull()), text_col, id_col
    )
    # signatures AND banding are the SHARED batch projections
    # (array_minhash_sigs + band_key_rows) — one source of truth, so
    # stream/batch bucketing cannot drift (r8 review: the signature
    # loop was a token-for-token restatement of array_minhash_sigs,
    # the exact drift class the r6 band_key_rows unification removed)
    return band_key_rows(array_minhash_sigs(sh, id_col), id_col)


def _pair_emitter(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    band_no = int(key[0])
    seen: list = list(state.get[0]) if state.exists else []
    # set for O(1) membership — a hot bucket accumulates thousands of
    # ids, and list scans made each arrival O(bucket) even when
    # nothing was emitted
    member = set(seen)
    out_a, out_b = [], []
    new_ids: list = []
    for pdf in pdfs:
        for doc_id in pdf["_nd_id"]:
            # unbox numpy scalars so state round-trips cleanly; string
            # ids pass through as-is (ordering works for both)
            doc_id = doc_id.item() if hasattr(doc_id, "item") else doc_id
            if doc_id in member:
                continue  # exact re-send: no self-pair
            for old in member:
                lo, hi = (old, doc_id) if old < doc_id else (doc_id, old)
                out_a.append(lo)
                out_b.append(hi)
            member.add(doc_id)
            new_ids.append(doc_id)
    if new_ids:
        state.update((seen + new_ids,))
    if out_a:
        yield pd.DataFrame(
            {"band_no": band_no, "id_a": out_a, "id_b": out_b}
        )


def streaming_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    streaming: bool = True,
) -> DataFrame:
    """LSH candidate pairs, incremental: (band_no, id_a, id_b) emitted
    the moment the LATER document of the pair arrives. Downstream
    takes `.select("id_a", "id_b").distinct()` (a pair found by two
    bands emits twice, same as the batch bucket expansion before its
    distinct). Batch form runs the identical band keys through the
    grouped emitter semantics via a plain self-pairing."""
    bk = band_keys(docs, text_col, id_col)
    if streaming:
        id_type = docs.schema[id_col].dataType
        return (
            bk.withColumnRenamed(id_col, "_nd_id")
            .groupBy("band_no", "band_key")
            .applyInPandasWithState(
                _pair_emitter,
                _out_schema(id_type),
                _state_schema(id_type),
                "update",
                GroupStateTimeout.NoTimeout,
            )
        )
    a = bk.select("band_no", "band_key", F.col(id_col).alias("id_a"))
    b = bk.select("band_no", "band_key", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band_no", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("band_no", "id_a", "id_b")
        .distinct()
    )
