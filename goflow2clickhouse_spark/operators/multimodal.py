"""Multimodal columns (SURVEY.md §2.C): image/audio/video as opaque
binary columns + typed metadata, processed by Arrow-batched pandas
functions over mapInPandas.

The Spark-side plumbing is real — BinaryType columns, metadata structs,
mapInPandas with a declared output schema, per-batch processing. The
codec layer is stubbed (this container has no image/audio libraries):
`decode_image`/`decode_audio` raise NotImplementedError; the
deterministic `extract_features` fake computes features from the actual
bytes (length + byte checksum) so the pipeline is testable end-to-end
and oracle-checkable (the same arithmetic is expressible in SQL over
the utf-8 encoding of the source text).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("checksum", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct
    (modality tag, byte length) — the multimodal storage layout.
    Parquet stores BinaryType natively; at scale keep blobs in their
    own column chunk so metadata-only queries never read them."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("blob", blob).withColumn(
        "meta",
        F.struct(
            F.lit("text").alias("modality"),
            F.octet_length(blob).cast("long").alias("byte_len"),
        ),
    )


def decode_image(payload: bytes) -> object:
    """Real image decode requires an imaging library not present in
    this container. The seam is here: swap in PIL/torchvision."""
    raise NotImplementedError(
        "image decode stub: no imaging library in this environment"
    )


def decode_audio(payload: bytes) -> object:
    raise NotImplementedError(
        "audio decode stub: no audio library in this environment"
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over the binary column: Arrow
    batches in, Arrow batches out; one Python worker per partition.
    Features are deterministic functions of the real bytes:
      byte_len  = len(blob)
      checksum  = sum(blob bytes) % 65536
      width     = byte_len % 640 + 1      (fake decode geometry)
      height    = byte_len * 7 % 480 + 1
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["blob"]
            byte_len = blobs.map(len)
            checksum = blobs.map(lambda b: sum(b) % 65536)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": byte_len.astype("int64"),
                    "checksum": checksum.astype("int64"),
                    "width": (byte_len % 640 + 1).astype("int32"),
                    "height": (byte_len * 7 % 480 + 1).astype("int32"),
                }
            )

    return df.select(id_col, "blob").mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("blob", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_image(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing over mapInPandas: Arrow batch in → per-row
    transformed payload out. The stub 'resampler' is deterministic
    (truncate/cycle the real bytes to width*height); a real deployment
    swaps the inner function for PIL/opencv — the schema, batch shape,
    and partitioning stay identical."""
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def stub_resample(b: bytes) -> bytes:
                if len(b) >= target:
                    return bytes(b[:target])
                reps = target // max(len(b), 1) + 1
                return bytes((b * reps)[:target])

            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "blob": pdf["blob"].map(stub_resample),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, "blob").mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling plumbing: treat the payload as fixed-size frames,
    emit every n-th — a 1→N mapInPandas (output rows ≠ input rows, the
    video-decode batch shape). Deterministic fake framing (byte slices)
    stands in for a codec; partitioning is inherited from the input, so
    at scale frames of one video stay on one partition unless
    explicitly repartitioned for downstream balance."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf["blob"]):
                n_frames = len(blob) // frame_bytes
                for f in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    nos.append(f)
                    frames.append(bytes(blob[f * frame_bytes:(f + 1) * frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return df.select(id_col, "blob").mapInPandas(batches, FRAME_SCHEMA)
