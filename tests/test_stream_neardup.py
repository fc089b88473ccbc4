"""Streaming MinHash-LSH near-dup candidates (streaming/neardup.py):
the incremental per-bucket emitter must produce exactly the batch
banding's candidate pairs, no matter how the stream is split into
micro-batches."""

from __future__ import annotations

import pyspark.sql.functions as F

from goflow2clickhouse_spark.plans.extension_queries import corpus
from goflow2clickhouse_spark.streaming.neardup import (
    streaming_candidate_pairs,
)

SF = "/root/testdata/sf0.001"


def _pairs(df) -> set:
    return {
        (r.id_a, r.id_b)
        for r in df.select("id_a", "id_b").distinct().collect()
    }


def test_streaming_matches_batch_banding(spark, tmp_path):
    docs = corpus(spark, SF)  # has planted near+exact duplicates
    src = str(tmp_path / "src")
    # several files → several micro-batches; split unaligned with the
    # planted duplicate pairs so pair members straddle batches
    docs.withColumn("_f", F.col("doc_id") % 3).repartition(
        "_f"
    ).drop("_f").write.parquet(src)

    batch_pairs = _pairs(streaming_candidate_pairs(docs, streaming=False))
    assert batch_pairs, "fixture corpus should yield candidates"

    stream_in = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_candidate_pairs(stream_in, streaming=True)
        .writeStream.format("memory")
        .queryName("neardup_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _pairs(spark.table("neardup_out"))
    assert got == batch_pairs


def test_streaming_resend_emits_no_self_pair(spark, tmp_path):
    import pandas as pd  # noqa: F401

    rows = [(1, "a b c d e f g"), (1, "a b c d e f g")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "src2")
    df.repartition(2).write.parquet(src)
    stream_in = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_candidate_pairs(stream_in, streaming=True)
        .writeStream.format("memory")
        .queryName("neardup_resend")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("neardup_resend").count() == 0


def test_streaming_string_ids_roundtrip(spark, tmp_path):
    """The id_col contract covers non-long ids: string ids must flow
    through the stateful emitter and back out typed as strings (the
    hardcoded-long schema crashed this; r6 review)."""
    docs = corpus(spark, SF).select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("sid"),
        "text",
    )
    src = str(tmp_path / "src")
    docs.coalesce(2).write.parquet(src)

    batch_pairs = _pairs(
        streaming_candidate_pairs(docs, id_col="sid", streaming=False)
    )
    assert batch_pairs and all(
        isinstance(a, str) and a.startswith("doc-") for a, _ in batch_pairs
    )
    stream_in = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_candidate_pairs(stream_in, id_col="sid", streaming=True)
        .writeStream.format("memory")
        .queryName("neardup_sid_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _pairs(spark.table("neardup_sid_out")) == batch_pairs
