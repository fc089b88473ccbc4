"""Streaming exact dedup (streaming/dedupe.py): the watermarked
dropDuplicatesWithinWatermark path must emit exactly the batch-dedup
row set when duplicates are exact copies inside the horizon."""

from __future__ import annotations

import pyspark.sql.functions as F

from goflow2clickhouse_spark.schema import load_table
from goflow2clickhouse_spark.streaming.dedupe import stream_exact_dedup

SF = "/root/testdata/sf0.001"


def _planted(spark):
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    return ev.unionByName(ev.filter(F.col("event_id") % 4 == 0))


def test_stream_dedup_matches_batch(spark, tmp_path):
    batch = _planted(spark)
    src = str(tmp_path / "src")
    batch.write.parquet(src)

    stream_in = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        stream_exact_dedup(stream_in, ["event_id"], streaming=True)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        tuple(r)
        for r in spark.table("dedup_out")
        .select("event_id", "event_type", "value")
        .collect()
    }
    want = {
        tuple(r)
        for r in stream_exact_dedup(batch, ["event_id"], streaming=False)
        .select("event_id", "event_type", "value")
        .collect()
    }
    assert got == want
    # and dedup actually removed the planted copies
    n_src = batch.count()
    assert len(got) < n_src


def test_stream_dedup_state_bounded_semantics(spark, tmp_path):
    """A duplicate arriving AFTER the watermark horizon re-emits: the
    documented divergence from batch (state eviction is the point)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    batches = [
        # batch 1: first occurrence of key 1 (+ a second key)
        [(1, t0, "a"), (2, t0 + dt.timedelta(minutes=1), "b")],
        # batch 2: filler advances the watermark to ~t0+50m, past key
        # 1's eviction point (t0 + 10m horizon)
        [(3, t0 + dt.timedelta(hours=1), "filler")],
        # batch 3: duplicate of key 1 long after eviction
        [(1, t0 + dt.timedelta(hours=3), "a-again")],
    ]
    schema = "event_id long, ts timestamp_ntz, tag string"
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")
    # one availableNow pass per file against a shared checkpoint: the
    # watermark (and dedup state) persist across restarts, so each file
    # is its own micro-batch regardless of file-batching heuristics
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream_in = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_exact_dedup(
                stream_in, ["event_id"], watermark="10 minutes",
                streaming=True,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    tags = sorted(
        r.tag for r in spark.read.parquet(out).select("tag").collect()
    )
    # both occurrences of key 1 survive: state for it was evicted long
    # before the 3-hour-later duplicate arrived
    assert tags == ["a", "a-again", "b", "filler"]


# ---------------------------------------------------------------------------
# streaming incremental dedup: the crawl loop over the persisted band index
# ---------------------------------------------------------------------------

def _crawl_batches(spark):
    """(day0 corpus, [batch1, batch2]): batch1 carries a near-dup and a
    verbatim copy of day0 docs plus novel docs; batch2 near-dups a doc
    KEPT from batch1 — only visible if the fold appended it."""
    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    day0 = d.filter(F.col("doc_id") % 3 == 0)
    novel1 = d.filter(F.col("doc_id") % 3 == 1)
    b1 = (
        novel1
        .unionByName(d.filter(F.col("doc_id") % 30 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        ))
        .unionByName(d.filter(F.col("doc_id") % 60 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"), F.col("text"),
        ))
    )
    b2 = (
        d.filter(F.col("doc_id") % 3 == 2)
        .unionByName(d.filter(F.col("doc_id") % 30 == 1).select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        ))
    )
    return day0, [b1, b2]


def _expected_statuses(old, batch):
    """Batch-recompute twin of one fold: per-doc exact/near/unique of
    `batch` against `old` (exact beats near)."""
    from goflow2clickhouse_spark.operators.dedup import (
        incremental_neardup_pairs,
    )

    old_sha = old.select(F.sha2("text", 256).alias("_sha")).distinct()
    ex = {
        r["doc_id"]
        for r in batch.select("doc_id", F.sha2("text", 256).alias("_sha"))
        .join(old_sha, "_sha", "left_semi").select("doc_id").collect()
    }
    pairs = incremental_neardup_pairs(old, batch)
    nr = {r["id_b"] for r in pairs.select("id_b").collect()}
    return {
        r["doc_id"]: (
            "exact" if r["doc_id"] in ex
            else "near" if r["doc_id"] in nr else "unique"
        )
        for r in batch.select("doc_id").collect()
    }


def test_incremental_dedup_fold_matches_batch_recompute(spark, tmp_path):
    """Two folds of the crawl loop: each batch's statuses equal the
    batch-recompute twin against the ACCUMULATED kept corpus, and a
    replayed epoch is skipped without touching output or index."""
    from goflow2clickhouse_spark.plans.storage import write_band_index
    from goflow2clickhouse_spark.streaming.dedupe import (
        incremental_dedup_fold,
    )
    from goflow2clickhouse_spark.versioned import current_meta

    day0, (b1, b2) = _crawl_batches(spark)
    idx = str(tmp_path / "bandidx")
    out = str(tmp_path / "statuses")
    write_band_index(day0, idx)

    assert incremental_dedup_fold(b1, idx, out, 0, run_id="ck-A") is True
    got1 = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(out).collect()
    }
    want1 = _expected_statuses(day0, b1)
    assert got1 == want1
    assert {"exact", "near", "unique"} <= set(want1.values())

    kept1 = b1.join(
        spark.createDataFrame(
            [(k,) for k, v in want1.items() if v == "unique"], "doc_id bigint"
        ),
        "doc_id", "left_semi",
    )
    assert incremental_dedup_fold(b2, idx, out, 1, run_id="ck-A") is True
    got2 = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(out).collect()
        if r["doc_id"] in {x["doc_id"] for x in b2.select("doc_id").collect()}
    }
    want2 = _expected_statuses(day0.unionByName(kept1), b2)
    assert got2 == want2
    # batch2's planted near-dup targets a KEPT batch1 doc — the fold
    # proof that appends are being served
    assert any(
        k >= 3000000 and v == "near" for k, v in want2.items()
    )

    # replayed epoch: skipped, nothing changes
    n_rows = spark.read.parquet(out).count()
    meta = current_meta(spark, idx)
    assert incremental_dedup_fold(b2, idx, out, 1, run_id="ck-A") is False
    assert spark.read.parquet(out).count() == n_rows
    assert current_meta(spark, idx) == meta
    # no run_id + non-monotonic epoch: loud error, never silent skip
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-monotonic"):
        incremental_dedup_fold(b2, idx, out, 1)


def test_streaming_incremental_dedup_end_to_end(spark, tmp_path):
    """The crawl loop as a real stream: two parquet drops = two
    micro-batches; statuses accumulate and match the two manual folds."""
    import glob
    import shutil

    from goflow2clickhouse_spark.plans.storage import write_band_index
    from goflow2clickhouse_spark.streaming.dedupe import (
        streaming_incremental_dedup,
    )

    day0, batches = _crawl_batches(spark)
    idx = str(tmp_path / "bandidx")
    out = str(tmp_path / "statuses")
    indir = tmp_path / "drop"
    indir.mkdir()
    ckpt = str(tmp_path / "ck")
    write_band_index(day0, idx)

    def drop(n):
        chunk = str(indir / f"chunk{n}")
        batches[n].coalesce(1).write.mode("overwrite").parquet(chunk)
        for f in glob.glob(chunk + "/part-*.parquet"):
            shutil.copy(f, str(indir / f"batch{n}.parquet"))
        shutil.rmtree(chunk)

    drop(0)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir))
    )
    q = streaming_incremental_dedup(stream, idx, out, ckpt)
    try:
        q.processAllAvailable()
        want1 = _expected_statuses(day0, batches[0])
        got = {
            r["doc_id"]: r["status"] for r in spark.read.parquet(out).collect()
        }
        assert got == want1
        drop(1)
        q.processAllAvailable()
        kept1 = batches[0].join(
            spark.createDataFrame(
                [(k,) for k, v in want1.items() if v == "unique"],
                "doc_id bigint",
            ),
            "doc_id", "left_semi",
        )
        want = dict(want1)
        want.update(_expected_statuses(day0.unionByName(kept1), batches[1]))
        got = {
            r["doc_id"]: r["status"] for r in spark.read.parquet(out).collect()
        }
        assert got == want
    finally:
        q.stop()


def test_incremental_dedup_fold_torn_replay_is_idempotent(spark, tmp_path, monkeypatch):
    """Crash between the status write and the index commit (the one
    window the (run_id, epoch) gate cannot cover — two stores, one
    atomic commit): the replayed fold must leave out_path with exactly
    one status row per doc, not an appended duplicate set."""
    from goflow2clickhouse_spark.plans import storage as storage_mod
    from goflow2clickhouse_spark.streaming import dedupe as dedupe_mod
    from goflow2clickhouse_spark.plans.storage import write_band_index
    from goflow2clickhouse_spark.streaming.dedupe import incremental_dedup_fold

    day0, (b1, _b2) = _crawl_batches(spark)
    idx = str(tmp_path / "bandidx")
    out = str(tmp_path / "statuses")
    write_band_index(day0, idx)

    real_append = storage_mod.append_to_band_index

    def boom(*a, **k):
        raise RuntimeError("simulated crash before index commit")

    monkeypatch.setattr(storage_mod, "append_to_band_index", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        incremental_dedup_fold(b1, idx, out, 0, run_id="ck-T")
    torn_rows = spark.read.parquet(out).count()
    assert torn_rows == b1.count()  # status landed, index commit did not

    monkeypatch.setattr(storage_mod, "append_to_band_index", real_append)
    assert incremental_dedup_fold(b1, idx, out, 0, run_id="ck-T") is True
    got = {
        (r["doc_id"]): r["status"] for r in spark.read.parquet(out).collect()
    }
    assert spark.read.parquet(out).count() == b1.count()  # no double-emit
    assert got == _expected_statuses(day0, b1)


def test_incremental_dedup_fold_zero_kept_batch(spark, tmp_path):
    """A micro-batch where EVERY doc is an exact dup (zero kept — the
    realistic crawl steady state) must not poison the index: the fold
    commits the replay gate without an unreadable empty bands delta,
    and the NEXT batch still folds and probes normally (r7 advice)."""
    from goflow2clickhouse_spark.plans.storage import (
        incremental_neardup_pairs_indexed,
        write_band_index,
    )
    from goflow2clickhouse_spark.streaming.dedupe import incremental_dedup_fold
    from goflow2clickhouse_spark.versioned import current_meta

    day0, (b1, b2) = _crawl_batches(spark)
    idx = str(tmp_path / "bandidx_zero")
    out = str(tmp_path / "statuses_zero")
    write_band_index(day0, idx)

    # batch 0: verbatim copies of day0 docs → all "exact", zero kept
    all_dups = day0.limit(5).select(
        (F.col("doc_id") + 5000000).alias("doc_id"), "text"
    )
    assert incremental_dedup_fold(all_dups, idx, out, 0, run_id="ck-Z") is True
    statuses = {
        r["status"] for r in spark.read.parquet(out).collect()
    }
    assert statuses == {"exact"}
    meta = current_meta(spark, idx)
    assert meta.get("appends", 0) == 0          # no empty delta committed
    assert meta["epoch"] == 0 and meta["run_id"] == "ck-Z"  # gate advanced

    # replay of the zero-kept epoch: skipped by the gate
    assert incremental_dedup_fold(all_dups, idx, out, 0, run_id="ck-Z") is False

    # the index is still fully servable: batch 1 folds normally
    assert incremental_dedup_fold(b1, idx, out, 1, run_id="ck-Z") is True
    want1 = _expected_statuses(day0, b1)
    got1 = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(out).collect()
        if r["doc_id"] < 5000000
    }
    assert got1 == want1
    assert current_meta(spark, idx)["appends"] == 1
    # and a direct probe over base+delta still runs
    assert incremental_neardup_pairs_indexed(b2, idx).collect()
