"""Running per-key distinct-count sketch on a stream, built on
Spark 4's transformWithState API (the typed-state successor to
applyInPandasWithState): each key holds its HyperLogLog registers in a
ValueState and emits an updated estimate every micro-batch.

Where `events_windowed_hll` is the WINDOWED form (a plain streaming
max-aggregate — no custom state), this is the RUNNING form: "how many
distinct users has each event type seen so far", updated continuously,
with state bounded at m integers per key forever. The bucket/rho
columns are computed by the SAME stateless expressions as the batch
register build (operators/sketch.hll_registers), so the stream and the
batch twin can never disagree on a register value — the parity test
asserts register-exact agreement across micro-batch splits.

API notes (public Spark 4.1 surface): `StatefulProcessor.init`
acquires typed state from the handle (`getValueState(name, schema)`),
`handleInputRows(key, pandas_iter, timer_values)` yields pandas
frames, and the query runs via
`df.groupBy(key).transformWithStateInPandas(processor, output_schema,
"Update", "None")`.

Environment note: transformWithState's Python state server speaks a
protobuf wire protocol — running the STREAMING path requires the
`protobuf` package (`from google.protobuf import descriptor` inside
pyspark's transform_with_state_driver_worker), which this container
does not ship. `running_distinct_estimate(streaming=True)` raises a
clear ImportError up front when protobuf is absent; the processor
logic itself is pure Python over pandas batches and is covered by
tests driving it against a fake state handle, and the batch twin is
fully tested — on a cluster with protobuf installed the streaming
path runs as written.

`running_distinct_foreach_batch` is the protobuf-LESS streaming form:
foreachBatch folds each micro-batch's (key, bucket, rho) maxima into
a versioned parquet register table (HllRegisterStore — the plain-
parquet stand-in for a Delta MERGE on (key, bucket)), so the running-
estimate contract is proven on a REAL stream in this container
(tests/test_stream_hll.py streams N micro-batches and matches the
batch twin after every one).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..operators.sketch import (
    HLL_ALPHA,
    HLL_M,
    hll_bucket_rho_exprs,
    hll_estimate_expr,
)


def _output_schema(key_type: str) -> str:
    """transformWithState output schema with the key's ACTUAL type —
    a hardcoded `key string` failed (or silently diverged from the
    batch twin) for any non-string key column (r6 review)."""
    return f"key {key_type}, n_seen bigint, n_used int, est double"


def hll_bucket_rho(key_col: Column | str, id_col: Column | str) -> list[Column]:
    """The stateless (key, bucket, rho) projection: bucket/rho come
    from operators/sketch.hll_bucket_rho_exprs — the SAME expressions
    the batch register build uses, so parity is by construction."""
    bucket, rho = hll_bucket_rho_exprs(id_col)
    return [
        (F.col(key_col) if isinstance(key_col, str) else key_col)
        .alias("key"),
        bucket.alias("bucket"),
        rho.alias("rho"),
    ]


def hll_estimate_py(regs: list[int]) -> tuple[int, float]:
    """Python replay of operators/sketch.hll_estimate over one
    register vector: (n_used, est). Same alpha, same harmonic sum
    (exact powers of two), same linear-counting correction."""
    n_used = sum(1 for r in regs if r > 0)
    inv_sum = sum(2.0 ** -r for r in regs if r > 0)
    zeros = HLL_M - n_used
    raw = (HLL_ALPHA * HLL_M * HLL_M) / (inv_sum + zeros)
    if raw <= 2.5 * HLL_M and zeros > 0:
        return n_used, float(HLL_M) * math.log(float(HLL_M) / zeros)
    return n_used, raw


class HllRunningProcessor(StatefulProcessor):
    """Per-key running HLL: ValueState of m register ints + a seen
    counter; every batch folds the incoming (bucket, rho) rows with
    max and emits (key, n_seen, n_used, est). State is EXACTLY m
    integers + one long per key — never grows with cardinality, the
    whole point of the sketch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._regs = handle.getValueState("regs", "rhos array<int>")
        self._seen = handle.getValueState("seen", "n bigint")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        regs = (
            list(self._regs.get()[0]) if self._regs.exists()
            else [0] * HLL_M
        )
        seen = self._seen.get()[0] if self._seen.exists() else 0
        for pdf in rows:
            seen += len(pdf)
            for b, r in zip(pdf["bucket"].tolist(), pdf["rho"].tolist()):
                if r > regs[b]:
                    regs[b] = r
        self._regs.update((regs,))
        self._seen.update((seen,))
        n_used, est = hll_estimate_py(regs)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [seen],
                "n_used": [n_used],
                "est": [est],
            }
        )

    def close(self) -> None:
        pass


def running_distinct_estimate(
    df: DataFrame,
    key_col: str,
    id_col: str,
    streaming: bool = True,
) -> DataFrame:
    """Per-key running distinct estimate: streaming via
    transformWithStateInPandas (Update mode, no timers), batch twin
    via the identical stateless projection + groupBy max — the final
    streaming emission per key must equal the batch result exactly
    (registers are integers; the estimator is a pure function of
    them)."""
    # null ids are dropped, matching COUNT(DISTINCT) semantics (which
    # ignores NULL) — and a NULL would reach the processor as a NaN
    # bucket index and crash list indexing
    proj = df.filter(F.col(id_col).isNotNull()).select(
        *hll_bucket_rho(key_col, id_col)
    )
    if streaming:
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "transformWithState requires the protobuf package for "
                "its state-server protocol; install protobuf or use "
                "streaming=False (the batch twin)"
            ) from exc
        return proj.groupBy("key").transformWithStateInPandas(
            statefulProcessor=HllRunningProcessor(),
            outputStructType=_output_schema(
                df.schema[key_col].dataType.simpleString()
            ),
            outputMode="Update",
            timeMode="None",
        )
    reg = proj.groupBy("key", "bucket").agg(F.max("rho").alias("rho"))
    agg = reg.groupBy("key").agg(
        F.count("*").alias("n_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("inv_sum"),
    )
    n_seen = proj.groupBy("key").agg(F.count("*").alias("n_seen"))
    est = hll_estimate_expr(F.col("n_used"), F.col("inv_sum"))
    # null-SAFE key join (r8 review): groupBy keeps a NULL-key group
    # and the stateful processor emits it, but the plain inner join
    # here rejected null=null — the batch twin silently lost the group
    # and the module's stream/batch-agreement contract broke on it
    return (
        agg.join(n_seen, agg["key"].eqNullSafe(n_seen["key"]))
        .select(
            agg["key"].alias("key"),
            "n_seen",
            F.col("n_used").cast("int").alias("n_used"),
            est.alias("est"),
        )
    )


# ---------------------------------------------------------------------------
# foreachBatch twin — the protobuf-less streaming path
# ---------------------------------------------------------------------------

class HllRegisterStore:
    """Versioned parquet register table backing the foreachBatch form
    of the running per-key HLL — the streaming path that needs NO
    state-server (and therefore no protobuf): each micro-batch folds
    its (key, bucket, rho) maxima and per-key seen counts into the
    store, and the running estimate is a pure read of the current
    version.

    Layout: `<path>/v{N}/regs` (key, bucket, rho) and
    `<path>/v{N}/seen` (key, n_seen) parquet, plus `<path>/_CURRENT`
    (JSON {version, epoch}) committed LAST via atomic rename — a crash
    mid-fold leaves _CURRENT pointing at the previous complete
    version. Folding batch epoch E is recorded in _CURRENT; a replayed
    epoch (foreachBatch redelivers the last batch after restart) is
    skipped, so n_seen never double-counts — exactly-once folds on an
    at-least-once delivery. Register merge is idempotent anyway (max),
    seen-counts are not; the epoch gate covers both.

    Scale: state is ≤ m rows per key regardless of cardinality; the
    per-batch fold shuffles (key, bucket) — sketch-sized, never
    input-sized. On a real deployment the same fold is one Delta/
    Iceberg MERGE on (key, bucket); plain versioned parquet keeps the
    contract runnable anywhere. Old versions are pruned to
    `keep_versions` (floor 2): a DataFrame returned by `estimates()`
    reads its parquet LAZILY, so it stays valid only until
    `keep_versions - 1` further folds land — consume (collect/write)
    an estimate within that grace window, or raise `keep_versions` to
    cover slower readers; a reader that outlives the window fails
    loudly with FileNotFound rather than silently mixing versions."""

    def __init__(self, path: str, keep_versions: int = 2) -> None:
        self.path = path
        # floor 2: keep_versions=1 would let the very next fold delete
        # the version an estimates() reader is still lazily holding
        self.keep = max(2, keep_versions)

    def _current(self, spark) -> tuple[int, int, str | None]:
        """(version, last folded epoch, run id); (0, -1, None) empty.
        Reads through the Hadoop FileSystem API (versioned.py) so the
        gate lives on the SAME filesystem as the register parquet —
        the prior os.* version silently pinned the store to the
        driver's local disk (the r7-advice defect class, fixed here
        alongside the IVF layout)."""
        from ..versioned import current_meta

        cur = current_meta(spark, self.path)
        if not cur:
            return 0, -1, None
        return int(cur["version"]), int(cur["epoch"]), cur.get("run_id")

    def fold(
        self,
        batch_df: DataFrame,
        key_col: str,
        id_col: str,
        epoch_id: int,
        run_id: str | None = None,
    ) -> bool:
        """Fold one micro-batch; returns False when the epoch was
        already folded (restart replay).

        The replay gate keys on (run_id, epoch_id): foreachBatch epoch
        numbering is monotonic only WITHIN one checkpoint lineage, so a
        store reused under a FRESH checkpoint restarts epochs at 0 — on
        the old epoch-only gate every batch hit `epoch <= last` and the
        store silently froze (r5 review). `run_id` identifies the
        checkpoint lineage (running_distinct_foreach_batch passes its
        checkpoint dir); a changed run_id resets the gate. Callers that
        fold manually without a run_id get a LOUD error on a
        non-monotonic epoch instead of a silent skip."""
        import posixpath

        from ..versioned import commit_version, version_dir

        spark = batch_df.sparkSession
        ver, last_epoch, last_run = self._current(spark)
        if run_id is not None and run_id == last_run:
            if epoch_id <= last_epoch:
                return False
        elif run_id is None and epoch_id <= last_epoch:
            raise ValueError(
                f"non-monotonic epoch {epoch_id} <= last folded "
                f"{last_epoch} with no run_id: pass the checkpoint "
                "lineage's run_id to distinguish a restart replay "
                "(skipped) from a new stream over a reused store "
                "(folded under the new run_id)"
            )
        proj = batch_df.filter(F.col(id_col).isNotNull()).select(
            *hll_bucket_rho(key_col, id_col)
        )
        delta_regs = proj.groupBy("key", "bucket").agg(
            F.max("rho").alias("rho")
        )
        delta_seen = proj.groupBy("key").agg(F.count("*").alias("n_seen"))
        if ver > 0:
            base = version_dir(self.path, ver)
            old_regs = spark.read.parquet(posixpath.join(base, "regs"))
            old_seen = spark.read.parquet(posixpath.join(base, "seen"))
            new_regs = (
                old_regs.unionByName(delta_regs)
                .groupBy("key", "bucket")
                .agg(F.max("rho").alias("rho"))
            )
            new_seen = (
                old_seen.unionByName(delta_seen)
                .groupBy("key")
                .agg(F.sum("n_seen").cast("long").alias("n_seen"))
            )
        else:
            new_regs = delta_regs
            new_seen = delta_seen.select(
                "key", F.col("n_seen").cast("long").alias("n_seen")
            )
        nxt = version_dir(self.path, ver + 1)
        new_regs.write.mode("overwrite").parquet(posixpath.join(nxt, "regs"))
        new_seen.write.mode("overwrite").parquet(posixpath.join(nxt, "seen"))
        # commit + prune through the shared versioned layout: only the
        # versions at the retention edge are checked (+2 crash slack —
        # see commit_version's comment), so a long-running stream never
        # rescans from v1 each fold (the r6 quadratic-stat finding
        # stays fixed inside commit_version)
        commit_version(
            spark, self.path, ver + 1,
            extra={"epoch": epoch_id, "run_id": run_id},
            keep_versions=self.keep,
        )
        return True

    def estimates(self, spark) -> DataFrame:
        """(key, n_seen, n_used, est) from the current version — the
        identical estimator expression as the batch twin, so the
        foreachBatch stream and `running_distinct_estimate(...,
        streaming=False)` over the same prefix of rows agree exactly."""
        import posixpath

        from ..versioned import version_dir

        ver, _, _ = self._current(spark)
        if ver == 0:
            raise FileNotFoundError(f"no folded registers under {self.path}")
        base = version_dir(self.path, ver)
        regs = spark.read.parquet(posixpath.join(base, "regs"))
        seen = spark.read.parquet(posixpath.join(base, "seen"))
        agg = regs.groupBy("key").agg(
            F.count("*").alias("n_used"),
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("inv_sum"),
        )
        est = hll_estimate_expr(F.col("n_used"), F.col("inv_sum"))
        # null-safe: fold() stores a NULL-key group (groupBy keeps it);
        # a plain inner join here could never surface it again — state
        # paid for, result silently missing (r8 review)
        return agg.join(seen, agg["key"].eqNullSafe(seen["key"])).select(
            agg["key"].alias("key"),
            "n_seen",
            F.col("n_used").cast("int").alias("n_used"),
            est.alias("est"),
        )


def _checkpoint_run_id(spark, checkpoint_dir: str) -> str:
    """Lineage identity of a streaming checkpoint: the query id Spark
    persists in `<checkpoint>/metadata` at stream start (before the
    first batch). Recreating the checkpoint dir regenerates the id, so
    it distinguishes "same lineage, replayed epoch" from "new lineage
    at the same path, epochs restarting at 0". Falls back to the path
    if the metadata is unreadable (pre-start call in a unit test).

    Read through the checkpoint's OWN filesystem (r7 review): a
    driver-local open() on an hdfs:// checkpoint always failed, so the
    gate silently fell back to the PATH — which stays equal when the
    dir is wiped and remade, re-freezing the store exactly like the r5
    bug this id lookup exists to prevent."""
    import json
    import posixpath

    from py4j.protocol import Py4JJavaError

    from ..versioned import read_small_bytes

    try:
        data = read_small_bytes(
            spark, posixpath.join(checkpoint_dir, "metadata")
        )
        if data is None:
            return checkpoint_dir
        return str(json.loads(data.decode("utf-8"))["id"])
    except (ValueError, KeyError, Py4JJavaError):
        return checkpoint_dir


def running_distinct_foreach_batch(
    stream_df: DataFrame,
    key_col: str,
    id_col: str,
    registers_path: str,
    checkpoint_dir: str,
    keep_versions: int = 2,
):
    """Protobuf-less streaming form of the running per-key distinct
    estimate: foreachBatch folds each micro-batch into an
    HllRegisterStore — runs end-to-end in any container, no
    transformWithState state server. Returns the started
    StreamingQuery; read the running estimates with
    `HllRegisterStore(registers_path).estimates(spark)`, consuming
    each estimate within `keep_versions - 1` subsequent folds (see
    HllRegisterStore's pruning contract).

    Same stateless (bucket, rho) projection as both other forms, so
    all three agree register-exactly on the same input prefix."""
    store = HllRegisterStore(registers_path, keep_versions)

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        # run_id = the streaming query id from the checkpoint's metadata
        # file: epoch numbering is monotonic per checkpoint LINEAGE, and
        # the query id is regenerated whenever the checkpoint dir is
        # recreated — unlike the dir PATH, which stays equal when the
        # dir is wiped and remade at the same location (e.g. /tmp after
        # reboot) and would freeze the gate exactly like the r5 bug
        # (review finding). Restart from the SAME checkpoint keeps the
        # id (replay → skip); any fresh checkpoint changes it (→ fold).
        store.fold(
            batch_df, key_col, id_col, epoch_id,
            run_id=_checkpoint_run_id(batch_df.sparkSession, checkpoint_dir),
        )

    return (
        stream_df.writeStream.foreachBatch(_fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
