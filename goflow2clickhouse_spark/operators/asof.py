"""As-of join — ClickHouse `ASOF JOIN` parity as a reusable operator.

Spark has no native as-of join. Two formulations exist:

1. equi-join on key + row_number over ts — simple, but it materializes
   every (probe row × candidate row) pair per key before the filter:
   quadratic in per-key density (kept only as the reference
   implementation in tests/test_asof.py).
2. **union-timeline** (this module): tag probe and reference rows,
   union them into one per-key timeline, sort once, and carry the
   nearest reference value across with last(..., ignorenulls) over an
   unbounded-preceding frame. One shuffle on the key, linear work in
   |probes| + |references| per key — the 100 TB shape.

Directions (both match ClickHouse/DuckDB ASOF LEFT JOIN semantics):
- backward: greatest ref ts <= probe ts; ties on ts resolved toward
  the LARGEST tie-break value;
- forward: smallest ref ts >= probe ts; ties resolved toward the
  SMALLEST tie-break value (the mirror).
Probes with no qualifying reference get NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _asof_join(
    probes: DataFrame,
    refs: DataFrame,
    key: str,
    probe_ts: str,
    ref_ts: str,
    value_cols: list[str],
    tie_break: str | None,
    order: list[Column],
) -> DataFrame:
    probe_cols = probes.columns
    clash = set(probe_cols) & set(value_cols)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with probe columns — "
            "alias one side before the as-of join"
        )
    if not value_cols:
        # a dynamically-computed empty list used to die as an opaque
        # IndexError below (r8 review)
        raise ValueError("value_cols must name at least one column")
    reserved = {"_k", "_ts", "_is_probe", "_tb", "_v", "_m"}
    res_clash = reserved & set(probe_cols)
    if res_clash:
        # internal scratch names — a probe column with one of them
        # duplicated columns deep inside the union with a baffling
        # AnalysisException (r8 review; value_cols got the clear error,
        # probe columns didn't)
        raise ValueError(
            f"probe columns {sorted(res_clash)} collide with the as-of "
            "join's internal scratch names — rename upstream"
        )
    tb = tie_break or value_cols[0]

    # NULL semantics (ClickHouse/DuckDB ASOF LEFT JOIN, and the
    # equi-join reference implementation): NULL never matches — a
    # null-key or null-ts REFERENCE can never qualify (filtered out;
    # Window.partitionBy would otherwise group null keys together and
    # the ts sort would slot a null-ts ref at one end of the
    # timeline, both producing phantom matches), and a null-key or
    # null-ts PROBE keeps its row with NULL value columns (routed
    # around the window entirely).
    probe_ok = F.col(probe_ts).isNotNull() & F.col(key).isNotNull()
    null_probes = probes.filter(~probe_ok)
    probes = probes.filter(probe_ok)
    refs = refs.filter(
        F.col(ref_ts).isNotNull() & F.col(key).isNotNull()
    )

    # the carried payload is ONE struct so a match is atomic — carrying
    # value columns independently could stitch together different
    # reference rows when some values are null. The struct is also the
    # FINAL window-order term: two reference rows fully tied on
    # (key, ts, tie_break) but differing in other value_cols would
    # otherwise carry a partition-order-dependent winner (r6 review) —
    # the struct's lexicographic field order makes the timeline total
    # (value_cols must stay orderable types; every in-repo caller's are)
    val_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    # a StructType OBJECT, not an assembled DDL string: names needing
    # quoting (spaces, colons) failed the string's parse path (r8)
    null_struct = F.lit(None).cast(
        StructType(
            [StructField(c, refs.schema[c].dataType) for c in value_cols]
        )
    )
    p = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(refs.schema[tb].dataType).alias("_tb"),
        *[F.col(c) for c in probe_cols],
        null_struct.alias("_v"),
    )
    r = refs.select(
        F.col(key).alias("_k"),
        F.col(ref_ts).alias("_ts"),
        F.lit(0).alias("_is_probe"),
        F.col(tb).alias("_tb"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_cols],
        val_struct.alias("_v"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = p.unionByName(r).select(
        "_is_probe",
        *probe_cols,
        F.last("_v", ignorenulls=True).over(w).alias("_m"),
    )
    matched = (
        carried.filter(F.col("_is_probe") == 1)
        .select(*probe_cols, *[F.col(f"_m.{c}").alias(c) for c in value_cols])
    )
    unmatched = null_probes.select(
        *probe_cols,
        *[
            F.lit(None).cast(refs.schema[c].dataType).alias(c)
            for c in value_cols
        ],
    )
    return matched.unionByName(unmatched)


def asof_join_backward(
    probes: DataFrame,
    refs: DataFrame,
    key: str,
    probe_ts: str,
    ref_ts: str,
    value_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For each probe row: the value_cols of the latest refs row with
    ref_ts <= probe_ts on the same key (NULL when none). Output: all
    probe columns + value_cols.

    Timeline order: ts ascending; references sort before probes at
    equal ts (ASOF is <=); among reference ties the largest tie-break
    sorts last, and last(ignorenulls) carries the latest non-null
    struct forward."""
    return _asof_join(
        probes, refs, key, probe_ts, ref_ts, value_cols, tie_break,
        order=[F.col("_ts").asc(), F.col("_is_probe").asc(),
               F.asc_nulls_first("_tb"), F.asc_nulls_first("_v")],
    )


def asof_join_forward(
    probes: DataFrame,
    refs: DataFrame,
    key: str,
    probe_ts: str,
    ref_ts: str,
    value_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For each probe row: the value_cols of the EARLIEST refs row with
    ref_ts >= probe_ts on the same key (NULL when none) — the mirror
    of asof_join_backward, same single-shuffle linear plan.

    Timeline order: ts DESCENDING, so walking the frame forward moves
    backward in time and the last reference seen before a probe is the
    smallest ts >= probe. References still sort before probes at equal
    ts (>= includes equality); among reference ties the SMALLEST
    tie-break sorts last and wins."""
    return _asof_join(
        probes, refs, key, probe_ts, ref_ts, value_cols, tie_break,
        order=[F.col("_ts").desc(), F.col("_is_probe").asc(),
               F.desc_nulls_first("_tb"), F.desc_nulls_first("_v")],
    )
