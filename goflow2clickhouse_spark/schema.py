"""Single source of truth for schemas.

The reference declares the `flows` schema twice — a Go struct with `ch:`
tags (/root/reference/main.go:45-77) and ClickHouse DDL
(/root/reference/initdb/create_tables.sql:1-35) — which must be kept in
sync by hand. Here the schema lives once, in FLOWS_SCHEMA, and DDL /
views / transforms all derive from it.

Type mapping (SURVEY.md §1.3): ClickHouse unsigned ints widen to Spark
LongType (UInt32 losslessly; UInt64 documented as < 2^63 in practice —
epoch seconds, byte/packet counts never approach it). `type` is Int32 in
the DDL (create_tables.sql:3) → IntegerType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# ---------------------------------------------------------------------------
# flows — the reference's single fact table
# (column order mirrors initdb/create_tables.sql:3-33 / main.go:45-77)
# ---------------------------------------------------------------------------

FLOWS_COLUMNS: list[tuple[str, object]] = [
    ("type", IntegerType()),              # create_tables.sql:3,  main.go:46
    ("time_received", LongType()),        # create_tables.sql:4,  main.go:47
    ("sequence_num", LongType()),         # create_tables.sql:5,  main.go:48
    ("sampling_rate", LongType()),        # create_tables.sql:6,  main.go:49
    ("flow_direction", LongType()),       # create_tables.sql:7,  main.go:50
    ("sampler_address", StringType()),    # create_tables.sql:9,  main.go:52
    ("time_flow_start", LongType()),      # create_tables.sql:11, main.go:54
    ("time_flow_end", LongType()),        # create_tables.sql:12, main.go:55
    ("bytes", LongType()),                # create_tables.sql:14, main.go:57
    ("packets", LongType()),              # create_tables.sql:15, main.go:58
    ("src_addr", StringType()),           # create_tables.sql:17, main.go:60
    ("dst_addr", StringType()),           # create_tables.sql:18, main.go:61
    ("etype", LongType()),                # create_tables.sql:20, main.go:63
    ("proto", LongType()),                # create_tables.sql:22, main.go:65
    ("src_port", LongType()),             # create_tables.sql:24, main.go:67
    ("dst_port", LongType()),             # create_tables.sql:25, main.go:68
    ("forwarding_status", LongType()),    # create_tables.sql:27, main.go:70
    ("tcp_flags", LongType()),            # create_tables.sql:28, main.go:71
    ("icmp_type", LongType()),            # create_tables.sql:29, main.go:72
    ("icmp_code", LongType()),            # create_tables.sql:30, main.go:73
    ("fragment_id", LongType()),          # create_tables.sql:32, main.go:75
    ("fragment_offset", LongType()),      # create_tables.sql:33, main.go:76
]

FLOWS_SCHEMA = StructType(
    [StructField(name, dtype, nullable=False) for name, dtype in FLOWS_COLUMNS]
)

# Raw decoded-message schema — the subset of goflow's pb.FlowMessage the
# reference consumes (main.go:127-150). Addresses arrive as raw bytes
# (4 or 16) and are formatted to strings by the transform (main.go:133).
RAW_FLOW_SCHEMA = StructType(
    [
        StructField("Type", LongType(), False),
        StructField("TimeReceived", LongType(), False),
        StructField("SequenceNum", LongType(), False),
        StructField("SamplingRate", LongType(), False),
        StructField("FlowDirection", LongType(), False),
        StructField("SamplerAddress", BinaryType(), False),
        StructField("TimeFlowStart", LongType(), False),
        StructField("TimeFlowEnd", LongType(), False),
        StructField("Bytes", LongType(), False),
        StructField("Packets", LongType(), False),
        StructField("SrcAddr", BinaryType(), False),
        StructField("DstAddr", BinaryType(), False),
        StructField("Etype", LongType(), False),
        StructField("Proto", LongType(), False),
        StructField("SrcPort", LongType(), False),
        StructField("DstPort", LongType(), False),
        StructField("ForwardingStatus", LongType(), False),
        StructField("TCPFlags", LongType(), False),
        StructField("IcmpType", LongType(), False),
        StructField("IcmpCode", LongType(), False),
        StructField("FragmentId", LongType(), False),
        StructField("FragmentOffset", LongType(), False),
    ]
)


def flows_ddl(table: str = "flows", location: str | None = None) -> str:
    """Spark SQL DDL equivalent of initdb/create_tables.sql:1-35.

    The reference's ENGINE=Null is a pure ingestion funnel; in Spark the
    equivalent durable form is a parquet/Delta table fed by the streaming
    sink, so the DDL here is USING PARQUET.
    """
    cols = ",\n  ".join(
        f"{name} {dtype.simpleString().upper()}" for name, dtype in FLOWS_COLUMNS
    )
    loc = f"\nLOCATION '{location}'" if location else ""
    return f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n) USING PARQUET{loc}"


# ---------------------------------------------------------------------------
# Driver fixture tables (/root/testdata/sf*/ — FIXTURES.md §2)
# ---------------------------------------------------------------------------

FIXTURE_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("label", IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("source", StringType(), False),
        StructField("n_chars", LongType(), False),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        # parquet TIMESTAMP(NANOS, isAdjustedToUTC=false) → µs-floored
        # NTZ on Spark ≥4.1 (see load_table)
        StructField("ts", TimestampNTZType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("props", StringType(), False),
    ]
)


def local_rel(spark: SparkSession, data, schema) -> DataFrame:
    """Tiny driver-built relation planned as a JVM LocalRelation (r14
    optimization round): `spark.createDataFrame(rows)` plans a
    Scan ExistingRDD whose EVERY execution round-trips a Python worker
    — measured ~0.25-0.35 s fixed cost even for ONE row, and these
    relations (query vectors, rerank candidates, quantizer artifacts,
    planted fixtures, CIDR site maps) sit inside plans that execute
    once per query run. The pandas+Arrow path plans a LocalRelation
    evaluated in-JVM (sub-ms per execution, bit-identical doubles —
    Arrow round-trips IEEE754 exactly). Columns ride as object dtype
    so None stays SQL NULL (a float64 column would silently turn None
    into NaN). Any conversion refusal — including a real NaN in the
    data, which pandas construction would alias with None — falls back
    to the row path: slower, never wrong. Row width is checked against
    the schema (the row path raises there; the dict zip would silently
    truncate/pad — r14 review)."""
    import math

    import pandas as pd

    data = list(data)  # the try-branch must not consume a one-shot iterable
    if isinstance(schema, str):
        st = _DDL_SCHEMAS.get(schema)
        if st is None:
            st = spark.createDataFrame([], schema).schema
            _DDL_SCHEMAS[schema] = st
    else:
        st = schema
    cols = [f.name for f in st.fields]

    def _nan_free(v) -> bool:
        if isinstance(v, float):
            return not math.isnan(v)
        if isinstance(v, (list, tuple)):
            return all(_nan_free(x) for x in v)
        if isinstance(v, dict):
            return all(_nan_free(x) for x in v.values())
        return True

    try:
        if not all(
            len(r) == len(cols) and _nan_free(tuple(r)) for r in data
        ):
            raise ValueError("row width mismatch or NaN — row path")
        recs = [
            r.asDict(recursive=True)
            if hasattr(r, "asDict")
            else dict(zip(cols, r))
            for r in data
        ]
        pdf = pd.DataFrame.from_records(recs, columns=cols).astype(object)
        pdf = pdf.where(pd.notna(pdf), None)
        return spark.createDataFrame(pdf, st)
    except Exception:
        return spark.createDataFrame(data, schema)


# table-scan partition counts observed per (sf_dir, table, parallelism)
# — plan METADATA (an int from the parquet layout), not query results:
# every invocation still computes everything from the parquet inputs.
# The memo only skips re-planning the same scan to re-learn its split
# count (measured ~0.25 s per fresh DataFrame).
_SCAN_PARTS: dict[tuple[str, str, int], int] = {}

# parsed DDL-string schemas (local_rel): parsing via a throwaway empty
# DataFrame costs a JVM round-trip per call on the probe hot path —
# cache by the DDL text (r14 review)
_DDL_SCHEMAS: dict[str, "StructType"] = {}


def spread_small_scan(
    spark: SparkSession, sf_dir: str, df: DataFrame, table: str = "documents"
) -> DataFrame:
    """Scale-adaptive spread (r14 optimization round, guide §2.5 "input
    skew ... repartition immediately after the read"): consumers with
    CPU-heavy per-row work (md5 shingle hashing, regex/split,
    mapInPandas codecs and tokenizers, Arrow-UDF address formatting)
    otherwise run that work on as few tasks as the fixture parquet has
    row groups — one. Repartition ONLY when the named table's scan
    cannot feed the session's parallelism: on a production-sized table
    the scan has orders of magnitude more splits than cores and this
    is a no-op (an unconditional repartition there would COALESCE the
    scan onto #cores partitions, a scale bug). Call it AFTER any
    source filter, never before — a repartition below a filter blocks
    predicate pushdown to the scan."""
    par = spark.sparkContext.defaultParallelism
    key = (sf_dir, table, par)
    n_in = _SCAN_PARTS.get(key)
    if n_in is None:
        n_in = load_table(spark, sf_dir, table).rdd.getNumPartitions()
        _SCAN_PARTS[key] = n_in
    return df.repartition(par) if n_in < par else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown + pruning free.

    `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    default; it is read as epoch-nanos long and floored to microseconds
    — exactly DuckDB's internal µs truncation, so oracles agree.
    """
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType as _Long

        _key = "spark.sql.legacy.parquet.nanosAsLong"
        spark.conf.set(_key, "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, _Long):
            # legacy conf honored (Spark <=4.0): epoch-nanos long ->
            # floor to us. The conf stays SET on this branch: schema
            # resolution only covers planning, and the per-file footer
            # conversion re-reads the session conf at EXECUTION time —
            # restoring it after planning made a later collect() on
            # the returned DataFrame fail with 'Illegal Parquet type'
            # (r6 review). Cost of leaving it: other nanos-parquet
            # reads in the session also read nanos-as-long, which this
            # same branch handles. On >=4.1 the conf is ignored.
            return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        # Spark ≥4.1 reads TIMESTAMP(NANOS, isAdjustedToUTC=false)
        # natively as a µs-floored TIMESTAMP_NTZ — the same naive
        # wall-clock DuckDB produces, and the same type every other
        # fixture timestamp reads as; keep it
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view named after itself.

    Mirrors the oracle harness, which pre-registers the same names in
    DuckDB, so one SQL text can run on both engines.
    """
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
