"""Schema module tests: the 22-column flows contract (SURVEY.md §1.3),
DDL generation (A15), fixture view registration."""

from __future__ import annotations

from goflow2clickhouse_spark.schema import (
    FIXTURE_TABLES,
    FLOWS_SCHEMA,
    RAW_FLOW_SCHEMA,
    flows_ddl,
    register_views,
)


def test_flows_schema_contract():
    names = [f.name for f in FLOWS_SCHEMA.fields]
    assert len(names) == 22
    assert names[0] == "type" and names[-1] == "fragment_offset"
    types = {f.name: f.dataType.simpleString() for f in FLOWS_SCHEMA.fields}
    assert types["type"] == "int"  # Int32 per create_tables.sql:3
    assert types["sampler_address"] == "string"
    assert types["bytes"] == "bigint"
    assert all(not f.nullable for f in FLOWS_SCHEMA.fields)


def test_raw_schema_mirrors_flows():
    # every flows column has a raw source field (projection is total)
    assert len(RAW_FLOW_SCHEMA.fields) == 22
    binaries = [f.name for f in RAW_FLOW_SCHEMA.fields
                if f.dataType.simpleString() == "binary"]
    assert binaries == ["SamplerAddress", "SrcAddr", "DstAddr"]


def test_flows_ddl_executes(spark, tmp_path):
    ddl = flows_ddl("flows_ddl_test", location=str(tmp_path / "flows_tbl"))
    assert "CREATE TABLE IF NOT EXISTS" in ddl and "USING PARQUET" in ddl
    spark.sql(ddl)
    try:
        cols = spark.table("flows_ddl_test").columns
        assert cols == [f.name for f in FLOWS_SCHEMA.fields]
    finally:
        spark.sql("DROP TABLE flows_ddl_test")


def test_register_views(spark, sf_dir):
    register_views(spark, sf_dir)
    for name in FIXTURE_TABLES:
        assert spark.table(name).count() > 0
    # events ts is a µs-floored timestamp: NTZ on Spark ≥4.1 (native
    # TIMESTAMP(NANOS) read), LTZ on older Spark via the legacy-conf path
    assert dict(spark.table("events").dtypes)["ts"] in (
        "timestamp_ntz", "timestamp"
    )
