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


def test_local_rel_plans_local_relation_and_keeps_nulls(spark):
    """local_rel (r14): tiny driver-built relations must plan as a JVM
    LocalRelation (the ExistingRDD shape pays a Python-worker round
    trip per execution), keep None as SQL NULL, and fall back — not
    silently rewrite — on inputs the Arrow path would alias."""
    import math

    from goflow2clickhouse_spark.schema import local_rel

    df = local_rel(spark, [(1, None), (2, 0.5)], "id long, x double")
    assert "LocalRelation" in df._jdf.queryExecution().optimizedPlan().toString()
    rows = {r["id"]: r["x"] for r in df.collect()}
    assert rows[1] is None and rows[2] == 0.5

    # a real NaN must survive as NaN (row-path fallback), not become NULL
    nan_df = local_rel(spark, [(1, float("nan"))], "id long, x double")
    [r] = nan_df.collect()
    assert r["x"] is not None and math.isnan(r["x"])

    # NaN nested in an array falls back too
    [r2] = local_rel(
        spark, [([1.0, float("nan")],)], "v array<double>"
    ).collect()
    assert math.isnan(r2["v"][1])

    # a mis-shaped tuple must raise (the row path's loud check), never
    # silently truncate or NULL-pad
    import pytest

    with pytest.raises(Exception):
        local_rel(spark, [(1, 2, 3)], "a long, b long").collect()

    # one-shot iterables are materialized before the try-branch
    gen_df = local_rel(spark, iter([(7, 1.5)]), "id long, x double")
    assert gen_df.collect()[0]["id"] == 7
