"""CLI entry point: flag parsing, sink-spec dispatch, and an end-to-end
drain run (file source -> parquet sink) through main()."""

from __future__ import annotations

import pytest

from goflow2clickhouse_spark.__main__ import build_parser, make_sink


def test_parser_defaults_match_reference():
    a = build_parser().parse_args([])
    assert a.listen == "sflow://:6343,netflow://:2055"  # main.go:31 verbatim
    assert a.batchsize == 10_000                    # main.go:36
    assert a.batchmaxtime == "10 seconds"           # main.go:37


def test_sink_specs():
    assert make_sink("parquet:///tmp/x")
    assert make_sink("parquet-idempotent:///tmp/x")
    assert make_sink("partitioned:///tmp/x")
    assert make_sink("jdbc:clickhouse://h:8123/db#flows")
    with pytest.raises(ValueError, match="unknown sink"):
        make_sink("s3://nope")


def test_main_drains_file_source(spark, tmp_path, capsys):
    from goflow2clickhouse_spark.__main__ import main
    from goflow2clickhouse_spark.schema import RAW_FLOW_SCHEMA
    from tests.test_flows_transform import _raw_row

    src = tmp_path / "in"
    rows = [_raw_row(SequenceNum=i) for i in range(7)]
    spark.createDataFrame(rows, RAW_FLOW_SCHEMA).coalesce(1).write.parquet(str(src))
    out = tmp_path / "out"
    rc = main([
        "--listen", f"file://{src}",
        "--sink", f"parquet://{out}",
        "--checkpoint", str(tmp_path / "ck"),
        "--available-now",
    ])
    assert rc == 0
    assert spark.read.parquet(str(out)).count() == 7
