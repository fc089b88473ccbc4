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


def test_log_flags_parity():
    """--loglevel/--logfmt (main.go:28-29 parity): defaults match the
    reference, levels map to log4j + python logging, and unknown
    levels are rejected like logrus would."""
    import logging

    from goflow2clickhouse_spark.__main__ import LOG_LEVELS

    a = build_parser().parse_args([])
    assert a.loglevel == "info"      # main.go:28 default
    assert a.logfmt == "normal"      # main.go:29 default
    a = build_parser().parse_args(["--loglevel", "warn", "--logfmt", "json"])
    assert LOG_LEVELS[a.loglevel] == ("WARN", logging.WARNING)
    with pytest.raises(SystemExit):  # unknown level rejected, like logrus
        build_parser().parse_args(["--loglevel", "loud"])


def test_logfmt_formatters_and_level_gating(capsys):
    """configure_logging wires a real stderr handler: json/plain
    formatting is observable, and the level GATES records — info is
    silenced under --loglevel error (the previously-dead Python half
    of the flag)."""
    import json

    from goflow2clickhouse_spark.__main__ import configure_logging

    log = configure_logging("info", "json")
    log.info("ingested", extra={"fields": {"rows": 7, "batches": 2}})
    line = capsys.readouterr().err.strip()
    assert json.loads(line) == {
        "msg": "ingested", "level": "info", "rows": 7, "batches": 2,
    }

    log = configure_logging("info", "normal")
    log.info("ingested", extra={"fields": {"rows": 7, "batches": 2}})
    assert capsys.readouterr().err.strip() == "ingested batches=2 rows=7"

    log = configure_logging("error", "normal")
    log.info("ingested", extra={"fields": {"rows": 7}})
    assert capsys.readouterr().err.strip() == ""  # gated
    log.error("boom")
    assert capsys.readouterr().err.strip() == "boom"  # error passes


def test_loglevel_reaches_spark_and_python(spark, tmp_path, capsys):
    """An end-to-end main() run with --loglevel error must set the
    package logger's level, leave the JVM log4j level at ERROR, and
    SUPPRESS the info-level 'ingested' status line."""
    import logging

    from goflow2clickhouse_spark.__main__ import main
    from goflow2clickhouse_spark.schema import RAW_FLOW_SCHEMA
    from tests.test_flows_transform import _raw_row

    src = tmp_path / "in"
    spark.createDataFrame(
        [_raw_row(SequenceNum=1)], RAW_FLOW_SCHEMA
    ).coalesce(1).write.parquet(str(src))
    rc = main([
        "--listen", f"file://{src}",
        "--sink", f"parquet://{tmp_path / 'out'}",
        "--checkpoint", str(tmp_path / "ck"),
        "--available-now",
        "--loglevel", "error", "--logfmt", "json",
    ])
    assert rc == 0
    assert (logging.getLogger("goflow2clickhouse_spark").level
            == logging.ERROR)
    assert "ingested" not in capsys.readouterr().err  # info gated
    jvm_level = (
        spark._jvm.org.apache.logging.log4j.LogManager.getRootLogger()
        .getLevel().toString()
    )
    assert jvm_level == "ERROR"
    spark.sparkContext.setLogLevel("WARN")  # restore for later tests


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


def test_main_jsonl_roundtrip(spark, tmp_path, capsys):
    """Process-level round trip of the reference's actual usage shape
    (main.go:207-262 — listen, decode, batch, insert) over the
    jsonl:// replay source: goflow2 JSON lines WITH junk mixed in go
    through main() to a parquet sink; good rows land, junk lines are
    dropped AND counted in the final metrics log line."""
    import json

    from goflow2clickhouse_spark.__main__ import main

    msgs = [
        {"Type": 1, "TimeReceived": 1700000000 + i, "SequenceNum": i,
         "SamplingRate": 1000, "FlowDirection": i % 2,
         "SamplerAddress": "10.0.0.1",
         "TimeFlowStart": 1700000000 + i, "TimeFlowEnd": 1700000060 + i,
         "Bytes": 500 + i, "Packets": 4,
         "SrcAddr": "192.168.1.%d" % (i + 1), "DstAddr": "10.1.0.1",
         "Etype": 2048, "Proto": 6, "SrcPort": 1000 + i, "DstPort": 443,
         "ForwardingStatus": 64, "TCPFlags": 16,
         "IcmpType": 0, "IcmpCode": 0,
         "FragmentId": 0, "FragmentOffset": 0}
        for i in range(6)
    ]
    d = tmp_path / "drop"
    d.mkdir()
    lines = [json.dumps(m) for m in msgs[:3]] + ["{not json", "[7]"] + [
        json.dumps(m) for m in msgs[3:]
    ]
    (d / "flows-0.jsonl").write_text("\n".join(lines) + "\n")

    out = tmp_path / "out"
    rc = main([
        "--listen", f"jsonl://{d}",
        "--sink", f"parquet://{out}",
        "--checkpoint", str(tmp_path / "ck"),
        "--available-now",
        "--logfmt", "json",
    ])
    assert rc == 0
    got = spark.read.parquet(str(out))
    assert got.count() == 6
    assert {r["src_addr"] for r in got.select("src_addr").collect()} == {
        "192.168.1.%d" % (i + 1) for i in range(6)
    }
    # the CLI's final status line reports the junk drop count
    err = capsys.readouterr().err
    status = [
        json.loads(ln) for ln in err.splitlines()
        if ln.startswith("{") and '"ingested"' in ln
    ]
    assert status, err
    # rows = RAW source rows (flows_rows_total counts numInputRows,
    # junk lines included); sink rows = rows - decode_dropped
    assert status[-1]["rows"] == 8
    assert status[-1]["decode_dropped"] == 2


def test_bench_stdout_line_fits_at_sixty_entries():
    """The driver keeps only the last 2,000 chars of bench output; the
    compact line must stay under the 1,600-char self-check even as the
    bench set grows (r7 verdict item 6: 1,453 chars at 46 entries).
    Project a worst-case 60-entry registry through the stdout shaping
    (2-decimal timings, top-40 cap + truncation marker) and pin the
    length."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    from goflow2clickhouse_spark.plans import registry

    # worst case from REALITY: the 60 longest names in the actual
    # registry (a synthetic-name projection would pin the wrong
    # constant), at 3-digit timings
    names = sorted(registry(), key=len, reverse=True)[:60]
    assert len(names) == 60
    timings = {n: 100.0 + i / 100.0 for i, n in enumerate(names)}
    ingest = {"rows": 1_000_000, "sec": 16.1234, "rows_per_sec": 62021.9}
    rec = bench._stdout_record(timings, ingest, 0.1)
    line = json.dumps(rec, separators=(",", ":"))
    assert len(rec["queries"]) == bench.STDOUT_QUERY_CAP
    assert rec["queries_truncated"] == 60 - bench.STDOUT_QUERY_CAP
    assert len(line) < 1600, len(line)
    # no truncation marker when everything fits
    rec_small = bench._stdout_record(dict(list(timings.items())[:10]), ingest, 0.1)
    assert "queries_truncated" not in rec_small
    assert len(rec_small["queries"]) == 10
    # the cap keeps the MOST EXPENSIVE queries (the informative ones)
    kept = set(rec["queries"])
    dropped = set(timings) - kept
    assert max(timings[n] for n in dropped) <= min(timings[n] for n in kept)


def test_plan_fingerprint_normalizes_lambda_ids():
    """PySpark lambda variable names come from a session-global
    counter, so the same plan printed later in a session carries
    different x_NN names — the r7 'plan CHANGED' drift flags were this
    artifact (r8 A/B). The fingerprint must treat them as equal."""
    import sys

    sys.path.insert(0, "/root/repo")
    import hashlib
    import re

    import bench

    class _FakePlan:
        def __init__(self, s):
            self._s = s

        def toString(self):
            return self._s

    class _FakeQE:
        def __init__(self, s):
            self._s = s

        def optimizedPlan(self):
            return _FakePlan(self._s)

    class _FakeJdf:
        def __init__(self, s):
            self._s = s

        def queryExecution(self):
            return _FakeQE(self._s)

    class _FakeDf:
        def __init__(self, s):
            self._jdf = _FakeJdf(s)

    a = _FakeDf(
        "Project [zip_with(xs#12, ys#4, lambdafunction((lambda x_112#7 * "
        "lambda y_10#2), lambda x_112#7, lambda y_10#2, false))]"
    )
    b = _FakeDf(
        "Project [zip_with(xs#99, ys#1, lambdafunction((lambda x_75#3 * "
        "lambda y_120#9), lambda x_75#3, lambda y_120#9, false))]"
    )
    c = _FakeDf(
        "Project [zip_with(xs#99, ys#1, lambdafunction((lambda x_75#3 + "
        "lambda y_120#9), lambda x_75#3, lambda y_120#9, false))]"
    )
    assert bench._plan_fingerprint(a) == bench._plan_fingerprint(b)
    assert bench._plan_fingerprint(a) != bench._plan_fingerprint(c)
    # the slot letter must SURVIVE normalization: x*x and x*y are
    # different plans (r8 review — erasing the slot collapsed them)
    d = _FakeDf(
        "Project [zip_with(xs#12, ys#4, lambdafunction((lambda x_112#7 * "
        "lambda x_112#7), lambda x_112#7, lambda y_10#2, false))]"
    )
    assert bench._plan_fingerprint(a) != bench._plan_fingerprint(d)
