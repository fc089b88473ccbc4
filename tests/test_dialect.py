"""ClickHouse-dialect shim tests: textual translation + execution
equivalence against native Spark expressions."""

from __future__ import annotations

from goflow2clickhouse_spark.functions.dialect import translate


def test_translate_simple():
    assert translate("uniq(x)") == "approx_count_distinct(x)"
    assert translate("uniqExact(x)") == "count(DISTINCT x)"
    assert translate("toStartOfMinute(ts)") == "date_trunc('minute', ts)"
    assert translate("bitAnd(tcp_flags, 2)") == "(tcp_flags & 2)"
    assert translate("intDiv(a, b)") == "(a div b)"
    assert translate("quantile(0.5)(x)") == "percentile_approx(x, 0.5)"
    assert translate("quantileExact(0.9)(x)") == "percentile(x, 0.9)"


def test_translate_nested():
    got = translate("toStartOfMinute(toDateTime(time_received))")
    assert got == "date_trunc('minute', to_timestamp(time_received))"
    got = translate("uniqExact(bitAnd(a, b))")
    assert got == "count(DISTINCT (a & b))"


def test_translated_sql_executes(spark):
    df = spark.createDataFrame(
        [(3232235777, 6, 1700000000), (167772161, 17, 1700000042)],
        "ip bigint, proto bigint, t bigint",
    )
    df.createOrReplaceTempView("t_dialect")
    out = spark.sql(
        translate(
            "SELECT IPv4NumToString(ip) AS ip_s, "
            "toDate(toDateTime(t)) AS d, "
            "bitAnd(proto, 2) AS p2 FROM t_dialect ORDER BY ip"
        )
    ).collect()
    assert out[0].ip_s == "10.0.0.1"
    assert out[1].ip_s == "192.168.1.1"
    assert str(out[0].d) == "2023-11-14"
    assert out[0].p2 == 0 and out[1].p2 == 2


def test_ipv4_roundtrip_via_dialect(spark):
    out = spark.sql(
        translate("SELECT IPv4StringToNum(IPv4NumToString(3232235777)) AS n")
    ).collect()
    assert out[0].n == 3232235777


def test_halfmd5_value_parity(spark):
    """halfMD5 must equal ClickHouse's value: big-endian UInt64 of the
    first 8 MD5 bytes (as Spark's signed long, same 64 bits)."""
    import hashlib

    vals = ["", "abc", "10.0.0.1", "the quick brown fox"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    df.createOrReplaceTempView("half_md5_t")
    got = {
        r.s: r.h
        for r in spark.sql(
            "SELECT s, " + translate("halfMD5(s)") + " AS h FROM half_md5_t"
        ).collect()
    }
    for v in vals:
        u64 = int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "big")
        want = u64 - (1 << 64) if u64 >= (1 << 63) else u64  # signed long
        assert got[v] == want, f"halfMD5({v!r})"


def test_translate_aggregate_combinators():
    assert translate("argMax(a, b)") == "max_by(a, b)"
    assert translate("argMin(a, b)") == "min_by(a, b)"
    assert translate("any(x)") == "first(x, true)"  # CH any skips NULLs
    assert translate("anyLast(x)") == "last(x, true)"
    assert translate("medianExact(x)") == "percentile(x, 0.5)"
    assert translate("median(x)") == "percentile_approx(x, 0.5)"


def test_translate_date_family():
    assert translate("toStartOfMonth(d)") == "date_trunc('month', d)"
    assert translate("toUnixTimestamp(t)") == "unix_timestamp(t)"
    assert translate("fromUnixTimestamp(s)") == "timestamp_seconds(s)"
    assert translate("toDayOfWeek(d)") == "(((dayofweek(d) + 5) % 7) + 1)"
    assert translate("dateDiff('day', a, b)") == (
        "timestampdiff(day, date_trunc('day', a), date_trunc('day', b))"
    )  # boundary crossings, not elapsed units
    assert translate("toYear(d)") == "year(d)"


def test_translate_string_predicates():
    assert translate("position(h, n)") == "instr(h, n)"
    assert translate("empty(s)") == "(length(s) = 0)"
    assert translate("notEmpty(s)") == "(length(s) > 0)"


def test_iso_day_of_week_executes(spark):
    # 2023-11-13 was a Monday: ClickHouse toDayOfWeek = 1
    row = spark.sql(
        "SELECT " + translate("toDayOfWeek(DATE'2023-11-13')") + " AS dow"
        + ", " + translate("toDayOfWeek(DATE'2023-11-19')") + " AS sun"
    ).first()
    assert row.dow == 1 and row.sun == 7


def test_translate_conditional_aggregates():
    assert translate("countIf(proto = 6)") == "count_if(proto = 6)"
    assert translate("sumIf(bytes, d = 0)") == (
        "coalesce(sum(CASE WHEN d = 0 THEN bytes END), 0)"
    )  # 0 on an empty relation, like ClickHouse
    assert translate("avgIf(x, y > 1)") == "avg(CASE WHEN y > 1 THEN x END)"
    assert translate("ifNull(a, 0)") == "coalesce(a, 0)"


def test_translate_interval_bucketing():
    got = translate("toStartOfInterval(ts, INTERVAL 5 MINUTE)")
    assert got == "timestamp_seconds((unix_timestamp(ts) div 300) * 300)"
    got = translate("toStartOfFiveMinutes(ts)")
    assert got == "timestamp_seconds((unix_timestamp(ts) div 300) * 300)"
    got = translate("toStartOfInterval(ts, INTERVAL 2 HOURS)")
    assert got == "timestamp_seconds((unix_timestamp(ts) div 7200) * 7200)"


def test_translate_date_parts():
    assert translate("toHour(ts)") == "hour(ts)"
    assert translate("toYYYYMM(ts)") == "cast(date_format(ts, 'yyyyMM') as int)"


def test_column_fns_intdiv_truncates(spark):
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.functions.dialect import CLICKHOUSE_COLUMN_FNS

    df = spark.createDataFrame([(7, 2), (-7, 2), (9, 3)], "a long, b long")
    out = df.select(
        CLICKHOUSE_COLUMN_FNS["intDiv"](F.col("a"), F.col("b")).alias("d")
    ).collect()
    assert [r.d for r in out] == [3, -3, 3]  # toward zero, like intDiv


# ---- property-based: translator structure preservation ---------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_IDENT = st.text(alphabet="abcxyz_", min_size=1, max_size=6)


@settings(max_examples=100, deadline=None)
@given(_IDENT, _IDENT)
def test_translate_balanced_parens_and_idempotent_passthrough(a, b):
    """Translation preserves paren balance, and SQL without ClickHouse
    spellings passes through byte-identical."""
    src = f"SELECT uniq({a}), bitAnd({a}, {b}), sumIf({a}, {b} > 0) FROM t"
    out = translate(src)
    assert out.count("(") == out.count(")")
    plain = f"SELECT {a}, count(*) FROM t WHERE {b} > 1 GROUP BY {a}"
    assert translate(plain) == plain


@settings(max_examples=50, deadline=None)
@given(_IDENT)
def test_translate_nested_calls_inside_out(x):
    """Nested ClickHouse calls translate at every level."""
    out = translate(f"uniqExact(toStartOfMinute(toDateTime({x})))")
    assert out == f"count(DISTINCT date_trunc('minute', to_timestamp({x})))"


def test_quantiles_plural_and_nested_args():
    """quantiles(p1,p2,...)(x) — the plural combinator — maps to an
    array of levels; nested calls inside either group survive the
    paren-balancing scanner (the old regex corrupted them)."""
    from goflow2clickhouse_spark.functions.dialect import translate

    assert "percentile_approx(bytes, array(0.5, 0.9))" in translate(
        "SELECT quantiles(0.5, 0.9)(bytes) FROM flows")
    assert "percentile(length(name), array(0.25, 0.75))" in translate(
        "SELECT quantilesExact(0.25, 0.75)(length(name)) FROM t")
    assert "percentile_approx(cast(x as bigint), 0.95)" in translate(
        "SELECT quantile(0.95)(toUInt64(x)) FROM t")


def test_uniq_family_variants():
    from goflow2clickhouse_spark.functions.dialect import translate

    got = translate(
        "SELECT uniqCombined(u), uniqHLL12(v), uniq(w), uniqExact(z) FROM t")
    assert got.count("approx_count_distinct") == 3
    assert "count(DISTINCT z)" in got


def test_plural_quantiles_executes(spark):
    """The rewritten plural form must actually run on Spark SQL and
    return one array of the requested levels."""
    from goflow2clickhouse_spark.functions.dialect import translate

    spark.range(100).createOrReplaceTempView("_dialect_q")
    row = spark.sql(
        translate("SELECT quantilesExact(0.0, 1.0)(id) AS qs FROM _dialect_q")
    ).collect()[0]
    assert list(row.qs) == [0.0, 99.0]


def test_translate_quote_aware_scanning():
    """Literals containing commas/parens must pass through intact, and
    function spellings INSIDE literals must not rewrite (r6 review —
    the blind scanners corrupted both)."""
    from goflow2clickhouse_spark.functions.dialect import translate

    assert translate("SELECT countIf(msg = 'a,b') FROM t") == (
        "SELECT count_if(msg = 'a,b') FROM t"
    )
    assert translate("SELECT ifNull(x, '(') FROM t") == (
        "SELECT coalesce(x, '(') FROM t"
    )
    assert translate("SELECT 'position(a,b)' FROM t") == (
        "SELECT 'position(a,b)' FROM t"
    )
    assert translate("SELECT ifNull(x, 'it''s, ok') FROM t") == (
        "SELECT coalesce(x, 'it''s, ok') FROM t"
    )
    assert translate(
        "SELECT quantile(0.5)(x), 'quantile(0.9)(y)' FROM t"
    ) == "SELECT percentile_approx(x, 0.5), 'quantile(0.9)(y)' FROM t"


def test_translate_rejects_wrong_arity():
    """str.format silently discarded extra args (countIf(x, cond)
    dropped the condition); translate must refuse instead — except
    forms with a real multi-arg meaning, which translate properly."""
    import pytest as _pytest

    from goflow2clickhouse_spark.functions.dialect import translate

    # the -If combinator over count(x): counts non-null x where cond
    assert translate("SELECT countIf(x, proto=6) FROM t") == (
        "SELECT count(CASE WHEN proto=6 THEN x END) FROM t"
    )
    with _pytest.raises(ValueError, match="ifNull"):
        translate("SELECT ifNull(x) FROM t")
    with _pytest.raises(ValueError, match="uniq"):
        translate("SELECT uniq(a, b) FROM t")
    with _pytest.raises(ValueError, match="dateDiff"):
        translate("SELECT dateDiff('day', a) FROM t")


def test_translate_backslash_escaped_quote_in_literal():
    """ClickHouse literals also escape quotes as \\' — the r6 scanner
    handled only '' doubling, so a \\' flipped the literal-parity state
    and corrupted everything after it (r7 advice)."""
    # the literal must pass through intact AND the call still rewrites
    assert translate(r"SELECT ifNull(x, 'it\'s, ok') FROM t") == (
        r"SELECT coalesce(x, 'it\'s, ok') FROM t"
    )
    # a function spelled AFTER a backslash-escaped literal still
    # rewrites (the old parity count thought it was inside a literal)
    assert translate(r"SELECT 'a\'b', uniq(x) FROM t") == (
        r"SELECT 'a\'b', approx_count_distinct(x) FROM t"
    )
    # argument splitting: a comma inside a \'-escaped literal must not
    # split countIf's single argument into two
    assert translate(r"SELECT countIf(msg = 'a\',b') FROM t") == (
        r"SELECT count_if(msg = 'a\',b') FROM t"
    )
    # paren balancing: a ')' inside a \'-escaped literal must not close
    # the call early
    assert translate(r"SELECT ifNull(x, '\')') FROM t") == (
        r"SELECT coalesce(x, '\')') FROM t"
    )


def test_callable_rules_reject_extra_arguments():
    """Callable rules previously sliced args[:k] and silently ignored
    extras — IPv4StringToNum(a, b) translated over `a` alone with no
    error (r7 review). All callable rules now enforce registered
    arities, like the template rules."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="argument"):
        translate("SELECT IPv4StringToNum(a, b) FROM t")
    with _pytest.raises(ValueError, match="argument"):
        translate("SELECT dateDiff('minute', a, b, 'UTC') FROM t")
    with _pytest.raises(ValueError, match="argument"):
        translate("SELECT countIf(a, b, c) FROM t")


def test_datediff_counts_boundary_crossings(spark):
    """ClickHouse dateDiff counts unit-boundary crossings; Spark
    timestampdiff counts complete elapsed units — 23:00 to 01:00 next
    day must be 1 day, not 0 (r8 review)."""
    from goflow2clickhouse_spark.functions.dialect import translate

    sql = translate(
        "SELECT dateDiff('day', t1, t2) AS d, dateDiff('hour', t1, t3) AS h "
        "FROM tdd"
    )
    spark.createDataFrame(
        [("2024-01-01 23:00:00", "2024-01-02 01:00:00",
          "2024-01-01 23:59:00")],
        "t1s string, t2s string, t3s string",
    ).selectExpr(
        "cast(t1s as timestamp) t1", "cast(t2s as timestamp) t2",
        "cast(t3s as timestamp) t3",
    ).createOrReplaceTempView("tdd")
    row = spark.sql(sql).collect()[0]
    assert row["d"] == 1   # one midnight crossed, 2h elapsed
    assert row["h"] == 0   # same hour bucket, 59min elapsed


def test_aggregate_if_and_any_null_semantics(spark):
    """countIf/sumIf return 0 on an empty relation (ClickHouse), and
    any/anyLast skip NULLs (r8 review)."""
    from goflow2clickhouse_spark.functions.dialect import (
        CLICKHOUSE_COLUMN_FNS,
        translate,
    )

    spark.createDataFrame(
        [(None, 1), ("x", 2), ("y", 3)], "s string, n long"
    ).createOrReplaceTempView("tany")
    row = spark.sql(translate(
        "SELECT any(s) AS a, anyLast(s) AS al, "
        "countIf(n > 99) AS c0, sumIf(n, n > 99) AS s0 FROM tany "
        "WHERE n > 0"
    )).collect()[0]
    assert row["a"] == "x"          # NULL skipped
    assert row["al"] == "y"
    empty = spark.sql(translate(
        "SELECT countIf(n > 0) AS c, sumIf(n, n > 0) AS s FROM tany "
        "WHERE n < 0"
    )).collect()[0]
    assert empty["c"] == 0 and empty["s"] == 0  # not NULL

    from pyspark.sql import functions as F
    df = spark.createDataFrame([(None,), ("z",)], "s string")
    got = df.agg(
        CLICKHOUSE_COLUMN_FNS["any"](F.col("s")).alias("a")
    ).collect()[0]
    assert got["a"] == "z"


def test_intdiv_column_fn_exact_above_2_53(spark):
    """The column-side intDiv must match the textual rule's exact
    `div` — the double-divide form rounded 2^53+1 (r8 review)."""
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.functions.dialect import (
        CLICKHOUSE_COLUMN_FNS,
        translate,
    )

    big = 2**53 + 1
    df = spark.createDataFrame([(big, 1), (-7, 2)], "a long, b long")
    col_fn = [
        r["q"] for r in df.select(
            CLICKHOUSE_COLUMN_FNS["intDiv"](F.col("a"), F.col("b")).alias("q")
        ).collect()
    ]
    df.createOrReplaceTempView("tdiv")
    sql_path = [
        r["q"] for r in spark.sql(
            translate("SELECT intDiv(a, b) AS q FROM tdiv")
        ).collect()
    ]
    assert col_fn == sql_path == [big, -3]


def test_nested_curried_quantile_translates(spark):
    """A curried quantile nested inside another's value argument must
    translate too, not pass through verbatim (r8 review)."""
    from goflow2clickhouse_spark.functions.dialect import translate

    sql = translate(
        "SELECT quantileExact(0.9)(n - quantileExact(0.5)(n) * 0) AS q "
        "FROM tq"
    )
    assert "quantileExact" not in sql
    assert sql == (
        "SELECT percentile(n - percentile(n, 0.5) * 0, 0.9) AS q FROM tq"
    )
    # the un-nested form still executes (nested AGGREGATES are invalid
    # SQL in any engine — the translator's job is the rewrite)
    spark.range(1, 101).selectExpr("id AS n").createOrReplaceTempView("tq")
    flat = translate("SELECT quantileExact(0.9)(n) AS q FROM tq")
    assert abs(spark.sql(flat).collect()[0]["q"] - 90.1) < 1e-9
