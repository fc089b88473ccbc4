"""Union-timeline as-of join operator: matches, misses, equal-ts
tie-breaks, atomic multi-column payloads."""

from __future__ import annotations

from goflow2clickhouse_spark.operators.asof import asof_join_backward


def test_asof_basic_and_miss(spark):
    probes = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 5), (3, 20, 50)],
        "pid long, k long, pts long",
    )
    refs = spark.createDataFrame(
        [(10, 50, 7, 0.5), (10, 99, 8, 0.8), (20, 60, 9, 0.9)],
        "k long, rts long, rid long, rv double",
    )
    out = {
        r.pid: (r.rid, r.rv)
        for r in asof_join_backward(
            probes, refs, "k", "pts", "rts", ["rid", "rv"], "rid"
        ).collect()
    }
    assert out[1] == (8, 0.8)      # latest ref at ts 99 <= 100
    assert out[2] == (None, None)  # no ref at or before ts 5
    assert out[3] == (None, None)  # ref at 60 > probe 50

def test_asof_equal_ts_and_ties(spark):
    probes = spark.createDataFrame([(1, 1, 100)], "pid long, k long, pts long")
    refs = spark.createDataFrame(
        [(1, 100, 3, 0.3), (1, 100, 4, 0.4), (1, 90, 9, 0.9)],
        "k long, rts long, rid long, rv double",
    )
    row = asof_join_backward(
        probes, refs, "k", "pts", "rts", ["rid", "rv"], "rid"
    ).first()
    # ref at equal ts IS eligible (<=); tie at ts=100 -> max rid wins,
    # and the payload is atomic (rid=4 comes with rv=0.4, never 0.3)
    assert (row.rid, row.rv) == (4, 0.4)


def test_asof_agrees_with_quadratic_reference(spark):
    """The retired equi-join + row_number formulation (quadratic per
    key: every probe x candidate pair materializes before ranking) is
    kept here only as a reference implementation; the linear
    union-timeline operator must agree with it row-for-row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    probes = spark.createDataFrame(
        [(i, i % 3, 10 * i) for i in range(1, 20)],
        "pid long, k long, pts long",
    )
    refs = spark.createDataFrame(
        [(k, 7 * j, 100 * k + j) for k in range(3) for j in range(25)],
        "k long, rts long, rid long",
    )

    linear = {
        r.pid: r.rid
        for r in asof_join_backward(
            probes, refs, "k", "pts", "rts", ["rid"], "rid"
        ).collect()
    }

    joined = probes.join(refs, "k", "left")
    w = Window.partitionBy("pid").orderBy(
        F.desc_nulls_last("rts"), F.desc_nulls_last("rid"))
    quadratic = {
        r.pid: r.rid
        for r in joined.filter((F.col("rts") <= F.col("pts")) | F.col("rts").isNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert linear == quadratic


def test_asof_rejects_column_collision(spark):
    import pytest as _pytest

    probes = spark.createDataFrame([(1, 1, 10)], "pid long, k long, pts long")
    refs = spark.createDataFrame([(1, 5, 2)], "k long, rts long, pid long")
    with _pytest.raises(ValueError, match="collide"):
        asof_join_backward(probes, refs, "k", "pts", "rts", ["pid"])


def test_asof_forward_basic_miss_and_ties(spark):
    from goflow2clickhouse_spark.operators.asof import asof_join_forward

    probes = spark.createDataFrame(
        [(1, 10, 40), (2, 10, 120), (3, 20, 70), (4, 10, 50)],
        "pid long, k long, pts long",
    )
    refs = spark.createDataFrame(
        [(10, 50, 7, 0.5), (10, 50, 8, 0.8), (10, 99, 9, 0.9),
         (20, 60, 1, 0.1)],
        "k long, rts long, rid long, rv double",
    )
    out = {
        r.pid: (r.rid, r.rv)
        for r in asof_join_forward(
            probes, refs, "k", "pts", "rts", ["rid", "rv"], "rid"
        ).collect()
    }
    assert out[1] == (7, 0.5)      # earliest ref >= 40 is ts 50; tie -> MIN rid
    assert out[2] == (None, None)  # no ref at or after 120
    assert out[3] == (None, None)  # ref at 60 < probe 70? no: 60 <= 70 fails >=
    assert out[4] == (7, 0.5)      # equal ts IS eligible (>=)


def test_asof_forward_agrees_with_quadratic_reference(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.operators.asof import asof_join_forward

    probes = spark.createDataFrame(
        [(i, i % 3, 10 * i) for i in range(1, 20)],
        "pid long, k long, pts long",
    )
    refs = spark.createDataFrame(
        [(k, 7 * j, 100 * k + j) for k in range(3) for j in range(25)],
        "k long, rts long, rid long",
    )
    linear = {
        r.pid: r.rid
        for r in asof_join_forward(
            probes, refs, "k", "pts", "rts", ["rid"], "rid"
        ).collect()
    }
    joined = probes.join(refs, "k", "left")
    w = Window.partitionBy("pid").orderBy(
        F.asc_nulls_last("rts"), F.asc_nulls_last("rid"))
    quadratic = {
        r.pid: r.rid
        for r in joined.filter((F.col("rts") >= F.col("pts")) | F.col("rts").isNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    # probes whose refs ALL fail the >= filter vanish from the quadratic
    # formulation entirely (the left join had matches, so no null-rts row
    # survives either); the operator correctly reports them as NULL
    assert linear == {pid: quadratic.get(pid) for pid in linear}
    assert any(v is None for v in linear.values())  # misses exercised


def test_asof_null_keys_and_timestamps_never_match(spark):
    """ASOF semantics (ClickHouse/DuckDB): NULL never matches — a
    null-key or null-ts probe keeps its row with NULL values, and a
    null-key or null-ts reference can never be carried into any
    probe."""
    from goflow2clickhouse_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    probes = spark.createDataFrame(
        [(1, 1, 100), (2, None, 100), (3, 1, None)],
        "pid long, k long, pts long",
    )
    refs = spark.createDataFrame(
        [(1, 50, 7), (None, 40, 8), (1, None, 9)],
        "k long, rts long, rid long",
    )
    back = {
        r.pid: r.rid
        for r in asof_join_backward(
            probes, refs, "k", "pts", "rts", ["rid"]
        ).collect()
    }
    # pid 1: only the valid (k=1, rts=50) ref qualifies — never the
    # null-key ref 8 or the null-ts ref 9
    assert back == {1: 7, 2: None, 3: None}

    fwd = {
        r.pid: r.rid
        for r in asof_join_forward(
            probes, refs, "k", "pts", "rts", ["rid"]
        ).collect()
    }
    assert fwd == {1: None, 2: None, 3: None}  # no ref with rts >= 100


def test_asof_full_tie_is_deterministic(spark):
    """Two reference rows fully tied on (key, ts, tie_break) but
    differing in another value column must carry a deterministic
    winner on any partitioning (the struct is the final order term)."""
    from goflow2clickhouse_spark.operators.asof import asof_join_backward

    refs_rows = [("k", 10, 5.0, 1), ("k", 10, 5.0, 9)]
    probes = spark.createDataFrame([("k", 20)], "key string, pts long")
    for parts in (1, 7):
        refs = spark.createDataFrame(
            refs_rows, "key string, rts long, price double, qty long"
        ).repartition(parts)
        out = asof_join_backward(
            probes, refs, "key", "pts", "rts", ["price", "qty"],
            tie_break="price",
        ).collect()
        assert len(out) == 1
        # struct order (price, qty): (5.0, 9) sorts last and is carried
        assert (out[0]["price"], out[0]["qty"]) == (5.0, 9), out


def test_asof_guards_reserved_and_empty(spark):
    """Probe columns colliding with internal scratch names, and an
    empty value_cols, must fail with clear errors (r8 review)."""
    import pytest as _pytest

    from goflow2clickhouse_spark.operators.asof import asof_join_backward

    probes = spark.createDataFrame(
        [(1, 10, "x")], "k long, t long, _ts string"
    )
    refs = spark.createDataFrame([(1, 5, 2.0)], "k long, t long, v double")
    with _pytest.raises(ValueError, match="scratch"):
        asof_join_backward(probes, refs, "k", "t", "t", ["v"])
    ok_probes = probes.drop("_ts")
    with _pytest.raises(ValueError, match="at least one"):
        asof_join_backward(ok_probes, refs, "k", "t", "t", [])
