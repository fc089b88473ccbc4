"""Differential test: every registered query with an oracle must match
DuckDB on row count, sorted column names, and order-insensitive value
hash — the same contract the driver's t2 gate applies at sf0.01.
"""

from __future__ import annotations

import pytest

from goflow2clickhouse_spark.oracle import compare, duck_connect
from goflow2clickhouse_spark.plans import registry

SPECS = registry()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
NO_ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = SPECS[name]
    df = spec.spark(spark, sf_dir)
    res = compare(name, df, spec.oracle, duck)
    assert res.columns_match, (
        f"{name}: column mismatch spark={res.spark_cols} oracle={res.oracle_cols}"
    )
    assert res.spark_rows == res.oracle_rows, (
        f"{name}: rows spark={res.spark_rows} oracle={res.oracle_rows}"
    )
    assert res.hash_match, f"{name}: value hash mismatch; diff={res.sample_diff}"


def test_every_registered_query_has_an_oracle():
    """Since r6 (approx_distinct_customers restructured to an
    error-bound-flag output) the registry carries ZERO no-oracle rows —
    every query is value-hash-checked against DuckDB. A new query
    without an oracle must be a deliberate, documented exception, not
    an accident: this test makes the regression loud."""
    assert NO_ORACLE_NAMES == [], (
        f"queries registered without oracles: {NO_ORACLE_NAMES}"
    )


def test_canonicalization_type_tags_strings():
    """A string cell whose TEXT is literally '[x]' / 'td:60.0' / '␀' /
    'nan' must never hash like the list ['x'] / a timedelta / NULL /
    NaN (r7 advice: list canonicalization was not type-tagged, so a
    string-vs-list engine divergence could hash as a false PASS).
    Numerics stay untagged so int 2 ≡ Decimal('2') ≡ 2.0 still match
    across engines."""
    import datetime
    from decimal import Decimal

    from goflow2clickhouse_spark.oracle import _canon_value

    assert _canon_value("[x]") != _canon_value(["x"])
    assert _canon_value("td:60.0") != _canon_value(
        datetime.timedelta(seconds=60)
    )
    assert _canon_value("␀") != _canon_value(None)
    assert _canon_value("nan") != _canon_value(float("nan"))
    assert _canon_value("deadbeef") != _canon_value(bytes.fromhex("deadbeef"))
    # cross-engine numeric equivalence is preserved
    assert _canon_value(2) == _canon_value(2.0) == _canon_value(Decimal("2"))
    # and strings still equal strings
    assert _canon_value("x") == _canon_value("x")


def test_canonicalization_decimal_normalizes_like_float():
    """Decimal('123.40') / Decimal('1E+2') must hash like the equal
    double — str() kept trailing zeros and exponent forms (r7 review)."""
    from decimal import Decimal

    from goflow2clickhouse_spark.oracle import _canon_value

    assert _canon_value(Decimal("123.40")) == _canon_value(123.4)
    assert _canon_value(Decimal("1E+2")) == _canon_value(100.0) == "100"
    assert _canon_value(Decimal("2")) == _canon_value(2) == "2"


def test_canonicalization_decimal_exact_above_float_range():
    """Above 2^53 float(Decimal) is lossy, so two genuinely different
    big DECIMAL sums collapsed to one canonical string — a false PASS
    (r7 advice). Exact canonicalization: distinct big decimals stay
    distinct, an integral DECIMAL still equals the same-valued BIGINT,
    and values inside the float-exact range keep the double parity."""
    from decimal import Decimal

    from goflow2clickhouse_spark.oracle import _canon_value

    a = Decimal(2**53)
    b = Decimal(2**53) + 1
    assert float(a) == float(b)  # the collapse the old path suffered
    assert _canon_value(a) != _canon_value(b)
    # integral big decimal ≡ the same big int (cross-engine BIGINT/DECIMAL)
    big = 10**20 + 7
    assert _canon_value(Decimal(big)) == _canon_value(big)
    assert _canon_value(Decimal("1E+20")) == _canon_value(10**20)
    # non-integral big decimal: exact positional form, no exponent
    assert _canon_value(Decimal("9007199254740993.5")) == "9007199254740993.5"
    assert _canon_value(-a) != _canon_value(-b)
    # inside the float-exact range nothing changed
    assert _canon_value(Decimal("123.40")) == _canon_value(123.4)
    # Decimal specials route like float specials
    assert _canon_value(Decimal("NaN")) == _canon_value(float("nan"))
    assert _canon_value(Decimal("Infinity")) == _canon_value(float("inf"))
    assert _canon_value(Decimal("-Infinity")) == _canon_value(float("-inf"))


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
)
def test_dsir_quantization_boundary_margin(spark, sf):
    """DSIR's lr_micro is FLOOR(float-LN-ratio x 1e6): the per-doc
    weights are exact integer dot products AFTER quantization, but the
    256 bucket values themselves hinge on Spark's and DuckDB's LN
    agreeing near an integer micro-boundary — the rounding-tie class
    that flipped quality_classifier_scores at sf0.1 in r6 (r7 verdict
    item 4). Assert every bucket's pre-floor value sits >= 1e-6 micro
    (1e-12 relative — ~500x double ULP at this magnitude) from an
    integer boundary at every fixture SF, so fixture or formula drift
    fails LOUDLY here before an engine divergence can silently flip a
    FLOOR in the driver differential."""
    import math

    from pyspark.sql import functions as F

    from goflow2clickhouse_spark.plans.corpus_queries import (
        _DSIR_B,
        _DSIR_TGT,
        _dsir_doc_bucket_counts,
    )

    dfb = _dsir_doc_bucket_counts(spark, sf)
    bt = (
        dfb.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("r"),
            F.sum(
                F.when(F.col("source") == _DSIR_TGT, F.col("cnt")).otherwise(0)
            ).alias("t"),
        )
        .collect()
    )
    # only populated buckets exist in EITHER engine's bt relation (the
    # oracle groups over the same dfb); require enough for non-vacuity
    assert len(bt) > 0.75 * _DSIR_B
    rr = float(sum(row["r"] for row in bt))
    tt = float(sum(row["t"] for row in bt))
    worst = 1.0
    for row in bt:
        v = (
            math.log((row["t"] + 1.0) / (tt + float(_DSIR_B)))
            - math.log((row["r"] + 1.0) / (rr + float(_DSIR_B)))
        ) * 1000000.0
        margin = min(v - math.floor(v), math.ceil(v) - v)
        worst = min(worst, margin)
    assert worst >= 1e-6, (
        f"bucket log-ratio within {worst} micro of an integer boundary "
        f"at {sf} — engines may disagree on the FLOOR; reformulate or "
        "adjust the quantization scale"
    )


def test_canonicalization_struct_and_map_cells():
    """Spark returns STRUCT cells as Row, DuckDB as dict — they must
    canonicalize identically (key-order-insensitively), stay distinct
    from strings/lists, and keep key/value boundaries injective (r8
    review: Row fell into the list branch, dict into str(v))."""
    from pyspark.sql import Row

    from goflow2clickhouse_spark.oracle import _canon_value

    assert _canon_value(Row(a=1, b="x")) == _canon_value({"a": 1, "b": "x"})
    assert _canon_value({"b": "x", "a": 1}) == _canon_value({"a": 1, "b": "x"})
    assert _canon_value({"a": 1}) != _canon_value(["a", 1])
    assert _canon_value({"a": 1}) != _canon_value("{'a': 1}")
    # boundary injectivity: a ':' inside a value can't re-split
    assert _canon_value({"a": "b:s:c"}) != _canon_value({"a:s:b": "c"})
    # nested structs recurse
    assert _canon_value(Row(o=Row(p=2))) == _canon_value({"o": {"p": 2}})


def test_canonicalization_branch_renderings_are_disjoint():
    """Every _canon_value branch carries a distinguishing tag (r8
    advice): without one, a fallback-branch object whose str() reads
    "{a:1}" hashed identically to the genuine struct {'a': 1}, and a
    bytes cell's bare hex collided with a BIGINT of the same digits —
    theoretical false PASSes."""
    from goflow2clickhouse_spark.oracle import _canon_value

    class _Oddball:
        def __init__(self, s):
            self._s = s

        def __str__(self):
            return self._s

    # fallback str(v) can't imitate a struct, list, string, or numeric
    assert _canon_value(_Oddball("{a:1}")) != _canon_value({"a": 1})
    assert _canon_value(_Oddball("l:[1]")) != _canon_value([1])
    assert _canon_value(_Oddball("s:x")) != _canon_value("x")
    assert _canon_value(_Oddball("7")) != _canon_value(7)
    # bytes vs same-digit integer (hex '1234' == str(1234))
    assert _canon_value(bytes.fromhex("1234")) != _canon_value(1234)
    # numerics still share the untagged space across engines
    from decimal import Decimal

    assert _canon_value(7) == _canon_value(7.0) == _canon_value(Decimal(7))
