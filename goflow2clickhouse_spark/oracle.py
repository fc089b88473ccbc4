"""Differential-test harness: run a Spark plan and its DuckDB oracle on
the same parquet fixtures and compare canonicalized results — the same
row-count + column-name + order-insensitive value-hash contract the
driver applies (SURVEY.md §5.2 layer 2).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .schema import FIXTURE_TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with every fixture registered as a view, the
    same names the driver pre-registers."""
    con = duckdb.connect()
    # SQL-escape the path (r9 review): an unescaped single quote in
    # sf_dir (legal in directory names) broke every CREATE VIEW
    safe_dir = sf_dir.replace("'", "''")
    for name in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{safe_dir}/{name}.parquet')"
        )
    return con


def _is_row(v: object) -> bool:
    """Spark Row without importing it at call frequency: Row is the
    only tuple subclass with asDict in these results."""
    return isinstance(v, tuple) and hasattr(v, "asDict")


def _canon_value(v: object) -> str:
    """Canonicalize one cell so Spark and DuckDB values hash alike."""
    import decimal

    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, int):
        # explicit branch (ints rode the untyped fallback before it
        # grew its "o:" tag): digit strings stay the shared untagged
        # numeric space (int 2 ≡ Decimal 2 ≡ 2.0)
        return str(v)
    if isinstance(v, decimal.Decimal):
        # inside the float-exact range, route through the float path:
        # str(Decimal('123.40')) is '123.40' / str(Decimal('1E+2')) is
        # '1E+2', neither of which matches an equal double's canonical
        # form — the numeric-equivalence contract (int 2 ≡ Decimal 2 ≡
        # 2.0) held only for trailing-zero-free decimals before (r7
        # review). ABOVE 2^53 float(v) is lossy, so two genuinely
        # different big DECIMAL sums could collapse to one canonical
        # string (false PASS — r7 advice): canonicalize those exactly
        # instead — integral values as int strings (matching the int
        # path's str(v), so a BIGINT on one engine still equals the
        # same-valued DECIMAL on the other), the rest as plain
        # positional decimal strings.
        if v.is_nan():
            return "nan"
        if v.is_infinite():
            return "inf" if v > 0 else "-inf"
        if v == v.to_integral_value():
            # ONE rule for every integral numeric at every magnitude
            # (shared with the int and float paths): a BIGINT on one
            # engine always hashes like the same-valued DECIMAL/double
            # on the other. The r8 review caught the misaligned first
            # cut (int-string above 2^53, float below): integral
            # BIGINT-vs-DECIMAL in [1e15, 2^53) hashed differently —
            # a false-FAIL window.
            return str(int(v))
        if abs(v) < 2**53:
            v = float(v)
        else:
            return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        # round FIRST, then test integrality on the rounded value (r9
        # review): testing the raw float put values within the 1e-9
        # tolerance of an integer on the WRONG side of the integral
        # collapse — engine A's exact 1.0 hashed "1" while engine B's
        # 0.99999999999 hashed "1.0", a false FAIL at exactly the
        # values the tolerance exists to absorb (and 1e-12 / -1e-12 /
        # 0.0 rendered three different ways). int() also normalizes
        # -0.0. Integral doubles stay ≡ BIGINT ≡ integral DECIMAL at
        # any magnitude (round is identity once ulp > 1e-9).
        r = round(v, 9)
        if r == int(r):
            return str(int(r))
        return repr(r)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        # tagged like the containers below (r8 advice class): a bare
        # hex rendering is all digits for e.g. b'\x12\x34', colliding
        # with the BIGINT 1234's canonical form
        return "b:" + v.hex()
    if _is_row(v):
        # Spark STRUCT cells arrive as Row (a tuple subclass) while
        # DuckDB returns dict — Row fell into the list branch and the
        # dict into str(v), a guaranteed false FAIL on equal structs
        # (r8 review); canonicalize both through the dict form
        v = v.asDict()
    if isinstance(v, dict):
        # key order is engine/row-dependent (Python dicts preserve
        # insertion order) — sort by canonical key; ':' is escaped in
        # both halves so key/value boundaries can never be re-split
        # ambiguously ({'a': 'b:s:c'} vs {'a:s:b': 'c'})
        items = sorted(
            (_esc(_canon_value(k)).replace(":", "\\:"),
             _esc(_canon_value(val)).replace(":", "\\:"))
            for k, val in v.items()
        )
        # container renderings carry type tags (r8 advice): '{'/'}'
        # are not escaped by _esc, so an untagged dict form could be
        # imitated by a fallback-branch object whose str() happened to
        # read "{a:1}" — a theoretical false PASS. With every branch
        # tagged ("s:" str, "m:" map, "l:" list, "b:" bytes, "td:"
        # timedelta, "o:" fallback) and numerics confined to
        # digit/inf/nan spellings, no two branches can render
        # identically.
        return "m:{" + ",".join(f"{k}:{val}" for k, val in items) + "}"
    if isinstance(v, (list, tuple)):
        # inner values escape their own delimiters so ["a,b"] can
        # never collide with ["a","b"] (the cell-level _esc then
        # escapes again — injective both ways); "l:" tag per the dict
        # branch's rule
        return "l:[" + ",".join(_esc(_canon_value(x)) for x in v) + "]"
    if isinstance(v, _dt.timedelta):
        return f"td:{v.total_seconds()}"
    if isinstance(v, str):
        # type tag (r7 advice): an untagged string whose TEXT is
        # literally '[x]' / 'td:60.0' / '␀' / 'nan' canonicalized
        # identically to the list ['x'] / a timedelta / NULL / NaN, so
        # a string-vs-structured engine divergence could hash as a
        # false PASS. The tag applies ONLY to str — numerics/Decimal
        # still share the untagged space so int 2 ≡ Decimal 2 ≡ 2.0
        # keeps matching across engines.
        return "s:" + v
    # fallback for types with no branch of their own: tagged so an
    # arbitrary str(v) can never imitate a tagged string, container,
    # or numeric rendering (r8 advice)
    return "o:" + str(v)


def _esc(canon: str) -> str:
    """Escape the cell/list delimiters inside a canonicalized value:
    un-escaped joins let different row shapes collide — ('x|y', 'z')
    and ('x', 'y|z') both canonicalized to 'x|y|z', so a real engine
    divergence that shifted delimiter-containing text between adjacent
    columns hashed as a false PASS (r6 review). Backslash first, then
    the structural characters."""
    return (
        canon.replace("\\", "\\\\")
        .replace("|", "\\|")
        .replace(",", "\\,")
        .replace("[", "\\[")
    )


def _canon_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    """Sort columns by name, then canonicalize + sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols_sorted = [columns[i] for i in order]
    out = sorted(
        "|".join(_esc(_canon_value(row[i])) for i in order) for row in rows
    )
    return cols_sorted, out


@dataclass
class DiffResult:
    name: str
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    hash_match: bool
    spark_cols: list[str]
    oracle_cols: list[str]
    sample_diff: list[str]

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.columns_match
            and self.hash_match
        )


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
) -> DiffResult:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    sc, s_canon = _canon_rows(s_cols, s_rows)
    oc, o_canon = _canon_rows(o_cols, o_rows)
    h_s = hashlib.sha256("\n".join(s_canon).encode()).hexdigest()
    h_o = hashlib.sha256("\n".join(o_canon).encode()).hexdigest()

    sample: list[str] = []
    if h_s != h_o:
        # multiset difference, not set difference: a mismatch caused
        # only by duplicate-row multiplicity must still produce a
        # non-empty sample
        from collections import Counter

        s_ctr, o_ctr = Counter(s_canon), Counter(o_canon)
        sample = [
            f"spark-only: {r}" for r in sorted((s_ctr - o_ctr).elements())[:3]
        ] + [
            f"oracle-only: {r}" for r in sorted((o_ctr - s_ctr).elements())[:3]
        ]
    return DiffResult(
        name=name,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        columns_match=sc == oc,
        hash_match=h_s == h_o,
        spark_cols=sc,
        oracle_cols=oc,
        sample_diff=sample,
    )
