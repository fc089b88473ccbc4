"""Fixture-regen canary for the remaining ROUND(SUM(money-product), 2)
sites (r9 verdict item 7): a 4dp rational sum lands on a .xx5 half-way
tie exactly when its exact integer representation ends in 50, and on a
tie Spark's round (HALF_UP on the shortest decimal repr) and DuckDB's
ROUND (x*100, round-half-away in binary) disagree on ~9% of tie
doubles — surfacing as a mysterious driver hash-mismatch after any
fixture regeneration.

When first run (r10) this canary found LIVE ties in q1 (group N/F at
sf0.001 and sf0.1), q3, q10, q15 and q11 (three EMITTED per-part ties
at sf0.01, plus a float HAVING threshold) — all green only by
accumulation-order luck — so those sites were CONVERTED to the
exact-cents single-division pattern (queries._rev_exact /
_REV_UNITS_SQL; q5/q6 opportunistically with them; q11's cut is now an
integer comparison) and left the tied class entirely. The rows below
cover the three sites that stayed conventional (q7, q9, q19): each
emits ALL its groups, so the all-groups tie check below is exactly
the emitted-row check, and each is clean on every shipped fixture. If
a row ever fails: that query's sum now sits exactly on a half-cent
boundary — convert it to the exact-cents pattern too (see
q1_pricing_summary for the shape).

Sites WITHOUT canary rows, and why they cannot structurally tie:
  * exact-cents converted sites (q1, q3, q5, q6, q10, q11, q15): no
    rounding left — identical doubles by construction (q11's HAVING
    cut is an integer comparison too).
  * ROUND(SUM(x), 2) of plain 2dp money (o_totalprice, acctbal,
    l_extendedprice alone, o_totalprice*integer-weight): a sum of 2dp
    values is 2dp — never a half-way case at 2dp.
  * events.value sums: value is an arbitrary double (verified: not
    2dp), so a tie needs the sum to BE the exact double .xx5 —
    measure-zero, not a rational-structure risk.
  * q17's SUM/7.0: same arbitrary-quotient class.
"""

from __future__ import annotations

import pytest

from goflow2clickhouse_spark.oracle import duck_connect

from conftest import SF_ORACLE

# exact integer units: cents = 2dp scaled 1e2; rev-type products are
# 1e4 units (cents x integer percent), charge is 1e6
_E = "CAST(round(l_extendedprice * 100) AS HUGEINT)"
_D = "CAST(round(l_discount * 100) AS HUGEINT)"
_T = "CAST(round(l_tax * 100) AS HUGEINT)"
_Q = "CAST(round(l_quantity) AS HUGEINT)"
_RP = "CAST(round(p_retailprice * 100) AS HUGEINT)"
_REV4 = f"{_E} * (100 - {_D})"

# (site, tie-modulus, exact-integer-sum SQL with the site's real
#  filters and grouping; each returns one row per group: key, s)
_SITES = [
    (
        "q7_volume_shipping.revenue",
        100,
        f"""SELECT n1.n_name || '/' || n2.n_name || '/' ||
                   CAST(EXTRACT(year FROM l_shipdate) AS VARCHAR) AS grp,
                   SUM({_REV4}) AS s
            FROM supplier
              JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1""",
    ),
    (
        "q9_product_profit.sum_profit",
        100,
        f"""SELECT n_name || '/' ||
                   CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS grp,
                   SUM({_REV4} - {_RP} * {_Q} * 10) AS s
            FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1""",
    ),
    (
        "q19_discounted_revenue.revenue",
        100,
        f"""SELECT 'global' AS grp, SUM({_REV4}) AS s
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)""",
    ),
]


@pytest.mark.parametrize(
    "site,mod,sql", _SITES, ids=[s[0] for s in _SITES]
)
def test_no_money_product_sum_sits_on_a_rounding_tie(site, mod, sql):
    con = duck_connect(SF_ORACLE)
    half = mod // 2
    ties = con.execute(
        f"SELECT grp, s FROM ({sql}) t "
        f"WHERE ((s % {mod}) + {mod}) % {mod} = {half}"
    ).fetchall()
    assert not ties, (
        f"{site}: sum(s) lands exactly on a half-way rounding tie for "
        f"group(s) {ties[:5]} on fixture {SF_ORACLE} — Spark/DuckDB "
        "ROUND disagree on ~9% of tie doubles; convert this site to "
        "the exact-cents pattern (see this file's module docstring)"
    )


def test_money_inputs_are_exact_2dp():
    """The canary's integer arithmetic assumes the money/percent
    columns are exact 2dp decimals stored as doubles — if a regen
    breaks that (e.g. full-double prices), every site above silently
    leaves the structural-tie class and the canary must be retired or
    reworked, not trusted."""
    con = duck_connect(SF_ORACLE)
    for col, tbl in [
        ("l_extendedprice", "lineitem"),
        ("l_discount", "lineitem"),
        ("l_tax", "lineitem"),
        ("p_retailprice", "part"),
    ]:
        n = con.execute(
            f"SELECT COUNT(*) FROM {tbl} "
            f"WHERE abs({col} * 100 - round({col} * 100)) > 1e-6"
        ).fetchone()[0]
        assert n == 0, f"{tbl}.{col} is no longer exact-2dp ({n} rows)"
    nq = con.execute(
        "SELECT COUNT(*) FROM lineitem "
        "WHERE abs(l_quantity - round(l_quantity)) > 1e-6"
    ).fetchone()[0]
    assert nq == 0, "l_quantity is no longer integer-valued"
