"""The named analytical query inventory (SURVEY.md §2.B instantiated).

The reference delegates its entire query surface to ClickHouse SQL over
the `flows` table (evidence: initdb/create_tables.sql ships a queryable
schema + ENGINE=Null and the repo contains zero SELECTs). This module is
that surface, re-expressed as Spark DataFrame plans, each paired with an
ANSI/DuckDB oracle SQL string for differential testing.

Conventions (driver contract):
- every computed column is aliased IDENTICALLY in the Spark plan and the
  oracle SQL (the harness sorts columns by name before hashing);
- double-valued money/ratio aggregates are either EXACT single
  divisions of integer-unit sums (the r9/r10 exact-cents pattern —
  identical doubles by construction; see _rev_exact) or, where the sum
  cannot structurally tie (plain 2dp money), rounded identically in
  both engines (tests/test_round_tie_canary.py documents and polices
  the split);
- oracle sums over BIGINT are cast back to BIGINT (DuckDB widens to
  HUGEINT, Spark stays LongType);
- top-k queries always carry a unique tie-breaker in the sort so LIMIT
  is deterministic on both engines.

Scale notes (100 TB design intent) are in each query's docstring; the
broadcast hints mark joins whose build side is bounded (region=5,
nation=25 rows at every scale factor).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..schema import load_table
from .flows_view import FLOWS_WITH, flows_df


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = ()


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, bench: bool = False,
          tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, bench, tags)
        return fn
    return deco


def registry() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def _PCTL_SQL(p: float, name: str) -> str:
    """One leg of the exact order-statistics percentile replay over
    the `r` CTE (pri, c cents, rn, n): pos = 1 + p*(n-1) in doubles,
    linear interpolation between the straddling ranks — the identical
    IEEE expression the Spark side computes, so both engines emit the
    same double from the same integers (see price_percentiles)."""
    pos = f"(1.0 + {p} * CAST(n - 1 AS DOUBLE))"
    return (
        f"SUM(CASE WHEN rn = FLOOR({pos}) AND rn = CEIL({pos}) "
        f"THEN CAST(c AS DOUBLE) "
        f"WHEN rn = FLOOR({pos}) THEN c * (CEIL({pos}) - {pos}) "
        f"WHEN rn = CEIL({pos}) THEN c * ({pos} - FLOOR({pos})) END) "
        f"/ 100.0 AS {name}"
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Exact-cents revenue: SUM(price * (1 - discount)) computed as ONE
# integer sum (cents x integer percent, 1e4-scaled units) divided once,
# UNROUNDED — identical doubles on both engines by construction. The
# former ROUND(SUM(double), 2) convention sat on half-cent ties (exact
# 4dp sums end in ...50 at ~1/100 per group; the r10 canary found LIVE
# ties in q1/q3/q10/q15 on the shipped fixtures) where Spark round and
# DuckDB ROUND disagree on ~9% of tie doubles — a per-engine coin flip
# on the accumulated float sum. Sums ride decimal(20,0)→(30,0) so
# 100 TB-scale groups (~4e11 lineitems → ~2e18 units) stay exact where
# a long sum would near overflow. ONE definition each side, shared by
# every revenue-emitting query (q3/q5/q7/q9-adjacent family).
_REV_SQL = (
    "CAST(SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)"
    " * (100 - CAST(round(l_discount * 100) AS HUGEINT))) AS DOUBLE)"
    " / 10000.0"
)
# same units, integer form (for sites that emit exact cents)
_REV_UNITS_SQL = (
    "SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)"
    " * (100 - CAST(round(l_discount * 100) AS HUGEINT)))"
)


def _rev_units() -> Column:
    """Per-row exact revenue in 1e4-scaled integer units, as
    decimal(20,0) so the aggregate widens to decimal(30,0)."""
    ce = F.round(F.col("l_extendedprice") * 100).cast("long")
    dp = F.round(F.col("l_discount") * 100).cast("long")
    return (ce * (100 - dp)).cast("decimal(20,0)")


def _rev_exact() -> Column:
    """The aggregate expression: exact integer sum, one IEEE division,
    no rounding."""
    return F.sum(_rev_units()).cast("double") / 10000.0


# ===========================================================================
# TPC-H-style relational core: scan → filter → agg → sort
# ===========================================================================

@query(
    "q1_pricing_summary",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_quantity) AS HUGEINT)            AS qi,
               CAST(round(l_extendedprice * 100) AS HUGEINT) AS ce,
               CAST(round(l_discount * 100) AS HUGEINT)      AS dp,
               CAST(round(l_tax * 100) AS HUGEINT)           AS tp
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02')
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qi) AS DOUBLE)                            AS sum_qty,
           CAST(SUM(ce) AS DOUBLE) / 100.0                    AS sum_base_price,
           CAST(SUM(ce * (100 - dp)) AS DOUBLE) / 10000.0     AS sum_disc_price,
           CAST(SUM(ce * (100 - dp) * (100 + tp)) AS DOUBLE)
               / 1000000.0                                    AS sum_charge,
           CAST(SUM(qi) AS DOUBLE) / COUNT(*)                 AS avg_qty,
           CAST(SUM(ce) AS DOUBLE) / (100.0 * COUNT(*))       AS avg_price,
           CAST(SUM(dp) AS DOUBLE) / (100.0 * COUNT(*))       AS avg_disc,
           COUNT(*)                                           AS count_order
    FROM c
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted. Scale: single wide scan + partial (map-side)
    aggregation into 6 groups — shuffle is a few KB regardless of input
    size; the scan reads only 7 of 11 columns (pruned).

    Money columns are EXACT integer sums divided once, unrounded (the
    r9 exact-cents pattern, extended here by the r10 tie canary, which
    caught a LIVE half-way tie: group (N, F)'s exact disc_price sum is
    ...055.9650 on the sf0.001 AND sf0.1 fixtures, so the former
    ROUND(SUM(double), 2) was a per-engine coin flip — green only by
    accumulation-order luck). Per-row scaled units fit a long (~5e12
    for the 1e6-unit charge); the sums ride decimal(20,0)→(30,0) so a
    100 TB corpus (~4e11 lineitems → charge sums ~2e22) stays exact
    where a long sum would overflow.

    Measured cost of exactness (r10, standalone min-of-4 at sf0.1):
    0.75 s vs ~0.38 s for the float-sum form — decimal partial
    aggregation is the slow path vs codegen'd double sums. Accepted:
    the tie was LIVE (a wrong-by-one-cent coin flip on a flagship
    query), the premium is scan-side work that scales with the same
    single pass, and no rounding convention can absorb a true
    half-way tie."""
    li = _t(spark, sf_dir, "lineitem")
    qi = F.round(F.col("l_quantity")).cast("long")
    ce = F.round(F.col("l_extendedprice") * 100).cast("long")
    dp = F.round(F.col("l_discount") * 100).cast("long")
    tp = F.round(F.col("l_tax") * 100).cast("long")
    d20 = "decimal(20,0)"
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qi).cast("double").alias("sum_qty"),
            (F.sum(ce.cast(d20)).cast("double") / 100.0)
            .alias("sum_base_price"),
            (F.sum((ce * (100 - dp)).cast(d20)).cast("double") / 10000.0)
            .alias("sum_disc_price"),
            (F.sum((ce * (100 - dp) * (100 + tp)).cast(d20)).cast("double")
             / 1000000.0).alias("sum_charge"),
            (F.sum(qi).cast("double") / n).alias("avg_qty"),
            (F.sum(ce.cast(d20)).cast("double") / (F.lit(100.0) * n))
            .alias("avg_price"),
            (F.sum(dp).cast("double") / (F.lit(100.0) * n))
            .alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REV_SQL} AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted. Scale: the c_mktsegment filter runs before the
    join (pushed to the customer scan); order of joins left to Catalyst +
    AQE (customer side shrinks ~5x after the filter). Revenue is the
    exact-cents single division (_rev_exact — the r10 tie-canary class:
    per-order 4dp sums land on half-cent ties at ~1/100 per group, and
    the DESC-by-revenue cutoff must order identical doubles)."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_rev_exact().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {_REV_SQL} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 adapted: 6-way join. Scale: nation (25) and region (5)
    are bounded at every SF → explicit broadcast; the big fact joins
    (orders⋈lineitem⋈supplier) shuffle on their keys and AQE handles
    skew. Region filter prunes 4/5 of nations before the fact join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey))  # bcast bound: nation x region dim, <= 25 rows
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == o.o_orderkey)
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
                 & (c.c_nationkey == F.col("s_nationkey")))
        .join(dim, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        # exact-cents single division (_rev_exact) — the r10 tie-canary
        # hardening; per-nation groups aggregate a 1/25 slice of the
        # corpus, so the decimal-widened sum matters at 100 TB
        .agg(_rev_exact().alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
                    * CAST(round(l_discount * 100) AS HUGEINT)) AS DOUBLE)
               / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg. Scale: all four predicates push
    into the parquet scan (row-group min/max skipping on l_shipdate);
    result is a single row — no meaningful shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        # exact-cents single division (the _rev_exact pattern with
        # price*discount units) — r10 tie-canary hardening
        .agg(
            (F.sum(
                (F.round(F.col("l_extendedprice") * 100).cast("long")
                 * F.round(F.col("l_discount") * 100).cast("long"))
                .cast("decimal(20,0)")
            ).cast("double") / 10000.0).alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_REV_SQL} AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adapted: fact-fact join + broadcast dim + top-k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))  # bcast bound: nation dim, 25 rows
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        # exact-cents single division (_rev_exact) — the r10 tie canary
        # found LIVE per-customer half-cent ties at sf0.01 and sf0.1
        .agg(_rev_exact().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ===========================================================================
# Window functions / per-group top-k
# ===========================================================================

@query(
    "top_customer_per_nation",
    oracle="""
    WITH spend AS (
        SELECT c_nationkey, c_custkey, c_name,
               ROUND(SUM(o_totalprice), 2) AS total_spend
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_nationkey, c_custkey, c_name
    ), ranked AS (
        SELECT n_name, c_custkey, c_name, total_spend,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY total_spend DESC, c_custkey) AS rn
        FROM spend JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name, c_custkey, c_name, total_spend, rn
    FROM ranked WHERE rn <= 3
    """,
)
def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number window — the scalable top-k idiom
    (no global sort; one shuffle on the partition key)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = F.broadcast(_t(spark, sf_dir, "nation"))  # bcast bound: nation dim, 25 rows
    spend = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("total_spend"), F.col("c_custkey")
    )
    return (
        spend.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "c_custkey", "c_name", "total_spend", "rn")
    )


@query(
    "running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame (deterministic under ties
    via the o_orderkey tie-breaker)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "customer_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS DATE),
                CAST(o_orderdate AS DATE)) AS INT) AS gap_days
    FROM orders
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — inter-event gaps per key (the reference's inter-flow-gap
    analytics shape, SURVEY.md §2.B windows row)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("int").alias("gap_days"),
    )


# ===========================================================================
# Grouping sets / rollup / cube
# ===========================================================================

@query(
    "rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count("*").alias("n"))
    )


@query(
    "cube_order_counts",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


# ===========================================================================
# Join variants: semi / anti / set ops / subqueries
# ===========================================================================

@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '2000-01-01')
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — Catalyst turns it into one shuffle-hash anti.
    Scoped to recent orders: every fixture customer has some order, so
    the unscoped predicate would be vacuously empty at every SF."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "big_spender_customers_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def big_spender_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ correlated EXISTS (decorrelated by Catalyst)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "nation_coverage_set_ops",
    oracle="""
    SELECT n_nationkey AS nationkey, 'both' AS coverage FROM nation
    WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
      AND n_nationkey IN (SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT n_nationkey AS nationkey, 'customer_only' AS coverage FROM nation
    WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
      AND n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
    """,
)
def nation_coverage_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect + except + unionByName over key sets."""
    cust_nations = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    supp_nations = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    both = cust_nations.intersect(supp_nations).withColumn("coverage", F.lit("both"))
    cust_only = cust_nations.distinct().exceptAll(supp_nations.distinct()).withColumn(
        "coverage", F.lit("customer_only"))
    return both.unionByName(cust_only)


@query(
    "orders_above_global_avg",
    oracle="""
    SELECT COUNT(*) AS n_above,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def orders_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (computed once, broadcast into the filter)."""
    o = _t(spark, sf_dir, "orders")
    avg_price = o.agg(F.avg("o_totalprice").alias("a"))
    return (
        o.join(F.broadcast(avg_price))  # bcast bound: 1-row scalar
        .filter(F.col("o_totalprice") > F.col("a"))
        .agg(F.count("*").alias("n_above"),
             F.round(F.max("o_totalprice"), 2).alias("max_price"))
    )


@query(
    "priority_revenue_union",
    oracle="""
    SELECT 'urgent' AS bucket, ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT 'low' AS bucket, ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n
    FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def priority_revenue_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def bucket(pri: str, tag: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderpriority") == pri)
            .agg(F.round(F.sum("o_totalprice"), 2).alias("total"),
                 F.count("*").alias("n"))
            .select(F.lit(tag).alias("bucket"), "total", "n")
        )

    return bucket("1-URGENT", "urgent").unionByName(bucket("5-LOW", "low"))


# ===========================================================================
# Aggregate variety: distinct, percentiles, CASE buckets, string fns
# ===========================================================================

@query(
    "distinct_customers_per_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def distinct_customers_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (expand+two-phase in Spark). The approximate twin
    (`uniq` → approx_count_distinct) is `approx_distinct_src` (no oracle,
    sketch values are engine-specific)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "approx_distinct_customers",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS approx_within_5pct
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `uniq()` equivalent: HLL++ sketch, mergeable across
    partitions — the 100 TB-safe distinct. The raw sketch estimate is
    engine-specific, so the ORACLE-CHECKED output is restructured to
    facts both engines agree on deterministically (r5 verdict item 3):
    the exact distinct plus a boolean pinning the HLL++ estimate (rsd
    0.01, deterministic for fixed input+rsd) within 5% relative error
    of it — DuckDB replays the exact count and the literal flag. A
    regression in the sketch path (wrong column, wrong rsd, broken
    merge) flips the flag and hash-mismatches."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_customers"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.01)
                - F.count_distinct("o_custkey")
            )
            <= 0.05 * F.count_distinct("o_custkey")
        ).alias("approx_within_5pct"),
    )


@query(
    "price_percentiles",
    oracle=f"""
    WITH cents AS (
        SELECT o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders),
    r AS (
        SELECT pri, c,
               ROW_NUMBER() OVER (PARTITION BY pri ORDER BY c) AS rn,
               COUNT(*) OVER (PARTITION BY pri) AS n
        FROM cents)
    SELECT pri AS o_orderpriority,
           {_PCTL_SQL(0.5, 'p50')},
           {_PCTL_SQL(0.95, 'p95')}
    FROM r GROUP BY pri
    """,
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (ClickHouse quantileExact) via
    explicit order statistics over integer CENTS: rank the group, take
    the two straddling ranks of pos = 1 + p*(n-1), linear-interpolate
    — the same definition Spark's `percentile` implements, but spelled
    in plain arithmetic so BOTH engines compute bit-identical doubles
    from identical integers (r9 review: ROUND(quantile, 2) sat on
    .xx5 half-way ties where Spark round and DuckDB ROUND disagree on
    ~9% of tie values — the quality_classifier_scores r6 class — and
    the engines' builtin interpolations differ by an ulp at exactly
    those values; a fixture regen had order-10% odds of a false FAIL).
    No rounding anywhere: the output is a single IEEE expression over
    exact cents, canonicalized identically by construction.
    percentile_approx stays the at-scale sketch variant."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("_c"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("_c")
    r = o.select(
        "o_orderpriority", "_c",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(
            Window.partitionBy("o_orderpriority")
        ).alias("_n"),
    )

    def pctl(p: float, name: str):
        pos = F.lit(1.0) + F.lit(p) * (F.col("_n") - 1).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        contrib = (
            F.when(
                (F.col("_rn") == lo) & (F.col("_rn") == hi),
                F.col("_c").cast("double"),
            )
            .when(F.col("_rn") == lo, F.col("_c") * (hi.cast("double") - pos))
            .when(F.col("_rn") == hi, F.col("_c") * (pos - lo.cast("double")))
        )
        return (F.sum(contrib) / F.lit(100.0)).alias(name)

    return r.groupBy("o_orderpriority").agg(
        pctl(0.5, "p50"), pctl(0.95, "p95")
    )


@query(
    "order_value_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               / (COUNT(*) * 100.0) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def order_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg_price is the exact mean of exact CENTS divided once —
    sum(cents) and n are identical integers on both engines, so the
    single IEEE division is bit-identical (r9 review: ROUND(AVG, 2)
    sat on .xx5 half-way ties that 2dp money means systematically
    produce, where Spark round and DuckDB ROUND disagree — the
    quality_classifier_scores r6 class)."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / (F.count("*") * F.lit(100.0))
            ).alias("avg_price"),
        )
    )


@query(
    "part_brand_stats",
    oracle="""
    SELECT upper(p_type) AS type_u,
           CAST(substring(p_brand, 7) AS INT) AS brand_num,
           COUNT(*) AS n,
           SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT))
               / (COUNT(*) * 100.0) AS avg_price
    FROM part
    WHERE p_name LIKE '%a%'
    GROUP BY upper(p_type), CAST(substring(p_brand, 7) AS INT)
    """,
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: LIKE, substring, upper, string→int cast.
    avg_price = exact cents mean divided once (bit-identical IEEE
    division of identical integers — see order_value_buckets; the
    many tiny (type, brand) groups made ROUND(AVG, 2)'s .xx5 tie
    class near-certain on a fixture regen, r9 review)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%a%"))
        .groupBy(
            F.upper("p_type").alias("type_u"),
            F.substring("p_brand", 7, 100).cast("int").alias("brand_num"),
        )
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("p_retailprice") * 100).cast("long"))
                / (F.count("*") * F.lit(100.0))
            ).alias("avg_price"),
        )
    )


def promote(names: list[str]) -> None:
    """Reorder the registry so `names` (in the given order) come first.

    The correctness driver verifies only a prefix of the registry (50
    entries per round), so registration order is coverage policy: each
    round promotes the names with the least driver-side evidence to the
    front of the dict. Unknown names RAISE — a renamed query must be
    renamed in the rotation too, else the driver window would silently
    shrink and the staleness bookkeeping would rot with no signal.
    """
    global _REGISTRY
    unknown = [n for n in names if n not in _REGISTRY]
    if unknown:
        raise ValueError(
            f"promote() given unregistered names {unknown} — update the "
            "rotation list in plans/__init__.py"
        )
    front = {n: _REGISTRY[n] for n in names}
    rest = {n: s for n, s in _REGISTRY.items() if n not in front}
    _REGISTRY = {**front, **rest}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-facing: name → callable(spark, sf_dir) → DataFrame."""
    return {name: spec.spark for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    """Driver-facing: name → DuckDB oracle SQL (only SQL-expressible)."""
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in _REGISTRY.items() if s.bench}


@query(
    "customer_order_value_windows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                 2) AS last_price,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def customer_order_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value (full frame) / ntile per customer —
    window-function breadth. Windows always partition by a key (one
    shuffle, parallel per key); a global ORDER BY window would funnel
    every row through one task and is deliberately absent from this
    inventory."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "nation_balance_full_outer",
    oracle="""
    WITH cb AS (
        SELECT c_nationkey AS nationkey, ROUND(SUM(c_acctbal), 2) AS cust_bal
        FROM customer GROUP BY c_nationkey
    ),
    sb AS (
        SELECT s_nationkey AS nationkey, ROUND(SUM(s_acctbal), 2) AS supp_bal
        FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cb.nationkey, sb.nationkey) AS nationkey,
           COALESCE(cust_bal, 0.0) AS cust_bal,
           COALESCE(supp_bal, 0.0) AS supp_bal
    FROM cb FULL OUTER JOIN sb ON cb.nationkey = sb.nationkey
    ORDER BY nationkey
    """,
)
def nation_balance_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates — nations with only customers
    or only suppliers survive with the missing side zeroed. Completes
    the §2.B join-type inventory (inner/left/semi/anti/range/as-of/
    full outer)."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cb = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.round(F.sum("c_acctbal"), 2).alias("cust_bal")
    )
    sb = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.round(F.sum("s_acctbal"), 2).alias("supp_bal")
    )
    return (
        cb.join(sb, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
        )
        .orderBy("nationkey")
    )
