"""Session-timezone robustness: the driver runs queries on a vanilla
SparkSession whose `spark.sql.session.timeZone` is whatever the host
JVM defaults to — results must match the DuckDB oracle regardless.
This flips the session to a non-UTC zone and re-runs the
timestamp-bearing queries (the class of bug: collected timestamps are
naive in session tz; bucketing/extraction must not shift)."""

from __future__ import annotations

import pytest

from goflow2clickhouse_spark.oracle import compare, duck_connect
from goflow2clickhouse_spark.plans import registry

TZ_QUERIES = [
    "events_minutely",
    "events_sliding_windows",
    "flows_bitrate_timeseries",
    "flows_tumbling_traffic",
    "orders_asof_union_timeline",
    "flows_conversation_sessions",
    "q7_volume_shipping",   # year extraction from dates
    # r4 additions
    "events_windowed_hll",          # epoch-hour bucketing
    "q4_order_priority",            # interval lateness comparison
    "q12_shipmode_priority",        # year range filter
    "q21_suppliers_kept_waiting",   # interval lateness comparison
]


@pytest.fixture(scope="module")
def ny_spark(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", TZ_QUERIES)
def test_query_matches_oracle_in_non_utc_session(ny_spark, sf_dir, duck, name):
    spec = registry()[name]
    res = compare(name, spec.spark(ny_spark, sf_dir), spec.oracle, duck)
    assert res.columns_match and res.hash_match, (
        f"{name} diverges under America/New_York session tz: "
        f"{res.sample_diff}"
    )
