"""Deterministic `flows` fact table derived from `lineitem`.

The reference's fact table (initdb/create_tables.sql:1-35) is populated
from live UDP flow packets, which the test harness does not have. To make
every flow-analytics query oracle-checkable, the engine derives a
deterministic flows table from the driver's `lineitem` fixture using ONLY
arithmetic that evaluates identically in Spark SQL and DuckDB (integer
`%`, `floor`, `CASE`, `concat`, `CAST`). Same SQL text → same rows on
both engines → value-hash parity.

Domains follow FIXTURES.md §1: proto skewed to TCP, dst_port skewed to
well-known ports, tcp_flags only when proto=6, a handful of sampler
addresses, zipf-ish src/dst pools via modular folding of TPC-H keys.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession


def _path_view_suffix(sf_dir: str) -> str:
    """Injective view-name suffix for a path: readable sanitized form
    PLUS a digest of the raw path. Sanitization alone is lossy —
    '/data/sf0.1' and '/data/sf0_1' both collapse to 'data_sf0_1', and
    a collision re-introduces the lazy-analysis wrong-data hazard the
    per-path names exist to prevent (r7 review). The digest is of the
    path STRING (stable across runs, unlike hash())."""
    clean = re.sub(r"[^A-Za-z0-9]", "_", sf_dir)
    return f"{clean}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"

# NOTE: portable subset only — every function here must behave identically
# in Spark SQL and DuckDB 1.0 (verified by tests/test_flows_view.py).
FLOWS_CTE_SQL = """
SELECT
    CAST(1 + (rid % 4) AS INT)                                   AS type,
    1700000000 + (rid % 3600)                                    AS time_received,
    rid % 100000                                                 AS sequence_num,
    CASE rid % 4 WHEN 0 THEN 1 WHEN 1 THEN 100
                 WHEN 2 THEN 1000 ELSE 10000 END                 AS sampling_rate,
    rid % 2                                                      AS flow_direction,
    concat('10.0.0.', CAST(1 + (rid % 8) AS STRING))             AS sampler_address,
    1700000000 + (rid % 3600) - (rid % 300)                      AS time_flow_start,
    1700000000 + (rid % 3600) - (rid % 300) + (rid % 120)        AS time_flow_end,
    40 + CAST(FLOOR(l_extendedprice) AS BIGINT)                  AS bytes,
    1 + CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT)          AS packets,
    concat('192.168.', CAST(l_partkey % 64 AS STRING), '.',
           CAST(rid % 251 AS STRING))                            AS src_addr,
    concat('172.16.', CAST(l_suppkey % 16 AS STRING), '.',
           CAST(rid % 199 AS STRING))                            AS dst_addr,
    CAST(2048 AS BIGINT)                                         AS etype,
    CASE WHEN rid % 10 < 6 THEN 6
         WHEN rid % 10 < 9 THEN 17 ELSE 1 END                    AS proto,
    1024 + (rid % 64000)                                         AS src_port,
    CASE rid % 5 WHEN 0 THEN 53 WHEN 1 THEN 80 WHEN 2 THEN 123
                 WHEN 3 THEN 443 ELSE 8080 END                   AS dst_port,
    CASE WHEN rid % 20 = 0 THEN 128 ELSE 64 END                  AS forwarding_status,
    CASE WHEN rid % 10 < 6 THEN 2 + (rid % 32) ELSE 0 END        AS tcp_flags,
    CASE WHEN rid % 10 >= 9 THEN 8 ELSE 0 END                    AS icmp_type,
    CAST(0 AS BIGINT)                                            AS icmp_code,
    CASE WHEN rid % 50 = 0 THEN rid % 65536 ELSE 0 END           AS fragment_id,
    CAST(0 AS BIGINT)                                            AS fragment_offset
FROM (
    SELECT l_orderkey * 8 + l_linenumber AS rid,
           l_partkey, l_suppkey, l_extendedprice
    FROM lineitem
) base
"""

# Prefix for oracle SQL strings: the DuckDB harness pre-registers
# `lineitem`, so the same CTE text works verbatim.
FLOWS_WITH = f"WITH flows AS ({FLOWS_CTE_SQL})\n"


def flows_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flows table as a DataFrame (lazy; plan = parquet scan of the
    4 needed lineitem columns + one codegen'd projection, no shuffle).

    Memoized per (session, sf_dir) ON the session object: parsing +
    analyzing the 24-column CTE costs ~0.5 s of driver time, and Spark
    composes new operators onto the already-analyzed child plan, so
    re-analysis of the subtree is a cheap resolved-node walk. The cache
    dies with the session (attribute storage), and distinct sf_dirs get
    distinct plans — sf-interleaving stays correct
    (tests/test_sf_interleave.py). The temp view is still re-registered
    per call so raw `spark.sql` over `lineitem` tracks the latest
    sf_dir."""
    cache: dict[str, DataFrame] = spark.__dict__.setdefault(
        "_flows_df_cache", {}
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    if sf_dir not in cache:
        # inline the scan (no view indirection) so the memoized plan is
        # pinned to THIS sf_dir regardless of later view re-registration.
        # The per-sf_dir view name derives from the PATH, not hash():
        # hash randomization made names run-dependent, and two sf_dirs
        # could collide — harmless under eager analysis, but silently
        # wrong under a lazy-analysis runtime (Spark Connect).
        view = "_flows_base_" + _path_view_suffix(sf_dir)
        rel = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        rel.createOrReplaceTempView(view)
        cache[sf_dir] = spark.sql(
            FLOWS_CTE_SQL.replace("FROM lineitem", f"FROM {view}")
        )
    return cache[sf_dir]


def register_sf_view(df: "DataFrame", base: str, sf_dir: str) -> str:
    """Register `df` under a PER-SF_DIR temp view name and return the
    name. spark.sql-based queries must reference this name instead of
    a fixed one: a fixed name re-registered per call is only safe
    under eager analysis — a lazy-analysis runtime (Spark Connect)
    resolves views at execution, so a plan built for sf_dir A would
    silently read sf_dir B's data after any later call re-registered
    the shared name (the hazard the flows_df cache already engineers
    around)."""
    name = f"_{base}_" + _path_view_suffix(sf_dir)
    df.createOrReplaceTempView(name)
    return name
