#!/usr/bin/env python
"""Bench harness: time the headline query inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed three times: a warm-up collect (JIT/codegen,
file listing, broadcast build) then two timed collects; the reported
value is the BEST timed run — min-of-2 suppresses GC/compaction noise
that was producing 2x run-to-run swings on the cache-heavy dedup
queries, so round-over-round comparisons track real changes. The first
query additionally pays SparkSession startup, which is excluded by the
warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from goflow2clickhouse_spark.session import get_spark
    from goflow2clickhouse_spark.plans import bench_queries

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = bench_queries()
    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        spec.spark(spark, sf_dir).collect()  # warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num: float | str = float(sf)
    except ValueError:
        sf_num = sf
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
