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
warm-up. (Fixed at n=2 since r2 — keep it so rounds stay
like-for-like.)

Regression guard: per-query deltas vs the latest BENCH_r*.json are
emitted in the JSON ("deltas": name → this/prev ratio for queries in
both rounds) and any >1.2x slowdown prints a WARN line to stderr
(fail-soft: exit stays 0, the driver records the numbers either way).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _previous_round_timings(sf_num: object) -> dict[str, float]:
    """Per-query seconds from the latest BENCH_r{N}.json next to this
    script (the driver wraps the bench JSON line under "parsed"), {} if
    none readable or the previous round ran at a different sf."""
    here = os.path.dirname(os.path.abspath(__file__))
    best_n, best = -1, {}
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
            inner = data.get("parsed", data)
            queries = inner.get("queries", {})
            prev_sf = inner.get("sf", data.get("sf"))
        except (OSError, ValueError, AttributeError):
            continue
        n = int(m.group(1))
        if n > best_n and isinstance(queries, dict) and prev_sf == sf_num:
            best_n, best = n, queries
    return best


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
    prev = _previous_round_timings(sf_num)
    deltas = {
        name: round(t / prev[name], 3)
        for name, t in timings.items()
        if name in prev and prev[name] > 0
    }
    for name, ratio in sorted(deltas.items()):
        if ratio > 1.2:
            print(
                f"WARN bench regression {name}: {ratio}x vs previous round "
                f"({prev[name]}s -> {timings[name]}s)",
                file=sys.stderr,
            )
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "deltas": deltas,
        "sf": sf_num,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
