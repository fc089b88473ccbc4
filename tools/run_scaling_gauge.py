#!/usr/bin/env python
"""SCALING gauge (r15, the r14 verdict's item 7): time the heaviest
compute-bound bench queries on the sf1-SCALE synthetic fixtures
(tools/gen_scale_fixtures.py) at the core count given by
$SPARK_GRAFT_CPUS, with bench.py's methodology (per-query isolation,
warm-up collect, best of 2-3 timed collects). The shipped sf0.1 bench
cannot demonstrate parallel scaling — every query is dominated by
fixed plan-analysis/stage latency (r14 verdict scaling block: all
8c/32c ratios ~1) — so this gauge runs the same operator code on 10x
the rows, where executor compute dominates, and the committed
SCALING_r15.json reports the 8c vs 32c wall-clock per query.

Usage:
  SPARK_GRAFT_CPUS=8  python tools/run_scaling_gauge.py /tmp/out8.json
  SPARK_GRAFT_CPUS=32 python tools/run_scaling_gauge.py /tmp/out32.json
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SCALE_FIXTURE_DIR", "/tmp/sfscale1")

# the heaviest compute-bound families at sf0.1, one representative per
# mechanism: MinHash substrate, cluster propagation, incremental
# recompute, curation composition, span/ngram dup coverage, leakage
# split, DSIR importance, knn cell join + pagerank, SemDeDup, codec
# map, pHash band join, windowed sketches, Arrow-UDF address classes
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_cluster_sizes",
    "incremental_dedup_newbatch",
    "corpus_curation_funnel",
    "text_dup_span_coverage",
    "leakage_free_split",
    "dsir_importance_topk",
    "knn_pagerank",
    "embedding_knn_graph",
    "semdedup_prune",
    "multimodal_decode_jpeg",
    "multimodal_phash_neardup",
    "events_windowed_cms",
    "ipv6_address_classes",
]


def main() -> None:
    out_path = sys.argv[1]
    from goflow2clickhouse_spark.session import get_spark
    from goflow2clickhouse_spark.plans import registry

    spark = get_spark(app_name="scaling_gauge")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    timings: dict[str, float] = {}
    for name in QUERIES:
        spec = specs[name]
        gc.collect()
        spark.catalog.clearCache()
        spark._jvm.System.gc()  # noqa: SLF001
        spark.sparkContext.setJobDescription(f"scaling:{name}")
        t0 = time.perf_counter()
        spec.spark(spark, SF_DIR).collect()  # warm-up
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3 if warm < 1.0 else 2):
            gc.collect()
            t0 = time.perf_counter()
            spec.spark(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", file=sys.stderr)
    rec = {
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "sf_dir": SF_DIR,
        "queries": timings,
        "total": round(sum(timings.values()), 3),
    }
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
