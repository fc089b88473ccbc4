"""Cache-lifecycle contract of the MinHash+LSH dedup operator: the
persisted shingle relation must not outlive the returned result handle
(no session-lifetime executor memory/disk leak)."""

from __future__ import annotations

import gc

from goflow2clickhouse_spark.operators.dedup import minhash_lsh_dedup_pairs
from goflow2clickhouse_spark.schema import load_table


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_minhash_lsh_unpersists_with_result_handle(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    before = _n_persistent(spark)

    pairs = minhash_lsh_dedup_pairs(docs)
    assert pairs.count() >= 0
    # while the handle is alive the shingle cache may (and should) exist
    assert _n_persistent(spark) >= before

    del pairs
    gc.collect()
    assert _n_persistent(spark) == before, (
        "shingle relation still cached after the result handle was dropped"
    )
