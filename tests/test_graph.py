"""Graph centrality: pagerank_fixed against an independently-coded
reference recursion on hand-built graphs, plus the guard paths."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from goflow2clickhouse_spark.operators.graph import PR_DAMPING, pagerank_fixed


def _ref_pagerank(edges, nodes, iters):
    """Second implementation of the exact recursion pagerank_fixed
    documents (teleport + damped in-mass, no dangling redistribution),
    written independently so a shared misunderstanding can't pass."""
    n = float(len(nodes))
    outdeg = Counter(s for s, _ in edges)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        mass = defaultdict(float)
        for s, d in edges:
            mass[d] += pr[s] / outdeg[s]
        pr = {
            v: (1.0 - PR_DAMPING) / n + PR_DAMPING * mass.get(v, 0.0)
            for v in nodes
        }
    return {v: pr[v] * n for v in nodes}


def _run(spark, edges, nodes, iters=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in nodes], "vec_id long")
    got = {
        r["vec_id"]: r["pr_norm"]
        for r in pagerank_fixed(e, nd, iterations=iters).collect()
    }
    want = _ref_pagerank(edges, nodes, iters)
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(want[v], rel=1e-9), (v, got, want)
    return got


def test_pagerank_cycle_is_uniform(spark):
    # a 3-cycle is PageRank's fixed point: everyone exactly average
    got = _run(spark, [(1, 2), (2, 3), (3, 1)], [1, 2, 3])
    assert all(v == pytest.approx(1.0, rel=1e-9) for v in got.values())


def test_pagerank_star_and_isolated_node(spark):
    # two sources feed one hub; node 4 is isolated (teleport only) and
    # nodes 1/3 are sinks for their mass (no dangling redistribution —
    # the documented simplification)
    got = _run(spark, [(1, 2), (3, 2)], [1, 2, 3, 4])
    assert got[2] > got[1] == got[3] == got[4]


def test_pagerank_chain_orders_by_depth(spark):
    # 1 -> 2 -> 3: mass accumulates down the chain within 3 iterations
    got = _run(spark, [(1, 2), (2, 3)], [1, 2, 3])
    assert got[3] > got[2] > got[1]


def test_pagerank_guards(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    nd = spark.createDataFrame([(1,), (2,)], "vec_id long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank_fixed(e, nd, iterations=0)
    with pytest.raises(ValueError, match="empty node"):
        pagerank_fixed(e, nd.filter("vec_id < 0"))
