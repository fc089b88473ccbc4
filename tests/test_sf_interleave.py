"""Scale-factor interleaving: one session, alternating sf_dir arguments.
The flows queries register a temp view over lineitem per call — results
must always track the sf_dir argument, never a stale registration."""

from __future__ import annotations

from goflow2clickhouse_spark.plans import registry

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def _fingerprint(df):
    # null-safe sort: grouping-sets rows carry NULL cells
    rows = sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
    return len(rows), hash(tuple(rows))


def test_queries_track_sf_dir_across_interleaved_calls(spark):
    specs = registry()
    for name in (
        "flows_top_talkers", "q1_pricing_summary", "events_minutely",
        # spark.sql-over-temp-view queries: per-sf_dir view names (r4)
        # keep these correct even under lazy analysis — interleaving is
        # exactly the pattern a shared view name breaks
        "ch_dialect_top_talkers", "flows_protocol_pivot",
        "grouping_sets_revenue",
    ):
        q = specs[name].spark
        a1 = _fingerprint(q(spark, SF_A))
        b1 = _fingerprint(q(spark, SF_B))
        a2 = _fingerprint(q(spark, SF_A))
        b2 = _fingerprint(q(spark, SF_B))
        assert a1 == a2 and b1 == b2, f"{name}: unstable across interleave"
        assert a1 != b1, f"{name}: sf0.001 and sf0.01 gave identical results"


def test_promoted_names_all_exist():
    """The driver-coverage rotation list in plans/__init__ must contain
    only real registry names — a typo there silently drops a query from
    the verified window."""
    import ast
    import pathlib

    src = pathlib.Path(
        "goflow2clickhouse_spark/plans/__init__.py").read_text()
    tree = ast.parse(src)
    promoted = None
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and getattr(node.func, "id", "") == "promote"):
            promoted = [ast.literal_eval(e) for e in node.args[0].elts]
    assert promoted, "promote() call not found"
    missing = [n for n in promoted if n not in registry()]
    assert not missing, f"promoted names not in registry: {missing}"
    # the 30 round-1-unproven names must sit inside the 50-entry window
    order = list(registry())
    for n in promoted:
        assert order.index(n) < 50, f"{n} fell outside the driver window"


def test_path_view_suffix_injective_under_sanitization():
    """'/x/sf0.1' and '/x/sf0_1' sanitize to the same string; the view
    suffix must still differ (the digest half) or a lazy-analysis
    runtime would silently read the wrong sf_dir's data (r7 review)."""
    from goflow2clickhouse_spark.plans.flows_view import _path_view_suffix

    a, b = _path_view_suffix("/x/sf0.1"), _path_view_suffix("/x/sf0_1")
    assert a != b
    # stable across calls (unlike hash() under PYTHONHASHSEED)
    assert a == _path_view_suffix("/x/sf0.1")
