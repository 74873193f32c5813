"""Unit tests for operators/graph.pagerank (analytic + Python mirror)."""

from __future__ import annotations

import pytest

from mysoftware_nocnetintel_spark.operators.graph import pagerank


def _ranks(df):
    return {r.node: r.r for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    got = _ranks(pagerank(edges, num_iters=7))
    assert got["a"] == pytest.approx(0.5)
    assert got["b"] == pytest.approx(0.5)


def test_dangling_sink_matches_python_mirror(spark):
    # a→b, a→c, b→c ; c is a sink (dangling mass dropped, ranks sum < 1)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = _ranks(pagerank(edges, num_iters=10))

    r = {k: 1 / 3 for k in "abc"}
    for _ in range(10):
        nxt = {k: 0.15 / 3 for k in "abc"}
        nxt["b"] += 0.85 * r["a"] * 0.5
        nxt["c"] += 0.85 * (r["a"] * 0.5 + r["b"] * 1.0)
        r = nxt
    for k in "abc":
        assert got[k] == pytest.approx(r[k], rel=1e-9)
    assert sum(got.values()) < 1.0  # dangling mass dropped, as documented


def test_weighted_edges_respected(spark):
    # a sends 90% of its rank to b, 10% to c
    edges = spark.createDataFrame(
        [("a", "b", 0.9), ("a", "c", 0.1), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    got = _ranks(pagerank(edges, num_iters=20, weight="w"))
    assert got["b"] > got["c"]
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-6)  # no sinks
