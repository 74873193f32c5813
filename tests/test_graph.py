"""Unit tests for operators/graph.pagerank (analytic + Python mirror).

Every test runs against all three size-adaptive physical strategies
(single-Arrow-task, broadcast-rank join loop, shuffle join loop) by forcing
the gates — the logical result must be identical regardless of which
physical path executed.
"""

from __future__ import annotations

import pytest

from mysoftware_nocnetintel_spark.operators import graph as G
from mysoftware_nocnetintel_spark.operators.graph import pagerank

STRATEGIES = {
    # (_LOCAL_EDGES, _BROADCAST_NODES)
    "single-task": (500_000, 2_000_000),
    "broadcast-join": (0, 2_000_000),
    "shuffle-join": (0, 0),
}


@pytest.fixture(params=sorted(STRATEGIES))
def strategy(request, monkeypatch):
    local_edges, broadcast_nodes = STRATEGIES[request.param]
    monkeypatch.setattr(G, "_LOCAL_EDGES", local_edges)
    monkeypatch.setattr(G, "_BROADCAST_NODES", broadcast_nodes)
    return request.param


def _ranks(df):
    return {r.node: r.r for r in df.collect()}


def test_two_node_cycle_is_uniform(spark, strategy):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    got = _ranks(pagerank(edges, num_iters=7))
    assert got["a"] == pytest.approx(0.5)
    assert got["b"] == pytest.approx(0.5)


def test_dangling_sink_matches_python_mirror(spark, strategy):
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


def test_weighted_edges_respected(spark, strategy):
    # a sends 90% of its rank to b, 10% to c
    edges = spark.createDataFrame(
        [("a", "b", 0.9), ("a", "c", 0.1), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    got = _ranks(pagerank(edges, num_iters=20, weight="w"))
    assert got["b"] > got["c"]
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-6)  # no sinks


def test_source_only_node_rank_is_base(spark, strategy):
    # s has no in-edges: rank must settle at (1-d)/n exactly
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = _ranks(pagerank(edges, num_iters=10, damping=0.85))
    assert got["s"] == pytest.approx(0.15 / 3, rel=1e-12)
