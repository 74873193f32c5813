"""Serving-mode plan cache semantics — especially the honesty exclusions.

The cache exists to skip py4j plan-construction on repeat invocations; it
must NEVER cache a query whose BUILD materializes state (localCheckpoint
chains, driver-side fits), because reusing such a DataFrame silently turns
recompute into a result-cache read (bench would measure block reads).
"""

from __future__ import annotations

import pytest

import mysoftware_nocnetintel_spark.plans as P
from mysoftware_nocnetintel_spark.plans import (
    QUERIES,
    clear_plan_cache,
    enable_plan_cache,
)


@pytest.fixture
def plan_cache():
    enable_plan_cache(True)
    yield
    enable_plan_cache(False)


def test_ordinary_queries_are_cached(spark, sf_dir, plan_cache):
    a = QUERIES["q1_pricing_summary"](spark, sf_dir)
    b = QUERIES["q1_pricing_summary"](spark, sf_dir)
    assert a is b  # same built DataFrame reused


def test_state_materializing_queries_are_never_cached(spark, sf_dir, plan_cache):
    for name in sorted(P._NO_PLAN_CACHE):
        assert name in QUERIES, f"stale _NO_PLAN_CACHE entry: {name}"
    a = QUERIES["q110_pagerank"](spark, sf_dir)
    b = QUERIES["q110_pagerank"](spark, sf_dir)
    assert a is not b  # honest rebuild every invocation


def test_exclusion_list_covers_checkpointing_builds(spark, sf_dir, plan_cache):
    """Every query whose BUILT plan embeds an RDD scan (the footprint of a
    localCheckpoint/materialized intermediate) must be in _NO_PLAN_CACHE —
    a cached checkpoint is a result cache, not a plan cache. Scans the
    whole registry so new iterative queries can't silently regress."""
    leaks = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
        except Exception:
            continue  # queries needing special context are out of scope here
        plan = df._jdf.queryExecution().analyzed().toString()
        has_rdd = "LogicalRDD" in plan or "ExistingRDD" in plan
        if has_rdd and name not in P._NO_PLAN_CACHE:
            leaks.append(name)
    assert not leaks, (
        f"queries with materialized state missing from _NO_PLAN_CACHE: {leaks}"
    )


def test_cache_cleared_on_disable(spark, sf_dir):
    enable_plan_cache(True)
    QUERIES["q1_pricing_summary"](spark, sf_dir)
    assert P._PLAN_CACHE
    enable_plan_cache(False)
    assert not P._PLAN_CACHE
    clear_plan_cache()

# r13 (VERDICT task 2): one of the heavy suites deselected from the
# DEFAULT run so `pytest tests/` fits the driver's pytest budget
# (pyproject addopts `-m "not slow"`); the full matrix runs with
# `pytest tests/ -m ""`. Subsystem representatives stay in the
# default set — see OPTIMIZATION_r13.md "pytest budget".
pytestmark = pytest.mark.slow
