"""plan_summary / assert_plan diagnostics over known plan shapes."""

from __future__ import annotations

import pytest

from mysoftware_nocnetintel_spark.plans import QUERIES
from mysoftware_nocnetintel_spark.plans.diagnostics import (
    assert_plan,
    plan_summary,
)


def test_q2_summary_matches_plan_gates(spark, sf_dir):
    s = plan_summary(QUERIES["q2_join_topn"](spark, sf_dir))
    assert s["broadcast_joins"] >= 2
    assert s["sort_merge_joins"] == 0
    assert s["top_k"] is True
    assert s["python_evals"] == 0
    assert any("o_orderdate" in f for f in s["pushed_filters"])


def test_assert_plan_passes_and_fails(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    s = assert_plan(
        df,
        max_exchanges=2,
        forbid_sort_merge=True,
        forbid_python=True,
        require_pushed_filter="l_shipdate",
    )
    assert s["exchanges"] <= 2
    with pytest.raises(AssertionError, match="exchanges"):
        assert_plan(df, max_exchanges=0)
    with pytest.raises(AssertionError, match="not pushed"):
        assert_plan(df, require_pushed_filter="no_such_col")


def test_python_seam_detected(spark, sf_dir):
    # q71 is the intentional Arrow pandas-UDF seam — the detector must see it
    s = plan_summary(QUERIES["q71_pandas_udf_score"](spark, sf_dir))
    assert s["python_evals"] >= 1
