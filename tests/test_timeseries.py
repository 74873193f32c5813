"""Edge-case semantics tests for the time-series library (SURVEY.md §7.4
risk 2: as-of tie-breaking and interpolation boundaries must be pinned)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators import timeseries as TS


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_backward_tie_matches_equal_ts(spark):
    left = _mk(spark, [(1, _ts("2024-01-01T10:00:00"), "L")], ["k", "ts", "lv"])
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),  # tie: must match
            (1, _ts("2024-01-01T09:00:00"), 50.0),
        ],
        ["k", "ts", "rv"],
    )
    out = TS.asof_join(left, right, keys="k", right_cols=["rv"]).collect()
    assert len(out) == 1
    assert out[0].rv_right == 100.0  # equal timestamp wins over earlier


def test_asof_no_prior_row_is_null(spark):
    left = _mk(spark, [(1, _ts("2024-01-01T08:00:00"), "L")], ["k", "ts", "lv"])
    right = _mk(spark, [(1, _ts("2024-01-01T09:00:00"), 1.0)], ["k", "ts", "rv"])
    out = TS.asof_join(left, right, keys="k", right_cols=["rv"]).collect()
    assert out[0].rv_right is None  # nothing at-or-before → null (left join)


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _mk(spark, [(1, _ts("2024-01-01T12:00:00"), "L")], ["k", "ts", "lv"])
    right = _mk(spark, [(1, _ts("2024-01-01T09:00:00"), 1.0)], ["k", "ts", "rv"])
    out = TS.asof_join(
        left, right, keys="k", right_cols=["rv"], tolerance="1 hour"
    ).collect()
    assert out[0].rv_right is None  # 3h-old match exceeds 1h tolerance


def test_asof_forward_direction(spark):
    left = _mk(spark, [(1, _ts("2024-01-01T10:00:00"), "L")], ["k", "ts", "lv"])
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01T09:00:00"), 1.0),
            (1, _ts("2024-01-01T11:00:00"), 2.0),
        ],
        ["k", "ts", "rv"],
    )
    out = TS.asof_join(
        left, right, keys="k", right_cols=["rv"], direction="forward"
    ).collect()
    assert out[0].rv_right == 2.0  # earliest at-or-after


def test_interpolate_midpoint_and_boundaries(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), None),  # leading → backfill 10
        (1, _ts("2024-01-01T01:00:00"), 10.0),
        (1, _ts("2024-01-01T02:00:00"), None),  # 1/3 of 10→40 gap
        (1, _ts("2024-01-01T04:00:00"), 40.0),
        (1, _ts("2024-01-01T05:00:00"), None),  # trailing → ffill 40
    ]
    df = _mk(spark, rows, ["k", "ts", "v"])
    out = {
        r.ts: r.v_interp
        for r in TS.interpolate_linear(df, "k", "ts", "v").collect()
    }
    assert out[_ts("2024-01-01T00:00:00")] == 10.0
    assert abs(out[_ts("2024-01-01T02:00:00")] - 20.0) < 1e-9
    assert out[_ts("2024-01-01T05:00:00")] == 40.0


def test_sessionize_single_row_and_gap(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00")),
        (1, _ts("2024-01-01T00:10:00")),
        (1, _ts("2024-01-01T01:00:00")),  # 50-min gap → new session
        (2, _ts("2024-01-01T00:00:00")),  # single-row entity
    ]
    df = _mk(spark, rows, ["k", "ts"])
    out = TS.sessionize(df, "k", "ts", gap="30 minutes").collect()
    sess = {(r.k, r.ts): r.session_id for r in out}
    assert sess[(1, _ts("2024-01-01T00:00:00"))] == 1
    assert sess[(1, _ts("2024-01-01T00:10:00"))] == 1
    assert sess[(1, _ts("2024-01-01T01:00:00"))] == 2
    assert sess[(2, _ts("2024-01-01T00:00:00"))] == 1


def test_assemble_sequences_sorted(spark):
    rows = [
        (1, _ts("2024-01-01T02:00:00"), 3.0),
        (1, _ts("2024-01-01T00:00:00"), 1.0),
        (1, _ts("2024-01-01T01:00:00"), 2.0),
    ]
    df = _mk(spark, rows, ["k", "ts", "v"])
    out = TS.assemble_sequences(df, "k", "ts", ["v"]).collect()[0]
    assert out.seq_len == 3
    assert [s.v for s in out.sequence] == [1.0, 2.0, 3.0]  # time-ordered


def test_resample_grid_density(spark):
    rows = [(1, _ts("2024-01-01T00:10:00")), (1, _ts("2024-01-01T03:40:00"))]
    df = _mk(spark, rows, ["k", "ts"])
    grid = sorted(r.ts for r in TS.resample_grid(df, "k", "ts", "1 hour").collect())
    assert grid[0] == _ts("2024-01-01T00:00:00")  # truncated start
    assert grid[-1] <= _ts("2024-01-01T03:40:00")
    assert len(grid) == 4  # 00,01,02,03


def test_rolling_and_lag_tiebreak(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, 10.0),
        (1, _ts("2024-01-01T00:00:00"), 2, 20.0),  # same ts → id order
        (1, _ts("2024-01-01T00:01:00"), 3, 30.0),
    ]
    df = _mk(spark, rows, ["k", "ts", "id", "v"])
    out = TS.with_lag_features(df, "k", "ts", "v", lags=(1,), tiebreak="id")
    lags = {r.id: r.v_lag1 for r in out.collect()}
    assert lags[1] is None and lags[2] == 10.0 and lags[3] == 20.0
