"""Time-series query surface: as-of join, interpolation, streaming-window
batch equivalents. SURVEY.md §2 rows J3, W5, T1-T3 (batch forms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import timeseries as TS
from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# J3: as-of join — align each purchase with the latest prior click per entity
# ("Timestamp alignment", README.md:37). Oracle is DuckDB's native ASOF JOIN.
def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = TS.asof_join(
        purchases,
        clicks,
        keys="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["value"],
        suffix="_click",
    )
    return out.select("event_id", "user_id", "ts", "value", "ts_click", "value_click")


# W5: linear interpolation of masked gaps ("interpolation", README.md:37).
# 'view' rows are treated as missing sensor readings and reconstructed from
# their temporal neighbors; boundaries back/forward-fill.
def q30_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    masked = ev.withColumn(
        "v",
        F.when(F.col("event_type") == "view", F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    out = TS.interpolate_linear(
        masked, "user_id", "ts", "v", out_col="v_interp", tiebreak="event_id"
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round("v_interp", 6).alias("value_interp"),
    )


# T1 batch form: tumbling 1-hour windows via F.window (micro-batch streaming
# uses the identical expression — see streaming module).
def q45_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


# T2 batch form: sliding 1-hour windows every 30 minutes — each event lands
# in exactly two windows.
def q46_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .orderBy("window_start")
    )


# T3: session windows via F.session_window (gap-merged, end = last + gap);
# count parity with the lag-gap batch formulation is oracle-checked.
def q47_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


TIMESERIES_QUERIES = {
    "q28_asof_join": q28_asof_join,
    "q30_interpolate": q30_interpolate,
    "q45_tumbling_window": q45_tumbling_window,
    "q46_sliding_window": q46_sliding_window,
    "q47_session_window": q47_session_window,
}
