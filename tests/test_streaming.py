"""Stream-batch parity tests (SURVEY.md §5.2 layer 4): every streaming
transformation shares its expression with a batch twin, so running the
stream to completion must reproduce the batch answer exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark import streaming as STR
from mysoftware_nocnetintel_spark.plans.queries_timeseries import (
    q45_tumbling_window,
    q47_session_window,
)
from mysoftware_nocnetintel_spark.sources import load_table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream = STR.read_events_stream(spark, sf_dir)
    got = STR.run_to_memory(
        STR.tumbling_rollup(stream), "t_tumbling", output_mode="complete"
    )
    want = q45_tumbling_window(spark, sf_dir)
    cols = ["window_start", "n", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_stream_equals_batch(spark, sf_dir):
    stream = STR.read_events_stream(spark, sf_dir)
    got = STR.run_to_memory(
        STR.session_rollup(stream), "t_session", output_mode="complete"
    )
    want = q47_session_window(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_static_join_parity(spark, sf_dir):
    """J6: stream-static join — live events enriched with a static dim."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_total"))
    stream = STR.read_events_stream(spark, sf_dir)
    joined = stream.join(dim, "user_id").select("event_id", "user_id", "user_total")
    got = STR.run_to_memory(joined, "t_ss_join", output_mode="append")
    want = ev.join(dim, "user_id").select("event_id", "user_id", "user_total")
    cols = ["event_id", "user_id", "user_total"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup_within_watermark(spark, sf_dir):
    """T5: duplicate keys collapse to one surviving row in-stream."""
    stream = STR.read_events_stream(spark, sf_dir)
    keyed = stream.withColumn("dup_key", F.col("event_id") % 100)
    got = STR.run_to_memory(
        STR.stream_dedup(keyed, ["dup_key"]), "t_dedup", output_mode="append"
    )
    n = got.count()
    distinct_keys = (
        load_table(spark, sf_dir, "events")
        .select((F.col("event_id") % 100).alias("k"))
        .distinct()
        .count()
    )
    assert n == distinct_keys


def test_stream_stream_join_parity(spark, sf_dir):
    """J7: watermarked stream-stream join == batch range join (q29)."""
    from mysoftware_nocnetintel_spark.plans.queries_relational import q29_range_join

    stream = STR.read_events_stream(spark, sf_dir)
    got = STR.run_to_memory(
        STR.stream_stream_join(stream), "t_ssj", output_mode="append"
    )
    got_counts = got.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))
    want = q29_range_join(spark, sf_dir)
    cols = ["user_id", "n_pairs"]
    assert _rows(got_counts, cols) == _rows(want, cols)


def test_threshold_alerts_parity(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    stream = STR.read_events_stream(spark, sf_dir)
    got = STR.run_to_memory(
        STR.threshold_alerts(stream, 300.0), "t_alerts", output_mode="append"
    )
    want = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 300.0)
    ).count()
    assert got.count() == want
    if got.count() > 0:
        assert got.select("alert_kind").distinct().collect()[0][0] == "value_threshold"


def test_drift_state_emits_per_user(spark, sf_dir):
    stream = STR.read_events_stream(spark, sf_dir)
    got = STR.run_to_memory(
        STR.with_drift_state(stream), "t_drift", output_mode="append"
    )
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    rows = got.collect()
    assert len(rows) == n_users  # single micro-batch → one state row per user
    # running mean over one batch == plain per-user mean
    want = {
        r.user_id: r.m
        for r in ev.groupBy("user_id").agg(F.avg("value").alias("m")).collect()
    }
    for r in rows:
        assert abs(r.mean - want[r.user_id]) < 1e-9
        assert abs(r.drift) < 1e-9  # first batch: batch_mean == running mean


def test_streaming_foreachbatch_parquet_sink(spark, sf_dir, tmp_path):
    """S4/S6: foreachBatch parquet alert sink round-trips."""
    out = str(tmp_path / "alerts")
    stream = STR.read_events_stream(spark, sf_dir)

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        STR.threshold_alerts(stream, 300.0)
        .writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    ev = load_table(spark, sf_dir, "events")
    want = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 300.0)
    ).count()
    got = spark.read.parquet(out).count() if want else 0
    assert got == want
