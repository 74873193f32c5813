"""Streaming heavy hitters (sharded batch SpaceSaving, T6 stateful).

Parity contract: with capacity >= distinct items per shard the summary
is EXACT (one availableNow batch -> est_count equals the batch groupBy
count, max_err 0). Under-capacity, the SpaceSaving guarantees hold:
est >= true >= est - max_err, and every item with true frequency >
total/capacity survives in its shard's summary."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources import load_table
from mysoftware_nocnetintel_spark.streaming import ops as STR


def test_exact_when_capacity_exceeds_cardinality(spark, sf_dir):
    stream = STR.read_events_stream(spark, sf_dir)
    got = STR.run_to_memory(
        STR.heavy_hitters_stream(
            stream, item_col="user_id", n_shards=4, capacity=10_000
        ),
        "t_hh_exact",
        output_mode="append",
    ).collect()
    ev = load_table(spark, sf_dir, "events")
    want = {
        str(r.user_id): r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    est = {r.item: r.est_count for r in got}
    assert est == want
    assert all(r.max_err == 0 for r in got)
    # disjoint sharding: every item appears in exactly one shard
    assert len(got) == len({r.item for r in got})


def test_v2_equals_v1(spark, sf_dir):
    """transformWithStateInPandas variant emits the identical summary
    (shared SpaceSaving fold; named ValueState instead of v1 group
    state)."""
    import pytest

    if not STR.STATE_V2_AVAILABLE:
        with pytest.raises(RuntimeError, match="protobuf"):
            STR.heavy_hitters_stream_v2(
                STR.read_events_stream(spark, sf_dir)
            )
        return
    v1 = {
        (r.shard, r.item): (r.est_count, r.max_err)
        for r in STR.run_to_memory(
            STR.heavy_hitters_stream(
                STR.read_events_stream(spark, sf_dir),
                item_col="event_type",
                n_shards=2,
                capacity=100,
            ),
            "t_hh_v1",
            output_mode="append",
        ).collect()
    }
    # state-v2 needs a multi-column-family store (RocksDB)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        v2 = {
            (r.shard, r.item): (r.est_count, r.max_err)
            for r in STR.run_to_memory(
                STR.heavy_hitters_stream_v2(
                    STR.read_events_stream(spark, sf_dir),
                    item_col="event_type",
                    n_shards=2,
                    capacity=100,
                ),
                "t_hh_v2",
                output_mode="append",
            ).collect()
        }
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert v1 and v2 == v1


def test_spacesaving_bounds_under_capacity(spark, sf_dir):
    """Tiny capacity: the estimate brackets the truth and dominant items
    survive."""
    stream = STR.read_events_stream(spark, sf_dir)
    got = STR.run_to_memory(
        STR.heavy_hitters_stream(
            stream, item_col="event_type", n_shards=1, capacity=3
        ),
        "t_hh_small",
        output_mode="append",
    ).collect()
    ev = load_table(spark, sf_dir, "events")
    true = {
        str(r.event_type): r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    total = sum(true.values())
    assert 0 < len(got) <= 3
    for r in got:
        t = true.get(r.item, 0)
        assert r.est_count >= t, (r.item, r.est_count, t)
        assert r.est_count - r.max_err <= t, (r.item, r.est_count, r.max_err, t)
    # heavy-hitter guarantee: any item above total/capacity is present
    kept = {r.item for r in got}
    for item, t in true.items():
        if t > total / 3:
            assert item in kept, (item, t, total)


def test_state_accumulates_across_batches(spark, sf_dir, tmp_path):
    """Two availableNow passes over a growing file source: the second
    run's summary reflects BOTH files (state persisted via checkpoint)."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    shutil.copy(f"{sf_dir}/events.parquet", str(src / "a.parquet"))

    def run():
        # memory sinks refuse checkpoint recovery; foreachBatch supports
        # it — collect the LAST emitted summary driver-side
        batches = []

        def sink(bdf, bid):
            batches.append(bdf.collect())

        stream = (
            spark.readStream.schema(STR._EVENTS_RAW_SCHEMA)
            .parquet(str(src))
        )
        q = (
            STR.heavy_hitters_stream(
                stream, item_col="event_type", n_shards=2, capacity=100
            )
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.item: r.est_count for b in batches for r in b}

    first = run()
    shutil.copy(f"{sf_dir}/events.parquet", str(src / "b.parquet"))
    second = run()
    assert first and second == {k: 2 * v for k, v in first.items()}
