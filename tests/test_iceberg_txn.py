"""Iceberg txn idempotence markers (snapshot-summary twin of Delta's txn
action): a redelivered append/merge whose (app, version) the snapshot
history already holds must skip with no new snapshot and no duplicate
rows — the exactly-once building block for the CDC sink and the
cross-format relays."""

from __future__ import annotations

import json
from glob import glob

from mysoftware_nocnetintel_spark.sources.iceberg import (
    merge_iceberg_rows,
    write_iceberg_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


def _n_snaps(path):
    with open(sorted(glob(f"{path}/metadata/v*.metadata.json"))[-1]) as f:
        return len(json.load(f)["snapshots"])


def test_append_txn_skips_redelivery(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path, txn=("app", 1))
    s2 = write_iceberg_append(_mk(spark, [(2, "b")]), path, txn=("app", 2))
    n = _n_snaps(path)
    # redelivery of batch 2 (and of the older batch 1): both skip
    assert write_iceberg_append(
        _mk(spark, [(2, "b")]), path, txn=("app", 2)
    ) == s2
    assert write_iceberg_append(
        _mk(spark, [(1, "a")]), path, txn=("app", 1)
    ) == s2
    assert _n_snaps(path) == n
    assert _rows(read_iceberg_snapshot(spark, path)) == {(1, "a"), (2, "b")}
    # a DIFFERENT app's version 2 is not deduplicated
    write_iceberg_append(_mk(spark, [(3, "c")]), path, txn=("other", 2))
    assert _rows(read_iceberg_snapshot(spark, path)) == {
        (1, "a"), (2, "b"), (3, "c"),
    }


def test_merge_txn_skips_redelivery(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a"), (2, "b")]), path)
    merge_iceberg_rows(
        spark, path, _mk(spark, [(2, "B")]), ["id"], txn=("cdc", 7)
    )
    n = _n_snaps(path)
    merge_iceberg_rows(
        spark, path, _mk(spark, [(2, "B")]), ["id"], txn=("cdc", 7)
    )
    assert _n_snaps(path) == n
    assert _rows(read_iceberg_snapshot(spark, path)) == {(1, "a"), (2, "B")}


def test_cdc_batch_replay_with_app_id_is_exact(spark, tmp_path):
    from mysoftware_nocnetintel_spark.streaming.ops import cdc_upsert_batch

    path = str(tmp_path / "t")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_id bigint, user_id bigint, ts_s bigint, value double"
    ).selectExpr(
        "event_id", "user_id", "timestamp_seconds(ts_s) as ts", "value"
    )
    cdc_upsert_batch(mk([(0, 5, 1, 1.0)]), path, ("user_id",), txn=("c", 0))
    cdc_upsert_batch(
        mk([(1, 5, 2, 2.0), (2, 6, 2, 3.0)]), path, ("user_id",),
        txn=("c", 1),
    )
    n = _n_snaps(path)
    # foreachBatch retry: the exact same batch replays — nothing changes
    cdc_upsert_batch(
        mk([(1, 5, 2, 2.0), (2, 6, 2, 3.0)]), path, ("user_id",),
        txn=("c", 1),
    )
    assert _n_snaps(path) == n
    got = {
        (r.user_id, r.event_id)
        for r in read_iceberg_snapshot(spark, path).collect()
    }
    assert got == {(5, 1), (6, 2)}


def test_relay_delta_bronze_to_iceberg_silver(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.delta import write_delta_append
    from mysoftware_nocnetintel_spark.streaming.ops import (
        DeltaTailer,
        relay_to_iceberg_increment,
    )

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    write_delta_append(_mk(spark, [(1, "a")]), bronze)
    t = DeltaTailer(spark, bronze, str(tmp_path / "ckpt"))
    ident = lambda df: df  # noqa: E731
    assert relay_to_iceberg_increment(t, ident, silver, "rx") is not None
    write_delta_append(_mk(spark, [(2, "b")]), bronze)

    # crash window: silver append lands, offset commit doesn't
    batch = t.poll()
    write_iceberg_append(
        batch, silver, txn=("rx", int(t.pending_version))
    )
    t2 = DeltaTailer(spark, bronze, str(tmp_path / "ckpt"))
    assert relay_to_iceberg_increment(t2, ident, silver, "rx") is not None
    assert _rows(read_iceberg_snapshot(spark, silver)) == {
        (1, "a"), (2, "b"),
    }
    assert relay_to_iceberg_increment(t2, ident, silver, "rx") is None
