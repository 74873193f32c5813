"""IcebergTailer (committed-offset streaming source over Iceberg) and the
exactly-once Iceberg-bronze → Delta-silver relay. Range classification is
file-level: metadata-only maintenance passes a strict tailer, row-removing
ranges fail fast or fall back to the multiplicity-aware diff
(net_changes)."""

from __future__ import annotations

import pytest

from mysoftware_nocnetintel_spark.sources.iceberg import (
    expire_iceberg_snapshots,
    merge_iceberg_rows,
    rewrite_iceberg_manifests,
    rewrite_iceberg_table,
    write_iceberg_append,
)
from mysoftware_nocnetintel_spark.streaming.ops import (
    IcebergTailer,
    relay_iceberg_increment,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


def test_initial_then_incremental_then_caught_up(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a"), (2, "b")]), path)
    t = IcebergTailer(spark, path, str(tmp_path / "ckpt"))
    assert _rows(t.poll()) == {(1, "a"), (2, "b")}
    t.commit()
    assert t.poll() is None  # caught up
    write_iceberg_append(_mk(spark, [(3, "c")]), path)
    batch = t.poll()
    assert _rows(batch) == {(3, "c")}  # new files only
    t.commit()
    assert t.poll() is None


def test_poll_without_commit_redelivers(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    t = IcebergTailer(spark, path, str(tmp_path / "ckpt"))
    t.poll()
    t.commit()
    write_iceberg_append(_mk(spark, [(2, "b")]), path)
    assert _rows(t.poll()) == {(2, "b")}
    # crash before commit: a fresh tailer on the same checkpoint
    # re-delivers the same batch
    t2 = IcebergTailer(spark, path, str(tmp_path / "ckpt"))
    assert _rows(t2.poll()) == {(2, "b")}


def test_metadata_only_range_passes_strict(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    write_iceberg_append(_mk(spark, [(2, "b")]), path)
    t = IcebergTailer(spark, path, str(tmp_path / "ckpt"))
    t.poll()
    t.commit()
    rewrite_iceberg_manifests(path, min_manifests=2)  # replace snapshot
    assert t.poll() is None  # pure metadata — nothing to emit, no error
    write_iceberg_append(_mk(spark, [(3, "c")]), path)
    assert _rows(t.poll()) == {(3, "c")}


def test_row_removing_range_strict_vs_net_changes(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a"), (2, "b")]), path)
    strict = IcebergTailer(spark, path, str(tmp_path / "s"))
    netted = IcebergTailer(
        spark, path, str(tmp_path / "n"), net_changes=True
    )
    strict.poll(), strict.commit()
    netted.poll(), netted.commit()
    merge_iceberg_rows(spark, path, _mk(spark, [(2, "B"), (3, "c")]), ["id"])
    with pytest.raises(ValueError, match="net_changes"):
        strict.poll()
    got = _rows(netted.poll())
    assert got == {(2, "B"), (3, "c")}  # new images only, (2,'b') gone
    netted.commit()
    # compaction nets to ZERO emitted rows
    rewrite_iceberg_table(spark, path)
    batch = netted.poll()
    assert batch is None or batch.count() == 0


def test_pin_ref_survives_expiration(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    t = IcebergTailer(
        spark, path, str(tmp_path / "ckpt"), pin_ref="consumer-x"
    )
    t.poll()
    t.commit()
    for i in range(2, 7):
        write_iceberg_append(_mk(spark, [(i, "v")]), path)
    expire_iceberg_snapshots(path, keep_last=1)
    # the committed offset snapshot was tagged → never expired → the
    # incremental read still works after aggressive retention
    assert _rows(t.poll()) == {(i, "v") for i in range(2, 7)}
    t.commit()


def test_expired_offset_fails_fast_without_pin(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    t = IcebergTailer(spark, path, str(tmp_path / "ckpt"))
    t.poll()
    t.commit()
    for i in range(2, 7):
        write_iceberg_append(_mk(spark, [(i, "v")]), path)
    expire_iceberg_snapshots(path, keep_last=1)
    with pytest.raises(ValueError, match="pin_ref"):
        t.poll()


def test_relay_exactly_once_crash_window(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.readers import (
        read_delta_snapshot,
    )

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    write_iceberg_append(_mk(spark, [(1, "a"), (2, "b")]), bronze)
    t = IcebergTailer(spark, bronze, str(tmp_path / "ckpt"))

    ident = lambda df: df  # noqa: E731
    assert relay_iceberg_increment(t, ident, silver, "relay-x") is not None
    write_iceberg_append(_mk(spark, [(3, "c")]), bronze)

    # simulate the crash window: the silver write lands, the offset
    # commit does not
    from mysoftware_nocnetintel_spark.sources.delta import write_delta_append

    batch = t.poll()
    write_delta_append(
        batch, silver, txn=("relay-x", int(t.pending_snapshot))
    )
    # restart: the relay re-polls the SAME range; the txn makes the
    # silver append skip, the offset finally commits
    t2 = IcebergTailer(spark, bronze, str(tmp_path / "ckpt"))
    assert relay_iceberg_increment(t2, ident, silver, "relay-x") is not None
    got = [
        (r.id, r.val) for r in read_delta_snapshot(spark, silver).collect()
    ]
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c")]  # no duplicates
    assert relay_iceberg_increment(t2, ident, silver, "relay-x") is None


def test_relay_crash_window_with_bronze_advance(spark, tmp_path):
    """Round-5 advisor scenario: crash lands between the silver
    txn-append and tailer.commit(), and bronze ADVANCES before
    redelivery. The pinned pending endpoint must make the retried poll
    re-deliver exactly the failed batch's range (start..v1) — deriving
    the endpoint from the live head would retry start..v2 under txn v2
    and double-append the v1 rows."""
    from mysoftware_nocnetintel_spark.sources.delta import (
        write_delta_append,
    )
    from mysoftware_nocnetintel_spark.sources.readers import (
        read_delta_snapshot,
    )

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    write_iceberg_append(_mk(spark, [(1, "a")]), bronze)
    t = IcebergTailer(spark, bronze, str(tmp_path / "ckpt"))
    ident = lambda df: df  # noqa: E731
    assert relay_iceberg_increment(t, ident, silver, "adv") is not None

    write_iceberg_append(_mk(spark, [(2, "b")]), bronze)
    # the failed delivery: batch written to silver, offset NOT committed
    batch = t.poll()
    v1 = int(t.pending_snapshot)
    write_delta_append(batch, silver, txn=("adv", v1))
    # bronze advances BEFORE the redelivery
    write_iceberg_append(_mk(spark, [(3, "c")]), bronze)

    # restart: first relay must redeliver EXACTLY start..v1 (skipped by
    # txn), the second one ships v1..v2
    t2 = IcebergTailer(spark, bronze, str(tmp_path / "ckpt"))
    assert relay_iceberg_increment(t2, ident, silver, "adv") == v1
    assert relay_iceberg_increment(t2, ident, silver, "adv") is not None
    got = sorted(
        (r.id, r.val) for r in read_delta_snapshot(spark, silver).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]  # (2,"b") exactly once
    assert relay_iceberg_increment(t2, ident, silver, "adv") is None


def test_pin_ref_moves_atomically(spark, tmp_path):
    """commit(pin_ref=...) must replace the refs-map entry in ONE
    metadata commit — at no metadata version may the pin be absent once
    it has existed (the drop+tag pair left such a window)."""
    import json
    import os

    bronze = str(tmp_path / "bronze")
    write_iceberg_append(_mk(spark, [(1, "a")]), bronze)
    t = IcebergTailer(
        spark, bronze, str(tmp_path / "ckpt"), pin_ref="consumer-pin"
    )
    t.poll()
    t.commit()
    write_iceberg_append(_mk(spark, [(2, "b")]), bronze)
    t.poll()
    t.commit()
    meta_dir = os.path.join(bronze, "metadata")
    versions = sorted(
        f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")
    )
    saw_pin = False
    for f in versions:
        with open(os.path.join(meta_dir, f)) as fh:
            refs = json.load(fh).get("refs") or {}
        if "consumer-pin" in refs:
            saw_pin = True
        elif saw_pin:
            raise AssertionError(
                f"{f}: pin vanished after existing — non-atomic ref move"
            )
    assert saw_pin


def test_stale_pin_cleared_by_explicit_commit(spark, tmp_path):
    """An explicit commit PAST the pinned pending endpoint makes the pin
    stale: the next poll must proceed from the committed offset (here:
    caught up → None), never redeliver the older pinned range backwards."""
    bronze = str(tmp_path / "bronze")
    write_iceberg_append(_mk(spark, [(1, "a")]), bronze)
    t = IcebergTailer(spark, bronze, str(tmp_path / "ckpt"))
    assert t.poll() is not None  # pins snapshot 1, uncommitted
    s2 = write_iceberg_append(_mk(spark, [(2, "b")]), bronze)
    t.commit(s2)  # operator explicitly skips ahead
    t2 = IcebergTailer(spark, bronze, str(tmp_path / "ckpt"))
    assert t2.poll() is None  # caught up; stale pin cleared, no rewind
