"""METADATA-ONLY partition drop, both formats (round-10 verdict task 1).

The drop must be pure metadata: remove tombstones (Delta) / a delete
snapshot whose manifest list excludes the partition's files (Iceberg) —
proved by asserting the on-disk data-file set is IDENTICAL before and
after. The pinned-files variant is the loss-free GC primitive for
rescue-then-drop maintenance loops: files appended to the partition
after the pinning snapshot must survive the drop.
"""

from __future__ import annotations

import glob
import os

import pytest

from mysoftware_nocnetintel_spark.sources.delta import (
    drop_delta_partition,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.iceberg import (
    drop_iceberg_partition,
    expire_iceberg_snapshots,
    write_iceberg_append,
    write_iceberg_position_deletes,
)
from mysoftware_nocnetintel_spark.sources.readers import (
    read_delta_snapshot,
    read_iceberg_snapshot,
)


def _df(spark, day, lo, hi):
    return spark.createDataFrame(
        [(day, i, f"v{i}") for i in range(lo, hi)],
        "day string, id bigint, val string",
    )


def _data_files(root):
    return {
        p
        for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                           recursive=True)
        if "_delta_log" not in p and os.sep + "metadata" + os.sep not in p
    }


def _rows(df):
    return {(r.day, r.id) for r in df.collect()}


# ------------------------------------------------------------------ delta


def test_delta_drop_is_metadata_only(spark, tmp_path):
    root = str(tmp_path / "d")
    write_delta_append(_df(spark, "d1", 0, 3), root, partition_by=("day",))
    write_delta_append(_df(spark, "d2", 3, 6), root)
    write_delta_append(_df(spark, "d1", 6, 8), root)  # 2nd file in d1
    before = _data_files(root)
    v = drop_delta_partition(spark, root, {"day": "d1"})
    assert isinstance(v, int)
    # METADATA-ONLY: not one data file rewritten, moved, or deleted
    assert _data_files(root) == before
    assert _rows(read_delta_snapshot(spark, root)) == {
        ("d2", 3), ("d2", 4), ("d2", 5),
    }
    # time travel still sees the dropped partition (tombstoned history)
    assert ("d1", 0) in _rows(read_delta_snapshot(spark, root, version=v - 1))
    # idempotent re-drop: nothing matches, no commit
    assert drop_delta_partition(spark, root, {"day": "d1"}) is None


def test_delta_drop_validates_keys(spark, tmp_path):
    root = str(tmp_path / "dv")
    write_delta_append(_df(spark, "d1", 0, 2), root, partition_by=("day",))
    with pytest.raises(ValueError, match="not partition columns"):
        drop_delta_partition(spark, root, {"id": "1"})
    with pytest.raises(ValueError, match="whole table"):
        drop_delta_partition(spark, root, {})


def test_delta_pinned_drop_spares_late_appends(spark, tmp_path):
    """The rescue-then-drop safety property: a drop pinned to the file
    set one snapshot read must NOT touch files appended to the partition
    after that snapshot."""
    from mysoftware_nocnetintel_spark.sources.delta import _replay_state

    root = str(tmp_path / "dp")
    write_delta_append(_df(spark, "d1", 0, 3), root, partition_by=("day",))
    write_delta_append(_df(spark, "d2", 3, 5), root)
    st = _replay_state(os.path.join(root, "_delta_log"))
    pinned = [
        rel
        for rel, add in st["live"].items()
        if add["partitionValues"].get("day") == "d1"
    ]
    # the RACING append: commits after the pinning snapshot
    write_delta_append(_df(spark, "d1", 100, 102), root)
    drop_delta_partition(spark, root, {"day": "d1"}, files=pinned)
    got = _rows(read_delta_snapshot(spark, root))
    assert got == {("d2", 3), ("d2", 4), ("d1", 100), ("d1", 101)}, got
    # pinning a file that is live OUTSIDE the partition is refused
    d2_files = [
        rel
        for rel, add in _replay_state(
            os.path.join(root, "_delta_log")
        )["live"].items()
        if add["partitionValues"].get("day") == "d2"
    ]
    with pytest.raises(ValueError, match="not in partition"):
        drop_delta_partition(
            spark, root, {"day": "d1"}, files=d2_files
        )
    # pinned files already dropped: idempotent no-op
    assert (
        drop_delta_partition(spark, root, {"day": "d1"}, files=pinned)
        is None
    )


# ---------------------------------------------------------------- iceberg


def test_iceberg_drop_is_metadata_only(spark, tmp_path):
    root = str(tmp_path / "i")
    write_iceberg_append(
        _df(spark, "d1", 0, 3), root, partition_by=("day",)
    )
    write_iceberg_append(_df(spark, "d2", 3, 6), root)
    write_iceberg_append(_df(spark, "d1", 6, 8), root)
    before = _data_files(root)
    prev = read_iceberg_snapshot(spark, root)
    prev_rows = _rows(prev)
    from mysoftware_nocnetintel_spark.sources.readers import (
        _iceberg_snapshot_files,
    )

    d1_files = {
        e.path
        for e in _iceberg_snapshot_files(root)[0]
        if (e.partition or {})["day"] == "d1"
    }
    snap = drop_iceberg_partition(root, {"day": "d1"})
    assert isinstance(snap, int)
    assert _data_files(root) == before  # METADATA-ONLY
    assert _rows(read_iceberg_snapshot(spark, root)) == {
        ("d2", 3), ("d2", 4), ("d2", 5),
    }
    # time travel: the parent snapshot still sees everything
    _, _, _, cur = _iceberg_snapshot_files(root)
    parent = cur["parent-snapshot-id"]
    assert _rows(
        read_iceberg_snapshot(spark, root, snapshot_id=parent)
    ) == prev_rows
    # idempotent re-drop
    assert drop_iceberg_partition(root, {"day": "d1"}) is None
    # expiration reclaims exactly the dropped partition's files
    expire_iceberg_snapshots(root, keep_last=1)
    gone = before - _data_files(root)
    assert gone == d1_files


def test_iceberg_drop_keeps_delete_manifests(spark, tmp_path):
    """Position deletes on OTHER partitions keep masking after a drop
    (delete manifests travel verbatim)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "idel")
    write_iceberg_append(
        _df(spark, "d1", 0, 3), root, partition_by=("day",)
    )
    write_iceberg_append(_df(spark, "d2", 3, 6), root)
    write_iceberg_position_deletes(spark, root, F.col("id") == 4)
    drop_iceberg_partition(root, {"day": "d1"})
    assert _rows(read_iceberg_snapshot(spark, root)) == {
        ("d2", 3), ("d2", 5),
    }


def test_iceberg_drop_validates_keys_and_pins(spark, tmp_path):
    root = str(tmp_path / "iv")
    write_iceberg_append(
        _df(spark, "d1", 0, 2), root, partition_by=("day",)
    )
    write_iceberg_append(_df(spark, "d2", 2, 4), root)
    with pytest.raises(ValueError, match="not partition fields"):
        drop_iceberg_partition(root, {"id": 1})
    with pytest.raises(ValueError, match="whole table"):
        drop_iceberg_partition(root, {})
    # pinning a live file outside the partition is refused
    from mysoftware_nocnetintel_spark.sources.readers import (
        _iceberg_snapshot_files,
    )

    data_files, _, _, _ = _iceberg_snapshot_files(root)
    d2 = [e.path for e in data_files if (e.partition or {})["day"] == "d2"]
    with pytest.raises(ValueError, match="not in partition"):
        drop_iceberg_partition(root, {"day": "d1"}, files=d2)


def test_iceberg_pinned_drop_spares_late_appends(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.readers import (
        _iceberg_snapshot_files,
    )

    root = str(tmp_path / "ip")
    write_iceberg_append(
        _df(spark, "d1", 0, 3), root, partition_by=("day",)
    )
    write_iceberg_append(_df(spark, "d2", 3, 5), root)
    data_files, _, _, _ = _iceberg_snapshot_files(root)
    pinned = [
        e.path for e in data_files if (e.partition or {})["day"] == "d1"
    ]
    write_iceberg_append(_df(spark, "d1", 100, 102), root)  # the racer
    drop_iceberg_partition(root, {"day": "d1"}, files=pinned)
    got = _rows(read_iceberg_snapshot(spark, root))
    assert got == {("d2", 3), ("d2", 4), ("d1", 100), ("d1", 101)}, got
    # idempotent: pinned set already dropped
    assert (
        drop_iceberg_partition(root, {"day": "d1"}, files=pinned) is None
    )


def test_delta_multi_partition_drop_is_one_commit(spark, tmp_path):
    """Round-10 review finding 3: a LIST of partition dicts drops every
    matching partition in ONE commit (batch sweeps pay one CAS)."""
    root = str(tmp_path / "dm")
    write_delta_append(_df(spark, "d1", 0, 2), root, partition_by=("day",))
    write_delta_append(_df(spark, "d2", 2, 4), root)
    write_delta_append(_df(spark, "d3", 4, 6), root)
    v_before = max(
        int(os.path.basename(p).split(".")[0])
        for p in glob.glob(os.path.join(root, "_delta_log", "*.json"))
    )
    v = drop_delta_partition(
        spark, root, [{"day": "d1"}, {"day": "d3"}]
    )
    assert v == v_before + 1  # exactly one commit for both partitions
    assert _rows(read_delta_snapshot(spark, root)) == {("d2", 2), ("d2", 3)}


def test_iceberg_multi_partition_drop_is_one_snapshot(spark, tmp_path):
    root = str(tmp_path / "im")
    write_iceberg_append(
        _df(spark, "d1", 0, 2), root, partition_by=("day",)
    )
    write_iceberg_append(_df(spark, "d2", 2, 4), root)
    write_iceberg_append(_df(spark, "d3", 4, 6), root)
    import json as _json
    from glob import glob as _g

    meta_files = sorted(
        _g(os.path.join(root, "metadata", "v*.metadata.json"))
    )
    n_snaps = len(
        _json.load(open(meta_files[-1]))["snapshots"]
    )
    snap = drop_iceberg_partition(root, [{"day": "d1"}, {"day": "d3"}])
    assert isinstance(snap, int)
    meta_files = sorted(
        _g(os.path.join(root, "metadata", "v*.metadata.json"))
    )
    assert len(_json.load(open(meta_files[-1]))["snapshots"]) == n_snaps + 1
    assert _rows(read_iceberg_snapshot(spark, root)) == {
        ("d2", 2), ("d2", 3),
    }


def test_iceberg_drop_never_matches_pre_evolution_files(spark, tmp_path):
    """Exactness under SPEC EVOLUTION: files written before the
    partition field existed carry no value for it, so a drop must KEEP
    them (a drop is exact, never a superset) — the evolved era's
    matching files go, the unpartitioned era's rows all survive."""
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        update_iceberg_partition_spec,
    )

    root = str(tmp_path / "ev")
    # unpartitioned era: d1 rows with NO partition record
    write_iceberg_append(_df(spark, "d1", 0, 3), root)
    update_iceberg_partition_spec(root, ("day",))
    # evolved era: d1 and d2 rows under identity(day)
    write_iceberg_append(_df(spark, "d1", 10, 12), root)
    write_iceberg_append(_df(spark, "d2", 20, 22), root)
    snap = drop_iceberg_partition(root, {"day": "d1"})
    assert isinstance(snap, int)
    got = _rows(read_iceberg_snapshot(spark, root))
    # evolved d1 files dropped; pre-evolution d1 rows SURVIVE
    assert got == {
        ("d1", 0), ("d1", 1), ("d1", 2), ("d2", 20), ("d2", 21),
    }, got


def test_delta_drop_translates_mapped_partition_names(spark, tmp_path):
    """Column mapping: after renaming the partition column, the log's
    add.partitionValues stay keyed by PHYSICAL name — a drop by the new
    LOGICAL name must translate (the reader's partition_filter rule)."""
    from mysoftware_nocnetintel_spark.sources.delta import (
        rename_delta_column,
    )

    root = str(tmp_path / "cm")
    write_delta_append(_df(spark, "d1", 0, 2), root, partition_by=("day",))
    write_delta_append(_df(spark, "d2", 2, 4), root)
    rename_delta_column(root, "day", "dt")
    v = drop_delta_partition(spark, root, {"dt": "d1"})
    assert isinstance(v, int)
    got = {(r.dt, r.id) for r in read_delta_snapshot(spark, root).collect()}
    assert got == {("d2", 2), ("d2", 3)}, got
    # the OLD logical name no longer validates
    with pytest.raises(ValueError, match="not partition columns"):
        drop_delta_partition(spark, root, {"day": "d2"})


def test_iceberg_drop_survivors_are_existing_status(spark, tmp_path):
    """Round-11 advisor fix: survivors copied into the drop snapshot's
    fresh manifest are EXISTING (status 0) with explicit ORIGINAL
    snapshot ids — a foreign engine's incremental scan of the delete
    snapshot must not misreport them as newly added files."""
    import json as _json

    from mysoftware_nocnetintel_spark.sources.avro_lite import (
        read_avro_file,
    )

    root = str(tmp_path / "iex")
    # one file per partition inside a SINGLE manifest, so the drop must
    # rewrite that manifest and copy the survivor
    both = spark.createDataFrame(
        [("d1", 0, "a"), ("d2", 1, "b")], "day string, id bigint, val string"
    )
    write_iceberg_append(both, root, partition_by=("day",))
    vs = sorted(
        glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )
    with open(vs[-1]) as f:
        pre_meta = _json.load(f)
    pre_snaps = {s["snapshot-id"] for s in pre_meta["snapshots"]}
    assert drop_iceberg_partition(root, {"day": "d1"}) is not None
    with open(sorted(
        glob.glob(os.path.join(root, "metadata", "v*.metadata.json"))
    )[-1]) as f:
        meta = _json.load(f)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, manifests = read_avro_file(snap["manifest-list"])
    copied = []
    for m in manifests:
        _, entries = read_avro_file(m["manifest_path"])
        copied.extend(e for e in entries if e.get("status") != 2)
    assert copied, "expected a rewritten manifest carrying the survivor"
    for e in copied:
        assert e["status"] == 0, e  # EXISTING, never ADDED
        assert e["snapshot_id"] in pre_snaps
        assert e.get("sequence_number") is not None
    assert _rows(read_iceberg_snapshot(spark, root)) == {("d2", 1)}
