"""Delta LAYOUT MIGRATION (round 7): ``repartition_delta_table``
rewrites the live rows under a new ``partitionColumns`` layout in ONE
commit (new metaData + removes + adds, all ``dataChange: false``) — the
Delta answer to Iceberg partition spec evolution, which is metadata-only
there because Iceberg's spec travels per manifest."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources import delta as dl
from mysoftware_nocnetintel_spark.sources.delta import (
    delete_delta_rows,
    rename_delta_column,
    repartition_delta_table,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _df(spark, rows, schema="id bigint, day string, val string"):
    return spark.createDataFrame(rows, schema)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_partition_unpartitioned_table(spark, tmp_path):
    root = str(tmp_path / "t1")
    write_delta_append(
        _df(spark, [(i, f"d{i % 2}", f"v{i}") for i in range(6)]), root
    )
    v = repartition_delta_table(spark, root, ("day",))

    got = read_delta_snapshot(spark, root).select("id", "day", "val")
    assert _rows(got) == [(i, f"d{i % 2}", f"v{i}") for i in range(6)]
    # the new layout prunes: corrupt the d1 partition's files and read
    # only d0 — driver-side pruning must never open them
    state = dl._replay_state(os.path.join(root, "_delta_log"))
    assert state["meta"]["partitionColumns"] == ["day"]
    for rel, e in state["live"].items():
        if (e.get("partitionValues") or {}).get("day") == "d1":
            with open(os.path.join(root, rel), "wb") as fh:
                fh.write(b"garbage")
    got = read_delta_snapshot(spark, root, partition_filter={"day": "d0"})
    assert sorted(r.id for r in got.collect()) == [0, 2, 4]
    # time travel below the migration keeps the OLD (unpartitioned)
    # metaData — but its files are the ones we just corrupted, so only
    # check the replayed metadata, not the rows
    import json as _json

    old_state = dl._replay_state(
        os.path.join(root, "_delta_log"), as_of=v - 1
    )
    assert old_state["meta"]["partitionColumns"] in ([], None)


def test_repartition_applies_dvs_and_appends_inherit(spark, tmp_path):
    root = str(tmp_path / "t2")
    write_delta_append(
        _df(spark, [(i, f"d{i % 3}", f"v{i}") for i in range(9)]), root
    )
    delete_delta_rows(spark, root, "id in (1, 4)")
    repartition_delta_table(spark, root, ("day",))
    got = read_delta_snapshot(spark, root)
    assert sorted(r.id for r in got.collect()) == [0, 2, 3, 5, 6, 7, 8]
    # masked rows never resurrect, and no DV survives the rewrite
    state = dl._replay_state(os.path.join(root, "_delta_log"))
    assert not any(e.get("deletionVector") for e in state["live"].values())
    # appends inherit the NEW layout
    write_delta_append(_df(spark, [(20, "d0", "new")]), root)
    got = read_delta_snapshot(spark, root, partition_filter={"day": "d0"})
    assert sorted(r.id for r in got.collect()) == [0, 3, 6, 20]


def test_unpartition_and_refusals(spark, tmp_path):
    root = str(tmp_path / "t3")
    write_delta_append(
        _df(spark, [(1, "d0", "a"), (2, "d1", "b")]),
        root,
        partition_by=("day",),
    )
    with pytest.raises(ValueError, match="already partitioned"):
        repartition_delta_table(spark, root, ("day",))
    with pytest.raises(ValueError, match="not in the schema"):
        repartition_delta_table(spark, root, ("nope",))
    repartition_delta_table(spark, root, ())
    state = dl._replay_state(os.path.join(root, "_delta_log"))
    assert state["meta"]["partitionColumns"] == []
    assert _rows(
        read_delta_snapshot(spark, root).select("id", "day", "val")
    ) == [
        (1, "d0", "a"),
        (2, "d1", "b"),
    ]


def test_repartition_mapped_table_by_renamed_column(spark, tmp_path):
    """Layout migration composes with column mapping: partition by a
    column that was RENAMED (its physicalName differs), then prune by
    the logical name."""
    root = str(tmp_path / "t4")
    write_delta_append(
        _df(spark, [(i, f"d{i % 2}", f"v{i}") for i in range(4)]), root
    )
    rename_delta_column(root, "day", "zone")
    repartition_delta_table(spark, root, ("zone",))
    state = dl._replay_state(os.path.join(root, "_delta_log"))
    assert state["meta"]["partitionColumns"] == ["zone"]
    # partitionValues keyed by the PHYSICAL name (pinned at upgrade)
    pv_keys = {
        k
        for e in state["live"].values()
        for k in (e.get("partitionValues") or {})
    }
    assert pv_keys == {"day"}
    got = read_delta_snapshot(spark, root, partition_filter={"zone": "d1"})
    assert sorted(r.id for r in got.collect()) == [1, 3]
    # and the partition column reads back typed/logical
    assert sorted(got.columns) == ["id", "val", "zone"]


def test_migration_is_datachange_false_for_tailers(spark, tmp_path):
    from mysoftware_nocnetintel_spark.streaming.ops import DeltaTailer

    root = str(tmp_path / "t5")
    write_delta_append(_df(spark, [(1, "d0", "a")]), root)
    t = DeltaTailer(spark, root, str(tmp_path / "ckpt"))
    assert t.poll() is not None
    t.commit()
    repartition_delta_table(spark, root, ("day",))
    # a pure layout migration emits no new rows downstream
    assert t.poll() is None
    write_delta_append(_df(spark, [(2, "d1", "b")]), root)
    batch = t.poll()
    assert batch is not None
    assert sorted(r.id for r in batch.collect()) == [2]
    t.commit()


def test_migration_recomputes_after_lost_race(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "t6")
    write_delta_append(
        _df(spark, [(1, "d0", "a"), (2, "d1", "b")]), root
    )

    real = dl._commit_version
    fired = {"n": 0}

    def racing(log_dir, version, actions):
        if fired["n"] == 0:
            fired["n"] = 1
            monkeypatch.setattr(dl, "_commit_version", real)
            try:
                write_delta_append(_df(spark, [(9, "d0", "w")]), root)
            finally:
                monkeypatch.setattr(dl, "_commit_version", racing)
        return real(log_dir, version, actions)

    monkeypatch.setattr(dl, "_commit_version", racing)
    repartition_delta_table(spark, root, ("day",))
    monkeypatch.setattr(dl, "_commit_version", real)
    # the recompute re-read the winner's row, so it migrated too
    got = read_delta_snapshot(spark, root, partition_filter={"day": "d0"})
    assert sorted(r.id for r in got.collect()) == [1, 9]
