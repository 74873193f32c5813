"""Time-travel WRITES: Delta RESTORE (delta-spark's RESTORE TABLE verb)
and Iceberg rollback_to_snapshot. Both are pure metadata commits — zero
data movement — and both preserve history (the rollback itself can be
undone)."""

from __future__ import annotations

import os

import pytest

from mysoftware_nocnetintel_spark.sources.delta import (
    checkpoint_delta_table,
    cleanup_delta_log,
    delete_delta_rows,
    restore_delta_table,
    vacuum_delta,
    write_delta_append,
    write_delta_overwrite,
)
from mysoftware_nocnetintel_spark.sources.iceberg import (
    rollback_iceberg_table,
    write_iceberg_append,
)
from mysoftware_nocnetintel_spark.sources.readers import (
    read_delta_snapshot,
    read_iceberg_snapshot,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


def test_delta_restore_roundtrip_and_undo(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_append(_mk(spark, [(1, "a")]), path)          # v0
    write_delta_append(_mk(spark, [(2, "b")]), path)          # v1
    write_delta_overwrite(_mk(spark, [(9, "z")]), path)       # v2
    v = restore_delta_table(path, 1)                          # v3
    assert v == 3
    assert _rows(read_delta_snapshot(spark, path)) == {(1, "a"), (2, "b")}
    # history intact: the overwritten state is still time-travelable
    assert _rows(read_delta_snapshot(spark, path, version=2)) == {(9, "z")}
    # and the restore itself can be undone by restoring to v2
    restore_delta_table(path, 2)
    assert _rows(read_delta_snapshot(spark, path)) == {(9, "z")}


def test_delta_restore_reverts_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_append(_mk(spark, [(1, "a")]), path)
    write_delta_append(
        spark.createDataFrame(
            [(2, "b", 7.5)], "id bigint, val string, score double"
        ),
        path,
    )
    got = read_delta_snapshot(spark, path)
    assert "score" in got.columns
    restore_delta_table(path, 0)
    got = read_delta_snapshot(spark, path)
    assert got.columns == ["id", "val"]
    assert _rows(got) == {(1, "a")}


def test_delta_restore_reinstates_deletion_vectors(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_append(
        _mk(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), path
    )  # v0
    delete_delta_rows(spark, path, "id = 2")  # v1, DV
    write_delta_overwrite(_mk(spark, [(9, "z")]), path)  # v2
    restore_delta_table(path, 1)
    assert _rows(read_delta_snapshot(spark, path)) == {(1, "a"), (3, "c")}
    # restoring to v0 un-deletes (the pre-DV entry has no DV)
    restore_delta_table(path, 0)
    assert _rows(read_delta_snapshot(spark, path)) == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }


def test_delta_restore_fails_on_vacuumed_files(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_append(_mk(spark, [(1, "a")]), path)
    write_delta_overwrite(_mk(spark, [(2, "b")]), path)
    # age the tombstoned v0 file out and vacuum it away
    assert vacuum_delta(path, retention_ms=0)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        restore_delta_table(path, 0)


def test_delta_restore_refusals(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_append(_mk(spark, [(1, "a")]), path)
    with pytest.raises(ValueError, match="already at version"):
        restore_delta_table(path, 0)
    with pytest.raises(ValueError, match="does not exist"):
        restore_delta_table(path, 5)
    # below a cleaned-up checkpoint the old state is unreconstructable
    write_delta_overwrite(_mk(spark, [(2, "b")]), path)
    write_delta_overwrite(_mk(spark, [(3, "c")]), path)
    checkpoint_delta_table(path)
    cleanup_delta_log(path)
    with pytest.raises(NotImplementedError, match="cleaned up"):
        restore_delta_table(path, 0)


def test_iceberg_rollback_moves_pointer_keeps_history(spark, tmp_path):
    path = str(tmp_path / "t")
    s1 = write_iceberg_append(_mk(spark, [(1, "a")]), path)
    s2 = write_iceberg_append(_mk(spark, [(2, "b")]), path)
    rollback_iceberg_table(path, s1)
    assert _rows(read_iceberg_snapshot(spark, path)) == {(1, "a")}
    # rolled-back snapshot stays time-travelable (history untouched)
    assert _rows(read_iceberg_snapshot(spark, path, snapshot_id=s2)) == {
        (1, "a"),
        (2, "b"),
    }
    # an append after rollback builds on the ROLLED-BACK state
    write_iceberg_append(_mk(spark, [(3, "c")]), path)
    assert _rows(read_iceberg_snapshot(spark, path)) == {(1, "a"), (3, "c")}


def test_iceberg_rollback_refusals(spark, tmp_path):
    path = str(tmp_path / "t")
    s1 = write_iceberg_append(_mk(spark, [(1, "a")]), path)
    with pytest.raises(ValueError, match="already current"):
        rollback_iceberg_table(path, s1)
    with pytest.raises(ValueError, match="does not exist"):
        rollback_iceberg_table(path, 12345)
    with pytest.raises(FileNotFoundError):
        rollback_iceberg_table(str(tmp_path / "nope"), s1)
