"""Filesystem compare-and-swap commits for the Iceberg writer
(HadoopTableOperations recipe: hard-link put-if-absent of
``v<N>.metadata.json``). A lost race must never clobber the winning
commit: appends re-stage their metadata on top of the winner (appends
commute), every other commit kind surfaces ``IcebergCommitConflict``."""

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources import iceberg as ice
from mysoftware_nocnetintel_spark.sources.iceberg import (
    IcebergCommitConflict,
    expire_iceberg_snapshots,
    write_iceberg_append,
    write_iceberg_position_deletes,
)
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "id bigint, val string"
    )


def _ids(spark, root):
    return sorted(r.id for r in read_iceberg_snapshot(spark, root).collect())


def test_append_retries_on_lost_race(spark, tmp_path, monkeypatch):
    """Simulate a concurrent writer landing BETWEEN our staging and our
    commit: intercept the first _commit_metadata call, run a full
    competing append (which commits the contested version for real),
    then let the original commit proceed — it must lose the CAS, retry
    against the winner's metadata, and land BOTH row sets."""
    root = str(tmp_path / "cas1")
    write_iceberg_append(_df(spark, 0, 5), root)

    real = ice._commit_metadata
    fired = {"n": 0}

    def racing(meta_dir, prev_ver, new_meta):
        if fired["n"] == 0:
            fired["n"] = 1
            # the competing writer wins the contested version
            write_iceberg_append(_df(spark, 100, 103), root)
        return real(meta_dir, prev_ver, new_meta)

    monkeypatch.setattr(ice, "_commit_metadata", racing)
    write_iceberg_append(_df(spark, 5, 8), root)
    monkeypatch.setattr(ice, "_commit_metadata", real)

    assert _ids(spark, root) == list(range(0, 8)) + [100, 101, 102]
    # three committed versions + create, no clobbered file
    metas = sorted(
        os.listdir(os.path.join(root, "metadata"))
    )
    assert sum(1 for m in metas if m.endswith(".metadata.json")) == 3
    hint = open(os.path.join(root, "metadata", "version-hint.text")).read()
    assert hint == "3"


def test_delete_surfaces_conflict(spark, tmp_path, monkeypatch):
    """Non-commuting commits (delete) must raise, not retry: a
    competing append lands between the delete's staging and its commit."""
    root = str(tmp_path / "cas2")
    write_iceberg_append(_df(spark, 0, 10), root)

    real = ice._commit_metadata
    fired = {"n": 0}

    def racing(meta_dir, prev_ver, new_meta):
        if fired["n"] == 0:
            fired["n"] = 1
            write_iceberg_append(_df(spark, 100, 102), root)
        return real(meta_dir, prev_ver, new_meta)

    monkeypatch.setattr(ice, "_commit_metadata", racing)
    from pyspark.sql import functions as F

    with pytest.raises(IcebergCommitConflict, match="another"):
        write_iceberg_position_deletes(spark, root, F.col("id") < 3)
    monkeypatch.setattr(ice, "_commit_metadata", real)
    # the losing delete left the winner's state intact — no rows deleted
    assert _ids(spark, root) == list(range(10)) + [100, 101]


def test_expire_surfaces_conflict_without_deleting(
    spark, tmp_path, monkeypatch
):
    """Expiration must commit BEFORE deleting files: when the CAS loses,
    every file the winner references must still exist."""
    root = str(tmp_path / "cas3")
    write_iceberg_append(_df(spark, 0, 3), root)
    write_iceberg_append(_df(spark, 3, 6), root)
    write_iceberg_append(_df(spark, 6, 9), root)
    write_iceberg_append(_df(spark, 9, 12), root)

    real = ice._commit_metadata
    fired = {"n": 0}

    def racing(meta_dir, prev_ver, new_meta):
        if fired["n"] == 0:
            fired["n"] = 1
            write_iceberg_append(_df(spark, 100, 102), root)
        return real(meta_dir, prev_ver, new_meta)

    monkeypatch.setattr(ice, "_commit_metadata", racing)
    with pytest.raises(IcebergCommitConflict):
        expire_iceberg_snapshots(root, keep_last=1)
    monkeypatch.setattr(ice, "_commit_metadata", real)
    # nothing was deleted: the full table (winner's append included)
    # still reads, and so does time travel to the oldest snapshot
    assert _ids(spark, root) == list(range(12)) + [100, 101]
    meta = json.load(
        open(os.path.join(root, "metadata", "v5.metadata.json"))
    )
    oldest = min(s["sequence-number"] for s in meta["snapshots"])
    assert oldest == 1  # no snapshot was expired


def test_schema_change_under_staged_append_conflicts(
    spark, tmp_path, monkeypatch
):
    """If the winning commit changed the schema, the staged files' stats
    are keyed to stale field ids — the append must NOT auto-retry."""
    root = str(tmp_path / "cas4")
    write_iceberg_append(_df(spark, 0, 3), root)

    real = ice._commit_metadata
    fired = {"n": 0}

    def racing(meta_dir, prev_ver, new_meta):
        if fired["n"] == 0:
            fired["n"] = 1
            # competing ADD-COLUMN append evolves the schema
            write_iceberg_append(
                spark.createDataFrame(
                    [(50, "x", 1.5)], "id bigint, val string, score double"
                ),
                root,
            )
        return real(meta_dir, prev_ver, new_meta)

    monkeypatch.setattr(ice, "_commit_metadata", racing)
    with pytest.raises(IcebergCommitConflict, match="schema"):
        write_iceberg_append(_df(spark, 3, 6), root)
    monkeypatch.setattr(ice, "_commit_metadata", real)
    # winner's commit intact
    assert _ids(spark, root) == [0, 1, 2, 50]


def test_version_hint_written(spark, tmp_path):
    root = str(tmp_path / "cas5")
    write_iceberg_append(_df(spark, 0, 2), root)
    write_iceberg_append(_df(spark, 2, 4), root)
    hint = os.path.join(root, "metadata", "version-hint.text")
    assert open(hint).read() == "2"
    meta = json.load(open(os.path.join(root, "metadata", "v2.metadata.json")))
    assert meta["current-snapshot-id"] == meta["snapshots"][-1]["snapshot-id"]
