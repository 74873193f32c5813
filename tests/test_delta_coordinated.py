"""Delta COORDINATED-COMMITS handshake (PROTOCOL.md "Coordinated
Commits"; docs/delta_coordinated_commits.md "do" row 2): enabling
coordination declares the coordinator in the table's metadata and
upgrades to the writer feature, and every version-creating verb then
refuses unless the process's committer declares the SAME coordinator
name — fail-closed, so "all writers go through the coordinator" is
enforceable rather than advisory. Maintenance that creates no commit
(vacuum, checkpoint) stays direct per the spec.
"""

from __future__ import annotations

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources import delta as D
from mysoftware_nocnetintel_spark.sources.catalog import (
    FilesystemCommitter,
    committer_from_spec,
    use_committer,
)
from mysoftware_nocnetintel_spark.sources.delta import (
    checkpoint_delta_table,
    delete_delta_rows,
    drop_delta_partition,
    enable_delta_coordinated_commits,
    rename_delta_column,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


class _Coordinator(FilesystemCommitter):
    """A coordinator-declaring committer: same filesystem CAS, plus the
    handshake identity (what a real commit-coordinator endpoint would
    carry on the catalog seam)."""

    coordinator_name = "test-coord"


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "id bigint, val string"
    )


def _setup(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta_append(_df(spark, 0, 3), root)
    with use_committer(_Coordinator()):
        v = enable_delta_coordinated_commits(
            root, "test-coord", {"endpoint": "https://coord.example"}
        )
    return root, v


def test_enable_declares_coordinator_and_requires_it(spark, tmp_path):
    root, v = _setup(spark, tmp_path)
    st = D._replay_state(os.path.join(root, "_delta_log"))
    conf = st["meta"]["configuration"]
    assert (
        conf["delta.coordinatedCommits.commitCoordinator-preview"]
        == "test-coord"
    )
    assert json.loads(
        conf["delta.coordinatedCommits.commitCoordinatorConf-preview"]
    ) == {"endpoint": "https://coord.example"}
    feats = st["protocol"]["writerFeatures"]
    assert "coordinatedCommits-preview" in feats
    # the spec requires ICT on coordinated tables: enabled in the SAME
    # commit, chain started
    assert "inCommitTimestamp" in feats
    assert conf["delta.enableInCommitTimestamps"] == "true"
    # enabling without committing through the coordinator is refused
    root2 = str(tmp_path / "t2")
    write_delta_append(_df(spark, 0, 2), root2)
    with pytest.raises(ValueError, match="requires this process"):
        enable_delta_coordinated_commits(root2, "test-coord")


def test_writers_fail_closed_off_coordinator(spark, tmp_path):
    root, _ = _setup(spark, tmp_path)
    # default committer declares no coordinator: every commit verb refuses
    with pytest.raises(NotImplementedError, match="test-coord"):
        write_delta_append(_df(spark, 3, 5), root)
    with pytest.raises(NotImplementedError, match="test-coord"):
        delete_delta_rows(spark, root, "id = 0")
    with pytest.raises(NotImplementedError, match="test-coord"):
        rename_delta_column(root, "val", "label")
    with pytest.raises(NotImplementedError, match="test-coord"):
        drop_delta_partition(spark, root, {"id": "0"})
    # nothing committed, table unchanged
    assert read_delta_snapshot(spark, root).count() == 3


def test_writes_flow_through_the_coordinator(spark, tmp_path):
    root, v_en = _setup(spark, tmp_path)
    with use_committer(_Coordinator()):
        v1 = write_delta_append(_df(spark, 3, 5), root)
        v2 = delete_delta_rows(spark, root, "id = 0")
        # idempotent re-enable: no new commit
        assert enable_delta_coordinated_commits(root, "test-coord") == v2
        # ICT chain continues through coordinated commits
        log_dir = os.path.join(root, "_delta_log")
        icts = []
        for v in (v_en, v1, v2):
            with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
                ci = json.loads(fh.readline())["commitInfo"]
            icts.append(int(ci["inCommitTimestamp"]))
        assert icts == sorted(set(icts))
        assert read_delta_snapshot(spark, root).count() == 4
    # commit-free maintenance stays direct (spec-allowed): checkpoint
    # works on the default committer
    checkpoint_delta_table(root)


def test_spec_grammar_carries_coordinator_name():
    c = committer_from_spec(
        "rest+http://h:9?ns=a.b&coordinator=prod-coord"
    )
    assert c.coordinator_name == "prod-coord"
    assert committer_from_spec("rest+http://h:9").coordinator_name is None
    assert committer_from_spec("filesystem").coordinator_name is None
