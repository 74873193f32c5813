"""Delta coordinated-commits END-TO-END (round-11 verdict task 3): an
in-process coordinator double (catalog.InProcessCommitCoordinator — the
Delta twin of tests/rest_catalog_server.py) implementing commit /
getCommits / backfill, driven through the full conformance flow:
enable → coordinated commits → foreign-writer refusal → lazy-backfill
visibility (the coordinated process reads the true head from the
getCommits merge; a plain process sees the consistent backfilled
prefix) → explicit backfill → views converge. Plus the ICT chain
clamping across UN-BACKFILLED parents — the exact seam where lazy
backfill would otherwise let clock skew regress the chain.

This implements the scoping doc's previously-declined row
(docs/delta_coordinated_commits.md "getCommits merge in readers") for
the snapshot reader + writer-state replay + ICT chain; delta_history /
CDF / the streaming tailer remain documented backfilled-prefix views.
"""

from __future__ import annotations

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources import delta as D
from mysoftware_nocnetintel_spark.sources.catalog import (
    CatalogCommitConflict,
    FilesystemCommitter,
    InProcessCommitCoordinator,
    set_committer,
    use_committer,
)
from mysoftware_nocnetintel_spark.sources.delta import (
    enable_delta_coordinated_commits,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "id bigint, val string"
    )


def _json_versions(root):
    log = os.path.join(root, "_delta_log")
    return sorted(
        int(p.split(".")[0])
        for p in os.listdir(log)
        if p.endswith(".json") and p.split(".")[0].isdigit()
    )


@pytest.fixture
def plain_committer():
    """Restore the default committer after each test."""
    yield
    set_committer(None)


def test_coordinated_flow_synchronous_backfill(spark, tmp_path,
                                               plain_committer):
    root = str(tmp_path / "sync")
    write_delta_append(_df(spark, 0, 3), root)
    coord = InProcessCommitCoordinator("coord-a", backfill_every=1)
    set_committer(coord)
    enable_delta_coordinated_commits(root, "coord-a")
    v = write_delta_append(_df(spark, 3, 6), root)
    # synchronous mode: every commit materializes immediately
    assert _json_versions(root) == list(range(v + 1))
    assert coord.get_commits(os.path.join(root, "_delta_log")) == {}
    assert read_delta_snapshot(spark, root).count() == 6
    # foreign (non-coordinator) writer refused
    set_committer(None)
    with pytest.raises(NotImplementedError, match="coordinator"):
        write_delta_append(_df(spark, 6, 9), root)


def test_lazy_backfill_visibility_and_convergence(spark, tmp_path,
                                                  plain_committer):
    """The conformance core: un-backfilled commits are visible to the
    coordinated process (snapshot + writer state), invisible to a plain
    process, and backfill converges the views byte-for-byte."""
    root = str(tmp_path / "lazy")
    write_delta_append(_df(spark, 0, 2), root)  # v0, plain filesystem
    coord = InProcessCommitCoordinator("coord-b", backfill_every=1000)
    set_committer(coord)
    enable_delta_coordinated_commits(root, "coord-b")  # v1 -> tail
    v2 = write_delta_append(_df(spark, 2, 4), root)
    v3 = write_delta_append(_df(spark, 4, 6), root)
    assert (v2, v3) == (2, 3)
    log = os.path.join(root, "_delta_log")
    # nothing past v0 materialized on disk
    assert _json_versions(root) == [0]
    tail = coord.get_commits(log)
    assert sorted(tail) == [1, 2, 3]
    # the COORDINATED process reads the true head
    assert {r.id for r in read_delta_snapshot(spark, root).collect()} == set(
        range(6)
    )
    assert D._replay_state(log)["version"] == 3
    # version time travel works across the virtual tail
    assert read_delta_snapshot(spark, root, version=2).count() == 4
    # a PLAIN process (no coordinator) sees the consistent prefix
    with use_committer(FilesystemCommitter()):
        assert {
            r.id for r in read_delta_snapshot(spark, root).collect()
        } == {0, 1}
    # txn idempotence gates see un-backfilled txn actions
    write_delta_append(_df(spark, 6, 8), root, txn=("app", 7))
    before = D._replay_state(log)["version"]
    assert write_delta_append(_df(spark, 6, 8), root, txn=("app", 7)) == before
    assert D._replay_state(log)["version"] == before  # replay skipped
    # explicit backfill: views converge
    n = coord.backfill(log)
    assert n == before  # v1..v_before materialized (v0 was a file)
    assert _json_versions(root) == list(range(before + 1))
    assert coord.get_commits(log) == {}
    with use_committer(FilesystemCommitter()):
        assert {
            r.id for r in read_delta_snapshot(spark, root).collect()
        } == set(range(8))


def test_coordinator_version_cas(tmp_path, plain_committer):
    coord = InProcessCommitCoordinator("coord-c", backfill_every=1000)
    log = str(tmp_path / "t" / "_delta_log")
    os.makedirs(log)
    p = os.path.join(log, f"{0:020d}.json")
    coord.put_if_absent(p, b'{"commitInfo": {"timestamp": 1}}\n')
    with pytest.raises(CatalogCommitConflict):
        coord.put_if_absent(p, b'{"commitInfo": {"timestamp": 2}}\n')
    # versions at or below the tail head are refused even as files
    with pytest.raises(CatalogCommitConflict):
        coord.put_if_absent(p, b"x")
    # periodic backfill: every Nth version flushes the whole tail
    every = InProcessCommitCoordinator("coord-c2", backfill_every=2)
    log2 = str(tmp_path / "t2" / "_delta_log")
    os.makedirs(log2)
    for v in (0, 1, 2):
        every.put_if_absent(
            os.path.join(log2, f"{v:020d}.json"),
            b'{"commitInfo": {"timestamp": 1}}\n',
        )
    # v2 (== 0 mod 2) triggered the flush of v0..v2
    assert sorted(
        int(f.split(".")[0]) for f in os.listdir(log2) if f.endswith(".json")
    ) == [0, 1, 2]
    assert every.get_commits(log2) == {}


def test_ict_chain_clamps_across_unbackfilled_parent(
    spark, tmp_path, plain_committer, monkeypatch
):
    """Clock skew between commits whose parents are un-backfilled: the
    ICT chain must clamp against the COORDINATOR's copy of the parent,
    or a backwards wall clock would regress the chain exactly when
    backfill lags."""
    root = str(tmp_path / "skew")
    write_delta_append(_df(spark, 0, 2), root)
    coord = InProcessCommitCoordinator("coord-d", backfill_every=1000)
    set_committer(coord)
    enable_delta_coordinated_commits(root, "coord-d")
    log = os.path.join(root, "_delta_log")

    real_time = D.time.time
    monkeypatch.setattr(
        D.time, "time", lambda: real_time() - 3600
    )  # wall clock jumps back an hour AFTER the enable commit
    write_delta_append(_df(spark, 2, 4), root)
    write_delta_append(_df(spark, 4, 6), root)
    icts = []
    for v, payload in sorted(coord.get_commits(log).items()):
        for line in payload.decode().splitlines():
            act = json.loads(line)
            if "commitInfo" in act:
                icts.append(int(act["commitInfo"]["inCommitTimestamp"]))
                break
    assert len(icts) == 3
    assert icts == sorted(set(icts)), f"ICT chain regressed: {icts}"


def test_mid_migration_version_in_both_sources_dedupes(
    spark, tmp_path, plain_committer
):
    """Round-11 review fix: the tail is fetched BEFORE the file listing,
    so a backfill racing the reader lands the migrating version in BOTH
    sources — the dedup (files win) must yield one consistent snapshot,
    never a double-fold or a missing middle commit."""
    root = str(tmp_path / "mig")
    write_delta_append(_df(spark, 0, 2), root)  # v0 file
    coord = InProcessCommitCoordinator("coord-m", backfill_every=1000)
    set_committer(coord)
    enable_delta_coordinated_commits(root, "coord-m")  # v1 tail
    write_delta_append(_df(spark, 2, 4), root)  # v2 tail
    log = os.path.join(root, "_delta_log")
    # simulate the mid-migration state: v1 materialized on disk while
    # STILL present in the coordinator tail
    FilesystemCommitter().put_if_absent(
        os.path.join(log, f"{1:020d}.json"), coord.get_commits(log)[1]
    )
    assert 1 in coord.get_commits(log) and os.path.exists(
        os.path.join(log, f"{1:020d}.json")
    )
    st = D._replay_state(log)
    assert st["version"] == 2
    assert {r.id for r in read_delta_snapshot(spark, root).collect()} == {
        0, 1, 2, 3,
    }


def test_gapped_tail_rejected_commit_and_replay(
    spark, tmp_path, plain_committer
):
    """Both gap defenses: the coordinator CAS refuses a commit that is
    not exactly head+1, and the replay refuses to fold a foreign
    coordinator's non-contiguous getCommits result over the head."""
    coord = InProcessCommitCoordinator("coord-g", backfill_every=1000)
    log = str(tmp_path / "g" / "_delta_log")
    os.makedirs(log)
    coord.put_if_absent(
        os.path.join(log, f"{0:020d}.json"),
        b'{"commitInfo": {"timestamp": 1}}\n',
    )
    with pytest.raises(CatalogCommitConflict, match="sequential"):
        coord.put_if_absent(
            os.path.join(log, f"{2:020d}.json"),
            b'{"commitInfo": {"timestamp": 2}}\n',
        )
    # a FOREIGN coordinator returning a gapped tail: replay fails loudly
    root = str(tmp_path / "t")
    write_delta_append(_df(spark, 0, 2), root)  # v0 as a file

    class GappedCoordinator(InProcessCommitCoordinator):
        def get_commits(self, log_dir, start_version=None):
            return {5: b'{"add": {"path": "x.parquet"}}\n'}

    set_committer(GappedCoordinator("coord-g2"))
    with pytest.raises(ValueError, match="non-contiguous"):
        D._replay_state(os.path.join(root, "_delta_log"))
    # the READ path refuses the identical gapped state (review fix: the
    # guard exists on both sides, not just the writer replay)
    with pytest.raises(ValueError, match="non-contiguous"):
        read_delta_snapshot(spark, root).count()
    # and an all-virtual log whose tail does not start at version 0 is
    # a gap over the EMPTY prefix — also refused
    bare = str(tmp_path / "bare")
    os.makedirs(os.path.join(bare, "_delta_log"))
    with pytest.raises(ValueError, match="non-contiguous"):
        D._replay_state(os.path.join(bare, "_delta_log"))


def test_unbackfilled_commit_without_commitinfo_refuses_ts_travel(
    spark, tmp_path, plain_committer
):
    """A virtual commit with no commitInfo has no clock (file commits
    fall back to mtime): timestamp travel refuses loudly instead of
    silently resolving to a stale version."""
    root = str(tmp_path / "noci")
    write_delta_append(_df(spark, 0, 2), root)
    coord = InProcessCommitCoordinator("coord-n", backfill_every=1000)
    set_committer(coord)
    log = os.path.join(root, "_delta_log")
    coord.put_if_absent(
        os.path.join(log, f"{1:020d}.json"),
        b'{"add": {"path": "nope.parquet", "partitionValues": {}}}\n',
    )
    import time as _t

    with pytest.raises(NotImplementedError, match="no commitInfo"):
        read_delta_snapshot(
            spark, root, as_of_ms=int(_t.time() * 1000) + 10_000
        ).count()


def test_coordinator_cas_survives_checkpoint_cleanup(
    spark, tmp_path, plain_committer
):
    """Round-11 review fix: the strict head+1 CAS reads the checkpoint
    version too — a checkpointed-then-cleaned log (no <v>.json left at
    the head) must keep accepting the next sequential commit."""
    from mysoftware_nocnetintel_spark.sources.delta import (
        checkpoint_delta_table,
        cleanup_delta_log,
    )

    root = str(tmp_path / "cp")
    coord = InProcessCommitCoordinator("coord-cp", backfill_every=1)
    set_committer(coord)
    for lo in (0, 2, 4):
        write_delta_append(_df(spark, lo, lo + 2), root)
    cp_v = checkpoint_delta_table(root)
    cleanup_delta_log(root)
    assert _json_versions(root) == []  # every <v>.json <= cp removed
    v = write_delta_append(_df(spark, 6, 8), root)  # must NOT conflict
    assert v == cp_v + 1
    assert read_delta_snapshot(spark, root).count() == 8
