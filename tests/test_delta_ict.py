"""Delta IN-COMMIT TIMESTAMPS (PROTOCOL.md "In-Commit Timestamps",
round 10 — the first "do" row of docs/delta_coordinated_commits.md):
one enable commit starts the chain (writer feature + enablement
properties + the first inCommitTimestamp), every later commit continues
it with a STRICTLY MONOTONE clamp (max(wall clock, parent ICT + 1)),
timestamp time travel and DESCRIBE HISTORY prefer the ICT, and log
cleanup keeps the newest ICT-bearing commit so the chain survives.
"""

from __future__ import annotations

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources import delta as D
from mysoftware_nocnetintel_spark.sources.delta import (
    checkpoint_delta_table,
    cleanup_delta_log,
    delete_delta_rows,
    delta_history,
    enable_delta_in_commit_timestamps,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "id bigint, val string"
    )


def _commit_info(root, version):
    p = os.path.join(root, "_delta_log", f"{version:020d}.json")
    with open(p) as fh:
        for line in fh:
            if line.strip():
                act = json.loads(line)
                if "commitInfo" in act:
                    return act["commitInfo"]
    return None


def test_enable_starts_chain_and_commits_continue_it(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta_append(_df(spark, 0, 3), root)
    v_en = enable_delta_in_commit_timestamps(root)
    st = D._replay_state(os.path.join(root, "_delta_log"))
    conf = st["meta"]["configuration"]
    assert conf["delta.enableInCommitTimestamps"] == "true"
    assert conf["delta.inCommitTimestampEnablementVersion"] == str(v_en)
    assert "inCommitTimestamp" in st["protocol"]["writerFeatures"]
    assert st["protocol"]["minWriterVersion"] == 7
    ict_en = _commit_info(root, v_en)["inCommitTimestamp"]
    assert ict_en == int(
        conf["delta.inCommitTimestampEnablementTimestamp"]
    )
    # idempotent re-enable: no new commit
    assert enable_delta_in_commit_timestamps(root) == v_en

    # every later commit carries a strictly larger ICT — append, MOR
    # delete (validated-retry path) included
    v1 = write_delta_append(_df(spark, 3, 6), root)
    v2 = delete_delta_rows(spark, root, "id = 0")
    icts = [ict_en]
    for v in (v1, v2):
        ci = _commit_info(root, v)
        assert ci.get("inCommitTimestamp") is not None, v
        icts.append(int(ci["inCommitTimestamp"]))
    assert icts == sorted(set(icts)), f"non-monotone ICT chain: {icts}"


def test_ict_monotone_under_clock_skew(spark, tmp_path, monkeypatch):
    """A wall clock that jumps BACKWARD must not produce a regressing
    ICT: the clamp pins the next commit to parent ICT + 1."""
    root = str(tmp_path / "skew")
    write_delta_append(_df(spark, 0, 2), root)
    enable_delta_in_commit_timestamps(root)
    parent_ict = _commit_info(root, 1)["inCommitTimestamp"]

    real_time = D.time.time
    monkeypatch.setattr(
        D.time, "time", lambda: (parent_ict - 3_600_000) / 1000.0
    )
    try:
        v = write_delta_append(_df(spark, 2, 4), root)
    finally:
        monkeypatch.setattr(D.time, "time", real_time)
    ci = _commit_info(root, v)
    assert ci["inCommitTimestamp"] == parent_ict + 1
    # the informational timestamp keeps the (skewed) wall clock; the
    # reader prefers the ICT, so time travel stays monotone
    assert ci["timestamp"] < ci["inCommitTimestamp"]


def test_as_of_ms_and_history_prefer_ict(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "tt")
    write_delta_append(_df(spark, 0, 2), root)   # v0
    enable_delta_in_commit_timestamps(root)       # v1
    ict1 = _commit_info(root, 1)["inCommitTimestamp"]
    # skewed commit: wall clock an hour EARLY, ICT clamps to ict1+1
    real_time = D.time.time
    monkeypatch.setattr(
        D.time, "time", lambda: (ict1 - 3_600_000) / 1000.0
    )
    try:
        write_delta_append(_df(spark, 2, 4), root)  # v2
    finally:
        monkeypatch.setattr(D.time, "time", real_time)
    # travel to ict1 resolves to v1 (2 rows): if the reader used the
    # informational timestamp, v2's early wall clock would shadow it
    got = read_delta_snapshot(spark, root, as_of_ms=ict1).count()
    assert got == 2
    # and ict1+1 (v2's ICT) sees the appended rows
    assert read_delta_snapshot(spark, root, as_of_ms=ict1 + 1).count() == 4
    hist = {r.version: r.commit_ts_ms for r in delta_history(spark, root).collect()}
    assert hist[2] == ict1 + 1  # history surfaces the ICT, not the skew


def test_cleanup_keeps_the_chain_alive(spark, tmp_path):
    root = str(tmp_path / "cl")
    write_delta_append(_df(spark, 0, 2), root)   # v0
    enable_delta_in_commit_timestamps(root)       # v1
    write_delta_append(_df(spark, 2, 4), root)   # v2
    checkpoint_delta_table(root)                  # checkpoint @ v2
    removed = cleanup_delta_log(root)
    # the newest at-or-below-checkpoint commit SURVIVES (chain anchor)
    assert removed == [0, 1]
    assert os.path.exists(
        os.path.join(root, "_delta_log", f"{2:020d}.json")
    )
    prev_ict = _commit_info(root, 2)["inCommitTimestamp"]
    v = write_delta_append(_df(spark, 4, 6), root)  # v3: chain continues
    ci = _commit_info(root, v)
    assert ci["inCommitTimestamp"] > prev_ict
    # a NON-ICT table still cleans everything at or below the checkpoint
    root2 = str(tmp_path / "plain")
    write_delta_append(_df(spark, 0, 2), root2)
    write_delta_append(_df(spark, 2, 4), root2)
    checkpoint_delta_table(root2)
    assert cleanup_delta_log(root2) == [0, 1]


def test_enable_refuses_foreign_tables(spark, tmp_path):
    root = str(tmp_path / "f")
    write_delta_append(_df(spark, 0, 2), root)
    log_dir = os.path.join(root, "_delta_log")
    # strip the writer tag via a foreign metaData rewrite
    st = D._replay_state(log_dir)
    meta = dict(st["meta"])
    meta["configuration"] = {}
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    with pytest.raises(NotImplementedError, match="another writer"):
        enable_delta_in_commit_timestamps(root)


def test_upgrade_lists_legacy_implied_features(spark, tmp_path):
    """Round-11 advisor fix (PROTOCOL.md "Table Features"): upgrading a
    legacy minWriterVersion-5 table (column mapping via rename) to
    table features must list EVERY legacy-implied feature, not just the
    features being added — a feature-aware foreign writer that saw
    writerFeatures without columnMapping would write the table without
    honoring the mapping."""
    from mysoftware_nocnetintel_spark.sources.delta import (
        rename_delta_column,
    )

    root = str(tmp_path / "cm")
    write_delta_append(_df(spark, 0, 3), root)
    rename_delta_column(root, "val", "v2")
    st = D._replay_state(os.path.join(root, "_delta_log"))
    assert st["protocol"]["minWriterVersion"] == 5  # legacy: implied list
    enable_delta_in_commit_timestamps(root)
    st = D._replay_state(os.path.join(root, "_delta_log"))
    assert set(st["protocol"]["writerFeatures"]) >= {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "generatedColumns",
        "columnMapping",
        "inCommitTimestamp",
    }
    # reads still project physical->logical after the upgrade
    got = read_delta_snapshot(spark, root)
    assert set(got.columns) == {"id", "v2"} and got.count() == 3


def test_dv_upgrade_keeps_column_mapping_features(spark, tmp_path):
    """Same spec rule on the MOR-delete upgrade path (minReaderVersion 3
    + deletionVectors): a column-mapped table keeps columnMapping in
    BOTH feature lists of the upgraded protocol."""
    from mysoftware_nocnetintel_spark.sources.delta import (
        rename_delta_column,
    )

    root = str(tmp_path / "cmdv")
    write_delta_append(_df(spark, 0, 4), root)
    rename_delta_column(root, "val", "v2")
    delete_delta_rows(spark, root, "id = 1")
    st = D._replay_state(os.path.join(root, "_delta_log"))
    assert set(st["protocol"]["readerFeatures"]) >= {
        "columnMapping",
        "deletionVectors",
    }
    assert set(st["protocol"]["writerFeatures"]) >= {
        "columnMapping",
        "deletionVectors",
        "appendOnly",
        "invariants",
    }
    got = read_delta_snapshot(spark, root)
    assert got.count() == 3 and set(got.columns) == {"id", "v2"}


def test_ict_of_zero_is_honored_not_skipped(spark, tmp_path):
    """Presence test, not truthiness (round-11 advisor fix): a
    pathological ICT of 0 is still the authoritative commit time —
    `or`-chaining would silently fall back to the informational
    timestamp."""
    root = str(tmp_path / "zero")
    write_delta_append(_df(spark, 0, 2), root)
    p = os.path.join(root, "_delta_log", f"{0:020d}.json")
    lines = []
    with open(p) as fh:
        for line in fh:
            if not line.strip():
                continue
            act = json.loads(line)
            if "commitInfo" in act:
                act["commitInfo"]["inCommitTimestamp"] = 0
            lines.append(json.dumps(act))
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    hist = {r["version"]: r for r in delta_history(spark, root).collect()}
    assert hist[0]["commit_ts_ms"] == 0
