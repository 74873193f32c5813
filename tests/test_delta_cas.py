"""Filesystem compare-and-swap commits for the Delta writer (the spec's
log-store mutual-exclusion contract emulated with hard-link
put-if-absent of ``<version>.json``). A lost race must never clobber the
winning commit: plain appends retry on top of the winner (their staged
files carry unique names, adds commute), every other commit kind —
overwrite, DV delete, create/evolution — surfaces
``DeltaCommitConflict`` because its action list was computed against the
old state."""

from __future__ import annotations

import os

import pytest

from mysoftware_nocnetintel_spark.sources import delta as dl
from mysoftware_nocnetintel_spark.sources.delta import (
    DeltaCommitConflict,
    delete_delta_rows,
    write_delta_append,
    write_delta_overwrite,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "id bigint, val string"
    )


def _ids(spark, root):
    return sorted(r.id for r in read_delta_snapshot(spark, root).collect())


def test_append_retries_on_lost_race(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "cas1")
    write_delta_append(_df(spark, 0, 5), root)

    real = dl._commit_version
    fired = {"n": 0}

    def racing(log_dir, version, actions):
        if fired["n"] == 0:
            fired["n"] = 1
            write_delta_append(_df(spark, 100, 103), root)  # winner
        return real(log_dir, version, actions)

    monkeypatch.setattr(dl, "_commit_version", racing)
    write_delta_append(_df(spark, 5, 8), root)
    monkeypatch.setattr(dl, "_commit_version", real)

    assert _ids(spark, root) == list(range(0, 8)) + [100, 101, 102]
    # create(0) + winner(1) + retried append(2) = 3 distinct version
    # files, none clobbered
    logs = [
        f
        for f in os.listdir(os.path.join(root, "_delta_log"))
        if f.endswith(".json") and not f.startswith(".")
    ]
    assert len(logs) == 3


def _preempt_once(monkeypatch, spark, root):
    """Intercept the next commit: land a competing append at the
    contested version FIRST (between staging and commit), then let the
    original proceed — it must lose the CAS."""
    real = dl._commit_version
    fired = {"n": 0}

    def racing(log_dir, version, actions):
        if fired["n"] == 0:
            fired["n"] = 1
            real_append = write_delta_append
            monkeypatch.setattr(dl, "_commit_version", real)
            try:
                real_append(_df(spark, 900, 901), root)
            finally:
                monkeypatch.setattr(dl, "_commit_version", racing)
        return real(log_dir, version, actions)

    monkeypatch.setattr(dl, "_commit_version", racing)
    return real


def test_non_commuting_commits_surface_conflict(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "cas2")
    write_delta_append(_df(spark, 0, 5), root)
    real = _preempt_once(monkeypatch, spark, root)
    with pytest.raises(DeltaCommitConflict):
        write_delta_overwrite(_df(spark, 10, 12), root)
    monkeypatch.setattr(dl, "_commit_version", real)
    # the winner's commit survives untouched; the failed overwrite left
    # only stray (unreferenced) files
    assert _ids(spark, root) == list(range(0, 5)) + [900]
    real = _preempt_once(monkeypatch, spark, root)
    with pytest.raises(DeltaCommitConflict):
        delete_delta_rows(spark, root, "id = 1")
    monkeypatch.setattr(dl, "_commit_version", real)
    assert _ids(spark, root) == list(range(0, 5)) + [900, 900]


def test_schema_change_underneath_aborts_retry(spark, tmp_path, monkeypatch):
    """If the race winner EVOLVED the schema, the staged adds may not
    conform — the retry must abort instead of committing blind."""
    root = str(tmp_path / "cas3")
    write_delta_append(_df(spark, 0, 3), root)

    real = dl._commit_version
    fired = {"n": 0}

    def racing(log_dir, version, actions):
        if fired["n"] == 0:
            fired["n"] = 1
            write_delta_append(
                spark.createDataFrame(
                    [(50, "x", 1.5)], "id bigint, val string, extra double"
                ),
                root,
            )  # winner widens the schema
        return real(log_dir, version, actions)

    monkeypatch.setattr(dl, "_commit_version", racing)
    with pytest.raises(DeltaCommitConflict):
        write_delta_append(_df(spark, 3, 6), root)


def test_threaded_appends_lose_no_rows(spark, tmp_path):
    """Four threads race plain appends; every row set must land and the
    log must hold one file per committed version."""
    import threading

    root = str(tmp_path / "cas4")
    write_delta_append(_df(spark, 0, 2), root)
    errs = []

    def work(lo):
        try:
            write_delta_append(_df(spark, lo, lo + 3), root)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=work, args=(lo,))
        for lo in (10, 20, 30, 40)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    want = list(range(0, 2))
    for lo in (10, 20, 30, 40):
        want += range(lo, lo + 3)
    assert _ids(spark, root) == sorted(want)
