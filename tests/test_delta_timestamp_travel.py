"""Delta TIMESTAMP time travel (`as_of_ms`, the twin of the Iceberg
reader's parameter and delta-spark's `timestampAsOf`).

Round 8: every commit carries an in-commit ``commitInfo.timestamp``
(written first in the version json) and resolution PREFERS it over the
commit file's mtime — so time travel survives a log tree copied or
rsynced without mtime preservation, the round-7 advisor's failure mode.
mtime remains the fallback for legacy/foreign commits without
commitInfo, and a timestamp after the latest commit raises (delta-spark
temporal-version parity; the Iceberg twin resolves to the current
snapshot per its own engine's semantics).
"""

from __future__ import annotations

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources.delta import (
    delta_history,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def _commit_ts(root: str) -> dict[int, int]:
    """version -> in-commit timestamp, straight from the log json."""
    log = os.path.join(root, "_delta_log")
    out: dict[int, int] = {}
    for name in sorted(os.listdir(log)):
        if not name.endswith(".json") or not name[0].isdigit():
            continue
        v = int(name.split(".")[0])
        with open(os.path.join(log, name)) as fh:
            first = json.loads(fh.readline())
        if "commitInfo" in first:
            out[v] = first["commitInfo"]["timestamp"]
    return out


def test_as_of_ms_uses_in_commit_timestamps_not_mtime(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta_append(_mk(spark, [(1, "a")]), root)  # v0
    write_delta_append(_mk(spark, [(2, "b")]), root)  # v1
    write_delta_append(_mk(spark, [(3, "c")]), root)  # v2
    ts = _commit_ts(root)
    assert sorted(ts) == [0, 1, 2]
    log = os.path.join(root, "_delta_log")
    # simulate a log tree copied WITHOUT mtime preservation: scramble
    # every mtime far into the future — resolution must not move
    for v in ts:
        os.utime(os.path.join(log, f"{v:020d}.json"), (9e9, 9e9))

    def ids(**kw):
        return sorted(
            r.id for r in read_delta_snapshot(spark, root, **kw).collect()
        )

    if ts[1] > ts[0]:
        assert ids(as_of_ms=ts[0]) == [1]
    assert ids(as_of_ms=ts[1]) == [1, 2] or ts[2] == ts[1]
    assert ids(as_of_ms=ts[2]) == [1, 2, 3]
    if ts[1] > ts[0]:
        assert ids(as_of_ms=ts[1] - 1) == [1]
    with pytest.raises(ValueError, match="no Delta commit at or before"):
        read_delta_snapshot(spark, root, as_of_ms=ts[0] - 1)
    with pytest.raises(ValueError, match="after the latest commit"):
        read_delta_snapshot(spark, root, as_of_ms=ts[2] + 60_000)
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_delta_snapshot(spark, root, version=1, as_of_ms=ts[1])


def test_as_of_ms_mtime_fallback_for_commits_without_commitinfo(
    spark, tmp_path
):
    """Legacy/foreign commits without commitInfo resolve by file mtime
    (delta-spark's own fallback), mixed with in-commit neighbors via the
    running-max monotonic adjustment."""
    root = str(tmp_path / "t2")
    write_delta_append(_mk(spark, [(1, "a")]), root)  # v0
    write_delta_append(_mk(spark, [(2, "b")]), root)  # v1
    log = os.path.join(root, "_delta_log")
    # strip v0's commitInfo line (a legacy-writer commit shape)
    p0 = os.path.join(log, f"{0:020d}.json")
    with open(p0) as fh:
        lines = [ln for ln in fh if ln.strip()]
    kept = [ln for ln in lines if "commitInfo" not in json.loads(ln)]
    assert len(kept) == len(lines) - 1
    with open(p0, "w") as fh:
        fh.writelines(kept)
    ts1 = _commit_ts(root)[1]
    # pin v0's mtime WELL before v1's in-commit timestamp
    os.utime(p0, (1000, 1000))

    def ids(**kw):
        return sorted(
            r.id for r in read_delta_snapshot(spark, root, **kw).collect()
        )

    assert ids(as_of_ms=1000_000) == [1]  # v0 via mtime
    assert ids(as_of_ms=ts1) == [1, 2]  # v1 via commitInfo
    with pytest.raises(ValueError, match="no Delta commit at or before"):
        read_delta_snapshot(spark, root, as_of_ms=999_000)


def test_as_of_ms_after_log_cleanup_fails_below_checkpoint(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.delta import (
        checkpoint_delta_table,
        cleanup_delta_log,
    )

    root = str(tmp_path / "t3")
    write_delta_append(_mk(spark, [(1, "a")]), root)
    write_delta_append(_mk(spark, [(2, "b")]), root)
    checkpoint_delta_table(root)
    cleanup_delta_log(root)
    write_delta_append(_mk(spark, [(3, "c")]), root)
    ts2 = _commit_ts(root)[2]
    # timestamps before the surviving commit prefix cannot resolve
    with pytest.raises(ValueError, match="no Delta commit"):
        read_delta_snapshot(spark, root, as_of_ms=1_000)
    got = read_delta_snapshot(spark, root, as_of_ms=ts2)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]


def test_history_reports_in_commit_timestamps(spark, tmp_path):
    root = str(tmp_path / "t4")
    write_delta_append(_mk(spark, [(1, "a")]), root)
    ts = _commit_ts(root)
    log = os.path.join(root, "_delta_log")
    os.utime(os.path.join(log, f"{0:020d}.json"), (9e9, 9e9))
    h = delta_history(spark, root).collect()
    assert h[0].commit_ts_ms == ts[0]  # not the scrambled mtime
