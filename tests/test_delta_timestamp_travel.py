"""Delta TIMESTAMP time travel (round 7 — `as_of_ms`, the twin of the
Iceberg reader's parameter and delta-spark's `timestampAsOf`): resolve
a timestamp to the last commit whose file timestamp is at or before it.
"""

from __future__ import annotations

import os

import pytest

from mysoftware_nocnetintel_spark.sources.delta import write_delta_append
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def test_as_of_ms_resolves_to_commit_file_times(spark, tmp_path):
    root = str(tmp_path / "t")
    write_delta_append(_mk(spark, [(1, "a")]), root)  # v0
    write_delta_append(_mk(spark, [(2, "b")]), root)  # v1
    write_delta_append(_mk(spark, [(3, "c")]), root)  # v2
    log = os.path.join(root, "_delta_log")
    # pin deterministic commit times: v0=1000s, v1=2000s, v2=3000s
    for v, t in ((0, 1000), (1, 2000), (2, 3000)):
        os.utime(os.path.join(log, f"{v:020d}.json"), (t, t))

    def ids(**kw):
        return sorted(
            r.id for r in read_delta_snapshot(spark, root, **kw).collect()
        )

    assert ids(as_of_ms=1000_000) == [1]
    assert ids(as_of_ms=2500_000) == [1, 2]
    assert ids(as_of_ms=9999_000) == [1, 2, 3]
    with pytest.raises(ValueError, match="no Delta commit at or before"):
        read_delta_snapshot(spark, root, as_of_ms=999_000)
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_delta_snapshot(spark, root, version=1, as_of_ms=2500_000)


def test_as_of_ms_after_log_cleanup_fails_below_checkpoint(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.delta import (
        checkpoint_delta_table,
        cleanup_delta_log,
    )

    root = str(tmp_path / "t2")
    write_delta_append(_mk(spark, [(1, "a")]), root)
    write_delta_append(_mk(spark, [(2, "b")]), root)
    checkpoint_delta_table(root)
    cleanup_delta_log(root)
    write_delta_append(_mk(spark, [(3, "c")]), root)
    log = os.path.join(root, "_delta_log")
    os.utime(os.path.join(log, f"{2:020d}.json"), (5000, 5000))
    # timestamps before the surviving commit prefix cannot resolve
    with pytest.raises(ValueError, match="no Delta commit"):
        read_delta_snapshot(spark, root, as_of_ms=1_000)
    got = read_delta_snapshot(spark, root, as_of_ms=6000_000)
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]
