"""remove_iceberg_orphan_files: deletes only UNREFERENCED debris, honors
the older-than safety valve, and never touches live data or the version
log."""

from __future__ import annotations

import os

from mysoftware_nocnetintel_spark.sources.iceberg import (
    remove_iceberg_orphan_files,
    write_iceberg_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


def _plant_orphans(path):
    """Simulate a crashed commit: a stranded data parquet + a stranded
    manifest avro that no snapshot references."""
    d = os.path.join(path, "data", "orphan-000.parquet")
    m = os.path.join(path, "metadata", "orphan-manifest.avro")
    for f in (d, m):
        with open(f, "wb") as fh:
            fh.write(b"debris")
    return [d, m]


def test_orphans_removed_live_files_kept(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    write_iceberg_append(_mk(spark, [(2, "b")]), path)
    planted = _plant_orphans(path)

    dry = remove_iceberg_orphan_files(path, older_than_ms=0, dry_run=True)
    assert sorted(planted) == dry
    assert all(os.path.exists(f) for f in planted)  # dry run: untouched

    removed = remove_iceberg_orphan_files(path, older_than_ms=0)
    assert sorted(planted) == removed
    assert not any(os.path.exists(f) for f in planted)
    # every snapshot still fully readable — nothing live was touched
    assert _rows(read_iceberg_snapshot(spark, path)) == {(1, "a"), (2, "b")}
    assert remove_iceberg_orphan_files(path, older_than_ms=0) == []


def test_older_than_protects_inflight_files(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    planted = _plant_orphans(path)
    # default 3-day cutoff: the just-written debris looks like a commit
    # in flight and must survive
    assert remove_iceberg_orphan_files(path) == []
    assert all(os.path.exists(f) for f in planted)
    # backdate the debris past the cutoff → now collectable
    old = 1_000_000_000
    for f in planted:
        os.utime(f, (old, old))
    assert remove_iceberg_orphan_files(path) == sorted(planted)
