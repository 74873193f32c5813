"""Identity-partitioned Iceberg writes + manifest-level partition pruning.

Zero-I/O proof mirrors the Delta pruning test: after the commit, one
partition's data file is overwritten with garbage — a pruned read that
excludes it succeeds, the unpruned read fails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.iceberg import (
    rewrite_iceberg_table,
    write_iceberg_append,
    write_iceberg_equality_deletes,
)
from mysoftware_nocnetintel_spark.sources.readers import (
    _iceberg_snapshot_files,
    read_iceberg_snapshot,
)


def _rows(df):
    return {(r.day, r.id, r.val) for r in df.collect()}


def _make(spark, tmp_path, name="ptab"):
    root = str(tmp_path / name)
    write_iceberg_append(
        spark.createDataFrame(
            [
                ("d1", 1, "a"),
                ("d1", 2, "b"),
                ("d2", 3, "c"),
                ("d3", 4, "d"),
            ],
            "day string, id bigint, val string",
        ),
        root,
        partition_by=("day",),
    )
    return root


def test_partitioned_append_and_pruning(spark, tmp_path):
    root = _make(spark, tmp_path)
    # full read sees everything (data files contain the partition column)
    assert _rows(read_iceberg_snapshot(spark, root)) == {
        ("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c"), ("d3", 4, "d"),
    }
    # one file set per partition tuple, each entry carrying its record
    data_files, _pos, _eq, _snap = _iceberg_snapshot_files(root)
    parts = {
        tuple(sorted(dict(e.partition).items())) if e.partition else None
        for e in data_files
    }
    assert parts == {(("day", "d1"),), (("day", "d2"),), (("day", "d3"),)}
    # pruned read
    assert _rows(
        read_iceberg_snapshot(spark, root, partition_filter={"day": "d1"})
    ) == {("d1", 1, "a"), ("d1", 2, "b")}

    # zero-I/O proof: corrupt d3's file; pruned read fine, full read fails
    d3_file = next(
        e.path
        for e in data_files
        if e.partition and dict(e.partition).get("day") == "d3"
    )
    with open(d3_file, "wb") as fh:
        fh.write(b"GARBAGE")
    assert _rows(
        read_iceberg_snapshot(spark, root, partition_filter={"day": "d2"})
    ) == {("d2", 3, "c")}
    with pytest.raises(Exception):
        read_iceberg_snapshot(spark, root).collect()


def test_partitioned_appends_inherit_spec_and_deletes_work(spark, tmp_path):
    root = _make(spark, tmp_path, "ptab2")
    # later appends inherit the spec (no partition_by argument)
    write_iceberg_append(
        spark.createDataFrame(
            [("d2", 5, "e")], "day string, id bigint, val string"
        ),
        root,
    )
    assert _rows(
        read_iceberg_snapshot(spark, root, partition_filter={"day": "d2"})
    ) == {("d2", 3, "c"), ("d2", 5, "e")}
    # equality deletes compose with partitioned data
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(3,)], "id bigint")
    )
    assert _rows(
        read_iceberg_snapshot(spark, root, partition_filter={"day": "d2"})
    ) == {("d2", 5, "e")}


def test_partitioned_fail_fasts(spark, tmp_path):
    root = _make(spark, tmp_path, "ptab3")
    # partition_by on an existing table
    with pytest.raises(ValueError, match="CREATE time"):
        write_iceberg_append(
            spark.createDataFrame(
                [("d9", 9, "z")], "day string, id bigint, val string"
            ),
            root,
            partition_by=("day",),
        )
    # unknown partition column at create
    with pytest.raises(ValueError, match="not in schema"):
        write_iceberg_append(
            spark.createDataFrame([(1,)], "id bigint"),
            str(tmp_path / "ptab4"),
            partition_by=("nope",),
        )
    # unknown filter key on an unpartitioned table
    root2 = str(tmp_path / "unpart")
    write_iceberg_append(
        spark.createDataFrame([(1, "a")], "id bigint, val string"), root2
    )
    with pytest.raises(ValueError, match="not partition columns"):
        read_iceberg_snapshot(spark, root2, partition_filter={"day": "d1"})
    # no matching files
    with pytest.raises(ValueError, match="no files match"):
        read_iceberg_snapshot(spark, root, partition_filter={"day": "nope"})


def test_partition_spec_in_metadata(spark, tmp_path):
    import json
    import os

    root = _make(spark, tmp_path, "ptab5")
    meta_dir = os.path.join(root, "metadata")
    latest = sorted(
        (f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")),
        key=lambda p: int(p[1:].split(".")[0]),
    )[-1]
    with open(os.path.join(meta_dir, latest)) as fh:
        meta = json.load(fh)
    specs = meta["partition-specs"]
    assert meta["default-spec-id"] == 0
    assert specs[0]["fields"][0]["name"] == "day"
    assert specs[0]["fields"][0]["transform"] == "identity"
    assert specs[0]["fields"][0]["field-id"] == 1000


def test_expire_snapshots(spark, tmp_path):
    """Expiration drops old snapshots from metadata and deletes files
    referenced only by them; the kept snapshots stay readable and the
    table keeps accepting commits."""
    import os

    from mysoftware_nocnetintel_spark.sources.iceberg import (
        expire_iceberg_snapshots,
    )

    root = str(tmp_path / "expire")
    s1 = write_iceberg_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, val string"),
        root,
    )
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(1,)], "id bigint")
    )
    s3 = rewrite_iceberg_table(spark, root)  # compacted: fresh files only
    n_files_before = len(os.listdir(os.path.join(root, "data")))

    removed = expire_iceberg_snapshots(root, keep_last=1)
    assert removed > 0
    # current snapshot still reads; expired ids are gone
    assert {(r.id, r.val) for r in read_iceberg_snapshot(spark, root).collect()} == {
        (2, "b")
    }
    with pytest.raises(ValueError, match="not found"):
        read_iceberg_snapshot(spark, root, snapshot_id=s1)
    # the pre-compaction data and delete files were deleted from disk
    assert len(os.listdir(os.path.join(root, "data"))) < n_files_before
    # further commits work on the expired table
    write_iceberg_append(
        spark.createDataFrame([(9, "z")], "id bigint, val string"), root
    )
    got = {(r.id, r.val) for r in read_iceberg_snapshot(spark, root).collect()}
    assert got == {(2, "b"), (9, "z")}
    # keep_last must retain the current snapshot
    with pytest.raises(ValueError, match="keep_last"):
        expire_iceberg_snapshots(root, keep_last=0)
    assert s3 is not None


def test_date_and_long_partition_values(spark, tmp_path):
    """Date partition values collect as datetime.date and long values as
    ints — both must encode into the manifest partition record (date in
    ISO string form) and prune correctly. Null partition values survive
    as JSON null."""
    import datetime

    root = str(tmp_path / "pdate")
    write_iceberg_append(
        spark.createDataFrame(
            [
                (datetime.date(2026, 1, 1), 7, 1, "a"),
                (datetime.date(2026, 1, 2), 7, 2, "b"),
                (None, None, 3, "c"),
            ],
            "d date, bucket bigint, id bigint, val string",
        ),
        root,
        partition_by=("d", "bucket"),
    )
    full = {
        (str(r.d), r.bucket, r.id)
        for r in read_iceberg_snapshot(spark, root).collect()
    }
    assert full == {("2026-01-01", 7, 1), ("2026-01-02", 7, 2), ("None", None, 3)}
    pruned = read_iceberg_snapshot(
        spark, root, partition_filter={"d": "2026-01-01"}
    ).collect()
    assert [(r.id, r.bucket) for r in pruned] == [(1, 7)]
    pruned2 = read_iceberg_snapshot(
        spark, root, partition_filter={"bucket": 7}
    ).collect()
    assert {r.id for r in pruned2} == {1, 2}
    pruned3 = read_iceberg_snapshot(
        spark, root, partition_filter={"d": None}
    ).collect()
    assert {r.id for r in pruned3} == {3}


def test_partitioned_rewrite_keeps_pruning(spark, tmp_path):
    """Compacting a partitioned table must regroup files per partition
    tuple: delete files disappear from the read path while partition
    records — and therefore pruning — survive (corrupt-excluded proof)."""
    root = _make(spark, tmp_path, "pcompact")
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(2,)], "id bigint")
    )
    rewrite_iceberg_table(spark, root)
    data_files, pos_dels, eq_dels, _snap = _iceberg_snapshot_files(root)
    assert not pos_dels and not eq_dels
    assert all(e.partition for e in data_files)
    assert _rows(
        read_iceberg_snapshot(spark, root, partition_filter={"day": "d1"})
    ) == {("d1", 1, "a")}
    # zero-I/O proof on the compacted layout
    d3 = next(
        e.path for e in data_files if dict(e.partition).get("day") == "d3"
    )
    with open(d3, "wb") as fh:
        fh.write(b"GARBAGE")
    assert _rows(
        read_iceberg_snapshot(spark, root, partition_filter={"day": "d2"})
    ) == {("d2", 3, "c")}


def test_schema_mismatch_refused_before_any_write(spark, tmp_path):
    """A mismatched append must fail while the table is still untouched:
    validating after the distributed write would strand orphan parquet +
    manifest files in the table directory forever (snapshot expiry only
    removes files referenced by expired snapshots)."""
    import os
    from glob import glob

    root = str(tmp_path / "sig")
    write_iceberg_append(
        spark.createDataFrame([(1, "a")], "id bigint, val string"), root
    )
    before_data = sorted(glob(os.path.join(root, "data", "*")))
    before_meta = sorted(glob(os.path.join(root, "metadata", "*")))
    with pytest.raises(ValueError, match="does not cover"):
        write_iceberg_append(
            spark.createDataFrame([(1, 2.0)], "id bigint, val double"), root
        )
    # nothing staged, moved, or committed — byte-for-byte same file sets
    assert sorted(glob(os.path.join(root, "data", "*"))) == before_data
    assert sorted(glob(os.path.join(root, "metadata", "*"))) == before_meta
    assert not glob(os.path.join(root, "__stage-*"))
