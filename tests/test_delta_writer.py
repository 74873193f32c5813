"""Minimal Delta APPEND writer round-trips against the log-replay reader,
plus its fail-fast scope (foreign tables, schema drift, checkpointed
logs)."""

from __future__ import annotations

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources.delta import write_delta_append
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


def test_append_roundtrip_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "dwt")
    v0 = write_delta_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, val string"),
        root,
    )
    v1 = write_delta_append(
        spark.createDataFrame([(30, "z")], "id bigint, val string"), root
    )
    assert (v0, v1) == (0, 1)
    assert _rows(read_delta_snapshot(spark, root)) == {
        (1, "a"), (2, "b"), (30, "z"),
    }
    assert _rows(read_delta_snapshot(spark, root, version=0)) == {
        (1, "a"), (2, "b"),
    }
    # column order doesn't matter, (name, type) pairs do
    write_delta_append(
        spark.createDataFrame([("y", 40)], "val string, id bigint"), root
    )
    assert (40, "y") in _rows(read_delta_snapshot(spark, root))


def test_refuses_schema_drift(spark, tmp_path):
    root = str(tmp_path / "dws")
    write_delta_append(
        spark.createDataFrame([(1, "a")], "id bigint, val string"), root
    )
    with pytest.raises(ValueError, match="does not cover"):
        write_delta_append(
            spark.createDataFrame([("1", "a")], "id string, val string"), root
        )
    with pytest.raises(ValueError, match="does not cover"):
        write_delta_append(
            spark.createDataFrame([(1, 2.0)], "id bigint, other double"), root
        )


def test_refuses_foreign_and_checkpointed_tables(spark, tmp_path):
    # foreign: a log without our writer tag
    root = str(tmp_path / "dwf")
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 1}}) + "\n")
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "x",
                        "schemaString": json.dumps(
                            {"type": "struct", "fields": []}
                        ),
                        "configuration": {},
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="another"):
        write_delta_append(
            spark.createDataFrame([(1,)], "id bigint"), root
        )
    # foreign checkpoint LAYOUT (multi-part / v2 — _last_checkpoint with
    # no classic single-file parquet): the writer can't reconstruct
    # state from layouts it doesn't maintain, so it must refuse rather
    # than commit against a partial live set
    root2 = str(tmp_path / "dwc")
    write_delta_append(spark.createDataFrame([(1,)], "id bigint"), root2)
    with open(
        os.path.join(root2, "_delta_log", "_last_checkpoint"), "w"
    ) as fh:
        fh.write(json.dumps({"version": 0, "parts": 2}))
    with pytest.raises(NotImplementedError, match="classic checkpoint"):
        write_delta_append(spark.createDataFrame([(2,)], "id bigint"), root2)


def test_partitioned_append_roundtrip_and_pruning(spark, tmp_path):
    """Hive-layout partitioned writes: the reader re-attaches partition
    columns from partitionValues, later appends inherit the spec, and
    partition_filter composes (zero-I/O proof via a corrupt excluded
    file)."""
    import glob as g

    root = str(tmp_path / "dwp")
    write_delta_append(
        spark.createDataFrame(
            [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c")],
            "day string, id bigint, val string",
        ),
        root,
        partition_by=("day",),
    )
    # inherit on the next append — no partition_by argument
    write_delta_append(
        spark.createDataFrame(
            [("d2", 4, "d")], "day string, id bigint, val string"
        ),
        root,
    )

    def rows(df):
        return {(r.day, r.id, r.val) for r in df.collect()}

    assert rows(read_delta_snapshot(spark, root)) == {
        ("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c"), ("d2", 4, "d"),
    }
    assert rows(
        read_delta_snapshot(spark, root, partition_filter={"day": "d2"})
    ) == {("d2", 3, "c"), ("d2", 4, "d")}
    # hive layout on disk, partition column NOT in the files
    d1_files = g.glob(os.path.join(root, "day=d1", "*.parquet"))
    assert d1_files
    import pyarrow.parquet as pq

    assert "day" not in pq.read_schema(d1_files[0]).names
    # zero-I/O proof: corrupt d1, pruned read to d2 still works
    with open(d1_files[0], "wb") as fh:
        fh.write(b"GARBAGE")
    assert rows(
        read_delta_snapshot(spark, root, partition_filter={"day": "d2"})
    ) == {("d2", 3, "c"), ("d2", 4, "d")}
    with pytest.raises(Exception):
        read_delta_snapshot(spark, root).collect()
    # declaring partition_by on an existing table refuses
    with pytest.raises(ValueError, match="CREATE time"):
        write_delta_append(
            spark.createDataFrame(
                [("d9", 9, "z")], "day string, id bigint, val string"
            ),
            root,
            partition_by=("day",),
        )


def test_partition_columns_reattach_typed_and_null(spark, tmp_path):
    """Partition values live as STRINGS in the log; the reader must cast
    them back to the schema type (a bigint partition column round-trips
    as bigint, not string), and NULL partition values must come back as
    real nulls, not the on-disk __HIVE_DEFAULT_PARTITION__ sentinel."""
    root = str(tmp_path / "dwt2")
    write_delta_append(
        spark.createDataFrame(
            [(10, 1, "a"), (20, 2, "b"), (None, 3, "c")],
            "bucket bigint, id bigint, val string",
        ),
        root,
        partition_by=("bucket",),
    )
    df = read_delta_snapshot(spark, root)
    assert dict(df.dtypes)["bucket"] == "bigint"
    got = {(r.bucket, r.id) for r in df.collect()}
    assert got == {(10, 1), (20, 2), (None, 3)}
    # typed filtering works (the string round-trip bug made this empty)
    assert df.filter("bucket = 10").count() == 1


def test_overwrite_roundtrip_and_time_travel(spark, tmp_path):
    """Overwrite replaces the live set in one commit; prior versions stay
    time-travelable (removed files are tombstones, not deletions); the
    copy-on-write DELETE pattern (overwrite with a filtered read) works."""
    from mysoftware_nocnetintel_spark.sources.delta import (
        write_delta_overwrite,
    )

    root = str(tmp_path / "dwo")
    write_delta_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, val string"
        ),
        root,
    )
    v1 = write_delta_overwrite(
        spark.createDataFrame([(9, "z")], "id bigint, val string"), root
    )
    assert v1 == 1
    assert _rows(read_delta_snapshot(spark, root)) == {(9, "z")}
    assert _rows(read_delta_snapshot(spark, root, version=0)) == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    # copy-on-write DELETE: overwrite with the filtered current state
    cur = read_delta_snapshot(spark, root)
    write_delta_overwrite(cur.filter("id != 9").union(
        spark.createDataFrame([(10, "y"), (11, "w")], "id bigint, val string")
    ), root)
    assert _rows(read_delta_snapshot(spark, root)) == {(10, "y"), (11, "w")}
    # overwrite on a missing table refuses
    with pytest.raises(FileNotFoundError):
        write_delta_overwrite(cur, str(tmp_path / "missing"))


def test_overwrite_commits_atomically(spark, tmp_path, monkeypatch):
    """Overwrite must write ONE version json (removes first, then adds)
    via temp-file + os.replace — a failure at commit time leaves the
    table at the previous version with the old rows intact, never an
    intermediate append-only state."""
    from mysoftware_nocnetintel_spark.sources import delta as delta_mod
    from mysoftware_nocnetintel_spark.sources.delta import (
        write_delta_overwrite,
    )

    root = str(tmp_path / "dwa")
    write_delta_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, val string"),
        root,
    )

    # crash injection: the commit write itself fails → no version file
    # may appear, and the table must still read as the old rows
    real_commit = delta_mod._commit_version

    def boom(log_dir, version, actions):
        raise OSError("injected commit failure")

    monkeypatch.setattr(delta_mod, "_commit_version", boom)
    with pytest.raises(OSError, match="injected"):
        write_delta_overwrite(
            spark.createDataFrame([(9, "z")], "id bigint, val string"), root
        )
    log_dir = os.path.join(root, "_delta_log")
    assert sorted(os.listdir(log_dir)) == [f"{0:020d}.json"]
    assert _rows(read_delta_snapshot(spark, root)) == {(1, "a"), (2, "b")}

    # real commit: one json whose remove tombstones PRECEDE the adds
    monkeypatch.setattr(delta_mod, "_commit_version", real_commit)
    v = write_delta_overwrite(
        spark.createDataFrame([(9, "z")], "id bigint, val string"), root
    )
    with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
        kinds = [
            next(iter(json.loads(line)))
            for line in fh
            if line.strip()
        ]
    assert "remove" in kinds and "add" in kinds
    assert kinds.index("remove") < kinds.index("add")
    assert kinds == sorted(kinds, key=lambda k: k == "add")  # removes first
    assert _rows(read_delta_snapshot(spark, root)) == {(9, "z")}
