"""Minimal Iceberg snapshot reader + vendored Avro codec tests.

The fixture is a hand-authored, spec-compliant Iceberg v2 table
(metadata/v*.metadata.json + Avro manifest list + Avro manifest + parquet
data files), exercising snapshot selection, time travel by snapshot-id and
timestamp, deleted-entry (status=2) replay, and the fail-fast gates."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.avro_lite import (
    read_avro_file,
    write_avro_file,
)
from mysoftware_nocnetintel_spark.sources.readers import (
    read_iceberg_snapshot,
    read_table_format,
)

# -------------------------------------------------------------- avro_lite

_GNARLY_SCHEMA = {
    "type": "record",
    "name": "r1",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "b", "type": "boolean"},
        {"name": "by", "type": "bytes"},
        {"name": "u", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {
            "name": "e",
            "type": {"type": "enum", "name": "col", "symbols": ["RED", "BLUE"]},
        },
        {
            "name": "fx",
            "type": {"type": "fixed", "name": "f16", "size": 4},
        },
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [{"name": "x", "type": "long"}],
            },
        },
    ],
}

_GNARLY_ROWS = [
    {
        "i": -3,
        "l": 2**40,
        "s": "héllo",
        "d": 3.5,
        "f": 0.25,
        "b": True,
        "by": b"\x00\xff",
        "u": None,
        "arr": ["a", "bb", ""],
        "m": {"k1": 1, "k2": -2},
        "e": "BLUE",
        "fx": b"abcd",
        "nested": {"x": -(2**33)},
    },
    {
        "i": 0,
        "l": -1,
        "s": "",
        "d": -0.0,
        "f": 1.0,
        "b": False,
        "by": b"",
        "u": 7,
        "arr": [],
        "m": {},
        "e": "RED",
        "fx": b"zzzz",
        "nested": {"x": 0},
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_roundtrip_all_types(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    write_avro_file(p, _GNARLY_SCHEMA, _GNARLY_ROWS, codec=codec)
    _, got = read_avro_file(p)
    assert got == _GNARLY_ROWS


def test_avro_multi_branch_union_roundtrip(tmp_path):
    """Unions with several non-null branches select by VALUE TYPE (a str
    in ["null","long","string"] must encode through the string branch),
    including enum-by-symbol, fixed-by-size, and int→double widening when
    no integer branch exists."""
    schema = {
        "type": "record",
        "name": "U",
        "fields": [
            {"name": "a", "type": ["null", "long", "string"]},
            {"name": "b", "type": ["double", "string"]},
            {
                "name": "c",
                "type": [
                    "bytes",
                    {"type": "fixed", "name": "F4", "size": 4},
                    {"type": "enum", "name": "E", "symbols": ["X", "Y"]},
                    "string",
                ],
            },
            {
                "name": "d",
                "type": [
                    {"type": "map", "values": "long"},
                    {
                        "type": "record",
                        "name": "R",
                        "fields": [{"name": "x", "type": "long"}],
                    },
                ],
            },
        ],
    }
    rows = [
        {"a": "s1", "b": 2.5, "c": b"abc", "d": {"k": 1}},
        {"a": 42, "b": "t", "c": "Y", "d": {"x": 7}},
        {"a": None, "b": 3, "c": "plain", "d": {}},
    ]
    p = str(tmp_path / "u.avro")
    write_avro_file(p, schema, rows)
    _, got = read_avro_file(p)
    # b=3 widened through the double branch; map-vs-record is first-match,
    # so d={"x":7} decodes as a map (the map branch admits any dict) and
    # d={} likewise
    assert got[0] == rows[0]
    assert got[1] == {"a": 42, "b": "t", "c": "Y", "d": {"x": 7}}
    assert got[2] == {"a": None, "b": 3.0, "c": "plain", "d": {}}
    with pytest.raises(ValueError, match="no union branch"):
        write_avro_file(
            str(tmp_path / "bad.avro"),
            {"type": "record", "name": "B",
             "fields": [{"name": "z", "type": ["null", "long"]}]},
            [{"z": "not-a-long"}],
        )


def test_avro_rejects_non_avro(tmp_path):
    p = str(tmp_path / "not.avro")
    with open(p, "wb") as fh:
        fh.write(b"PAR1junk")
    with pytest.raises(ValueError, match="not an Avro"):
        read_avro_file(p)


# ------------------------------------------------------- iceberg fixture

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}


def _entry(status, path, snap_id, content=0, fmt="PARQUET"):
    return {
        "status": status,
        "snapshot_id": snap_id,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": fmt,
            "record_count": 1,
            "file_size_in_bytes": 1,
        },
    }


def _write_iceberg_fixture(root):
    """Three snapshots: s1 adds f1; s2 keeps f1 + adds f2; s3 deletes f1
    (status=2) keeping f2. current-snapshot-id = s3."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    f1 = os.path.join(root, "data", "f1.parquet")
    f2 = os.path.join(root, "data", "f2.parquet")
    pq.write_table(pa.table({"id": [1, 2], "val": ["a", "b"]}), f1)
    pq.write_table(pa.table({"id": [30], "val": ["z"]}), f2)

    def manifest(name, entries):
        p = os.path.join(root, "metadata", name)
        write_avro_file(p, _MANIFEST_ENTRY_SCHEMA, entries)
        return p

    m1 = manifest("m1.avro", [_entry(1, f1, 100)])
    m2 = manifest("m2.avro", [_entry(0, f1, 100), _entry(1, f2, 200)])
    m3 = manifest("m3.avro", [_entry(2, f1, 300), _entry(0, f2, 200)])

    def mlist(name, mpaths, snap_id):
        p = os.path.join(root, "metadata", name)
        write_avro_file(
            p,
            _MANIFEST_FILE_SCHEMA,
            [
                {
                    "manifest_path": mp,
                    "manifest_length": os.path.getsize(mp),
                    "partition_spec_id": 0,
                    "content": 0,
                    "added_snapshot_id": snap_id,
                }
                for mp in mpaths
            ],
        )
        return p

    snaps = [
        {"snapshot-id": 100, "timestamp-ms": 1000,
         "manifest-list": mlist("snap-100.avro", [m1], 100)},
        {"snapshot-id": 200, "timestamp-ms": 2000,
         "manifest-list": mlist("snap-200.avro", [m2], 200)},
        {"snapshot-id": 300, "timestamp-ms": 3000,
         "manifest-list": mlist("snap-300.avro", [m3], 300)},
    ]
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": root,
        "current-snapshot-id": 300,
        "snapshots": snaps,
    }
    with open(os.path.join(root, "metadata", "v3.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    # a stale earlier metadata version must be ignored (reader picks max v)
    stale = dict(meta, **{"current-snapshot-id": 100, "snapshots": snaps[:1]})
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(stale, fh)
    return root


def test_iceberg_snapshot_and_time_travel(spark, tmp_path):
    root = _write_iceberg_fixture(str(tmp_path / "itable"))

    def rows(df):
        return {(r.id, r.val) for r in df.collect()}

    # current snapshot (300): f1 was deleted via a status=2 entry
    assert rows(read_iceberg_snapshot(spark, root)) == {(30, "z")}
    # pin by snapshot id
    assert rows(read_iceberg_snapshot(spark, root, snapshot_id=100)) == {
        (1, "a"),
        (2, "b"),
    }
    assert rows(read_iceberg_snapshot(spark, root, snapshot_id=200)) == {
        (1, "a"),
        (2, "b"),
        (30, "z"),
    }
    # time travel by timestamp: latest snapshot at or before t=2500 is s2
    assert rows(read_iceberg_snapshot(spark, root, as_of_ms=2500)) == {
        (1, "a"),
        (2, "b"),
        (30, "z"),
    }
    # the public gate falls back to the minimal reader (version→snapshot id)
    assert rows(
        read_table_format(spark, root, fmt="iceberg", version=100)
    ) == {(1, "a"), (2, "b")}
    with pytest.raises(ValueError, match="not found"):
        read_iceberg_snapshot(spark, root, snapshot_id=999)


def test_iceberg_fail_fast_gates(spark, tmp_path):
    root = _write_iceberg_fixture(str(tmp_path / "itable2"))
    # non-parquet data file → refuse rather than return wrong rows
    bad = os.path.join(root, "metadata", "m_orc.avro")
    write_avro_file(
        bad,
        _MANIFEST_ENTRY_SCHEMA,
        [_entry(1, os.path.join(root, "data", "f9.orc"), 400, fmt="ORC")],
    )
    mlist_p = os.path.join(root, "metadata", "snap-400.avro")
    write_avro_file(
        mlist_p,
        _MANIFEST_FILE_SCHEMA,
        [{"manifest_path": bad, "manifest_length": 1,
          "partition_spec_id": 0, "content": 0, "added_snapshot_id": 400}],
    )
    meta_p = os.path.join(root, "metadata", "v4.metadata.json")
    meta = {
        "format-version": 2,
        "current-snapshot-id": 400,
        "snapshots": [
            {"snapshot-id": 400, "timestamp-ms": 4000, "manifest-list": mlist_p}
        ],
    }
    with open(meta_p, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(NotImplementedError, match="ORC"):
        read_iceberg_snapshot(spark, root)
    # foreign EQUALITY delete files without resolvable equality ids refuse
    # (the fixture's manifest schema carries no equality_ids, and the table
    # metadata has no field-id schema to resolve them against)
    eq = os.path.join(root, "metadata", "m_eq.avro")
    write_avro_file(
        eq,
        _MANIFEST_ENTRY_SCHEMA,
        [_entry(1, os.path.join(root, "data", "d9.parquet"), 400, content=2)],
    )
    write_avro_file(
        mlist_p,
        _MANIFEST_FILE_SCHEMA,
        [{"manifest_path": eq, "manifest_length": 1,
          "partition_spec_id": 0, "content": 1, "added_snapshot_id": 400}],
    )
    with pytest.raises(NotImplementedError, match="equality_ids"):
        read_iceberg_snapshot(spark, root)
    # unknown manifest content kinds refuse too
    write_avro_file(
        mlist_p,
        _MANIFEST_FILE_SCHEMA,
        [{"manifest_path": eq, "manifest_length": 1,
          "partition_spec_id": 0, "content": 7, "added_snapshot_id": 400}],
    )
    with pytest.raises(NotImplementedError, match="content=7"):
        read_iceberg_snapshot(spark, root)


def test_iceberg_missing_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_iceberg_snapshot(spark, str(tmp_path / "nope"))


# ------------------------------------------------------ writer round-trip


def test_iceberg_append_roundtrip_and_time_travel(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_append,
    )

    root = str(tmp_path / "wtable")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, val string")
    df2 = spark.createDataFrame([(30, "z")], "id bigint, val string")
    s1 = write_iceberg_append(df1, root)
    s2 = write_iceberg_append(df2, root)
    assert s2 > s1

    def rows(df):
        return {(r.id, r.val) for r in df.collect()}

    assert rows(read_iceberg_snapshot(spark, root)) == {
        (1, "a"),
        (2, "b"),
        (30, "z"),
    }
    # time travel back to the first snapshot
    assert rows(read_iceberg_snapshot(spark, root, snapshot_id=s1)) == {
        (1, "a"),
        (2, "b"),
    }


def test_iceberg_append_refuses_foreign_table(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_append,
    )

    root = _write_iceberg_fixture(str(tmp_path / "ftable"))
    df = spark.createDataFrame([(9, "q")], "id bigint, val string")
    with pytest.raises(NotImplementedError, match="another"):
        write_iceberg_append(df, root)


def test_iceberg_position_delete_roundtrip(spark, tmp_path):
    """Merge-on-read DELETE: a position-delete commit must hide matching
    rows in the current snapshot, leave prior snapshots intact (time
    travel), compose with a later append, and stack with a second delete
    (existing deletes applied before computing new coordinates)."""
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_append,
        write_iceberg_position_deletes,
    )

    root = str(tmp_path / "dtable")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id bigint, val string"
    )
    s1 = write_iceberg_append(df1, root)
    sd = write_iceberg_position_deletes(spark, root, F.col("id") % 2 == 0)
    assert sd > s1

    def rows(df):
        return {(r.id, r.val) for r in df.collect()}

    assert rows(read_iceberg_snapshot(spark, root)) == {(1, "a"), (3, "c")}
    # pre-delete snapshot still shows everything
    assert rows(read_iceberg_snapshot(spark, root, snapshot_id=s1)) == {
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    }
    # append after a delete: new rows visible, old deletes still applied
    write_iceberg_append(
        spark.createDataFrame([(6, "f")], "id bigint, val string"), root
    )
    assert rows(read_iceberg_snapshot(spark, root)) == {
        (1, "a"), (3, "c"), (6, "f"),
    }
    # second delete stacks (and re-deleting dead rows is a no-op)
    write_iceberg_position_deletes(spark, root, F.col("id") >= 3)
    assert rows(read_iceberg_snapshot(spark, root)) == {(1, "a")}
