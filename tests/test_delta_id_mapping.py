"""Delta column mapping, id mode (PROTOCOL.md "Column Mapping").

Data files store arbitrary physical column names PLUS parquet field ids;
matching is BY FIELD ID, never by name. The reader builds an explicit
read schema whose StructFields carry ``parquet.field.id`` metadata and
enables Spark's field-id resolution, so renamed columns (metaData-only),
dropped columns, and add-column evolution (old files lack the new id →
NULLs) all follow from id matching. Partition columns re-attach from
``add.partitionValues`` (physical keys) and rename to logical."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _fid_table(cols):
    """pyarrow table whose fields carry parquet field ids.

    cols: [(file_column_name, field_id, values)]
    """
    arrays, fields = [], []
    for name, fid, values in cols:
        arr = pa.array(values)
        fields.append(
            pa.field(
                name, arr.type, metadata={b"PARQUET:field_id": str(fid).encode()}
            )
        )
        arrays.append(arr)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def _schema_string(fields):
    """fields: [(logical, delta_type, field_id, physical)]"""
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": name,
                    "type": typ,
                    "nullable": True,
                    "metadata": (
                        {"delta.columnMapping.id": fid,
                         "delta.columnMapping.physicalName": phys}
                        if fid is not None
                        else {}
                    ),
                }
                for name, typ, fid, phys in fields
            ],
        }
    )


def _meta_action(fields, partition_columns=()):
    return {
        "metaData": {
            "id": "m-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(fields),
            "partitionColumns": list(partition_columns),
            "configuration": {"delta.columnMapping.mode": "id",
                              "delta.columnMapping.maxColumnId": "9"},
        }
    }


def _write_commit(root, version, actions):
    with open(
        os.path.join(root, "_delta_log", f"{version:020d}.json"), "w"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _make(tmp_path, name, meta, file_cols, partition_values=None):
    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(_fid_table(file_cols), os.path.join(root, "f0.parquet"))
    add = {"add": {"path": "f0.parquet", "dataChange": True}}
    if partition_values is not None:
        add["add"]["partitionValues"] = partition_values
    _write_commit(
        root,
        0,
        [{"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
         meta, add],
    )
    return root


def test_id_mode_matches_by_field_id_not_name(spark, tmp_path):
    # file column names deliberately DISAGREE with the schema's
    # physicalName — id mode must not care
    root = _make(
        tmp_path,
        "id1",
        _meta_action([("id", "long", 1, "col-aaa"),
                      ("val", "string", 2, "col-bbb")]),
        [("totally-unrelated", 1, [1, 2]), ("also-wrong", 2, ["a", "b"])],
    )
    df = read_delta_snapshot(spark, root)
    assert df.columns == ["id", "val"]
    assert {(r.id, r.val) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_id_mode_rename_is_metadata_only(spark, tmp_path):
    root = _make(
        tmp_path,
        "id2",
        _meta_action([("id", "long", 1, "col-aaa"),
                      ("val", "string", 2, "col-bbb")]),
        [("col-aaa", 1, [1, 2]), ("col-bbb", 2, ["a", "b"])],
    )
    _write_commit(
        root, 1,
        [_meta_action([("id", "long", 1, "col-aaa"),
                       ("label", "string", 2, "col-bbb")])],
    )
    assert read_delta_snapshot(spark, root).columns == ["id", "label"]
    assert read_delta_snapshot(spark, root, version=0).columns == ["id", "val"]


def test_id_mode_dropped_column(spark, tmp_path):
    root = _make(
        tmp_path,
        "id3",
        _meta_action([("id", "long", 1, "col-aaa")]),
        [("col-aaa", 1, [1, 2]), ("col-bbb", 2, ["a", "b"])],
    )
    df = read_delta_snapshot(spark, root)
    assert df.columns == ["id"]
    assert {r.id for r in df.collect()} == {1, 2}


def test_id_mode_add_column_yields_nulls_for_old_files(spark, tmp_path):
    """A file written before a column existed lacks that field id — its
    rows must surface NULL for the new column (Delta add-column
    semantics), while newer files carry real values."""
    root = _make(
        tmp_path,
        "id4",
        _meta_action([("id", "long", 1, "col-aaa")]),
        [("col-aaa", 1, [1, 2])],
    )
    pq.write_table(
        _fid_table([("col-aaa", 1, [3]), ("col-ccc", 3, [30])]),
        os.path.join(root, "f1.parquet"),
    )
    _write_commit(
        root, 1,
        [_meta_action([("id", "long", 1, "col-aaa"),
                       ("extra", "long", 3, "col-ccc")]),
         {"add": {"path": "f1.parquet", "dataChange": True}}],
    )
    df = read_delta_snapshot(spark, root)
    assert df.columns == ["id", "extra"]
    assert {(r.id, r.extra) for r in df.collect()} == {
        (1, None), (2, None), (3, 30),
    }


def test_id_mode_partitioned_typed_and_renamed(spark, tmp_path):
    from pyspark.sql import types as T

    root = _make(
        tmp_path,
        "id5",
        _meta_action(
            [("id", "long", 1, "col-aaa"), ("part", "long", 2, "col-ppp")],
            partition_columns=["col-ppp"],
        ),
        [("col-aaa", 1, [1, 2])],
        partition_values={"col-ppp": "7"},
    )
    df = read_delta_snapshot(spark, root)
    assert df.columns == ["id", "part"]
    assert df.schema["part"].dataType == T.LongType()
    assert {(r.id, r.part) for r in df.collect()} == {(1, 7), (2, 7)}


def test_id_mode_requires_field_ids_in_metadata(spark, tmp_path):
    root = _make(
        tmp_path,
        "id6",
        _meta_action([("id", "long", None, None)]),
        [("col-aaa", 1, [1, 2])],
    )
    with pytest.raises(NotImplementedError, match="delta.columnMapping.id"):
        read_delta_snapshot(spark, root)
