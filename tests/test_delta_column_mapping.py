"""Delta column mapping, name mode (PROTOCOL.md "Column Mapping").

Data files store physical column names (``col-<uuid>``); the logical
schema lives in the metaData action. The reader must project physical →
logical, honor later metaData actions (logical RENAME without data
rewrite), implement dropped columns (physical data survives, schema entry
leaves), and fail fast on id-mode / nested mapping / missing
physicalName.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _schema_string(fields):
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": name,
                    "type": typ,
                    "nullable": True,
                    "metadata": (
                        {
                            "delta.columnMapping.physicalName": phys,
                            "delta.columnMapping.id": i + 1,
                        }
                        if phys
                        else {}
                    ),
                }
                for i, (name, typ, phys) in enumerate(fields)
            ],
        }
    )


def _meta_action(fields, mode="name"):
    return {
        "metaData": {
            "id": "m-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(fields),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": mode,
                              "delta.columnMapping.maxColumnId": "9"},
        }
    }


def _table(tmp_path, name, actions):
    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"col-aaa": [1, 2], "col-bbb": ["a", "b"]}),
        os.path.join(root, "part-0000.parquet"),
    )
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        for a in actions:
            fh.write(json.dumps(a) + "\n")
        fh.write(json.dumps({"add": {"path": "part-0000.parquet", "dataChange": True}}) + "\n")
    return root


def test_name_mode_projects_logical_names(spark, tmp_path):
    root = _table(
        tmp_path,
        "cm1",
        [_meta_action([("id", "long", "col-aaa"), ("val", "string", "col-bbb")])],
    )
    df = read_delta_snapshot(spark, root)
    assert df.columns == ["id", "val"]
    assert {(r.id, r.val) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_rename_is_metadata_only(spark, tmp_path):
    # second metaData action renames val -> label; data files unchanged
    root = _table(
        tmp_path,
        "cm2",
        [_meta_action([("id", "long", "col-aaa"), ("val", "string", "col-bbb")])],
    )
    with open(os.path.join(root, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                _meta_action(
                    [("id", "long", "col-aaa"), ("label", "string", "col-bbb")]
                )
            )
            + "\n"
        )
    df = read_delta_snapshot(spark, root)
    assert df.columns == ["id", "label"]
    # time travel BEFORE the rename shows the old logical name
    assert read_delta_snapshot(spark, root, version=0).columns == ["id", "val"]


def test_dropped_column(spark, tmp_path):
    # schema only maps col-aaa: col-bbb is a dropped column, stays in
    # parquet but must not surface
    root = _table(tmp_path, "cm3", [_meta_action([("id", "long", "col-aaa")])])
    df = read_delta_snapshot(spark, root)
    assert df.columns == ["id"]
    assert {r.id for r in df.collect()} == {1, 2}


def test_no_mapping_mode_reads_raw(spark, tmp_path):
    root = _table(
        tmp_path,
        "cm4",
        [_meta_action([("col-aaa", "long", None), ("col-bbb", "string", None)],
                      mode="none")],
    )
    df = read_delta_snapshot(spark, root)
    assert set(df.columns) == {"col-aaa", "col-bbb"}


def test_metadata_via_parquet_checkpoint(spark, tmp_path):
    """metaData decoded from a PARQUET checkpoint row delivers its
    configuration as a pyarrow MAP — [(key, value)] tuples, not a dict.
    The mapping must still apply (this exact shape crashed the first
    implementation with AttributeError on list.get)."""
    root = _table(
        tmp_path,
        "cmcp",
        [_meta_action([("id", "long", "col-aaa"), ("val", "string", "col-bbb")])],
    )
    log_dir = os.path.join(root, "_delta_log")
    meta_struct = pa.struct(
        [
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    add_t = pa.struct(
        [("path", pa.string()), ("partitionValues", pa.map_(pa.string(), pa.string()))]
    )
    meta_row = {
        "id": "m-1",
        "schemaString": _schema_string(
            [("id", "long", "col-aaa"), ("val", "string", "col-bbb")]
        ),
        "configuration": [
            ("delta.columnMapping.mode", "name"),
            ("delta.appendOnly", "false"),
        ],
    }
    pq.write_table(
        pa.table(
            {
                "add": pa.array(
                    [{"path": "part-0000.parquet", "partitionValues": []}, None],
                    add_t,
                ),
                "metaData": pa.array([None, meta_row], meta_struct),
            }
        ),
        os.path.join(log_dir, f"{0:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 0, "size": 2}))
    df = read_delta_snapshot(spark, root)
    assert df.columns == ["id", "val"]
    assert {(r.id, r.val) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_fail_fasts(spark, tmp_path):
    # unknown mapping mode (id-mode is now SUPPORTED — see
    # test_delta_id_mapping.py; a field without an id under mode=id is
    # covered there)
    root = _table(
        tmp_path, "cm5",
        [_meta_action([("id", "long", "col-aaa")], mode="nonsense")],
    )
    with pytest.raises(NotImplementedError, match="nonsense"):
        read_delta_snapshot(spark, root)
    # name mode but a field without physicalName
    root = _table(
        tmp_path, "cm6",
        [_meta_action([("id", "long", None)])],
    )
    with pytest.raises(NotImplementedError, match="physicalName"):
        read_delta_snapshot(spark, root)
    # nested field mapping
    bad = _meta_action([])
    bad["metaData"]["schemaString"] = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "s",
                    "type": {"type": "struct", "fields": []},
                    "nullable": True,
                    "metadata": {"delta.columnMapping.physicalName": "col-s"},
                }
            ],
        }
    )
    root = _table(tmp_path, "cm7", [bad])
    with pytest.raises(NotImplementedError, match="nested"):
        read_delta_snapshot(spark, root)


import random


@pytest.mark.parametrize("seed", [3, 29])
def test_random_rename_drop_chains(spark, tmp_path, seed):
    """Randomized schema-evolution differential: a chain of metadata-only
    RENAME and DROP commits over fixed physical data must replay, at
    EVERY version, to exactly the logical schema the reference model
    predicts — with values projected from the untouched physical
    columns."""
    rng = random.Random(seed)
    root = str(tmp_path / f"chain{seed}")
    os.makedirs(os.path.join(root, "_delta_log"))
    phys = ["col-aa", "col-bb", "col-cc", "col-dd"]
    values = {"col-aa": 1, "col-bb": 2, "col-cc": 3, "col-dd": 4}
    pq_rows = [tuple(values[p] for p in phys)]
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({p: [values[p]] for p in phys}),
        os.path.join(root, "part-0000.parquet"),
    )
    # model: ordered list of (logical, physical); start = identity-ish
    model = [(f"c{i}", p) for i, p in enumerate(phys)]

    def meta_action(m):
        return _meta_action([(lg, "long", ph) for lg, ph in m])

    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(json.dumps(meta_action(model)) + "\n")
        fh.write(json.dumps({"add": {"path": "part-0000.parquet", "dataChange": True}}) + "\n")
    history = [list(model)]
    fresh = 0
    for v in range(1, 6):
        if len(model) > 1 and rng.random() < 0.4:
            model.pop(rng.randrange(len(model)))  # DROP
        else:  # RENAME
            i = rng.randrange(len(model))
            fresh += 1
            model[i] = (f"renamed{fresh}", model[i][1])
        with open(os.path.join(root, "_delta_log", f"{v:020d}.json"), "w") as fh:
            fh.write(json.dumps(meta_action(model)) + "\n")
        history.append(list(model))

    for v, m in enumerate(history):
        df = read_delta_snapshot(spark, root, version=v)
        assert df.columns == [lg for lg, _p in m], f"seed={seed} v={v}"
        row = df.collect()[0]
        assert tuple(row) == tuple(values[p] for _lg, p in m), f"v={v}"
    assert pq_rows  # silence unused warning


def test_partitioned_mapped_table_casts_partition_types(spark, tmp_path):
    """Under mode=name, add.partitionValues keys are PHYSICAL column
    names; the declared-type cast must be applied to the physical column
    BEFORE the physical→logical rename, or a bigint partition column
    silently surfaces as a string."""
    from pyspark.sql import types as T

    root = str(tmp_path / "cmpart")
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"col-aaa": [1, 2]}),
        os.path.join(root, "part-0000.parquet"),
    )
    meta = _meta_action(
        [("id", "long", "col-aaa"), ("part", "long", "col-ppp")]
    )
    meta["metaData"]["partitionColumns"] = ["col-ppp"]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
            )
            + "\n"
        )
        fh.write(json.dumps(meta) + "\n")
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "part-0000.parquet",
                        "partitionValues": {"col-ppp": "7"},
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    got = read_delta_snapshot(spark, root)
    assert set(got.columns) == {"id", "part"}
    assert got.schema["part"].dataType == T.LongType()
    assert {(r.id, r.part) for r in got.collect()} == {(1, 7), (2, 7)}


def test_stats_skipping_uses_physical_names(spark, tmp_path):
    """Column-mapped tables key add.stats by PHYSICAL column name
    (PROTOCOL.md column-mapping writer requirements). A scan_filter on
    the LOGICAL name must translate through physicalName and prune —
    proven zero-I/O by corrupting the pruned file."""
    root = str(tmp_path / "cmstats")
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"col-aaa": [1, 2], "col-bbb": ["a", "b"]}),
        os.path.join(root, "part-lo.parquet"),
    )
    pq.write_table(
        pa.table({"col-aaa": [100, 200], "col-bbb": ["x", "y"]}),
        os.path.join(root, "part-hi.parquet"),
    )
    meta = _meta_action(
        [("id", "long", "col-aaa"), ("val", "string", "col-bbb")]
    )
    adds = [
        {
            "add": {
                "path": "part-lo.parquet",
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": 2,
                        "minValues": {"col-aaa": 1},
                        "maxValues": {"col-aaa": 2},
                    }
                ),
            }
        },
        {
            "add": {
                "path": "part-hi.parquet",
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": 2,
                        "minValues": {"col-aaa": 100},
                        "maxValues": {"col-aaa": 200},
                    }
                ),
            }
        },
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
            )
            + "\n"
        )
        fh.write(json.dumps(meta) + "\n")
        for a in adds:
            fh.write(json.dumps(a) + "\n")
    # the low file is provably outside id >= 50: corrupt it — the pruned
    # scan must still answer
    with open(os.path.join(root, "part-lo.parquet"), "wb") as fh:
        fh.write(b"GARBAGE")
    got = read_delta_snapshot(spark, root, scan_filter=("id", ">=", 50))
    assert {(r.id, r.val) for r in got.collect()} == {(100, "x"), (200, "y")}


def test_stats_skipping_logical_keyed_stats_prune_nothing(spark, tmp_path):
    """A non-conformant writer that keyed stats by LOGICAL names under
    column mapping must not cause wrong pruning — the physical-name
    lookup misses, every file is kept, and the row filter answers."""
    root = str(tmp_path / "cmstats2")
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"col-aaa": [1, 2], "col-bbb": ["a", "b"]}),
        os.path.join(root, "part-lo.parquet"),
    )
    meta = _meta_action(
        [("id", "long", "col-aaa"), ("val", "string", "col-bbb")]
    )
    add = {
        "add": {
            "path": "part-lo.parquet",
            "dataChange": True,
            # WRONG key ("id" instead of "col-aaa") claiming a range that
            # would prune the file if it were trusted under the wrong name
            "stats": json.dumps(
                {
                    "numRecords": 2,
                    "minValues": {"id": 1000},
                    "maxValues": {"id": 2000},
                }
            ),
        }
    }
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
            )
            + "\n"
        )
        fh.write(json.dumps(meta) + "\n")
        fh.write(json.dumps(add) + "\n")
    got = read_delta_snapshot(spark, root, scan_filter=("id", "<=", 1))
    assert {(r.id, r.val) for r in got.collect()} == {(1, "a")}
