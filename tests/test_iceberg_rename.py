"""Iceberg column RENAME on read (spec "Schema Evolution" + name mapping).

The minimal writer stamps no parquet field ids (plain df.write.parquet),
so renames resolve through the spec's ``schema.name-mapping.default``
property: the scan widens its read schema with one nullable twin per
historical name and coalesces per field (a file carries exactly one of
the names — reuse is refused at rename/evolve time). Mirrors
tests/test_delta_id_mapping.py: rename → append → read round-trip,
pruning still correct, deletes compose, refusals fail fast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.iceberg import (
    rename_iceberg_column,
    write_iceberg_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def _mk(spark, rows, schema="id bigint, val string"):
    return spark.createDataFrame(rows, schema)


def test_rename_append_read_roundtrip(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a"), (2, "b")]), root)
    rename_iceberg_column(root, "val", "label")
    # post-rename reads surface the NEW name with pre-rename files' data
    got = read_iceberg_snapshot(spark, root)
    assert got.columns == ["id", "label"]
    assert {(r.id, r.label) for r in got.collect()} == {(1, "a"), (2, "b")}
    # appends use the new name; both file generations union cleanly
    write_iceberg_append(
        _mk(spark, [(3, "c")], "id bigint, label string"), root
    )
    got = read_iceberg_snapshot(spark, root)
    assert {(r.id, r.label) for r in got.collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }
    # appending under the OLD name fails fast (schema no longer has it)
    with pytest.raises(ValueError, match="does not cover"):
        write_iceberg_append(_mk(spark, [(4, "d")]), root)


def test_double_rename_and_rename_back(spark, tmp_path):
    root = str(tmp_path / "t2")
    write_iceberg_append(_mk(spark, [(1, "a")]), root)
    rename_iceberg_column(root, "val", "v2")
    write_iceberg_append(_mk(spark, [(2, "b")], "id bigint, v2 string"), root)
    rename_iceberg_column(root, "v2", "v3")
    write_iceberg_append(_mk(spark, [(3, "c")], "id bigint, v3 string"), root)
    got = read_iceberg_snapshot(spark, root)
    assert got.columns == ["id", "v3"]
    assert {(r.id, r.v3) for r in got.collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }
    # renaming BACK to a historical name of the SAME field is legal
    rename_iceberg_column(root, "v3", "val")
    got = read_iceberg_snapshot(spark, root)
    assert {(r.id, r.val) for r in got.collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }


def test_rename_refusals(spark, tmp_path):
    root = str(tmp_path / "t3")
    write_iceberg_append(
        _mk(spark, [(1, "a", 1.0)], "id bigint, val string, x double"), root
    )
    rename_iceberg_column(root, "val", "label")
    with pytest.raises(ValueError, match="does not exist"):
        rename_iceberg_column(root, "nope", "y")
    # a DIFFERENT field may not take a current name...
    with pytest.raises(ValueError, match="already used"):
        rename_iceberg_column(root, "x", "label")
    # ...nor a historical one (files without ids would turn ambiguous)
    with pytest.raises(ValueError, match="already used"):
        rename_iceberg_column(root, "x", "val")
    # new columns may not reuse historical names either
    with pytest.raises(ValueError, match="historical names"):
        write_iceberg_append(
            _mk(
                spark,
                [(2, "b", 2.0, "zz")],
                "id bigint, label string, x double, val string",
            ),
            root,
        )


def test_rename_partition_source(spark, tmp_path):
    """Renaming a partition SOURCE works (round 6): spec fields key by
    source-id, spec-field names (partition_filter keys) never change,
    appends recompute transforms from the new name, and transform
    pruning routes scan_filter on the new name."""
    root = str(tmp_path / "t4")
    write_iceberg_append(
        _mk(spark, [(i, f"u{i % 3}") for i in range(9)]),
        root,
        partition_by=("bucket(4, id)",),
    )
    rename_iceberg_column(root, "id", "key")
    write_iceberg_append(
        _mk(spark, [(100, "x")], "key bigint, val string"), root
    )
    got = read_iceberg_snapshot(spark, root)
    assert sorted(r.key for r in got.collect()) == list(range(9)) + [100]
    # bucket transform pruning routes the RENAMED source name
    got = read_iceberg_snapshot(spark, root, scan_filter=("key", "=", 100))
    assert sorted(r.key for r in got.collect()) == [100]
    # identity-partitioned twin: partition_filter keys stay the SPEC
    # FIELD name (the original column name at create time)
    root2 = str(tmp_path / "t4b")
    write_iceberg_append(
        spark.createDataFrame(
            [(i, f"d{i % 2}") for i in range(6)], "id bigint, day string"
        ),
        root2,
        partition_by=("day",),
    )
    rename_iceberg_column(root2, "day", "dt")
    write_iceberg_append(
        spark.createDataFrame([(6, "d0")], "id bigint, dt string"), root2
    )
    got = read_iceberg_snapshot(spark, root2, partition_filter={"day": "d0"})
    assert sorted(r.id for r in got.collect()) == [0, 2, 4, 6]
    # non-source columns still rename fine on a partitioned table
    rename_iceberg_column(root2, "id", "nid")
    got = read_iceberg_snapshot(spark, root2)
    assert sorted(r.nid for r in got.collect()) == list(range(7))


def test_scan_filter_and_zone_maps_after_rename(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.readers import (
        _iceberg_snapshot_files,
    )

    root = str(tmp_path / "t5")
    write_iceberg_append(
        _mk(spark, [(i, f"u{i}") for i in range(10)]).coalesce(1), root
    )
    write_iceberg_append(
        _mk(spark, [(i, f"u{i}") for i in range(10, 20)]).coalesce(1), root
    )
    rename_iceberg_column(root, "id", "key")
    # zone-map bounds are keyed by FIELD ID: pruning must still work via
    # the new name — corrupt the low file (first append, seq 1, rows
    # 0..9) and prove the filtered read never touches it
    data_files, _p, _e, _s = _iceberg_snapshot_files(root)
    for e in data_files:
        if e.seq == 1:
            with open(e.path, "wb") as fh:
                fh.write(b"garbage")
    got = read_iceberg_snapshot(spark, root, scan_filter=("key", ">=", 15))
    assert {r.key for r in got.collect()} == set(range(15, 20))


def test_equality_deletes_across_rename(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_equality_deletes,
    )

    root = str(tmp_path / "t6")
    write_iceberg_append(_mk(spark, [(i, "v") for i in range(6)]), root)
    # delete file written under the OLD name...
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(2,)], "id bigint")
    )
    rename_iceberg_column(root, "id", "key")
    # ...must still mask after the rename (equality_ids are field ids;
    # the name mapping resolves the file's old column name)
    got = read_iceberg_snapshot(spark, root)
    assert {r.key for r in got.collect()} == {0, 1, 3, 4, 5}
    # and a post-rename delete (new name) composes on top
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(4,)], "key bigint")
    )
    got = read_iceberg_snapshot(spark, root)
    assert {r.key for r in got.collect()} == {0, 1, 3, 5}


def test_position_deletes_across_rename(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_position_deletes,
    )

    root = str(tmp_path / "t7")
    write_iceberg_append(_mk(spark, [(i, "v") for i in range(6)]), root)
    write_iceberg_position_deletes(spark, root, F.col("id") % 2 == 0)
    rename_iceberg_column(root, "id", "key")
    got = read_iceberg_snapshot(spark, root)
    assert {r.key for r in got.collect()} == {1, 3, 5}
    write_iceberg_position_deletes(spark, root, F.col("key") == 3)
    got = read_iceberg_snapshot(spark, root)
    assert {r.key for r in got.collect()} == {1, 5}


def test_avro_files_across_rename(spark, tmp_path):
    root = str(tmp_path / "t8")
    write_iceberg_append(
        _mk(spark, [(1, "a")]), root, file_format="avro"
    )
    rename_iceberg_column(root, "val", "label")
    write_iceberg_append(
        _mk(spark, [(2, "b")], "id bigint, label string"),
        root,
        file_format="avro",
    )
    got = read_iceberg_snapshot(spark, root)
    assert {(r.id, r.label) for r in got.collect()} == {(1, "a"), (2, "b")}


def test_rename_then_add_column_and_compaction(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        rewrite_iceberg_table,
    )

    root = str(tmp_path / "t9")
    write_iceberg_append(_mk(spark, [(1, "a")]), root)
    rename_iceberg_column(root, "val", "label")
    # additive evolution under a fresh (non-historical) name still works
    write_iceberg_append(
        _mk(
            spark,
            [(2, "b", 9.0)],
            "id bigint, label string, score double",
        ),
        root,
    )
    got = read_iceberg_snapshot(spark, root)
    rows = {(r.id, r.label, r.score) for r in got.collect()}
    assert rows == {(1, "a", None), (2, "b", 9.0)}
    # compaction rewrites files under the CURRENT names; reads unchanged
    rewrite_iceberg_table(spark, root)
    got = read_iceberg_snapshot(spark, root)
    assert {(r.id, r.label, r.score) for r in got.collect()} == rows


def test_tailer_across_rename(spark, tmp_path):
    """A rename commit is metadata-only (no snapshot): the tailer must
    pass it untouched and later batches surface the NEW column name."""
    from mysoftware_nocnetintel_spark.streaming.ops import IcebergTailer

    root = str(tmp_path / "t10")
    write_iceberg_append(_mk(spark, [(1, "a")]), root)
    t = IcebergTailer(spark, root, str(tmp_path / "ckpt"))
    assert t.poll() is not None
    t.commit()
    rename_iceberg_column(root, "val", "label")
    assert t.poll() is None  # metadata-only: nothing to consume
    write_iceberg_append(
        _mk(spark, [(2, "b")], "id bigint, label string"), root
    )
    batch = t.poll()
    assert batch is not None and "label" in batch.columns
    assert [(r.id, r.label) for r in batch.collect()] == [(2, "b")]
    t.commit()


def test_drop_column_roundtrip_and_refusals(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        drop_iceberg_column,
        write_iceberg_equality_deletes,
    )

    root = str(tmp_path / "t11")
    write_iceberg_append(
        _mk(spark, [(1, "a", 1.5)], "id bigint, val string, x double"), root
    )
    drop_iceberg_column(root, "x")
    got = read_iceberg_snapshot(spark, root)
    assert got.columns == ["id", "val"]
    assert {(r.id, r.val) for r in got.collect()} == {(1, "a")}
    # appends now use the narrowed schema; the dropped name is reserved
    write_iceberg_append(_mk(spark, [(2, "b")]), root)
    with pytest.raises(ValueError, match="historical names"):
        write_iceberg_append(
            _mk(spark, [(3, "c", 9.9)], "id bigint, val string, x double"),
            root,
        )
    # rename may not take the dropped name either
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        rename_iceberg_column,
    )

    with pytest.raises(ValueError, match="already used"):
        rename_iceberg_column(root, "val", "x")
    with pytest.raises(ValueError, match="does not exist"):
        drop_iceberg_column(root, "nope")
    # live equality-delete key → refuse the drop with the remedy
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(1,)], "id bigint")
    )
    with pytest.raises(ValueError, match="equality-delete key"):
        drop_iceberg_column(root, "id")
    # compaction folds the deletes away, then the drop lands
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        rewrite_iceberg_table,
    )

    rewrite_iceberg_table(spark, root)
    drop_iceberg_column(root, "id")
    got = read_iceberg_snapshot(spark, root)
    assert got.columns == ["val"]
    assert {r.val for r in got.collect()} == {"b"}


def test_drop_then_rename_interplay(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        drop_iceberg_column,
        rename_iceberg_column,
    )

    root = str(tmp_path / "t12")
    write_iceberg_append(
        _mk(spark, [(1, "a", 2.0)], "id bigint, val string, x double"), root
    )
    rename_iceberg_column(root, "val", "label")
    drop_iceberg_column(root, "label")  # drop under the renamed name
    got = read_iceberg_snapshot(spark, root)
    assert got.columns == ["id", "x"]
    # BOTH historical names of the dropped field stay reserved
    for bad in ("val", "label"):
        with pytest.raises(ValueError, match="already used"):
            rename_iceberg_column(root, "x", bad)
