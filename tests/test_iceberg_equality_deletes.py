"""Iceberg v2 EQUALITY delete round-trips against the minimal writer/reader.

Spec semantics under test (iceberg.apache.org/spec/ "Equality Delete Files"
+ "Sequence Numbers"): an equality delete row kills a data row iff every
equality column matches null-safely AND the data file's data sequence
number is strictly lower than the delete file's — so a key re-appended
AFTER the delete survives (the CDC upsert pattern). Composition with
position deletes and time travel is covered too.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.iceberg import (
    write_iceberg_append,
    write_iceberg_equality_deletes,
    write_iceberg_position_deletes,
)
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_equality_delete_roundtrip_and_resurrect(spark, tmp_path):
    root = str(tmp_path / "eqtable")
    s1 = write_iceberg_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, val string"
        ),
        root,
    )
    sd = write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(2,), (3,)], "id bigint")
    )
    assert sd > s1
    assert _rows(read_iceberg_snapshot(spark, root)) == {(1, "a")}
    # time travel to the pre-delete snapshot is unaffected
    assert _rows(read_iceberg_snapshot(spark, root, snapshot_id=s1)) == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    # re-append key 2 AFTER the delete: higher data sequence number, so the
    # equality delete does NOT apply to it (strictly-lower rule)
    write_iceberg_append(
        spark.createDataFrame([(2, "b2")], "id bigint, val string"), root
    )
    assert _rows(read_iceberg_snapshot(spark, root)) == {(1, "a"), (2, "b2")}
    # a second equality delete on the same key kills the re-appended row
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(2,)], "id bigint")
    )
    assert _rows(read_iceberg_snapshot(spark, root)) == {(1, "a")}


def test_equality_delete_multi_column_and_nulls(spark, tmp_path):
    root = str(tmp_path / "eqnull")
    write_iceberg_append(
        spark.createDataFrame(
            [(1, "x", 10.0), (1, None, 11.0), (2, "x", 12.0), (2, "y", 13.0)],
            "id bigint, tag string, v double",
        ),
        root,
    )
    # composite key (id, tag); the null key row must match null-safely
    write_iceberg_equality_deletes(
        spark,
        root,
        spark.createDataFrame([(1, None), (2, "y")], "id bigint, tag string"),
    )
    assert _rows(read_iceberg_snapshot(spark, root)) == {
        (1, "x", 10.0),
        (2, "x", 12.0),
    }


def test_equality_and_position_deletes_compose(spark, tmp_path):
    root = str(tmp_path / "mixed")
    write_iceberg_append(
        spark.createDataFrame(
            [(i, chr(97 + i)) for i in range(6)], "id bigint, val string"
        ),
        root,
    )
    write_iceberg_position_deletes(spark, root, F.col("id") < 2)  # 0,1
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(4,), (5,)], "id bigint")
    )
    assert _rows(read_iceberg_snapshot(spark, root)) == {(2, "c"), (3, "d")}
    # a position delete computed AFTER an equality delete must treat
    # equality-deleted rows as already dead (no-op on id=4) and hit id=3
    write_iceberg_position_deletes(spark, root, F.col("id") >= 3)
    assert _rows(read_iceberg_snapshot(spark, root)) == {(2, "c")}


def test_equality_delete_distinct_keys_and_dedup(spark, tmp_path):
    root = str(tmp_path / "eqdup")
    write_iceberg_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, val string"),
        root,
    )
    # duplicate key rows in the input collapse to distinct tuples
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(2,), (2,), (2,)], "id bigint")
    )
    assert _rows(read_iceberg_snapshot(spark, root)) == {(1, "a")}


def test_equality_delete_fail_fasts(spark, tmp_path):
    root = str(tmp_path / "eqfail")
    write_iceberg_append(
        spark.createDataFrame([(1, "a")], "id bigint, val string"), root
    )
    with pytest.raises(ValueError, match="not in the table schema"):
        write_iceberg_equality_deletes(
            spark, root, spark.createDataFrame([(1,)], "nope bigint")
        )
    with pytest.raises(FileNotFoundError):
        write_iceberg_equality_deletes(
            spark,
            str(tmp_path / "missing"),
            spark.createDataFrame([(1,)], "id bigint"),
        )
    # a table created with UNMAPPED complex-typed columns (map/struct) has
    # no field-id schema — equality deletes fail fast
    root2 = str(tmp_path / "eqcomplex")
    write_iceberg_append(
        spark.createDataFrame(
            [(1, {"a": "b"})], "id bigint, tags map<string,string>"
        ),
        root2,
    )
    with pytest.raises(NotImplementedError, match="field-id schema"):
        write_iceberg_equality_deletes(
            spark, root2, spark.createDataFrame([(1,)], "id bigint")
        )
    # LIST columns get field-id schemas since the ANN-index round: equality
    # deletes on a primitive key of a list-carrying table now just work
    root3 = str(tmp_path / "eqlist")
    write_iceberg_append(
        spark.createDataFrame(
            [(1, ["a", "b"]), (2, ["c"])], "id bigint, tags array<string>"
        ),
        root3,
    )
    write_iceberg_equality_deletes(
        spark, root3, spark.createDataFrame([(2,)], "id bigint")
    )
    assert {
        (r.id, tuple(r.tags))
        for r in read_iceberg_snapshot(spark, root3).collect()
    } == {(1, ("a", "b"))}


def test_rewrite_compacts_away_delete_files(spark, tmp_path):
    """Major compaction: after a rewrite the current snapshot's manifest
    list must reference ONLY fresh data files (no delete manifests, no
    old data files), rows must be unchanged, merge-on-read history must
    stay time-travelable, and further upserts must work on top."""
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        rewrite_iceberg_table,
    )
    from mysoftware_nocnetintel_spark.sources.readers import (
        _iceberg_snapshot_files,
    )

    root = str(tmp_path / "compact")
    write_iceberg_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, val string"
        ),
        root,
    )
    write_iceberg_position_deletes(spark, root, F.col("id") == 1)
    s_pre = write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(3,)], "id bigint")
    )
    want = {(2, "b")}
    assert _rows(read_iceberg_snapshot(spark, root)) == want

    sid = rewrite_iceberg_table(spark, root)
    assert _rows(read_iceberg_snapshot(spark, root)) == want
    data_files, pos_dels, eq_dels, snap = _iceberg_snapshot_files(root)
    assert snap["snapshot-id"] == sid
    assert not pos_dels and not eq_dels and len(data_files) >= 1
    # pre-rewrite snapshot still replays merge-on-read
    assert _rows(read_iceberg_snapshot(spark, root, snapshot_id=s_pre)) == want
    # the table keeps working after compaction: upsert key 2
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(2,)], "id bigint")
    )
    write_iceberg_append(
        spark.createDataFrame([(2, "b2")], "id bigint, val string"), root
    )
    assert _rows(read_iceberg_snapshot(spark, root)) == {(2, "b2")}


def test_append_schema_mismatch_refused(spark, tmp_path):
    root = str(tmp_path / "schemamismatch")
    write_iceberg_append(
        spark.createDataFrame([(1, "a")], "id bigint, val string"), root
    )
    with pytest.raises(ValueError, match="does not cover the"):
        write_iceberg_append(
            spark.createDataFrame([(1, 2.0)], "id bigint, other double"), root
        )
    # same NAMES but different TYPES must refuse too — committing
    # mixed-type parquet would corrupt every later scan
    with pytest.raises(ValueError, match="does not cover the"):
        write_iceberg_append(
            spark.createDataFrame([("1", "a")], "id string, val string"), root
        )
    # matching (name, type) pairs in a different column order are fine
    write_iceberg_append(
        spark.createDataFrame([("b", 2)], "val string, id bigint"), root
    )
