"""Iceberg AVRO data files: row-oriented fast-appends + mixed-format
reads + compaction back to parquet.

The spec allows avro data files precisely for small frequent commits (a
columnar footer per micro-batch is the overhead); Spark ships no avro
reader without the external spark-avro jar, so the scan decodes through
avro_lite INSIDE the executors (mapInPandas over the file list). Deletes
must compose across formats because both scans emit the same (__fp,
__pos) coordinates; rewrite/bin-pack must CONVERT avro files to parquet.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.iceberg import (
    rewrite_iceberg_table,
    write_iceberg_append,
    write_iceberg_equality_deletes,
    write_iceberg_position_deletes,
)
from mysoftware_nocnetintel_spark.sources.readers import (
    _iceberg_snapshot_files,
    read_iceberg_snapshot,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mixed(spark, tmp_path, name="av"):
    root = str(tmp_path / name)
    write_iceberg_append(
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.0)], "id bigint, s string, v double"
        ).coalesce(1),
        root,
    )
    write_iceberg_append(
        spark.createDataFrame(
            [(3, "c", 2.5), (4, None, 3.5)], "id bigint, s string, v double"
        ).coalesce(1),
        root,
        file_format="avro",
    )
    return root


def test_avro_append_roundtrip_and_mixed_read(spark, tmp_path):
    root = _mixed(spark, tmp_path)
    data_files, _p, _e, _s = _iceberg_snapshot_files(root)
    assert sorted(e.fmt for e in data_files) == ["AVRO", "PARQUET"]
    assert _rows(read_iceberg_snapshot(spark, root)) == [
        (1, "a", 1.5), (2, "b", 2.0), (3, "c", 2.5), (4, None, 3.5),
    ]


def test_avro_only_table(spark, tmp_path):
    root = str(tmp_path / "avonly")
    for batch in ([(1, 10.0)], [(2, 20.0)], [(3, None)]):
        write_iceberg_append(
            spark.createDataFrame(batch, "id bigint, v double").coalesce(1),
            root,
            file_format="avro",
        )
    assert _rows(read_iceberg_snapshot(spark, root)) == [
        (1, 10.0), (2, 20.0), (3, None),
    ]


def test_position_deletes_hit_avro_rows(spark, tmp_path):
    root = _mixed(spark, tmp_path, "avpd")
    # id=3 lives in the avro file; id=1 in the parquet file
    write_iceberg_position_deletes(
        spark, root, F.col("id").isin(1, 3)
    )
    assert _rows(read_iceberg_snapshot(spark, root)) == [
        (2, "b", 2.0), (4, None, 3.5),
    ]


def test_equality_deletes_hit_avro_rows(spark, tmp_path):
    root = _mixed(spark, tmp_path, "aveq")
    write_iceberg_equality_deletes(
        spark, root, spark.createDataFrame([(4,)], "id bigint")
    )
    assert _rows(read_iceberg_snapshot(spark, root)) == [
        (1, "a", 1.5), (2, "b", 2.0), (3, "c", 2.5),
    ]
    # re-insert AFTER the delete: the sequence-number scope must keep it
    write_iceberg_append(
        spark.createDataFrame(
            [(4, "back", 9.0)], "id bigint, s string, v double"
        ).coalesce(1),
        root,
        file_format="avro",
    )
    assert (4, "back", 9.0) in _rows(read_iceberg_snapshot(spark, root))


def test_scan_filter_keeps_boundless_avro_files(spark, tmp_path):
    """Avro entries carry no column bounds, so zone maps must always KEEP
    them (skipping is an optimization, never correctness) while the row
    filter still applies."""
    root = _mixed(spark, tmp_path, "avzm")
    got = read_iceberg_snapshot(spark, root, scan_filter=("id", ">=", 3))
    assert _rows(got) == [(3, "c", 2.5), (4, None, 3.5)]
    got = read_iceberg_snapshot(spark, root, scan_filter=("id", "<", 2))
    assert _rows(got) == [(1, "a", 1.5)]


def test_full_rewrite_converts_avro_to_parquet(spark, tmp_path):
    root = _mixed(spark, tmp_path, "avrw")
    before = _rows(read_iceberg_snapshot(spark, root))
    rewrite_iceberg_table(spark, root)
    data_files, _p, _e, _s = _iceberg_snapshot_files(root)
    assert all(e.fmt == "PARQUET" for e in data_files)
    assert _rows(read_iceberg_snapshot(spark, root)) == before
    # converted files regain column bounds → zone maps work again
    assert all(e.lower and e.upper for e in data_files)


def test_binpack_always_packs_avro(spark, tmp_path):
    """Incremental bin-packing converts row-format fast-append files even
    when their partition is below the fragmentation threshold; untouched
    parquet files are carried verbatim."""
    root = _mixed(spark, tmp_path, "avbp")
    data_files, _p, _e, _s = _iceberg_snapshot_files(root)
    kept_path = next(e.path for e in data_files if e.fmt == "PARQUET")
    before = _rows(read_iceberg_snapshot(spark, root))
    rewrite_iceberg_table(spark, root, min_files_per_partition=99)
    after, _p, _e, _s = _iceberg_snapshot_files(root)
    assert all(e.fmt == "PARQUET" for e in after)
    assert kept_path in {e.path for e in after}  # parquet carried verbatim
    assert _rows(read_iceberg_snapshot(spark, root)) == before


def test_avro_append_fail_fasts(spark, tmp_path):
    root = str(tmp_path / "avff")
    # non-primitive column type
    with pytest.raises(NotImplementedError, match="primitive"):
        write_iceberg_append(
            spark.createDataFrame(
                [([1, 2],)], "arr array<bigint>"
            ),
            root,
            file_format="avro",
        )
    # partitioned + avro
    with pytest.raises(NotImplementedError, match="unpartitioned"):
        write_iceberg_append(
            spark.createDataFrame([("d1", 1)], "day string, id bigint"),
            root,
            partition_by=("day",),
            file_format="avro",
        )
    with pytest.raises(ValueError, match="file_format"):
        write_iceberg_append(
            spark.createDataFrame([(1,)], "id bigint"), root,
            file_format="orc",
        )


def test_time_travel_across_formats(spark, tmp_path):
    root = _mixed(spark, tmp_path, "avtt")
    _d, _p, _e, snap = _iceberg_snapshot_files(root)
    rewrite_iceberg_table(spark, root)
    old = read_iceberg_snapshot(
        spark, root, snapshot_id=snap["snapshot-id"]
    )
    assert len(_rows(old)) == 4
