"""Driver-side partition pruning in the Delta reader: a partition_filter
must drop non-matching files BEFORE any scan is planned. Proof of zero
I/O on excluded partitions: the excluded partition's data file is
CORRUPT — the read succeeds only if that file is never opened."""

from __future__ import annotations

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _partitioned_table(spark, tmp_path):
    root = str(tmp_path / "ptable")
    os.makedirs(os.path.join(root, "_delta_log"))
    os.makedirs(os.path.join(root, "day=2026-01-01"))
    os.makedirs(os.path.join(root, "day=2026-01-02"))

    def _file(rel, rows):
        import glob as g
        import shutil

        tmp = os.path.join(root, "__t")
        spark.createDataFrame(rows, "id bigint, val string").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        shutil.move(g.glob(tmp + "/*.parquet")[0], os.path.join(root, rel))
        shutil.rmtree(tmp)

    _file("day=2026-01-01/part-a.parquet", [(1, "a"), (2, "b")])
    # the second partition's file is GARBAGE: reading it would throw
    with open(os.path.join(root, "day=2026-01-02/part-b.parquet"), "wb") as fh:
        fh.write(b"NOT A PARQUET FILE")
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 1}}) + "\n")
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "day=2026-01-01/part-a.parquet",
                        "partitionValues": {"day": "2026-01-01"},
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "day=2026-01-02/part-b.parquet",
                        "partitionValues": {"day": "2026-01-02"},
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    return root


def test_pruning_never_opens_excluded_partitions(spark, tmp_path):
    root = _partitioned_table(spark, tmp_path)
    df = read_delta_snapshot(
        spark, root, partition_filter={"day": "2026-01-01"}
    )
    assert {(r.id, r.val, r.day) for r in df.collect()} == {
        (1, "a", "2026-01-01"),
        (2, "b", "2026-01-01"),
    }
    # without pruning the corrupt partition IS opened and the scan fails —
    # proving the filter above prevented any I/O against it
    with pytest.raises(Exception):
        read_delta_snapshot(spark, root).collect()


def test_pruning_validates_keys_and_empty_matches(spark, tmp_path):
    root = _partitioned_table(spark, tmp_path)
    with pytest.raises(ValueError, match="not partition columns"):
        read_delta_snapshot(spark, root, partition_filter={"nope": "1"})
    with pytest.raises(ValueError, match="no files match"):
        read_delta_snapshot(
            spark, root, partition_filter={"day": "1999-01-01"}
        )
