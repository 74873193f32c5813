"""Table paths with URI-hostile characters (space, non-ASCII, '%', '+').

Spark surfaces ``_metadata.file_path`` as a PERCENT-ENCODED URI, while the
driver-side file-coordinate keys (Delta DV descriptors, Iceberg manifest
entries) are plain ``os.path`` strings. Round-5 advisor: normalizing by
stripping only the scheme made every coordinate join silently empty under
such a path — DV-masked rows resurfaced on read, ``delete_delta_rows``
raised KeyError, and the Iceberg sequence-number join emptied the scan.
These tests pin the decode at every seam.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.delta import (
    delete_delta_rows,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.readers import (
    read_delta_snapshot,
    read_iceberg_snapshot,
)

# a space, a non-ASCII char, a literal '%', and a literal '+' — each is a
# distinct failure mode ('%'/'+' catch double-decode and form-encoding bugs)
WEIRD = "my tablé %x +y"


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


def test_delta_dv_mask_survives_weird_path(spark, tmp_path):
    root = str(tmp_path / WEIRD / "t")
    write_delta_append(
        spark.createDataFrame(
            [(i, chr(97 + i % 26)) for i in range(20)],
            "id bigint, val string",
        ).coalesce(2),
        root,
    )
    all_rows = _rows(read_delta_snapshot(spark, root))
    assert len(all_rows) == 20
    delete_delta_rows(spark, root, "id % 3 = 0")  # KeyError pre-fix
    got = _rows(read_delta_snapshot(spark, root))
    assert got == {(i, v) for i, v in all_rows if i % 3 != 0}


def test_delta_cow_rewrite_weird_path(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.delta import (
        update_delta_rows,
    )

    root = str(tmp_path / WEIRD / "cow")
    write_delta_append(
        spark.createDataFrame(
            [(i, "a") for i in range(10)], "id bigint, val string"
        ),
        root,
    )
    delete_delta_rows(spark, root, "id = 7")
    # copy-on-write UPDATE scans through _masked_target: pre-fix the DV
    # coordinates un-matched and row 7 resurfaced into the rewrite
    update_delta_rows(spark, root, "id < 3", {"val": "'z'"})
    got = _rows(read_delta_snapshot(spark, root))
    assert got == {(i, "z" if i < 3 else "a") for i in range(10) if i != 7}


def test_iceberg_position_deletes_weird_path(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_append,
        write_iceberg_position_deletes,
    )

    root = str(tmp_path / WEIRD / "ice")
    write_iceberg_append(
        spark.createDataFrame(
            [(i, chr(97 + i % 26)) for i in range(12)],
            "id bigint, val string",
        ),
        root,
    )
    # pre-fix the seq join (manifest plain path vs encoded scan URI)
    # emptied the whole read under this path
    assert len(_rows(read_iceberg_snapshot(spark, root))) == 12
    write_iceberg_position_deletes(spark, root, F.col("id") % 2 == 0)
    got = _rows(read_iceberg_snapshot(spark, root))
    assert got == {
        (i, chr(97 + i % 26)) for i in range(12) if i % 2 == 1
    }


def test_iceberg_equality_deletes_weird_path(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_append,
        write_iceberg_equality_deletes,
    )

    root = str(tmp_path / WEIRD / "iceq")
    write_iceberg_append(
        spark.createDataFrame(
            [(i, "v") for i in range(8)], "id bigint, val string"
        ),
        root,
    )
    write_iceberg_equality_deletes(
        spark,
        root,
        spark.createDataFrame([(2,), (5,)], "id bigint"),
    )
    got = _rows(read_iceberg_snapshot(spark, root))
    assert got == {(i, "v") for i in range(8) if i not in (2, 5)}
