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
    with pytest.raises(ValueError, match="does not match"):
        write_delta_append(
            spark.createDataFrame([("1", "a")], "id string, val string"), root
        )
    with pytest.raises(ValueError, match="does not match"):
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
    # checkpointed: the minimal writer can't maintain checkpoints
    root2 = str(tmp_path / "dwc")
    write_delta_append(spark.createDataFrame([(1,)], "id bigint"), root2)
    with open(
        os.path.join(root2, "_delta_log", "_last_checkpoint"), "w"
    ) as fh:
        fh.write(json.dumps({"version": 0}))
    with pytest.raises(NotImplementedError, match="checkpointed"):
        write_delta_append(spark.createDataFrame([(2,)], "id bigint"), root2)
