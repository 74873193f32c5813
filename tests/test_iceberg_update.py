"""update_iceberg_rows: merge-on-read UPDATE by predicate — one row-delta
snapshot (position-delete file + updated-image data files). Differential
vs Delta's update_delta_rows (both strategies) on the same inputs."""

from __future__ import annotations

import json
from glob import glob

import pytest

from mysoftware_nocnetintel_spark.sources.iceberg import (
    rewrite_iceberg_table,
    update_iceberg_rows,
    write_iceberg_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


def _n_snaps(path):
    with open(sorted(glob(f"{path}/metadata/v*.metadata.json"))[-1]) as f:
        return len(json.load(f)["snapshots"])


def test_update_is_one_snapshot_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(
        _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), path
    )
    n = _n_snaps(path)
    update_iceberg_rows(
        spark, path, "id >= 2", {"val": "concat(val, '!')"}
    )
    assert _n_snaps(path) == n + 1
    assert _rows(read_iceberg_snapshot(spark, path)) == {
        (1, "a"), (2, "b!"), (3, "c!"),
    }
    with open(
        sorted(glob(f"{path}/metadata/v*.metadata.json"))[-1]
    ) as f:
        meta = json.load(f)
    prev = meta["snapshots"][-1]["parent-snapshot-id"]
    assert _rows(read_iceberg_snapshot(spark, path, snapshot_id=prev)) == {
        (1, "a"), (2, "b"), (3, "c"),
    }


def test_update_twice_and_compaction(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a"), (2, "b")]), path)
    update_iceberg_rows(spark, path, "id = 2", {"val": "'B'"})
    update_iceberg_rows(spark, path, "id = 2", {"val": "'BB'"})
    assert _rows(read_iceberg_snapshot(spark, path)) == {
        (1, "a"), (2, "BB"),
    }
    rewrite_iceberg_table(spark, path)  # folds the delete files away
    assert _rows(read_iceberg_snapshot(spark, path)) == {
        (1, "a"), (2, "BB"),
    }


def test_update_partitioned_moves_partitions(spark, tmp_path):
    path = str(tmp_path / "p")
    write_iceberg_append(
        _mk(spark, [(1, "x"), (2, "y")]), path, partition_by=("val",)
    )
    update_iceberg_rows(spark, path, "id = 1", {"val": "'z'"})
    assert _rows(read_iceberg_snapshot(spark, path)) == {(1, "z"), (2, "y")}
    assert _rows(
        read_iceberg_snapshot(spark, path, partition_filter={"val": "z"})
    ) == {(1, "z")}


def test_update_no_match_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    with pytest.raises(ValueError, match="matched no rows"):
        update_iceberg_rows(spark, path, "id = 99", {"val": "'x'"})


@pytest.mark.parametrize("seed", [9])
def test_update_differential_vs_delta(spark, tmp_path, seed):
    """Same random updates on Delta (CoW and MoR) and Iceberg — all three
    engines' states must agree after every statement."""
    import random

    from mysoftware_nocnetintel_spark.sources.delta import (
        update_delta_rows,
        write_delta_append,
    )
    from mysoftware_nocnetintel_spark.sources.readers import (
        read_delta_snapshot,
    )

    rng = random.Random(seed)
    rows = [(i, f"v{i % 4}") for i in range(25)]
    ice = str(tmp_path / "ice")
    dc = str(tmp_path / "dc")
    dm = str(tmp_path / "dm")
    write_iceberg_append(_mk(spark, rows), ice)
    write_delta_append(_mk(spark, rows), dc)
    write_delta_append(_mk(spark, rows), dm)
    for step in range(4):
        pivot = rng.randrange(0, 25)
        pred = f"id % 4 = {rng.randrange(4)} and id >= {pivot}"
        exprs = {"val": f"concat(val, '.{step}')"}
        try:
            update_iceberg_rows(spark, ice, pred, exprs)
        except ValueError:
            continue  # no match — Delta would raise identically
        update_delta_rows(spark, dc, pred, exprs, strategy="cow")
        update_delta_rows(spark, dm, pred, exprs, strategy="mor")
        i = _rows(read_iceberg_snapshot(spark, ice))
        c = {(r.id, r.val) for r in read_delta_snapshot(spark, dc).collect()}
        m = {(r.id, r.val) for r in read_delta_snapshot(spark, dm).collect()}
        assert i == c == m, f"seed={seed} step={step}"
