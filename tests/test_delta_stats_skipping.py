"""Delta per-file statistics (add.stats) + reader data skipping.

The pruning proofs reuse the corrupt-excluded-file pattern: files whose
stats range excludes the predicate are overwritten with garbage — the
pruned read succeeds (zero I/O on them), the unpruned read fails.
"""

from __future__ import annotations

import json
import os
import random
from glob import glob

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.delta import (
    checkpoint_delta_table,
    cleanup_delta_log,
    delete_delta_rows,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _adds(path):
    out = []
    for c in sorted(glob(os.path.join(path, "_delta_log", "[0-9]*.json"))):
        with open(c) as fh:
            for line in fh:
                act = json.loads(line)
                if "add" in act:
                    out.append(act["add"])
    return out


def _corrupt(path, rels):
    for rel in rels:
        with open(os.path.join(path, rel), "wb") as fh:
            fh.write(b"garbage")


def test_append_records_protocol_stats(spark, tmp_path):
    root = str(tmp_path / "stab")
    write_delta_append(
        spark.createDataFrame(
            [(1, 2.5, "x"), (2, float("nan"), "y"), (None, 7.5, "z")],
            "k bigint, v double, s string",
        ).coalesce(1),
        root,
    )
    (add,) = _adds(root)
    st = json.loads(add["stats"])
    assert st["numRecords"] == 3
    assert st["minValues"]["k"] == 1 and st["maxValues"]["k"] == 2
    # NaN-poisoned double stats are withheld (skipping on them would be
    # wrong), string stats are never published (truncation risk)
    assert "v" not in st["minValues"] and "s" not in st["minValues"]
    assert st["nullCount"]["k"] == 1


def test_clustered_write_skips_files(spark, tmp_path):
    root = str(tmp_path / "ctab")
    df = spark.createDataFrame(
        [(i, str(i)) for i in range(1000)], "k bigint, v string"
    )
    write_delta_append(df, root, sort_by=("k",))
    adds = _adds(root)
    assert len(adds) > 1
    # corrupt every file whose range excludes k >= 900
    dead = [
        a["path"]
        for a in adds
        if json.loads(a["stats"])["maxValues"]["k"] < 900
    ]
    assert dead  # clustering produced excludable files
    _corrupt(root, dead)
    got = {
        r.k
        for r in read_delta_snapshot(
            spark, root, scan_filter=("k", ">=", 900)
        ).collect()
    }
    assert got == set(range(900, 1000))
    with pytest.raises(Exception):
        read_delta_snapshot(spark, root).collect()


def test_zorder_skips_on_second_column(spark, tmp_path):
    rng = random.Random(3)
    root = str(tmp_path / "ztab")
    rows = [
        (rng.randint(0, 4095), rng.randint(0, 4095), i) for i in range(4096)
    ]
    write_delta_append(
        spark.createDataFrame(rows, "a bigint, b bigint, rid bigint"),
        root,
        sort_by=("a", "b"),
        zorder=True,
    )
    adds = _adds(root)
    dead = [
        a["path"]
        for a in adds
        if json.loads(a["stats"])["maxValues"]["b"] < 3600
    ]
    assert dead  # z-order clustered the SECOND column too
    _corrupt(root, dead)
    got = {
        r.rid
        for r in read_delta_snapshot(
            spark, root, scan_filter=("b", ">=", 3600)
        ).collect()
    }
    assert got == {rid for _a, b, rid in rows if b >= 3600}


def test_stats_survive_checkpoint_and_cleanup(spark, tmp_path):
    root = str(tmp_path / "cptab")
    for lo in (0, 500):
        write_delta_append(
            spark.createDataFrame(
                [(i,) for i in range(lo, lo + 500)], "k bigint"
            ),
            root,
            sort_by=("k",),
        )
    checkpoint_delta_table(root)
    cleanup_delta_log(root)
    # stats must have ridden through the checkpoint: corrupt low files,
    # high-range read still works
    adds = _adds(root)  # post-cleanup json tail may be empty — use reader
    live = read_delta_snapshot(spark, root, scan_filter=("k", ">=", 950))
    assert {r.k for r in live.collect()} == set(range(950, 1000))
    # prune decision provable: corrupt everything below the cut
    files = glob(os.path.join(root, "part-*.parquet"))
    import pyarrow.parquet as pq

    dead = [
        f
        for f in files
        if pq.read_table(f, columns=["k"])["k"].to_pylist()
        and max(pq.read_table(f, columns=["k"])["k"].to_pylist()) < 950
    ]
    assert dead
    for f in dead:
        with open(f, "wb") as fh:
            fh.write(b"garbage")
    assert {
        r.k
        for r in read_delta_snapshot(
            spark, root, scan_filter=("k", ">=", 950)
        ).collect()
    } == set(range(950, 1000))


def test_all_files_skipped_is_legal_empty(spark, tmp_path):
    root = str(tmp_path / "etab")
    write_delta_append(
        spark.createDataFrame([(1,), (2,)], "k bigint"), root
    )
    out = read_delta_snapshot(spark, root, scan_filter=("k", ">", 100))
    assert out.count() == 0
    assert out.columns == ["k"]


def test_skipping_composes_with_deletion_vectors(spark, tmp_path):
    root = str(tmp_path / "dvtab")
    write_delta_append(
        spark.createDataFrame([(i,) for i in range(100)], "k bigint"),
        root,
        sort_by=("k",),
    )
    delete_delta_rows(spark, root, "k = 95")
    got = {
        r.k
        for r in read_delta_snapshot(
            spark, root, scan_filter=("k", ">=", 90)
        ).collect()
    }
    assert got == set(range(90, 100)) - {95}


def test_skipping_randomized_differential(spark, tmp_path):
    import operator as op_mod

    rng = random.Random(17)
    OPS = {
        "=": op_mod.eq, ">=": op_mod.ge, ">": op_mod.gt,
        "<=": op_mod.le, "<": op_mod.lt,
    }
    root = str(tmp_path / "fz")
    vals = [rng.randint(-500, 500) for _ in range(400)]
    rows = [(v, i) for i, v in enumerate(vals)]
    write_delta_append(
        spark.createDataFrame(rows, "k bigint, rid bigint"),
        root,
        sort_by=("k",),
    )
    for _ in range(10):
        o = rng.choice(list(OPS))
        val = rng.randint(-550, 550)
        got = {
            (r.k, r.rid)
            for r in read_delta_snapshot(
                spark, root, scan_filter=("k", o, val)
            ).collect()
        }
        assert got == {(k, i) for k, i in rows if OPS[o](k, val)}, (o, val)


def test_dv_readd_preserves_stats(spark, tmp_path):
    root = str(tmp_path / "dvk")
    write_delta_append(
        spark.createDataFrame([(i,) for i in range(100)], "k bigint"),
        root,
        sort_by=("k",),
    )
    delete_delta_rows(spark, root, "k = 5")
    # every LIVE add (incl. DV re-adds) still carries stats — the prune
    # proof: corrupt the low-range files, a high-range read still works
    from mysoftware_nocnetintel_spark.sources.delta import _replay_state

    state = _replay_state(os.path.join(root, "_delta_log"))
    assert all(a.get("stats") for a in state["live"].values())
    dead = [
        rel
        for rel, a in state["live"].items()
        if json.loads(a["stats"])["maxValues"]["k"] < 50
    ]
    assert dead
    _corrupt(root, dead)
    got = {
        r.k
        for r in read_delta_snapshot(
            spark, root, scan_filter=("k", ">=", 50)
        ).collect()
    }
    assert got == set(range(50, 100))
