"""Metadata-only partition row counts (round 10): maintenance loops
that size work by partition population (the ANN rebalance threshold)
must read KB of log/Avro, not scan the table. Exactness contract: the
metadata counts either EQUAL the scan-side groupBy or the function
returns None (caller falls back to a scan) — never a silent overcount.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.delta import (
    delete_delta_rows,
    partition_row_counts as delta_counts,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.iceberg import (
    partition_row_counts as iceberg_counts,
    write_iceberg_append,
    write_iceberg_position_deletes,
)
from mysoftware_nocnetintel_spark.sources.readers import (
    read_delta_snapshot,
    read_iceberg_snapshot,
)


def _df(spark, day, lo, hi):
    return spark.createDataFrame(
        [(day, i, f"v{i}") for i in range(lo, hi)],
        "day string, id bigint, val string",
    )


def _scan_counts(spark, root, rdr):
    return {
        r["day"]: int(r["n"])
        for r in rdr(spark, root)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_delta_counts_match_scan_and_subtract_dvs(spark, tmp_path):
    root = str(tmp_path / "d")
    write_delta_append(_df(spark, "d1", 0, 5), root, partition_by=("day",))
    write_delta_append(_df(spark, "d2", 5, 8), root)
    write_delta_append(_df(spark, "d1", 8, 10), root)
    assert delta_counts(root, "day") == _scan_counts(
        spark, root, read_delta_snapshot
    ) == {"d1": 7, "d2": 3}
    # a MOR delete masks rows via a DV — the descriptor's cardinality
    # keeps the metadata count EXACT
    delete_delta_rows(spark, root, "id IN (0, 1, 6)")
    assert delta_counts(root, "day") == _scan_counts(
        spark, root, read_delta_snapshot
    ) == {"d1": 5, "d2": 2}
    with pytest.raises(ValueError, match="not a partition column"):
        delta_counts(root, "id")


def test_delta_counts_none_without_stats(spark, tmp_path):
    """A foreign-written add without stats must push callers to the
    scan path, never guess."""
    import json
    import os

    root = str(tmp_path / "ds")
    write_delta_append(_df(spark, "d1", 0, 3), root, partition_by=("day",))
    log_dir = os.path.join(root, "_delta_log")
    ver = max(
        int(os.path.basename(p).split(".")[0])
        for p in os.listdir(log_dir)
        if p.endswith(".json")
    )
    # strip stats from every add in a replayed copy of the tip commit
    lines = []
    with open(os.path.join(log_dir, f"{ver:020d}.json")) as fh:
        for line in fh:
            if not line.strip():
                continue
            act = json.loads(line)
            if act.get("add"):
                act["add"].pop("stats", None)
            lines.append(json.dumps(act))
    with open(os.path.join(log_dir, f"{ver + 1:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    assert delta_counts(root, "day") is None


def test_iceberg_counts_match_scan_then_fall_back_on_deletes(
    spark, tmp_path
):
    root = str(tmp_path / "i")
    write_iceberg_append(
        _df(spark, "d1", 0, 5), root, partition_by=("day",)
    )
    write_iceberg_append(_df(spark, "d2", 5, 8), root)
    assert iceberg_counts(root, "day") == _scan_counts(
        spark, root, read_iceberg_snapshot
    ) == {"d1": 5, "d2": 3}
    with pytest.raises(ValueError, match="not a partition field"):
        iceberg_counts(root, "id")
    # a live position delete makes manifest counts an overcount: the
    # function must return None (fall back to scan), never be wrong
    write_iceberg_position_deletes(spark, root, F.col("id") == 0)
    assert iceberg_counts(root, "day") is None


def test_rebalance_counts_from_metadata(spark, tmp_path, monkeypatch):
    """The rebalance count pass must come from metadata on an
    engine-written index — the scan fallback is never consulted
    (reader monkeypatched to explode)."""
    from mysoftware_nocnetintel_spark.operators import ann_index as AI
    from mysoftware_nocnetintel_spark.sources import readers as R

    rows = [
        (i, [10.0 + (i % 7) * 1e-3, 10.0] + [0.5] * 6) for i in range(60)
    ] + [
        (100 + j, [float(5 * j) - 20.0, 25.0] + [float(j)] * 6)
        for j in range(12)
    ]
    path = str(tmp_path / "ann")
    AI.build_ivf_index(
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ),
        path,
        n_cells=4,
    )
    meta_counts = AI._metadata_cell_counts(path, "delta")
    assert meta_counts is not None and sum(meta_counts.values()) == 72

    def exploding_reader(*a, **kw):  # pragma: no cover - must not run
        raise AssertionError("rebalance counted via a scan")

    # the count pass imports read_delta_snapshot inside rebalance; the
    # split/rescue stages legitimately read cells, so only the
    # groupBy-count path is guarded: patch, derive counts, unpatch
    monkeypatch.setattr(R, "read_delta_snapshot", exploding_reader)
    try:
        got = AI._metadata_cell_counts(path, "delta")
    finally:
        monkeypatch.undo()
    assert got == meta_counts
    # observability (round-11 verdict task 7): a full rebalance over an
    # engine-written index records ZERO count-scan fallbacks
    before = AI.REBALANCE_STATS["count_scan_fallbacks"]
    AI.rebalance_ivf_index(spark, path, max_rows_per_cell=10_000)
    assert AI.REBALANCE_STATS["count_scan_fallbacks"] == before


def test_rebalance_falls_back_to_scan_after_retraction(spark, tmp_path):
    """The production interplay: a GDPR retraction leaves equality
    deletes live on an Iceberg ANN index, so metadata counts can't be
    exact — _metadata_cell_counts returns None and the rebalance's
    count pass silently takes the scan path with CORRECT post-delete
    populations (the retracted vector is not counted)."""
    from mysoftware_nocnetintel_spark.operators import ann_index as AI
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_equality_deletes,
    )

    rows = [
        (i, [10.0 + (i % 7) * 1e-3, 10.0] + [0.5] * 6) for i in range(40)
    ] + [
        (100 + j, [float(5 * j) - 20.0, 25.0] + [float(j)] * 6)
        for j in range(8)
    ]
    path = str(tmp_path / "ann_i")
    AI.build_ivf_index(
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ),
        path,
        n_cells=4,
        table_format="iceberg",
    )
    assert sum(AI._metadata_cell_counts(path, "iceberg").values()) == 48
    write_iceberg_equality_deletes(
        spark, path, spark.createDataFrame([(0,)], "vec_id bigint")
    )
    assert AI._metadata_cell_counts(path, "iceberg") is None  # fall back
    import warnings as _w

    before = AI.REBALANCE_STATS["count_scan_fallbacks"]
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        report = AI.rebalance_ivf_index(spark, path, max_rows_per_cell=10_000)
    assert report["split"] == {}  # threshold high: counts only
    # the silent degradation is now OBSERVABLE: counter bumped, and the
    # process's first fallback warned with the table path
    assert AI.REBALANCE_STATS["count_scan_fallbacks"] > before
    if before == 0:
        assert any("count scan" in str(w.message) for w in caught)
    from mysoftware_nocnetintel_spark.sources.readers import (
        read_iceberg_snapshot,
    )

    assert read_iceberg_snapshot(spark, path).count() == 47
