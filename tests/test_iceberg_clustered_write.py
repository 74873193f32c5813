"""Clustered (sorted) Iceberg appends: sort_by range-partitions + sorts
the write so per-file zone-map bounds are near-disjoint and scan_filter
prunes most files — the post-partitioning scan-cost lever. Zero-I/O
proof by corrupting every file outside the probed key slice."""

from __future__ import annotations

import random

import pytest

from mysoftware_nocnetintel_spark.sources.iceberg import write_iceberg_append
from mysoftware_nocnetintel_spark.sources.readers import (
    _iceberg_snapshot_files,
    read_iceberg_snapshot,
)


def test_clustered_write_prunes_most_files(spark, tmp_path):
    root = str(tmp_path / "cl1")
    rng = random.Random(5)
    rows = [(i, float(rng.randrange(1000))) for i in rng.sample(range(1000), 1000)]
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    write_iceberg_append(
        spark.createDataFrame(rows, "id bigint, v double"),
        root,
        sort_by=("id",),
    )
    data_files, _p, _e, _s = _iceberg_snapshot_files(root)
    assert len(data_files) >= 4
    # near-disjoint id ranges: intervals must not overlap
    spans = sorted((e.lower["1"], e.upper["1"]) for e in data_files)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, spans
    # a narrow probe touches ONE file: corrupt every other file and the
    # pruned scan still answers
    probe_lo, probe_hi = spans[0]
    keep = next(
        e.path for e in data_files if e.lower["1"] == probe_lo
    )
    for e in data_files:
        if e.path != keep:
            with open(e.path, "wb") as fh:
                fh.write(b"GARBAGE")
    got = read_iceberg_snapshot(
        spark, root, scan_filter=("id", "<=", probe_hi)
    )
    assert {r.id for r in got.collect()} == set(range(probe_lo, probe_hi + 1))


def test_unsorted_append_gives_full_range_files(spark, tmp_path):
    """The contrast case the docstring claims: without sort_by, every
    file spans ~the whole key range, so nothing can prune."""
    root = str(tmp_path / "cl2")
    rng = random.Random(7)
    rows = [(i, 0.0) for i in rng.sample(range(1000), 1000)]
    write_iceberg_append(
        spark.createDataFrame(rows, "id bigint, v double").repartition(6),
        root,
    )
    data_files, _p, _e, _s = _iceberg_snapshot_files(root)
    assert len(data_files) >= 4
    spans = [(e.lower["1"], e.upper["1"]) for e in data_files]
    # every file covers the bulk of the range
    assert all(hi - lo > 700 for lo, hi in spans), spans


def test_compaction_reclusters(spark, tmp_path):
    """The production lifecycle: unsorted (even avro) fast-appends, then
    a CLUSTERING compactor — rewrite(sort_by) must leave near-disjoint
    parquet bounds where the appends had none."""
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        rewrite_iceberg_table,
    )

    root = str(tmp_path / "cl4")
    rng = random.Random(11)
    ids = rng.sample(range(600), 600)
    for k in range(3):
        write_iceberg_append(
            spark.createDataFrame(
                [(i, float(i)) for i in ids[k * 200 : (k + 1) * 200]],
                "id bigint, v double",
            ).coalesce(1),
            root,
            file_format="avro" if k == 2 else "parquet",
        )
    spark.conf.set("spark.sql.shuffle.partitions", "6")
    rewrite_iceberg_table(spark, root, sort_by=("id",))
    data_files, _p, _e, _s = _iceberg_snapshot_files(root)
    assert len(data_files) >= 4
    assert all(e.fmt == "PARQUET" for e in data_files)
    spans = sorted((e.lower["1"], e.upper["1"]) for e in data_files)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, spans
    got = read_iceberg_snapshot(spark, root, scan_filter=("id", "<", 50))
    assert {r.id for r in got.collect()} == set(range(50))


def test_sort_by_fail_fasts(spark, tmp_path):
    root = str(tmp_path / "cl3")
    with pytest.raises(ValueError, match="sort_by columns"):
        write_iceberg_append(
            spark.createDataFrame([(1,)], "id bigint"), root,
            sort_by=("nope",),
        )
    with pytest.raises(NotImplementedError, match="no bounds"):
        write_iceberg_append(
            spark.createDataFrame([(1,)], "id bigint"), root,
            file_format="avro", sort_by=("id",),
        )
