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


# ------------------------------------------------------------- z-order


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """The reason z-order exists: lexicographic sort_by=(a,b) gives
    disjoint bounds on `a` only — a predicate on `b` keeps every file.
    The Morton interleave must (1) return identical rows, (2) prune
    files on BOTH columns' predicates, (3) beat lexicographic pruning
    on the second column."""
    import random

    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_append,
    )
    from mysoftware_nocnetintel_spark.sources.readers import (
        _iceberg_snapshot_files,
        _zone_map_prune,
        read_iceberg_snapshot,
    )

    rng = random.Random(11)
    rows = [
        (rng.randint(0, 4095), rng.randint(0, 4095), i)
        for i in range(4096)
    ]
    df = spark.createDataFrame(rows, "a bigint, b bigint, rid bigint")
    lex_root = str(tmp_path / "lex")
    z_root = str(tmp_path / "zed")
    write_iceberg_append(df, lex_root, sort_by=("a", "b"))
    write_iceberg_append(df, z_root, sort_by=("a", "b"), zorder=True)

    # identical content
    got = {
        (r.a, r.b, r.rid)
        for r in read_iceberg_snapshot(spark, z_root).collect()
    }
    assert got == set(rows)

    def survivors(root, col, lo):
        files, _p, _e, _s = _iceberg_snapshot_files(root)
        return len(_zone_map_prune(root, files, (col, ">=", lo))), len(files)

    # predicate on the SECOND column: lexicographic keeps ~everything,
    # z-order must do strictly better (and meaningfully so)
    z_keep, z_total = survivors(z_root, "b", 3600)
    lex_keep, lex_total = survivors(lex_root, "b", 3600)
    assert lex_keep == lex_total  # b is scattered across every lex file
    assert z_keep < lex_keep
    # cell edges are EQUAL-DEPTH quantile boundaries (approxQuantile
    # sketch, merge-order-dependent), so one cell can straddle a curve
    # bit boundary: allow +1 file over the ideal half
    assert z_keep <= z_total // 2 + 1
    # predicate on the FIRST column still prunes under z-order too
    za_keep, _ = survivors(z_root, "a", 3600)
    assert za_keep <= z_total // 2 + 1
    # pruned scan stays correct on both columns
    for col in ("a", "b"):
        got = {
            r.rid
            for r in read_iceberg_snapshot(
                spark, z_root, scan_filter=(col, ">=", 3600)
            ).collect()
        }
        want = {
            rid for a, b, rid in rows if (a if col == "a" else b) >= 3600
        }
        assert got == want


def test_zorder_refusals(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_append,
    )
    from mysoftware_nocnetintel_spark.sources.zorder import zvalue_column

    df = spark.createDataFrame([(1, "x")], "a bigint, s string")
    with pytest.raises(NotImplementedError, match="z-order on column"):
        write_iceberg_append(
            df, str(tmp_path / "zs"), sort_by=("a", "s"), zorder=True
        )
    with pytest.raises(ValueError, match="at least 2"):
        zvalue_column(df, ("a",))
    with pytest.raises(ValueError, match="exceeds a long"):
        zvalue_column(
            spark.createDataFrame(
                [tuple(range(12))], ", ".join(f"c{i} bigint" for i in range(12))
            ),
            tuple(f"c{i}" for i in range(12)),
        )


def test_zorder_recluster_during_compaction(spark, tmp_path):
    import random

    from mysoftware_nocnetintel_spark.sources.iceberg import (
        rewrite_iceberg_table,
        write_iceberg_append,
    )
    from mysoftware_nocnetintel_spark.sources.readers import (
        _iceberg_snapshot_files,
        _zone_map_prune,
        read_iceberg_snapshot,
    )

    rng = random.Random(5)
    root = str(tmp_path / "zc")
    rows = [
        (rng.randint(0, 4095), rng.randint(0, 4095), i)
        for i in range(4096)
    ]
    # two UNclustered appends, then a z-order rewrite
    half = len(rows) // 2
    for chunk in (rows[:half], rows[half:]):
        write_iceberg_append(
            spark.createDataFrame(chunk, "a bigint, b bigint, rid bigint"),
            root,
        )
    # pruning expectations below assume 8 curve cells (files)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    rewrite_iceberg_table(spark, root, sort_by=("a", "b"), zorder=True)
    files, _p, _e, _s = _iceberg_snapshot_files(root)
    for col in ("a", "b"):
        kept = len(_zone_map_prune(root, files, (col, ">=", 3600)))
        # +1: equal-depth cell edges (sketch-derived) may straddle a
        # curve bit boundary — see test_zorder_prunes_on_both_dimensions
        assert kept <= len(files) // 2 + 1, (col, kept, len(files))
    assert {
        (r.a, r.b, r.rid)
        for r in read_iceberg_snapshot(spark, root).collect()
    } == set(rows)
