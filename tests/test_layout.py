"""Data-layout tests: clustered (sorted-within-file) parquet gives parquet
row groups tight, near-disjoint min/max statistics on the sort keys — the
mechanism that lets a point/range predicate skip whole row groups at scan
time (ROADMAP 7; the clustering-index analogue at 100 TB)."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources import load_table
from mysoftware_nocnetintel_spark.sources.sinks import write_clustered


def _rowgroup_cover(path: str, col: str, target) -> tuple[int, int]:
    """(#row groups whose [min,max] could contain target, total #row groups)
    across all parquet part files under path."""
    import glob
    import os

    cover = total = 0
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        idx = names.index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= target <= st.max):
                cover += 1
    return cover, total


def test_clustered_write_prunes_row_groups(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    sorted_path = str(tmp_path / "sorted")
    unsorted_path = str(tmp_path / "unsorted")
    # small row groups so a single file holds several
    opts = {"parquet.block.size": str(8 * 1024), "parquet.enable.dictionary": "false"}
    write_clustered(
        ev.coalesce(1), sorted_path, [], ["user_id", "event_id"], options=opts
    )
    w = ev.coalesce(1).write.mode("overwrite")
    for k, v in opts.items():
        w = w.option(k, v)
    w.parquet(unsorted_path)

    target = 3  # a mid-range user_id
    s_cover, s_total = _rowgroup_cover(sorted_path, "user_id", target)
    u_cover, u_total = _rowgroup_cover(unsorted_path, "user_id", target)
    assert s_total >= 3, f"expected multiple row groups, got {s_total}"
    # sorted layout: the target user occupies a contiguous range -> few groups
    assert s_cover <= max(2, s_total // 3), (s_cover, s_total)
    # unsorted layout: every group straddles the full id range
    assert u_cover == u_total, (u_cover, u_total)
    # round-trip intact
    got = spark.read.parquet(sorted_path).count()
    assert got == ev.count()


def test_zorder_layout_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order on (user_id, value-bucket): point predicates on EITHER
    dimension must skip row groups (each covers ~a quadrant of the curve),
    where a single-column sort only helps its own column."""
    from mysoftware_nocnetintel_spark.sources.sinks import write_zordered

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            (F.col("value") / 4).cast("int").alias("vbucket"),
            "value",
        )
    )
    zpath = str(tmp_path / "zorder")
    opts = {"parquet.block.size": str(2 * 1024), "parquet.enable.dictionary": "false"}
    write_zordered(ev.coalesce(1), zpath, "user_id", "vbucket", options=opts)

    uid_cover, total = _rowgroup_cover(zpath, "user_id", 3)
    vb_cover, total2 = _rowgroup_cover(zpath, "vbucket", 40)
    assert total >= 8
    # the higher-significance dimension (col_b, odd bit positions) prunes
    # hard; the minor one still prunes (both would cover EVERY group in a
    # random layout)
    assert vb_cover <= total2 // 3, (vb_cover, total2)
    assert uid_cover < total, (uid_cover, total)
    assert spark.read.parquet(zpath).count() == ev.count()
