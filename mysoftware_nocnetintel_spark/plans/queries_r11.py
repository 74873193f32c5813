"""Round-11 coverage: the Iceberg v3 deletion-vector READ path
(docs/iceberg_v3_scope.md "do" row 1; reference README.md:23-27 S2
lakehouse intake). q159 exercises the whole chain the driver can
value-hash: v2 position deletes → Puffin ``deletion-vector-v1``
conversion (sources/puffin.py) → a format-version-3 snapshot read whose
MOR mask comes from decoded roaring DVs — graded against a DuckDB
oracle recomputing the post-delete state from the source parquet.

At 100 TB: deletion vectors are pure metadata+KB-bitmap MOR — the mask
decodes driver-side from blobs the metadata walk already located and
broadcasts to the scan's anti-join; data files are never rewritten, and
one DV per data file (spec rule) keeps the mask count bounded by the
file count, not the delete count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries_r10 import _scratch_index_path, _t


def q159_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 v3-DELETION-VECTOR read, ORACLE-VERIFIED: land the events
    table as a v2 Iceberg table, MOR-delete one bucket as v2 position
    deletes, rewrite them as Iceberg v3 Puffin deletion vectors
    (``convert_iceberg_position_deletes_to_dvs`` — the spec's upgrade
    discipline: one DV per referenced data file, format-version bumped
    to 3), and aggregate the survivors from a fresh v3 snapshot read.
    The DuckDB twin recomputes the same post-delete state from the
    source parquet, so the Puffin/roaring/manifest DV chain is graded
    by the driver's value-hash — the query-level proof on top of
    tests/test_iceberg_v3_dv.py's differential and codec units."""
    from ..sources.iceberg import (
        write_iceberg_append,
        write_iceberg_position_deletes,
    )
    from ..sources.puffin import convert_iceberg_position_deletes_to_dvs
    from ..sources.readers import read_iceberg_snapshot

    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % F.lit(4)).cast("int").alias("bucket"),
        "event_id",
        "value",
    )
    path = _scratch_index_path("v3_dv", sf_dir)
    write_iceberg_append(ev, path)
    write_iceberg_position_deletes(spark, path, F.col("bucket") == 2)
    convert_iceberg_position_deletes_to_dvs(path)
    return (
        read_iceberg_snapshot(spark, path)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("bucket")
    )


def q160_dv_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 v3 DV WRITE path, ORACLE-VERIFIED (the scope doc's second
    "do" row): land events as v2, convert to a plain v3 table, then
    run TWO successive merge-on-read deletes through
    ``write_iceberg_dv_deletes`` (bucket 2, then bucket 3) — the second
    delete REPLACES the first's deletion vectors where files overlap
    (one DV per data file, positions unioned, the spec's replace
    discipline) — and aggregate the survivors from a fresh snapshot
    read. The DuckDB twin recomputes the post-delete state from the
    source parquet with both buckets excluded, so the replace
    discipline's row-level semantics are value-hash graded, not just
    unit-tested."""
    from ..sources.iceberg import write_iceberg_append
    from ..sources.puffin import (
        convert_iceberg_position_deletes_to_dvs,
        write_iceberg_dv_deletes,
    )
    from ..sources.readers import read_iceberg_snapshot

    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % F.lit(4)).cast("int").alias("bucket"),
        "event_id",
        "value",
    )
    path = _scratch_index_path("v3_dv_write", sf_dir)
    write_iceberg_append(ev, path)
    convert_iceberg_position_deletes_to_dvs(path)  # plain v3 bump
    write_iceberg_dv_deletes(spark, path, F.col("bucket") == 2)
    write_iceberg_dv_deletes(spark, path, F.col("bucket") == 3)
    return (
        read_iceberg_snapshot(spark, path)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("bucket")
    )


R11_QUERIES = {
    "q159_dv_read": q159_dv_read,
    "q160_dv_write": q160_dv_write,
}
