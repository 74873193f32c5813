"""Operational inspection surfaces: delta_history (DESCRIBE HISTORY) and
iceberg_snapshots (the connector's snapshots metadata table). Driver-side
KB-scale metadata walks returning bounded DataFrames."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.delta import (
    delete_delta_rows,
    delta_history,
    write_delta_append,
    write_delta_overwrite,
)
from mysoftware_nocnetintel_spark.sources.iceberg import (
    iceberg_snapshots,
    rewrite_iceberg_table,
    write_iceberg_append,
    write_iceberg_equality_deletes,
)


def _b(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "id bigint").coalesce(1)


def test_delta_history(spark, tmp_path):
    root = str(tmp_path / "dh")
    write_delta_append(_b(spark, 1, 2), root)
    write_delta_append(_b(spark, 3), root, txn=("appX", 7))
    write_delta_overwrite(_b(spark, 9), root)
    delete_delta_rows(spark, root, "id = 9")
    h = {r.version: r for r in delta_history(spark, root).collect()}
    assert sorted(h) == [0, 1, 2, 3]
    assert h[0].operation == "CREATE TABLE AS APPEND"
    assert h[1].operation == "APPEND"
    assert (h[1].txn_app_id, h[1].txn_version) == ("appX", 7)
    assert h[2].operation == "OVERWRITE"
    assert h[2].n_removed_files >= 2  # tombstones for both prior adds
    assert "DELETE" in h[3].operation
    assert h[0].txn_app_id is None


def test_iceberg_snapshots(spark, tmp_path):
    root = str(tmp_path / "is")
    write_iceberg_append(_b(spark, 1, 2), root)
    write_iceberg_append(_b(spark, 3), root, file_format="avro")
    write_iceberg_equality_deletes(spark, root, _b(spark, 2))
    rewrite_iceberg_table(spark, root)
    snaps = iceberg_snapshots(spark, root).orderBy("sequence_number").collect()
    assert [s.operation for s in snaps] == [
        "append", "append", "delete", "replace",
    ]
    assert [s.n_data_files for s in snaps] == [1, 2, 2, snaps[3].n_data_files]
    assert snaps[1].n_records == 3
    assert snaps[2].n_delete_files == 1
    # REPLACE folds deletes away and re-counts live records
    assert snaps[3].n_delete_files == 0
    assert snaps[3].n_records == 2  # ids {1, 3}
    assert [s.is_current for s in snaps] == [False, False, False, True]
    # sequence numbers strictly increase
    seqs = [s.sequence_number for s in snaps]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
