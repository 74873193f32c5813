"""Writer-maintained classic Delta checkpoints (delta.io PROTOCOL.md
"Checkpoints"): ``checkpoint_delta_table`` compacts the full log state
into one parquet file, ``cleanup_delta_log`` drops the JSON prefix, and
every writer entry point (append, txn-idempotent append, overwrite,
DV delete, vacuum, history) keeps working against checkpoint-seeded
state. This is what keeps log replay O(tail) instead of O(history) on a
long-lived table."""

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources.delta import (
    checkpoint_delta_table,
    cleanup_delta_log,
    delete_delta_rows,
    delta_history,
    latest_txn_version,
    vacuum_delta,
    write_delta_append,
    write_delta_overwrite,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _rows(spark, root, **kw):
    return sorted(
        (r.id, r.val) for r in read_delta_snapshot(spark, root, **kw).collect()
    )


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "id bigint, val string")


def test_checkpoint_roundtrip_and_log_cleanup(spark, tmp_path):
    root = str(tmp_path / "cp1")
    write_delta_append(_df(spark, [(1, "a"), (2, "b")]), root)
    write_delta_append(_df(spark, [(3, "c")]), root, txn=("appX", 7))
    write_delta_overwrite(_df(spark, [(4, "d"), (5, "e"), (6, "f")]), root)
    delete_delta_rows(spark, root, "id = 5")
    before = _rows(spark, root)
    assert before == [(4, "d"), (6, "f")]

    v = checkpoint_delta_table(root)
    assert v == 3
    lc = json.load(open(os.path.join(root, "_delta_log", "_last_checkpoint")))
    assert lc["version"] == 3
    # same snapshot through the checkpoint-seeded read
    assert _rows(spark, root) == before

    # txn state survives INTO the checkpoint (spec requirement)
    removed = cleanup_delta_log(root)
    assert removed == [0, 1, 2, 3]
    assert latest_txn_version(root, "appX") == 7
    assert _rows(spark, root) == before

    # every writer keeps working on the cleaned, checkpointed table
    assert write_delta_append(_df(spark, [(7, "g")]), root) == 4
    assert _rows(spark, root) == [(4, "d"), (6, "f"), (7, "g")]
    # idempotent replay check still skips (txn read from checkpoint)
    assert write_delta_append(_df(spark, [(99, "z")]), root, txn=("appX", 7)) == 4
    delete_delta_rows(spark, root, "id = 4")
    assert _rows(spark, root) == [(6, "f"), (7, "g")]
    assert write_delta_overwrite(_df(spark, [(8, "h")]), root) == 6
    assert _rows(spark, root) == [(8, "h")]

    # a second checkpoint on an already-checkpointed table
    assert checkpoint_delta_table(root) == 6
    cleanup_delta_log(root)
    assert _rows(spark, root) == [(8, "h")]

    # history: synthetic row for the truncated prefix, then the tail
    h = delta_history(spark, root).collect()
    assert h[0].operation.startswith("CHECKPOINT")
    assert h[0].version == 6

    # time travel below the cleaned checkpoint fails fast
    with pytest.raises(NotImplementedError, match="below the last checkpoint"):
        read_delta_snapshot(spark, root, version=1)


def test_checkpoint_preserves_dv_and_tombstones_for_vacuum(spark, tmp_path):
    """DV descriptors ride through the checkpoint (deleted rows stay
    masked) and remove tombstones ride through too (vacuum still finds
    ages for pre-checkpoint tombstones after the JSON log is gone)."""
    root = str(tmp_path / "cp2")
    write_delta_append(_df(spark, [(i, f"v{i}") for i in range(10)]), root)
    write_delta_overwrite(
        _df(spark, [(i, f"w{i}") for i in range(10)]), root
    )
    delete_delta_rows(spark, root, "id >= 7")
    expect = [(i, f"w{i}") for i in range(7)]
    assert _rows(spark, root) == expect

    checkpoint_delta_table(root)
    cleanup_delta_log(root)
    assert _rows(spark, root) == expect

    # old overwritten files were tombstoned pre-checkpoint; their
    # deletionTimestamp must survive so an aged vacuum can collect them
    deleted = vacuum_delta(root, retention_ms=0, now_ms=2**62)
    assert deleted, "vacuum found nothing despite tombstones in checkpoint"
    # live data is untouched
    assert _rows(spark, root) == expect
    # further deletes merge with the checkpointed DV
    delete_delta_rows(spark, root, "id = 0")
    assert _rows(spark, root) == expect[1:]


def test_checkpoint_partitioned_table(spark, tmp_path):
    root = str(tmp_path / "cp3")
    df = spark.createDataFrame(
        [(1, "x", "2024-01-01"), (2, "y", "2024-01-02"), (3, "z", "2024-01-01")],
        "id bigint, val string, day string",
    )
    write_delta_append(df, root, partition_by=("day",))
    checkpoint_delta_table(root)
    cleanup_delta_log(root)
    got = read_delta_snapshot(
        spark, root, partition_filter={"day": "2024-01-01"}
    )
    assert sorted((r.id, r.day) for r in got.collect()) == [
        (1, "2024-01-01"),
        (3, "2024-01-01"),
    ]
    # appends inherit partitionColumns from the checkpointed metaData
    write_delta_append(
        spark.createDataFrame(
            [(4, "q", "2024-01-01")], "id bigint, val string, day string"
        ),
        root,
    )
    got2 = read_delta_snapshot(
        spark, root, partition_filter={"day": "2024-01-01"}
    )
    assert sorted(r.id for r in got2.collect()) == [1, 3, 4]


def test_checkpoint_refuses_foreign_table(spark, tmp_path):
    root = str(tmp_path / "cpf")
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
        checkpoint_delta_table(root)
    with pytest.raises(ValueError, match="no checkpoint"):
        cleanup_delta_log(root)
