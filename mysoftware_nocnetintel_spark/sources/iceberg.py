"""Minimal Apache Iceberg APPEND writer (companion to
``readers.read_iceberg_snapshot``), built on the PUBLIC Iceberg table spec
(iceberg.apache.org/spec/). Honestly scoped and fail-fast:

- format-version 2, UNPARTITIONED, parquet data files, append-only;
- single-writer: the metadata version bump is a plain file write, not a
  compare-and-swap against a catalog — concurrent writers would race
  (the production path is the Iceberg connector + a real catalog);
- refuses to append to tables it didn't create (unknown features could
  be silently dropped).

The COMMIT is driver-side KB-scale metadata (one manifest Avro, one
manifest-list Avro, one metadata.json); the data write itself is a normal
distributed ``df.write.parquet``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from glob import glob

from pyspark.sql import DataFrame

from .avro_lite import write_avro_file

_WRITER_TAG = "mysoftware-nocnetintel-spark-minimal"

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}


def _load_meta(meta_dir: str) -> tuple[dict | None, int]:
    versions = sorted(
        glob(os.path.join(meta_dir, "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )
    if not versions:
        return None, 0
    with open(versions[-1]) as fh:
        meta = json.load(fh)
    v = int(os.path.basename(versions[-1])[1:].split(".")[0])
    return meta, v


def write_iceberg_append(df: DataFrame, path: str) -> int:
    """Append ``df`` to the Iceberg table at ``path`` (creating it on first
    write). Returns the new snapshot id. See module docstring for scope."""
    import pyarrow.parquet as pq

    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(meta_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    meta, ver = _load_meta(meta_dir)
    if meta is not None and meta.get("properties", {}).get("writer") != _WRITER_TAG:
        raise NotImplementedError(
            "refusing to append to an Iceberg table created by another "
            "writer (unknown features could be dropped): use the "
            "iceberg-spark-runtime connector"
        )

    # distributed data write into a staging dir, then move into data/
    stage = os.path.join(path, f"__stage-{uuid.uuid4().hex[:12]}")
    df.write.parquet(stage)
    new_files: list[str] = []
    for f in sorted(glob(os.path.join(stage, "*.parquet"))):
        dest = os.path.join(data_dir, f"{uuid.uuid4().hex[:16]}.parquet")
        shutil.move(f, dest)
        new_files.append(dest)
    shutil.rmtree(stage)
    if not new_files:
        raise ValueError("append produced no data files")

    now_ms = int(time.time() * 1000)
    snap_id = now_ms * 1000 + (ver + 1)  # unique, monotone per table
    seq = (meta.get("last-sequence-number", 0) if meta else 0) + 1

    entries = []
    for f in new_files:
        pmeta = pq.read_metadata(f)  # driver-side footer read, KB-scale
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snap_id,
                "data_file": {
                    "content": 0,
                    "file_path": f,
                    "file_format": "PARQUET",
                    "record_count": pmeta.num_rows,
                    "file_size_in_bytes": os.path.getsize(f),
                },
            }
        )
    manifest = os.path.join(meta_dir, f"m-{snap_id}.avro")
    write_avro_file(manifest, MANIFEST_ENTRY_SCHEMA, entries)

    # append semantics: new manifest-list = all prior manifests + this one
    prior = []
    if meta is not None:
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        from .avro_lite import read_avro_file

        _, prior = read_avro_file(cur["manifest-list"])
    mlist = os.path.join(meta_dir, f"snap-{snap_id}.avro")
    write_avro_file(
        mlist,
        MANIFEST_FILE_SCHEMA,
        [dict(m, sequence_number=m.get("sequence_number", 0)) for m in prior]
        + [
            {
                "manifest_path": manifest,
                "manifest_length": os.path.getsize(manifest),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": seq,
                "added_snapshot_id": snap_id,
            }
        ],
    )

    snapshot = {
        "snapshot-id": snap_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": mlist,
        "summary": {"operation": "append"},
    }
    new_meta = {
        "format-version": 2,
        "table-uuid": (meta or {}).get("table-uuid", str(uuid.uuid4())),
        "location": path,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "properties": {"writer": _WRITER_TAG},
        "snapshots": ((meta or {}).get("snapshots", [])) + [snapshot],
        "current-snapshot-id": snap_id,
    }
    with open(os.path.join(meta_dir, f"v{ver + 1}.metadata.json"), "w") as fh:
        json.dump(new_meta, fh)
    return snap_id


# Delete commits collect (file_path, pos) rows to the driver before writing
# the position-delete parquet; deletes touching more rows than this belong
# to the connector (a real engine writes delete files distributed).
_MAX_DELETE_ROWS = 1_000_000


def write_iceberg_position_deletes(spark, path: str, condition) -> int:
    """Merge-on-read DELETE: commit a v2 POSITION delete file marking every
    currently-live row matching ``condition`` (a Column predicate over the
    table's columns). Returns the new snapshot id.

    The matching rows' (file_path, pos) coordinates come from the hidden
    ``_metadata`` columns of a distributed scan (existing position deletes
    are applied first, so re-deleting already-dead rows is a no-op); the
    delete file itself is KB-scale driver-written parquet, sorted by
    (file_path, pos) as the spec recommends. Same single-writer /
    fail-fast scope as :func:`write_iceberg_append`.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from .readers import (
        _iceberg_snapshot_files,
        _norm_file_path,
        _position_delete_rows,
    )

    meta_dir = os.path.join(path, "metadata")
    meta, ver = _load_meta(meta_dir)
    if meta is None:
        raise FileNotFoundError(f"no Iceberg table at {path}")
    if meta.get("properties", {}).get("writer") != _WRITER_TAG:
        raise NotImplementedError(
            "refusing to modify an Iceberg table created by another writer: "
            "use the iceberg-spark-runtime connector"
        )
    data_files, delete_files, _snap = _iceberg_snapshot_files(path)
    # capture the (file, pos) coordinates WHILE the hidden _metadata columns
    # are still resolvable (they exist only on the file-source relation),
    # then apply any existing deletes before filtering
    data = spark.read.parquet(*data_files).select(
        "*",
        _norm_file_path(F.col("_metadata.file_path")).alias("__fp"),
        F.col("_metadata.row_index").alias("__pos"),
    )
    if delete_files:
        data = data.join(
            _position_delete_rows(spark, delete_files),
            ["__fp", "__pos"],
            "left_anti",
        )
    hits = (
        data.filter(condition)
        .select(F.col("__fp").alias("file_path"), F.col("__pos").alias("pos"))
        .limit(_MAX_DELETE_ROWS + 1)
        .collect()
    )
    if len(hits) > _MAX_DELETE_ROWS:
        raise NotImplementedError(
            f"delete touches more than {_MAX_DELETE_ROWS} rows: use the "
            "iceberg-spark-runtime connector (distributed delete writes)"
        )
    rows = sorted((r.file_path, r.pos) for r in hits)

    del_file = os.path.join(
        os.path.join(path, "data"), f"delete-{uuid.uuid4().hex[:16]}.parquet"
    )
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([r[0] for r in rows], pa.string()),
                "pos": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        del_file,
    )

    now_ms = int(time.time() * 1000)
    snap_id = now_ms * 1000 + (ver + 1)
    seq = meta.get("last-sequence-number", 0) + 1
    manifest = os.path.join(meta_dir, f"m-{snap_id}-deletes.avro")
    write_avro_file(
        manifest,
        MANIFEST_ENTRY_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "content": 1,  # position deletes
                    "file_path": del_file,
                    "file_format": "PARQUET",
                    "record_count": len(rows),
                    "file_size_in_bytes": os.path.getsize(del_file),
                },
            }
        ],
    )

    from .avro_lite import read_avro_file

    cur = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, prior = read_avro_file(cur["manifest-list"])
    mlist = os.path.join(meta_dir, f"snap-{snap_id}.avro")
    write_avro_file(
        mlist,
        MANIFEST_FILE_SCHEMA,
        [dict(m, sequence_number=m.get("sequence_number", 0)) for m in prior]
        + [
            {
                "manifest_path": manifest,
                "manifest_length": os.path.getsize(manifest),
                "partition_spec_id": 0,
                "content": 1,  # delete manifest
                "sequence_number": seq,
                "added_snapshot_id": snap_id,
            }
        ],
    )
    snapshot = {
        "snapshot-id": snap_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": mlist,
        "summary": {"operation": "delete"},
    }
    new_meta = dict(
        meta,
        **{
            "last-sequence-number": seq,
            "last-updated-ms": now_ms,
            "snapshots": meta.get("snapshots", []) + [snapshot],
            "current-snapshot-id": snap_id,
        },
    )
    with open(os.path.join(meta_dir, f"v{ver + 1}.metadata.json"), "w") as fh:
        json.dump(new_meta, fh)
    return snap_id
