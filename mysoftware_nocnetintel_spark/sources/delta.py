"""Minimal Delta Lake APPEND writer (companion to
``readers.read_delta_snapshot``), built on the PUBLIC Delta transaction-log
protocol (delta.io PROTOCOL.md). Honestly scoped and fail-fast, mirroring
the Iceberg writer's posture:

- append-only, UNPARTITIONED, parquet data files, protocol (1, 2);
- single-writer: the commit is a plain ``<version>.json`` write, not the
  spec's atomic put-if-absent against a log store — concurrent writers
  would race (the production path is the delta-spark connector);
- refuses to append to tables it didn't create (unknown protocol/features
  could be silently violated) and to tables whose schema doesn't match.

The COMMIT is driver-side KB-scale JSON; the data write itself is a
normal distributed ``df.write.parquet``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from glob import glob

from pyspark.sql import DataFrame

_WRITER_TAG = "mysoftware-nocnetintel-spark-minimal"


def _log_versions(log_dir: str) -> list[int]:
    return sorted(
        int(os.path.basename(p).split(".")[0])
        for p in glob(os.path.join(log_dir, "[0-9]*.json"))
    )


def _table_meta(log_dir: str, versions: list[int]) -> dict | None:
    """Latest metaData action in the JSON log (our tables never have
    checkpoints, so the log is complete)."""
    meta = None
    for v in versions:
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                act = json.loads(line)
                if "metaData" in act:
                    meta = act["metaData"]
    return meta


def _schema_sig(schema_json: str) -> list[tuple[str, object]]:
    s = json.loads(schema_json)
    return sorted((f["name"], json.dumps(f["type"])) for f in s["fields"])


def write_delta_append(df: DataFrame, path: str) -> int:
    """Append ``df`` to the Delta table at ``path`` (creating it on first
    write). Returns the committed version. See module docstring for scope.
    """
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    versions = _log_versions(log_dir)
    if glob(os.path.join(log_dir, "_last_checkpoint")):
        raise NotImplementedError(
            "refusing to append to a checkpointed Delta table (the minimal "
            "writer cannot maintain checkpoints): use the delta-spark "
            "connector"
        )
    schema_json = df.schema.json()
    if versions:
        meta = _table_meta(log_dir, versions)
        if not meta or (meta.get("configuration") or {}).get(
            "writer"
        ) != _WRITER_TAG:
            raise NotImplementedError(
                "refusing to append to a Delta table created by another "
                "writer (unknown protocol features could be violated): use "
                "the delta-spark connector"
            )
        if _schema_sig(meta["schemaString"]) != _schema_sig(schema_json):
            raise ValueError(
                f"append schema {_schema_sig(schema_json)} does not match "
                f"the table schema {_schema_sig(meta['schemaString'])}"
            )
    version = (versions[-1] + 1) if versions else 0

    # distributed data write into a staging dir, then move into the root
    stage = os.path.join(path, f"__stage-{uuid.uuid4().hex[:12]}")
    df.write.parquet(stage)
    new_files: list[str] = []
    for f in sorted(glob(os.path.join(stage, "*.parquet"))):
        name = f"part-{uuid.uuid4().hex[:16]}.parquet"
        shutil.move(f, os.path.join(path, name))
        new_files.append(name)
    shutil.rmtree(stage)
    if not new_files:
        raise ValueError("append produced no data files")

    now_ms = int(time.time() * 1000)
    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": [],
                    "configuration": {"writer": _WRITER_TAG},
                    "createdTime": now_ms,
                }
            }
        )
    for name in new_files:
        actions.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(path, name)),
                    "modificationTime": now_ms,
                    "dataChange": True,
                }
            }
        )
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return version
