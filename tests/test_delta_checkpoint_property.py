"""Randomized differential for the Delta reader's checkpoint replay.

Generates random commit histories (adds/removes over a pool of parquet
part files), checkpoints at a random version, and checks
``read_delta_snapshot`` at EVERY still-reachable version against a pure-
Python replay reference — the engine-vs-reference boundary fuzzing pattern
used for pagerank/packing. Covers: checkpoint seeding, JSON-tail replay,
exact-checkpoint-version reads, below-checkpoint time travel, and
single- vs multi-part CLASSIC checkpoints and V2 UUID-named checkpoints
(inline-json and sidecar-parquet variants).
"""

from __future__ import annotations

import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _part_pool(root, n_parts):
    """n_parts parquet files, each with distinct id rows (ids = 100*i…)."""
    paths = []
    for i in range(n_parts):
        name = f"part-{i:04d}.parquet"
        pq.write_table(
            pa.table({"id": [100 * i, 100 * i + 1]}),
            os.path.join(root, name),
        )
        paths.append(name)
    return paths


def _random_history(rng, parts, n_commits):
    """Random add/remove actions; returns (commits, live_after) where
    commits[v] is the action list and live_after[v] the reference live
    set after replaying 0..v."""
    commits, live, live_after = [], set(), []
    for _ in range(n_commits):
        actions = []
        n_act = rng.randint(1, 3)
        for _ in range(n_act):
            if live and rng.random() < 0.4:
                p = rng.choice(sorted(live))
                actions.append({"remove": {"path": p, "dataChange": True}})
                live.discard(p)
            else:
                p = rng.choice(parts)
                actions.append(
                    {"add": {"path": p, "size": 1, "dataChange": True}}
                )
                live.add(p)
        commits.append(actions)
        live_after.append(set(live))
    return commits, live_after


def _expected_ids(root, live):
    out = set()
    for rel in live:
        for row in pq.read_table(os.path.join(root, rel)).to_pylist():
            out.add(row["id"])
    return out


def _write_v2_checkpoint(log_dir, version, live, rng, kind):
    """V2 UUID-named checkpoint: json with inline adds, or parquet whose
    adds live in 1-2 sidecar files (random split)."""
    import uuid

    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    if kind == "v2json":
        top = os.path.join(
            log_dir, f"{version:020d}.checkpoint.{uuid.uuid4().hex}.json"
        )
        with open(top, "w") as fh:
            fh.write(json.dumps({"checkpointMetadata": {"version": version}}) + "\n")
            fh.write(json.dumps({"protocol": proto}) + "\n")
            for p in sorted(live):
                fh.write(json.dumps({"add": {"path": p}}) + "\n")
    else:  # v2pq: sidecar-backed parquet top-level
        os.makedirs(os.path.join(log_dir, "_sidecars"), exist_ok=True)
        add_t = pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
            ]
        )
        live_sorted = sorted(live)
        cut = rng.randint(0, len(live_sorted))
        sidecars = []
        for i, chunk in enumerate([live_sorted[:cut], live_sorted[cut:]]):
            if not chunk and len(sidecars) > 0:
                continue  # at least one sidecar, skip empty second
            name = f"sc-{version}-{i}.parquet"
            pq.write_table(
                pa.table(
                    {
                        "add": pa.array(
                            [
                                {"path": p, "partitionValues": []}
                                for p in chunk
                            ],
                            add_t,
                        )
                    }
                ),
                os.path.join(log_dir, "_sidecars", name),
            )
            sidecars.append(name)
        sidecar_t = pa.struct(
            [("path", pa.string()), ("sizeInBytes", pa.int64())]
        )
        proto_t = pa.struct(
            [
                ("minReaderVersion", pa.int32()),
                ("readerFeatures", pa.list_(pa.string())),
            ]
        )
        table = pa.table(
            {
                "sidecar": pa.array(
                    [{"path": n, "sizeInBytes": 1} for n in sidecars] + [None],
                    sidecar_t,
                ),
                "protocol": pa.array(
                    [None] * len(sidecars)
                    + [
                        {
                            "minReaderVersion": 3,
                            "readerFeatures": ["v2Checkpoint"],
                        }
                    ],
                    proto_t,
                ),
            }
        )
        pq.write_table(
            table,
            os.path.join(
                log_dir,
                f"{version:020d}.checkpoint.{uuid.uuid4().hex}.parquet",
            ),
        )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": version, "size": len(live)}))


def _write_checkpoint(log_dir, version, live, parts_count):
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
        ]
    )
    proto_t = pa.struct([("minReaderVersion", pa.int32())])
    rows_add = [{"path": p, "partitionValues": []} for p in sorted(live)] + [
        None
    ]
    rows_proto = [None] * len(live) + [{"minReaderVersion": 1}]
    table = pa.table(
        {
            "add": pa.array(rows_add, type=add_t),
            "protocol": pa.array(rows_proto, type=proto_t),
        }
    )
    if parts_count:
        n = len(rows_add)
        per = (n + parts_count - 1) // parts_count
        for i in range(parts_count):
            pq.write_table(
                table.slice(i * per, per),
                os.path.join(
                    log_dir,
                    f"{version:020d}.checkpoint."
                    f"{i + 1:010d}.{parts_count:010d}.parquet",
                ),
            )
    else:
        pq.write_table(
            table, os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
        )
    meta = {"version": version, "size": len(rows_add)}
    if parts_count:
        meta["parts"] = parts_count
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps(meta))


@pytest.mark.parametrize(
    "seed,kind",
    [
        (11, "classic"),
        (23, "multipart"),
        (47, "v2json"),
        (59, "v2pq"),
        (71, "v2json"),
        (83, "v2pq"),
    ],
)
def test_checkpointed_history_matches_reference(spark, tmp_path, seed, kind):
    rng = random.Random(seed)
    root = str(tmp_path / f"t{seed}")
    log_dir = os.path.join(root, "_delta_log")
    os.makedirs(log_dir)
    parts = _part_pool(root, 6)
    n_commits = rng.randint(4, 8)
    commits, live_after = _random_history(rng, parts, n_commits)
    # make sure the final state is non-empty (reader raises on empty)
    if not live_after[-1]:
        commits.append([{"add": {"path": parts[0], "size": 1, "dataChange": True}}])
        live_after.append({parts[0]})
        n_commits += 1
    for v, actions in enumerate(commits):
        head = (
            [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}]
            if v == 0
            else []
        )
        with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as fh:
            for a in head + actions:
                fh.write(json.dumps(a) + "\n")

    cp_version = rng.randrange(n_commits)
    if kind in ("classic", "multipart"):
        _write_checkpoint(
            log_dir,
            cp_version,
            live_after[cp_version],
            parts_count=2 if kind == "multipart" else 0,
        )
    else:
        _write_v2_checkpoint(
            log_dir, cp_version, live_after[cp_version], rng, kind
        )
    # optionally vacuum the JSON prefix at or below the checkpoint
    vacuumed = rng.random() < 0.5
    if vacuumed:
        for v in range(cp_version + 1):
            os.remove(os.path.join(log_dir, f"{v:020d}.json"))

    for v in range(n_commits):
        want = live_after[v]
        if v < cp_version and vacuumed:
            with pytest.raises((NotImplementedError, ValueError)):
                read_delta_snapshot(spark, root, version=v)
            continue
        if not want:
            with pytest.raises(ValueError, match="no files"):
                read_delta_snapshot(spark, root, version=v)
            continue
        got = {
            r.id for r in read_delta_snapshot(spark, root, version=v).collect()
        }
        assert got == _expected_ids(root, want), (
            f"seed={seed} version={v} cp={cp_version} vacuumed={vacuumed}"
        )
    # latest (no version pin) == last commit state
    got = {r.id for r in read_delta_snapshot(spark, root).collect()}
    assert got == _expected_ids(root, live_after[-1])
