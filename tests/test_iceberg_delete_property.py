"""Randomized differential for Iceberg v2 position-delete round-trips.

Random interleavings of appends and predicate deletes against the minimal
writer, checked after every commit against a plain-Python reference table
(id -> val). Covers: delete-on-delete stacking (existing deletes applied
before computing new coordinates), appends after deletes, empty-result
deletes, and time travel to every prior snapshot at the end.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.sources.iceberg import (
    write_iceberg_append,
    write_iceberg_position_deletes,
)
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


@pytest.mark.parametrize("seed", [5, 17])
def test_random_append_delete_interleavings(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"t{seed}")
    ref: dict[int, str] = {}
    next_id = 0
    snapshots: list[tuple[int, set]] = []

    # first commit must be an append (table creation)
    ops = ["append"] + [
        "delete" if rng.random() < 0.4 else "append" for _ in range(5)
    ]
    for op in ops:
        if op == "append":
            n = rng.randint(1, 4)
            batch = [(next_id + i, chr(97 + (next_id + i) % 26)) for i in range(n)]
            next_id += n
            sid = write_iceberg_append(
                spark.createDataFrame(batch, "id bigint, val string"), root
            )
            ref.update(dict(batch))
        else:
            # random modulus predicate; may match zero live rows
            m = rng.choice([2, 3, 5])
            r = rng.randrange(m)
            sid = write_iceberg_position_deletes(
                spark, root, F.col("id") % m == r
            )
            ref = {k: v for k, v in ref.items() if k % m != r}
        snapshots.append((sid, set(ref.items())))
        if ref:
            assert _rows(read_iceberg_snapshot(spark, root)) == set(
                ref.items()
            ), f"seed={seed} after {op} (snapshot {sid})"

    # time travel: every recorded snapshot replays to its reference state
    for sid, want in snapshots:
        if not want:
            continue  # reader raises on empty snapshots by contract
        got = _rows(read_iceberg_snapshot(spark, root, snapshot_id=sid))
        assert got == want, f"seed={seed} snapshot {sid}"
