"""Randomized Delta writer-interleaving differential: a random sequence
of APPEND / OVERWRITE / MoR-DELETE commits must keep the table readable
and EXACTLY equal to a plain python model of the same operations — at
the head and at every historical version (time travel replays the same
prefix). This is the Delta counterpart of the Iceberg mixed-delete and
CDC batch-split fuzz suites."""

from __future__ import annotations

import random

import pytest

from mysoftware_nocnetintel_spark.sources.delta import (
    delete_delta_rows,
    write_delta_append,
    write_delta_overwrite,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot


def _read(spark, root, version=None):
    return {
        (r.id, r.grp)
        for r in read_delta_snapshot(spark, root, version=version).collect()
    }


@pytest.mark.parametrize("seed", [11, 87])
def test_random_append_overwrite_delete_interleaving(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"fuzz{seed}")

    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        rows = [(next_id + i, rng.randrange(4)) for i in range(n)]
        next_id += n
        return rows

    def df(rows):
        return spark.createDataFrame(rows, "id bigint, grp bigint")

    model: set = set(fresh_rows(8))
    write_delta_append(df(sorted(model)), root)
    history = [set(model)]  # model state at each committed version

    for _step in range(8):
        op = rng.choice(["append", "overwrite", "delete", "delete"])
        if op == "append":
            rows = fresh_rows(rng.randint(1, 6))
            write_delta_append(df(rows), root)
            model |= set(rows)
        elif op == "overwrite":
            keep_grp = rng.randrange(4)
            new = fresh_rows(rng.randint(1, 4))
            survivors = {r for r in model if r[1] == keep_grp}
            model = survivors | set(new)
            write_delta_overwrite(df(sorted(model)), root)
        else:
            grp = rng.randrange(4)
            victims = {r for r in model if r[1] == grp}
            if not victims or victims == model:
                # empty delete refuses; full delete may empty a file —
                # commit an append instead to keep the walk moving
                rows = fresh_rows(1)
                write_delta_append(df(rows), root)
                model |= set(rows)
                history.append(set(model))
                continue
            delete_delta_rows(spark, root, f"grp = {grp}")
            model -= victims
        history.append(set(model))
        assert _read(spark, root) == model, f"seed={seed} step={_step} {op}"

    # TIME TRAVEL: every historical version equals the model's history
    for v, expect in enumerate(history):
        assert _read(spark, root, version=v) == expect, (
            f"seed={seed} version={v}"
        )
