"""Round-11 verdict task 6: SERVE-DURING-REBALANCE fuzz — a concurrent
reader issues `query_ivf_index` continuously across the sidecar swap /
ghost sweep / GC windows while rebalances run, asserting every result
set is a consistent view of ONE generation (never torn): the exact
planted neighbor is top-1 in every draw, no duplicate ids, and queries
over untouched cells return byte-identical results throughout. Both
formats, maintenance under the fault-injecting committer.

The guard under test: `query_ivf_index` re-reads the sidecar AFTER
building the serving plan and rebuilds on any change — the probes and
the cell file listings can never straddle a swap+GC, and a built plan
cannot tear afterwards because both snapshot readers pin the live file
list at construction while the GC is metadata-only (parquet stays until
vacuum).
"""

from __future__ import annotations

import threading

import pytest

from mysoftware_nocnetintel_spark.operators import ann_index as AI
from mysoftware_nocnetintel_spark.sources.catalog import (
    FaultInjectingCommitter,
    use_committer,
)

DIM = 8


def _corpus_rows():
    rows = []
    for i in range(150):  # tight blob -> the hot cell (all DISTINCT)
        eps = i * 1e-4
        rows.append((i, [10.0 + eps, 10.0 - eps] + [0.5] * (DIM - 2)))
    for i in range(150, 200):  # spread region (stable cells)
        j = i - 150
        rows.append(
            (
                i,
                [float(5 * (j % 8)) - 20.0, float(5 * (j // 8)) + 20.0]
                + [float((j * 3) % 11) - 5.0] * (DIM - 2),
            )
        )
    return rows


@pytest.mark.slow
@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_serving_never_tears_across_rebalance(spark, tmp_path, fmt):
    rows = _corpus_rows()
    by_id = dict(rows)
    path = str(tmp_path / f"ann_{fmt}")
    AI.build_ivf_index(
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ),
        path,
        n_cells=4,
        table_format=fmt,
    )
    hot_id, stable_id = 3, 160
    queries = spark.createDataFrame(
        [(1, by_id[hot_id]), (2, by_id[stable_id])],
        "qid bigint, qv array<double>",
    )

    errors: list[str] = []
    draws = {"n": 0}
    stable_baseline: dict = {}
    done = threading.Event()

    def _reader():
        try:
            while not done.is_set():
                got = AI.query_ivf_index(
                    spark, queries, path, k=3, nprobe=2
                ).collect()
                draws["n"] += 1
                per = {1: [], 2: []}
                for r in got:
                    per[r.qid].append((r.rn, r.vec_id, round(r.score, 9)))
                for qid, rs in per.items():
                    rs.sort()
                    ids = [v for _rn, v, _s in rs]
                    if len(ids) != len(set(ids)):
                        errors.append(f"duplicate ids for qid {qid}: {rs}")
                    if not rs:
                        errors.append(f"qid {qid} returned no rows")
                # the planted EXACT neighbor is top-1 in EVERY draw —
                # a torn old-router/new-data view would drop it
                if per[1] and per[1][0][1] != hot_id:
                    errors.append(f"hot top-1 {per[1][0]} != {hot_id}")
                if per[2] and per[2][0][1] != stable_id:
                    errors.append(f"stable top-1 {per[2][0]} != {stable_id}")
                # untouched cells serve byte-identically throughout
                if per[2]:
                    if not stable_baseline:
                        stable_baseline["rs"] = per[2]
                    elif stable_baseline["rs"] != per[2]:
                        errors.append(
                            f"stable result drifted: {stable_baseline['rs']}"
                            f" -> {per[2]}"
                        )
                if errors:
                    return
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(f"reader raised: {e!r}")

    t = threading.Thread(target=_reader, daemon=True)
    t.start()
    try:
        committer = FaultInjectingCommitter(
            seed=11, max_delay_s=0.08, spurious_conflict_rate=0.1
        )
        with use_committer(committer):
            # repeated rebalances: each splits the (still-)hot cells —
            # multiple append/swap/GC windows for the reader to straddle
            # (the committer latency stretches each window so several
            # serve draws land inside maintenance)
            for _round in range(4):
                AI.rebalance_ivf_index(
                    spark, path, max_rows_per_cell=30, split_factor=2
                )
    finally:
        done.set()
        t.join(timeout=120)
    assert not errors, errors[:5]
    assert draws["n"] >= 3, f"reader only completed {draws['n']} draws"
    # post-maintenance: same invariants hold at rest
    final = AI.query_ivf_index(spark, queries, path, k=3, nprobe=2).collect()
    top = {r.qid: r.vec_id for r in final if r.rn == 1}
    assert top == {1: hot_id, 2: stable_id}


def test_swap_mid_build_rebuilds_then_fails_loudly(spark, tmp_path,
                                                   monkeypatch):
    """The guard's two edges, deterministically: a sidecar that changes
    once mid-build causes a REBUILD against the head (the draw still
    serves, one generation); one that never stops churning fails loudly
    after 5 attempts instead of returning a possibly-torn plan."""
    rows = _corpus_rows()
    path = str(tmp_path / "ann")
    AI.build_ivf_index(
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ),
        path,
        n_cells=4,
    )
    queries = spark.createDataFrame(
        [(1, rows[3][1])], "qid bigint, qv array<double>"
    )
    real = AI.read_ann_params
    calls = {"n": 0}

    def one_swap(p):
        calls["n"] += 1
        out = real(p)
        if calls["n"] == 2:  # the post-build validation of attempt 1
            out = dict(out, retired={"999": [1]})  # a swap happened
        return out

    monkeypatch.setattr(AI, "read_ann_params", one_swap)
    got = AI.query_ivf_index(spark, queries, path, k=1, nprobe=2).collect()
    assert [r.vec_id for r in got] == [3]
    assert calls["n"] == 4  # build+validate, then rebuild+revalidate
    monkeypatch.undo()

    def churning(p):
        calls["n"] += 1
        return dict(real(p), retired={str(calls["n"]): [1]})

    monkeypatch.setattr(AI, "read_ann_params", churning)
    with pytest.raises(RuntimeError, match="swapped generations"):
        AI.query_ivf_index(spark, queries, path, k=1, nprobe=2)
