"""SemDeDup (operators/similarity.semdedup) semantics and differentials.

The greedy contract under test: within a cluster, scanning ids ascending,
a row is dropped iff some ALREADY-KEPT row of the same cluster has cosine
>= tau with it, and dup_of names the FIRST such kept row. Blocking
(max_cell_rows) is a memory knob and must not change results.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators.similarity import semdedup


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )


def test_planted_duplicates_keep_lowest_id(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(5, 16)
    vecs = []
    # ids 0-4: distinct base vectors; 5-9: near-copies of base[0..4];
    # 10: exact copy of base[2]
    vecs.extend(base)
    vecs.extend(base + rng.randn(5, 16) * 1e-3)
    vecs.append(base[2])
    out = {
        r.vec_id: r
        for r in semdedup(
            _df(spark, vecs), n_cells=1, tau=0.99
        ).collect()
    }
    for i in range(5):
        assert out[i].keep and out[i].dup_of is None
    for i in range(5, 10):
        assert not out[i].keep and out[i].dup_of == i - 5
    assert not out[10].keep and out[10].dup_of == 2


def test_singletons_all_kept(spark):
    rng = np.random.RandomState(11)
    # orthogonal-ish random vectors: nothing near tau
    out = semdedup(_df(spark, rng.randn(40, 32)), n_cells=4, tau=0.9).collect()
    assert len(out) == 40 and all(r.keep for r in out)
    assert all(r.dup_of is None for r in out)


@pytest.mark.parametrize("seed", [3, 19])
def test_brute_force_differential(spark, seed):
    """The distributed per-cell greedy must equal a plain-Python greedy
    over the SAME cell assignment (collected once), including dup_of
    attribution and tie behavior at moderate tau."""
    rng = np.random.RandomState(seed)
    n = 120
    X = rng.randn(n, 8)  # low dim → plenty of moderate-cosine pairs
    got = {
        r.vec_id: r
        for r in semdedup(_df(spark, X), n_cells=3, tau=0.6).collect()
    }
    assert len(got) == n
    # reference greedy per cell, ascending id — through the same float32
    # storage cast the array<float> column applies, so boundary cosines
    # can't disagree between reference and operator
    X32 = X.astype(np.float32).astype(np.float64)
    Xn = X32 / np.linalg.norm(X32, axis=1, keepdims=True)
    by_cell: dict[int, list[int]] = {}
    for i in range(n):
        by_cell.setdefault(got[i].cell, []).append(i)
    for cell, ids in by_cell.items():
        kept: list[int] = []
        for i in sorted(ids):
            hit = next(
                (j for j in kept if float(Xn[j] @ Xn[i]) >= 0.6), None
            )
            if hit is None:
                kept.append(i)
                assert got[i].keep and got[i].dup_of is None, i
            else:
                assert not got[i].keep and got[i].dup_of == hit, i


def test_blocking_is_semantics_free(spark):
    rng = np.random.RandomState(23)
    X = rng.randn(60, 8)
    a = sorted(
        map(tuple, semdedup(_df(spark, X), n_cells=2, tau=0.6).collect())
    )
    b = sorted(
        map(
            tuple,
            semdedup(
                _df(spark, X), n_cells=2, tau=0.6, max_cell_rows=7
            ).collect(),
        )
    )
    assert a == b


def test_zero_vector_never_matches(spark):
    vecs = [[1.0, 0.0], [0.0, 0.0], [0.0, 0.0]]
    out = {
        r.vec_id: r
        for r in semdedup(_df(spark, vecs), n_cells=1, tau=0.5).collect()
    }
    # zero vectors have cosine 0 with everything (normalized by 1), so both
    # zero rows are kept — they are not "duplicates" of anything
    assert out[1].keep and out[2].keep


def test_runaway_cell_refused(spark):
    """A pathologically skewed embedding space (everything in one cell)
    must fail fast with the grow-n_cells remedy, not OOM the one Python
    worker that receives the whole group: blocking bounds the similarity
    matrix, cell_cap bounds the GROUP."""
    import pytest

    from mysoftware_nocnetintel_spark.operators.similarity import semdedup

    rows = [(i, [1.0, 0.0, 0.0, float(i % 7)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="cell_cap"):
        semdedup(
            df, n_cells=1, tau=0.99, cell_cap=10
        ).collect()
    # under the cap the same corpus dedups normally
    out = semdedup(df, n_cells=1, tau=0.99, cell_cap=100).collect()
    assert len(out) == 40
    assert any(r.keep for r in out) and any(not r.keep for r in out)
