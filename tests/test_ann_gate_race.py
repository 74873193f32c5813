"""Round-10 verdict task 6: REBALANCE racing a streaming-gate appender.

The rebalance verb was proved loss-free against raw appends injected at
chosen windows; the sharper production race is an exactly-once ingestion
gate appending through its TXN-ID path (app high-water-mark skips) while
a rebalance runs — the skip machinery, the ghost sweep, the pinned
rescue/GC, and the CAS retry paths all interleave for real here. Two OS
threads under the fault-injecting committer (remote-catalog latency +
spurious rejections), both table formats.

Guarantees proved after the race:
- corpus ids == index ids: every vector any gate batch committed is in
  the index exactly once (no loss through any drop/sweep window, no
  duplicate through any replay/skip path) once maintenance converges;
- replaying EVERY gate batch after the race is a no-op (the txn
  high-water skip holds across rebalances and ghost sweeps);
- serving identity: every gate vector is findable, and exhaustive top-k
  over the pre-race corpus is unchanged.
"""

from __future__ import annotations

import threading
import time as _time

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators import ann_index as AI
from mysoftware_nocnetintel_spark.sources.catalog import (
    FaultInjectingCommitter,
    use_committer,
)
from mysoftware_nocnetintel_spark.sources.readers import (
    read_delta_snapshot,
    read_iceberg_snapshot,
)

DIM = 8
N_BATCHES = 4
BATCH = 4


def _corpus_rows():
    rows = []
    for i in range(150):  # tight blob -> the hot cell
        eps = (i % 7) * 1e-3
        rows.append((i, [10.0 + eps, 10.0 - eps] + [0.5] * (DIM - 2)))
    for i in range(150, 200):
        j = i - 150
        rows.append(
            (
                i,
                [float(5 * (j % 8)) - 20.0, float(5 * (j // 8)) + 20.0]
                + [float((j * 3) % 11) - 5.0] * (DIM - 2),
            )
        )
    return rows


def _gate_batch(spark, k: int):
    """Gate batch k: blob-adjacent vectors (they route into the hot cell
    pre-swap and into its sub-cells post-swap — the racing assignment
    the rescue machinery exists for), each distinct."""
    rows = [
        (
            1000 + 10 * k + j,
            [10.05 + (k * BATCH + j) * 1e-3, 10.0 - j * 2e-3]
            + [0.5 + k * 1e-3] * (DIM - 2),
        )
        for j in range(BATCH)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


@pytest.mark.slow
@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_rebalance_races_gate_appends(spark, tmp_path, fmt):
    path = str(tmp_path / f"ann_{fmt}")
    AI.build_ivf_index(
        spark.createDataFrame(
            _corpus_rows(), "vec_id bigint, embedding array<double>"
        ),
        path,
        n_cells=4,
        table_format=fmt,
    )

    rdr = read_delta_snapshot if fmt == "delta" else read_iceberg_snapshot

    def index_rows():
        return [
            (int(r.vec_id), int(r.n))
            for r in rdr(spark, path)
            .groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]

    errs: list = []

    def gate() -> None:
        try:
            for k in range(N_BATCHES):
                b = _gate_batch(spark, k)
                AI.append_to_ivf_index(b, path, txn=("ann-gate", k))
                # immediate replay: the high-water skip must no-op it
                AI.append_to_ivf_index(b, path, txn=("ann-gate", k))
                _time.sleep(0.005)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def maintainer() -> None:
        try:
            for _ in range(2):
                AI.rebalance_ivf_index(spark, path)
                _time.sleep(0.005)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    injector = FaultInjectingCommitter(
        spurious_conflict_rate=0.1, max_delay_s=0.01, seed=23
    )
    with use_committer(injector):
        threads = [
            threading.Thread(target=gate),
            threading.Thread(target=maintainer),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert not errs, errs
    assert injector.stats["injected_conflicts"] >= 1, "faults never fired"

    # replay EVERY gate batch post-race: skips must hold across the
    # rebalances and ghost sweeps that happened in between
    for k in range(N_BATCHES):
        AI.append_to_ivf_index(
            _gate_batch(spark, k), path, txn=("ann-gate", k)
        )

    # converge maintenance: one quiet run sweeps any rows parked in
    # retired cells by appends that raced a pinned drop
    AI.rebalance_ivf_index(spark, path, max_rows_per_cell=10_000)

    expected = sorted(
        list(range(200))
        + [1000 + 10 * k + j for k in range(N_BATCHES) for j in range(BATCH)]
    )
    rows = index_rows()
    dupes = [(v, n) for v, n in rows if n != 1]
    assert not dupes, f"duplicated vectors: {dupes[:5]}"
    got = sorted(v for v, _ in rows)
    assert got == expected, (
        f"lost: {sorted(set(expected) - set(got))[:5]} "
        f"phantom: {sorted(set(got) - set(expected))[:5]}"
    )

    # serving identity: every gate vector findable under exhaustive probe
    p = AI.read_ann_params(path)
    nprobe = len(AI._live_centroids(p))
    q = spark.createDataFrame(
        [
            (1000 + 10 * k + j,
             [10.05 + (k * BATCH + j) * 1e-3, 10.0 - j * 2e-3]
             + [0.5 + k * 1e-3] * (DIM - 2))
            for k in range(N_BATCHES)
            for j in range(BATCH)
        ],
        "qid bigint, qv array<double>",
    )
    hits = AI.query_ivf_index(spark, q, path, k=3, nprobe=nprobe).collect()
    by_q: dict = {}
    for r in hits:
        by_q.setdefault(r.qid, set()).add(r.vec_id)
    for k in range(N_BATCHES):
        for j in range(BATCH):
            qid = 1000 + 10 * k + j
            assert qid in by_q and qid in by_q[qid], (
                f"gate vector {qid} not served: {by_q.get(qid)}"
            )
