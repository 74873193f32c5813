"""Lakehouse-native PERSISTED ANN index: IVF cells as a cell-partitioned
Delta table, centroids as sidecar metadata, probes as driver-side
partition pruning.

The batch ANN operators (operators/similarity.py) re-derive centroids and
cell assignments per run. This module persists the index the way FAISS
persists one — train once, assign once, store — but in open lakehouse
layout (Delta or Iceberg, ``table_format=``), so the index is a TABLE:
time travel, vacuum, idempotent appends, CAS commits, and any foreign
parquet reader all apply.

Layout and the 100 TB argument:

- ``<path>/cell=<c>/part-*.parquet`` — the corpus vectors Hive-partitioned
  by IVF cell through the engine's own Delta writer. At scale the index
  IS the corpus organized for locality; no second copy.
- ``<path>/_ann_index_params.json`` — centroids + geometry (KB-scale
  driver metadata, exactly like the closure constants the batch operators
  use).
- A serving query computes its ``nprobe`` nearest cells DRIVER-SIDE from
  the sidecar centroids (numpy over a bounded collected query batch) and
  reads ONLY those cells via the Delta reader's driver-side partition
  pruning (sources/readers.py ``partition_filter``): non-probed cells are
  never opened — a query touches ``nprobe/n_cells`` of the files, which
  is the whole point of IVF made literal in the storage layout.
- Scoring on the pruned scan is the same Arrow-batched cosine + per-query
  top-k window the batch operator uses, so results are IDENTICAL to
  ``similarity.ivf_topk`` with the same centroids (test-pinned parity).

Public lineage: IVF (inverted file) indexing per Jegou et al. 2011 /
the FAISS design; the sampled k-means fit is ivf_centroids' documented
FAISS heuristic. Delta persistence cited in sources/delta.py.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import _cosine_batch, ivf_assign, ivf_centroids

_PARAMS_FILE = "_ann_index_params.json"

# serving guard: probe-cell computation collects the query batch to the
# driver (vectors only). Serving batches are small by nature; anything
# larger should run the batch operator over the full corpus instead.
_MAX_SERVING_QUERIES = 4096


def _params_path(path: str) -> str:
    return os.path.join(path, _PARAMS_FILE)


def read_ann_params(path: str) -> dict:
    """Pinned geometry + centroids of the index at ``path``."""
    with open(_params_path(path), encoding="utf-8") as f:
        return json.load(f)


def _write_table(df, path, fmt, partition_by=(), txn=None):
    """Format seam: the index rides either open table format — same
    partition spec, same idempotent-txn discipline (Delta Transaction
    Identifiers / Iceberg snapshot-summary txn markers)."""
    if fmt == "delta":
        from ..sources.delta import write_delta_append

        return write_delta_append(df, path, partition_by=partition_by, txn=txn)
    if fmt == "iceberg":
        from ..sources.iceberg import write_iceberg_append

        return write_iceberg_append(df, path, partition_by=partition_by, txn=txn)
    raise ValueError(f"unknown table_format {fmt!r}")


def _read_cell(spark, path, fmt, cell: int):
    """One probed cell's files — driver-side partition pruning in either
    format (Delta add.partitionValues are strings; Iceberg manifests carry
    the typed partition record)."""
    if fmt == "delta":
        from ..sources.readers import read_delta_snapshot

        return read_delta_snapshot(spark, path, partition_filter={"cell": str(cell)})
    if fmt == "iceberg":
        from ..sources.readers import read_iceberg_snapshot

        return read_iceberg_snapshot(spark, path, partition_filter={"cell": cell})
    raise ValueError(f"unknown table_format {fmt!r}")


def build_ivf_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    table_format: str = "delta",
) -> int:
    """Create the persisted IVF index: sampled-kmeans centroids (bounded
    driver collect — ivf_centroids' FAISS heuristic), zero-shuffle cell
    assignment (ivf_assign's Arrow argmin), one cell-partitioned commit in
    either open table format. Returns the committed version/snapshot."""
    if os.path.exists(_params_path(path)):
        raise ValueError(f"index already exists at {path}")
    cents = ivf_centroids(df, vec_col, n_cells, seed, as_list=True)
    params = {
        "n_cells": n_cells,
        "seed": seed,
        "table_format": table_format,
        "centroids": [[float(x) for x in c] for _, c in cents],
    }
    # sidecar FIRST (same crash argument as dedup_index.build): a rerun
    # after a crash mid-build hits the exists-guard instead of silently
    # double-appending; remedy is delete-and-rebuild.
    os.makedirs(path, exist_ok=True)
    tmp = _params_path(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(params, f)
    os.replace(tmp, _params_path(path))
    assigned = ivf_assign(df, cents, vec_col).select(
        "cell",
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    return _write_table(assigned, path, table_format, partition_by=("cell",))


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
) -> int:
    """Register new vectors under the index's PINNED centroids (cells
    stay stable — the FAISS add-after-train contract; re-train by
    rebuilding). ``txn`` passes through to the format's idempotent-commit
    support for exactly-once batch registration."""
    p = read_ann_params(path)
    cents = _live_centroids(p)  # retired slots never take new vectors
    assigned = ivf_assign(df, cents, vec_col).select(
        "cell",
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    return _write_table(
        assigned, path, p.get("table_format", "delta"), txn=txn
    )


def _live_centroids(params: dict) -> list[tuple[int, list[float]]]:
    """(cell_id, centroid) pairs, skipping RETIRED slots (``None`` —
    written by :func:`rebalance_ivf_index` when it splits a hot cell;
    the list index stays the cell id forever, so splits never shift
    other cells' identities)."""
    return [
        (i, c) for i, c in enumerate(params["centroids"]) if c is not None
    ]


def _probe_cells_np(
    qrows: list, centroids: list[list[float]], nprobe: int
) -> dict:
    """qid -> nprobe nearest LIVE cell ids (ascending L2, ties to lower
    cell) — numpy over driver-side metadata, the serving-path analogue
    of similarity._probe_cells_literal (same tie-break; retired ``None``
    slots are never probed). Distances accumulate
    component-by-component in ELEMENT ORDER (not numpy pairwise
    summation), reproducing the SQL aggregate fold's rounding exactly —
    near-tie centroid distances must not rank differently here than in
    the batch operator, or the parity guarantee breaks on adversarial
    inputs."""
    live = [(i, c) for i, c in enumerate(centroids) if c is not None]
    ids = np.asarray([i for i, _ in live], dtype=np.int64)
    C = np.asarray([c for _, c in live], dtype=np.float64)
    out: dict = {}
    for qid, qv in qrows:
        q = np.asarray(qv, dtype=np.float64)
        acc = np.zeros(len(C))
        for j in range(C.shape[1]):
            diff = q[j] - C[:, j]
            acc = acc + diff * diff  # left-to-right fold per cell
        order = np.lexsort((ids, acc))
        out[qid] = [int(ids[c]) for c in order[:nprobe]]
    return out


def query_ivf_index(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "qid",
    query_vec: str = "qv",
) -> DataFrame:
    """Serve a query batch from the persisted index, reading ONLY the
    probed cells' files.

    1. Collect the (bounded) query batch — vectors are serving-side
       metadata, capped at ``_MAX_SERVING_QUERIES``.
    2. Probe cells driver-side from the sidecar centroids.
    3. Read the UNION of probed cells via partition_filter — driver-side
       file pruning; never-probed cells are never opened (test proves it
       with a corrupt excluded file).
    4. Score with the Arrow-batched cosine against a broadcast
       (qid, qv, cell) probe table; per-query top-k window.

    Returns (qid, vec_id, score, rn) — identical to similarity.ivf_topk
    run with the same centroids (parity test-pinned)."""
    p = read_ann_params(path)
    fmt = p.get("table_format", "delta")
    qrows = [
        (r[0], list(r[1]))
        for r in queries.select(query_id, query_vec)
        .limit(_MAX_SERVING_QUERIES + 1)
        .collect()
    ]
    if len(qrows) > _MAX_SERVING_QUERIES:
        raise ValueError(
            f"serving batch exceeds {_MAX_SERVING_QUERIES} queries; run "
            "similarity.ivf_topk over the corpus for bulk joins"
        )
    probes = _probe_cells_np(qrows, p["centroids"], nprobe)
    cells = sorted({c for cs in probes.values() for c in cs})
    from pyspark.sql import types as T

    qid_type = queries.schema[query_id].dataType

    scans = []
    for c in cells:
        try:
            scans.append(_read_cell(spark, path, fmt, c))
        except ValueError:
            continue  # an empty cell has no files — legal, nothing to scan
    if not scans:
        # schema-stable empty result: qid type from the QUERY frame,
        # vec_id type from the index table when it is readable
        vec_id_type: T.DataType = T.LongType()
        try:
            from ..sources.readers import (
                read_delta_snapshot,
                read_iceberg_snapshot,
            )

            rdr = read_delta_snapshot if fmt == "delta" else read_iceberg_snapshot
            vec_id_type = rdr(spark, path).schema["vec_id"].dataType
        except Exception:
            pass
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(query_id, qid_type),
                    T.StructField("vec_id", vec_id_type),
                    T.StructField("score", T.DoubleType()),
                    T.StructField("rn", T.LongType()),
                ]
            ),
        )
    corpus = scans[0]
    for s in scans[1:]:
        corpus = corpus.unionByName(s)

    probe_rows = [
        (qid, qv, c) for qid, qv in qrows for c in probes[qid]
    ]
    probe_df = spark.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField(query_id, qid_type),
                T.StructField(query_vec, T.ArrayType(T.DoubleType())),
                T.StructField("cell", T.IntegerType()),
            ]
        ),
    )
    scored = corpus.join(
        F.broadcast(probe_df),
        corpus["cell"].cast("int") == probe_df["cell"],
    ).withColumn("score", _cosine_batch(F.col("embedding"), F.col(query_vec)))
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(query_id, "vec_id", "score", "rn")
    )


def _delete_cells(spark, path: str, fmt: str, cells: list[int]) -> None:
    """GC the rows of retired cells through the format's ordinary
    delete verbs (the index is a table; no index-specific machinery)."""
    if not cells:
        return
    ids = ",".join(str(int(c)) for c in sorted(cells))
    if fmt == "delta":
        from ..sources.delta import delete_delta_rows

        delete_delta_rows(spark, path, f"cell IN ({ids})")
    elif fmt == "iceberg":
        from ..sources.iceberg import write_iceberg_position_deletes

        write_iceberg_position_deletes(
            spark, path, F.col("cell").isin([int(c) for c in cells])
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown table_format {fmt!r}")


def rebalance_ivf_index(
    spark: SparkSession,
    path: str,
    max_rows_per_cell: int | None = None,
    split_factor: int = 2,
) -> dict:
    """SPLIT HOT CELLS — the skew-maintenance verb a 100 TB IVF index
    needs: real embedding distributions are lumpy, and one hot cell
    breaks the ``nprobe/n_cells`` cost model (every query probing it
    scans a large fraction of the corpus). This verb re-clusters ONLY
    the oversized cells (seeded k-means within each, ``split_factor``
    sub-centroids), moves only their vectors, and leaves every other
    cell's files untouched — the per-group incremental-maintenance
    posture of the lakehouse rewrites.

    ZERO-DOWNTIME ordering — the SIDECAR SWAP is the atomic visibility
    switch (``os.replace``), so serving is correct at every instant:

    1. GC sweep: rows of already-retired cells (a prior run's crash
       window 3) are deleted first — they are invisible to probes either
       way.
    2. For each oversized cell, append its vectors re-assigned under NEW
       cell ids (appended to the centroid list; parent ids are never
       reused) with an idempotent txn — a crashed run's replay skips
       completed appends. The new cells are NOT in the sidecar yet, so
       partition pruning keeps them invisible; a concurrent reader still
       probes the parent and sees every vector exactly once.
    3. Swap the sidecar: parent slots become ``None`` (retired — list
       indexes stay cell ids forever), sub-centroids appended. From this
       instant probes route to the sub-cells, whose rows are already
       committed; parent rows become unreachable (pruned).
    3b. RESCUE: a concurrent append landing between the parent read
       and the swap sits unmoved in the (now frozen) parent cell; an
       anti-join against the sub-cells identifies those late arrivals
       exactly and reassigns them under an idempotent rescue txn —
       without this, step 4 would lose them.
    4. GC the parent rows through the format's ordinary delete verb. A
       crash before this leaves dead-but-unprobeable rows that the next
       run's sweep (step 1) removes.

    ``max_rows_per_cell`` defaults to 2x the mean live-cell population.
    Returns ``{"split": {parent: [new ids]}, "moved": n, "rescued": n,
    "gc_cells": [...]}. Counting is a full-column scan of (cell) here; a deployment
    can read the same counts from add.stats / manifest row counts
    without touching data."""
    import math

    p = read_ann_params(path)
    fmt = p.get("table_format", "delta")
    if fmt == "delta":
        from ..sources.readers import read_delta_snapshot as _rdr
    else:
        from ..sources.readers import read_iceberg_snapshot as _rdr

    counts = {
        int(r["cell"]): int(r["n"])
        for r in _rdr(spark, path)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    retired = [
        i for i, c in enumerate(p["centroids"]) if c is None
    ]
    sweep = [c for c in retired if counts.get(c)]
    _delete_cells(spark, path, fmt, sweep)  # step 1: GC prior crashes

    live = _live_centroids(p)
    live_counts = [counts.get(i, 0) for i, _ in live]
    if max_rows_per_cell is None:
        mean = (sum(live_counts) / max(len(live), 1)) if live else 0
        max_rows_per_cell = max(1, math.ceil(2 * mean))
    oversized = sorted(
        i
        for i, _ in live
        if counts.get(i, 0) > max_rows_per_cell
    )
    if not oversized:
        return {"split": {}, "moved": 0, "rescued": 0, "gc_cells": sweep,
                "unsplittable": []}

    base = len(p["centroids"])  # new ids start here; generation marker
    centroids = [list(c) if c is not None else None for c in p["centroids"]]
    split: dict[int, list[int]] = {}
    unsplittable: list[int] = []
    moved = 0
    next_id = base
    for parent in oversized:
        cell_df = _read_cell(spark, path, fmt, parent).select(
            "vec_id", "embedding"
        )
        subs = ivf_centroids(
            cell_df,
            "embedding",
            split_factor,
            seed=int(p.get("seed", 42)) + 7919 * (parent + 1),
            as_list=True,
        )
        pairs = [
            (next_id + j, list(vec)) for j, (_, vec) in enumerate(subs)
        ]
        assigned = ivf_assign(cell_df, pairs, "embedding").select(
            "cell",
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        # unsplittable guard: if every vector lands in ONE sub (a blob
        # denser than k-means can separate), splitting would retire the
        # parent for an identically-hot child — and the next run would
        # split THAT, growing the centroid list forever. Leave the cell
        # alone; a blob of near-identical vectors needs dedup, not cells.
        sub_counts = {
            int(r["cell"]): int(r["n"])
            for r in assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if len(sub_counts) < 2:
            unsplittable.append(parent)
            continue
        # step 2: idempotent append — app id pinned to this generation,
        # version to the parent, so a crash-replay skips completed cells
        _write_table(
            assigned, path, fmt, txn=(f"ann-rebalance-{base}", parent)
        )
        split[parent] = [i for i, _ in pairs]
        moved += counts.get(parent, 0)
        for cid, vec in pairs:
            assert cid == len(centroids)
            centroids.append([float(x) for x in vec])
        centroids[parent] = None  # retire (visibility flips at swap)
        next_id += len(pairs)

    if not split:
        return {"split": {}, "moved": 0, "rescued": 0, "gc_cells": sweep,
                "unsplittable": unsplittable}

    # step 3: ATOMIC sidecar swap — the visibility switch
    new_params = dict(
        p,
        centroids=centroids,
        rebalance_generation=base,
    )
    tmp = _params_path(path) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(new_params, f)
    os.replace(tmp, _params_path(path))

    # step 3b: RESCUE the race window. A concurrent append that landed
    # between this run's parent read (step 2) and the sidecar swap
    # (step 3) sits in the parent cell, unmoved — and step 4's delete
    # would LOSE it. Post-swap the parent set is FROZEN (appenders
    # re-read the sidecar per batch, and retired cells never take new
    # vectors), so an anti-join of the parent's current rows against
    # the sub-cells' ids identifies the late arrivals exactly; they are
    # reassigned under an idempotent rescue txn before the delete. The
    # join is bounded by the hot cell's size — distributed, no driver
    # materialization.
    rescued = 0
    for parent, new_ids in split.items():
        cur = _read_cell(spark, path, fmt, parent).select(
            "vec_id", "embedding"
        )
        moved_ids = None
        for c in new_ids:
            s = _read_cell(spark, path, fmt, c).select("vec_id")
            moved_ids = s if moved_ids is None else moved_ids.unionByName(s)
        late = cur.join(moved_ids, "vec_id", "left_anti")
        pairs = [(c, centroids[c]) for c in new_ids]
        late_assigned = ivf_assign(late, pairs, "embedding").select(
            "cell",
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        n_late = late_assigned.count()
        if n_late:
            _write_table(
                late_assigned, path, fmt,
                txn=(f"ann-rebalance-rescue-{base}", parent),
            )
            rescued += n_late

    # step 4: GC the parents (idempotent; next run sweeps on crash)
    _delete_cells(spark, path, fmt, sorted(split))
    return {"split": split, "moved": moved, "rescued": rescued,
            "gc_cells": sweep, "unsplittable": unsplittable}
