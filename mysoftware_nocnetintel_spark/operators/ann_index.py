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
    cents = [(i, c) for i, c in enumerate(p["centroids"])]
    assigned = ivf_assign(df, cents, vec_col).select(
        "cell",
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    return _write_table(
        assigned, path, p.get("table_format", "delta"), txn=txn
    )


def _probe_cells_np(
    qrows: list, centroids: list[list[float]], nprobe: int
) -> dict:
    """qid -> nprobe nearest cell ids (ascending L2, ties to lower cell) —
    numpy over driver-side metadata, the serving-path analogue of
    similarity._probe_cells_literal (same tie-break). Distances accumulate
    component-by-component in ELEMENT ORDER (not numpy pairwise
    summation), reproducing the SQL aggregate fold's rounding exactly —
    near-tie centroid distances must not rank differently here than in
    the batch operator, or the parity guarantee breaks on adversarial
    inputs."""
    C = np.asarray(centroids, dtype=np.float64)
    out: dict = {}
    for qid, qv in qrows:
        q = np.asarray(qv, dtype=np.float64)
        acc = np.zeros(len(C))
        for j in range(C.shape[1]):
            diff = q[j] - C[:, j]
            acc = acc + diff * diff  # left-to-right fold per cell
        order = np.lexsort((np.arange(len(C)), acc))
        out[qid] = [int(c) for c in order[:nprobe]]
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
