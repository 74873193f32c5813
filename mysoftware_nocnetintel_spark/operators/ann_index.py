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
    # CELL-CLUSTERED LAYOUT (r13, measured in r12 then blocked): hash-
    # repartition by the partition column so each cell's rows land in ONE
    # write task → ~1 file per cell instead of (cells × write tasks) tiny
    # files (16×16=256 at the defaults). Serving latency is file-count-
    # bound at this scale (every probed cell's files are opened per
    # statement); the r12 A/B measured the 8-query serve ~3.6 → ~1.1 s.
    # Unblocked by the order-insensitive rebalance split sample above
    # (rebalance_ivf_index) — maintenance generations no longer depend on
    # file order. Task count follows spark.sql.shuffle.partitions (scale-
    # configurable); at cluster scale a giant cell stays one task's
    # write, split into bounded files by spark.sql.files.maxRecordsPerFile
    # and by AQE skew handling in batch (AQE-on) deployments.
    return _write_table(
        assigned.repartition("cell"), path, table_format,
        partition_by=("cell",),
    )


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
    run with the same centroids (parity test-pinned).

    TORN-VIEW GUARD (round-11 verdict task 6): the sidecar read and the
    probed cells' FILE LISTINGS both happen driver-side inside this
    call; a rebalance whose swap+GC lands between them would route with
    the OLD centroids into a parent cell the GC just emptied. The plans
    themselves can't tear after build — the snapshot readers pin the
    live file list at construction and the GC is metadata-only (the
    parquet stays until vacuum) — so re-reading the sidecar AFTER the
    build and rebuilding on any change makes every returned plan a
    consistent view of ONE generation (old or new, never a mix). The
    serve-during-rebalance fuzz (tests/test_ann_serve_race.py) drives
    this window with a concurrent reader in both formats."""
    # Arrow fetch, not collect() — same rows/order/bits, without the
    # per-row pickle cost (see similarity.ivf_centroids)
    _qtbl = (
        queries.select(query_id, query_vec)
        .limit(_MAX_SERVING_QUERIES + 1)
        .toArrow()
    )
    qrows = list(
        zip(_qtbl.column(0).to_pylist(), _qtbl.column(1).to_pylist())
    )
    if len(qrows) > _MAX_SERVING_QUERIES:
        raise ValueError(
            f"serving batch exceeds {_MAX_SERVING_QUERIES} queries; run "
            "similarity.ivf_topk over the corpus for bulk joins"
        )
    from pyspark.sql import types as T

    qid_type = queries.schema[query_id].dataType

    def _build(p: dict) -> DataFrame:
        fmt = p.get("table_format", "delta")
        probes = _probe_cells_np(qrows, p["centroids"], nprobe)
        cells = sorted({c for cs in probes.values() for c in cs})
        # ONE snapshot read with a membership partition filter covering
        # every probed cell (r12, guide §1.2 "remove passes"): the old
        # per-cell loop replayed the table's log/manifests once PER CELL
        # and unioned up to n_cells scans — at 8 queries × nprobe 4 that
        # was ~16 log replays per statement, pure driver latency. Same
        # rows (union of the probed cells' live rows), same pruning
        # guarantee (never-probed cells are never opened).
        from ..sources.readers import NoMatchingFilesError

        corpus = None
        try:
            if fmt == "delta":
                from ..sources.readers import read_delta_snapshot

                corpus = read_delta_snapshot(
                    spark,
                    path,
                    partition_filter={
                        "cell": frozenset(str(c) for c in cells)
                    },
                )
            elif fmt == "iceberg":
                from ..sources.readers import read_iceberg_snapshot

                corpus = read_iceberg_snapshot(
                    spark,
                    path,
                    partition_filter={"cell": frozenset(cells)},
                )
            else:  # pragma: no cover
                raise RuntimeError(f"unknown table_format {fmt!r}")
        except NoMatchingFilesError:
            # none of the probed cells has files — a legal empty slice.
            # Any OTHER ValueError (bad filter keys on a foreign/corrupt
            # table, missing version) propagates: silently serving an
            # empty result for a broken table would hide the breakage
            # (r12 advisor).
            corpus = None
        if corpus is None:
            # schema-stable empty result: qid type from the QUERY frame,
            # vec_id type from the index table when it is readable
            vec_id_type: T.DataType = T.LongType()
            try:
                from ..sources.readers import (
                    read_delta_snapshot,
                    read_iceberg_snapshot,
                )

                rdr = (
                    read_delta_snapshot
                    if fmt == "delta"
                    else read_iceberg_snapshot
                )
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
        ).withColumn(
            "score", _cosine_batch(F.col("embedding"), F.col(query_vec))
        )
        w = Window.partitionBy(query_id).orderBy(
            F.col("score").desc(), F.col("vec_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= k)
            .select(query_id, "vec_id", "score", "rn")
        )

    for _attempt in range(5):
        p = read_ann_params(path)
        plan = _build(p)
        if read_ann_params(path) == p:
            return plan
        # the sidecar swapped mid-build: the probes and the file
        # listings may straddle generations — rebuild against the head
    raise RuntimeError(
        f"index at {path} swapped generations 5 times during one plan "
        "construction: maintenance is churning faster than serving can "
        "route; retry when the rebalance settles"
    )


def _delete_cells(
    spark,
    path: str,
    fmt: str,
    cells: list[int],
    files_by_cell: "dict[int, list[str]] | None" = None,
) -> None:
    """GC retired/ghost cells through the formats' METADATA-ONLY
    partition drop (round 10 — ``cell`` IS the table's partition
    column): one commit tombstones (Delta) / excludes from the manifest
    list (Iceberg) the partition's files. No data file is read or
    rewritten, and the old row-level delete caps (5M Delta DV
    positions / 1M Iceberg delete rows) are gone — a cell of ANY size
    GCs in O(its file count) driver-side metadata.

    ``files_by_cell`` PINS each cell's drop to the exact file list a
    rescue read (:func:`_pin_cell`): files appended to the cell after
    that snapshot are provably untouched and survive into the next
    run's sweep. Unpinned (``None``) drops take the cell's current
    files — correct only where no concurrent writer can target the
    cell (the ghost sweep: ghost ids lie beyond every published
    sidecar, so no appender assigns into them)."""
    if fmt not in ("delta", "iceberg"):  # pragma: no cover
        raise ValueError(f"unknown table_format {fmt!r}")
    if not cells:
        return
    ids = sorted(int(c) for c in cells)
    if files_by_cell is None:
        # unpinned sweep (ghost cells): ONE commit drops every cell —
        # a crashed run leaves split_factor ghosts per parent, and the
        # sweep must not pay one CAS + manifest rewrite per ghost
        # (round-10 review)
        if fmt == "delta":
            from ..sources.delta import drop_delta_partition

            drop_delta_partition(
                spark, path, [{"cell": str(c)} for c in ids]
            )
        else:
            from ..sources.iceberg import drop_iceberg_partition

            drop_iceberg_partition(path, [{"cell": c} for c in ids])
        return
    for c in ids:
        fl = files_by_cell.get(c)
        if not fl:
            continue  # pinned mode with nothing pinned: nothing to drop
        if fmt == "delta":
            from ..sources.delta import drop_delta_partition

            drop_delta_partition(spark, path, {"cell": str(c)}, files=fl)
        else:
            from ..sources.iceberg import drop_iceberg_partition

            drop_iceberg_partition(path, {"cell": c}, files=fl)


def _read_cell_or_none(spark, path, fmt, cell: int):
    """A cell's rows, or None when the cell has no files (legal: an
    empty sub-cell, or a partition fully GC'd). Other ValueErrors are
    genuine table problems and propagate (r12 advisor)."""
    from ..sources.readers import NoMatchingFilesError

    try:
        return _read_cell(spark, path, fmt, cell)
    except NoMatchingFilesError:
        return None


# Observability for the metadata-count fast path (round-11 verdict task
# 7, the spec_native_fallbacks pattern): an engine-written index table
# ALWAYS qualifies for metadata counts, so a nonzero fallback counter
# means some writer path stopped emitting stats and the rebalance
# silently degraded to full-column scans — visible here instead of only
# in wall-clock. The first fallback also warns with the table path.
REBALANCE_STATS: dict[str, int] = {"count_scan_fallbacks": 0}
# table paths whose count-scan fallback has already warned once (the
# warning is per table; the counter above is the process-wide total)
_WARNED_FALLBACK_PATHS: set[str] = set()


def _metadata_cell_counts(path: str, fmt: str) -> "dict[int, int] | None":
    """EXACT per-cell populations from table METADATA alone (Delta
    add.stats minus DV cardinality / Iceberg manifest record counts) —
    the zero-I/O count path the rebalance sizes its work by. None when
    the format can't guarantee exactness (missing stats, live delete
    files after a retraction); callers fall back to the scan."""
    if fmt == "delta":
        from ..sources.delta import partition_row_counts

        raw = partition_row_counts(path, "cell")
    else:
        from ..sources.iceberg import partition_row_counts

        raw = partition_row_counts(path, "cell")
    if raw is None:
        return None
    return {int(k): int(v) for k, v in raw.items()}


def _pin_cell(spark, path: str, fmt: str, cell: int):
    """One cell's rows AND file list at a SINGLE pinned snapshot —
    ``(DataFrame | None, files)``. The rescue read and the GC drop must
    see the SAME file set: pinning both to one snapshot makes an append
    committing at ANY later point provably untouched by the drop (it
    adds a file the pin never saw), closing the lost-append window a
    fresh-scan delete had between the rescue read and its own scan
    (round-10 advisor). Driver-side metadata walk only."""
    if fmt == "delta":
        from ..sources.delta import _replay_state
        from ..sources.readers import read_delta_snapshot

        st = _replay_state(os.path.join(path, "_delta_log"))
        files = sorted(
            rel
            for rel, add in st["live"].items()
            if (add.get("partitionValues") or {}).get("cell") == str(cell)
        )
        if not files:
            return None, []
        return (
            read_delta_snapshot(
                spark,
                path,
                version=st["version"],
                partition_filter={"cell": str(cell)},
            ),
            files,
        )
    from ..sources.readers import (
        _iceberg_snapshot_files,
        read_iceberg_snapshot,
    )

    data_files, _, _, snap = _iceberg_snapshot_files(path)
    files = sorted(
        e.path
        for e in data_files
        if (e.partition or {}).get("cell") == int(cell)
    )
    if not files:
        return None, []
    return (
        read_iceberg_snapshot(
            spark,
            path,
            snapshot_id=snap["snapshot-id"],
            partition_filter={"cell": int(cell)},
        ),
        files,
    )


def _rescue_then_gc(
    spark, path: str, fmt: str, parent: int, sub_ids: list[int],
    centroids: list,
) -> int:
    """Move any rows still sitting in RETIRED cell ``parent`` to its
    sub-cells, then drop the parent's files. The anti-join against the
    sub-cells' ids is the idempotency mechanism (no txn needed: a
    replayed rescue finds its previously committed rows in the
    sub-cells and computes an empty late set). Loss-freedom is now
    PINNED, not probabilistic (round 10): the rescue read and the GC
    drop share ONE snapshot's file list (:func:`_pin_cell` →
    :func:`_delete_cells` ``files_by_cell``), so an append committing
    at ANY point after the pin lands in a file the drop never touches
    and is rescued by the next run's sweep — including the old
    lost-append window between the rescue read and a fresh-scan
    delete's own scan (round-10 advisor HIGH). Returns the number
    rescued."""
    cur, pinned_files = _pin_cell(spark, path, fmt, parent)
    if cur is None:
        return 0
    cur = cur.select("vec_id", "embedding")
    moved_ids = None
    for c in sub_ids:
        s = _read_cell_or_none(spark, path, fmt, c)
        if s is None:
            continue
        s = s.select("vec_id")
        moved_ids = s if moved_ids is None else moved_ids.unionByName(s)
    late = cur if moved_ids is None else cur.join(
        moved_ids, "vec_id", "left_anti"
    )
    pairs = [
        (c, centroids[c]) for c in sub_ids if centroids[c] is not None
    ]
    if not pairs:
        raise RuntimeError(
            f"retired cell {parent} has rows but no live sub-cells "
            f"recorded — index metadata is inconsistent; rebuild"
        )
    late_assigned = ivf_assign(late, pairs, "embedding").select(
        "cell",
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    ).localCheckpoint(eager=False)  # feeds count AND write: one compute
    n_late = late_assigned.count()
    if n_late:
        _write_table(late_assigned, path, fmt)
    _delete_cells(
        spark, path, fmt, [parent],
        files_by_cell={int(parent): pinned_files},
    )
    return n_late


def rebalance_ivf_index(
    spark: SparkSession,
    path: str,
    max_rows_per_cell: int | None = None,
    split_factor: int = 2,
) -> dict:
    """SPLIT HOT CELLS — the skew-maintenance verb a 100 TB IVF index
    needs: real embedding distributions are lumpy, and one hot cell
    breaks the ``nprobe/n_cells`` cost model (every query probing it
    scans a large fraction of the corpus). Only the oversized cells'
    vectors move (seeded k-means within each, ``split_factor``
    sub-centroids); every other cell's files are untouched — the
    per-group incremental-maintenance posture of the lakehouse rewrites.

    Each hot cell is its own GENERATION, processed to completion before
    the next (sub-cell ids are allocated from the sidecar as it stands
    at that cell's turn, so a crash-replay with a DIFFERENT oversized
    set can never collide ids across parents). Per parent, the SIDECAR
    SWAP is the atomic visibility switch (``os.replace``) and serving
    is correct at every instant:

    0. GHOST sweep: rows in cells the sidecar does not know (a prior
       run crashed after its append but before its swap) are deleted —
       their vectors still live in the unswapped parent, and the cell
       ids are about to be reallocated.
    1. RETIRED sweep: retired cells that still hold rows (a prior run
       crashed between swap and GC) are rescue-then-GC'd using the
       sidecar's recorded ``retired`` map — late arrivals move to the
       sub-cells before the delete, so nothing is ever lost.
    2. Append the parent's vectors re-assigned under NEW cell ids with
       an idempotent txn (app per parent, version = first sub id —
       monotone, and the high-water-mark skip can only fire for THIS
       parent's own completed append). Not yet in the sidecar → pruned
       → invisible; a concurrent reader still probes the parent.
    3. Swap the sidecar: the parent slot becomes ``None`` (retired —
       list indexes stay cell ids forever), sub-centroids appended,
       ``retired[parent] = sub ids`` recorded for future sweeps.
    4. Rescue-then-GC the parent (:func:`_rescue_then_gc`): the
       anti-join moves any append that raced the swap window; the GC is
       a METADATA-ONLY partition drop PINNED to the file list the
       rescue read (round 10), so an append committing at any later
       point lands in an unpinned file, survives the drop, and is
       rescued by the next run's sweep — no cell-size cap, no data file
       rewritten.

    If the txn skip fires on an append whose rows the ghost sweep
    deleted (same parent, same first-sub-id, rows gone), the rescue
    pass re-moves the ENTIRE parent — the anti-join sees empty
    sub-cells — so the skip can never strand vectors.

    An UNSPLITTABLE guard refuses splits where k-means routes every
    vector to one sub (a blob of near-identical vectors needs dedup,
    not more cells — splitting would grow the centroid list forever
    across runs). Retired cells are never probed and never take
    appends.

    ``max_rows_per_cell`` defaults to 2x the mean live-cell population.
    Returns ``{"split": {parent: [new ids]}, "moved": n, "rescued": n,
    "gc_cells": [...], "unsplittable": [...]}``. Counting reads table
    METADATA (round 10 — Delta add.stats minus DV cardinality / Iceberg
    manifest record counts: KB of log/Avro, zero data I/O) and falls
    back to a full-column scan only when metadata can't be exact
    (:func:`_metadata_cell_counts`)."""
    import math

    p = read_ann_params(path)
    fmt = p.get("table_format", "delta")
    if fmt == "delta":
        from ..sources.readers import read_delta_snapshot as _rdr
    else:
        from ..sources.readers import read_iceberg_snapshot as _rdr

    def _counts() -> dict[int, int]:
        # metadata first (round 10): KB of log/Avro instead of a
        # full-column scan — at 100 TB the count pass would otherwise
        # rival the split itself. Falls back to the scan whenever
        # metadata can't be exact (e.g. live delete files after a
        # vec_id retraction).
        meta_counts = _metadata_cell_counts(path, fmt)
        if meta_counts is not None:
            return meta_counts
        # first-fallback warning keyed PER TABLE PATH (r11 advisor: the
        # process-global counter suppressed the diagnostic for every
        # other table after the first fallback anywhere); the global
        # counter still totals every fallback for tests/observability
        if path not in _WARNED_FALLBACK_PATHS:
            _WARNED_FALLBACK_PATHS.add(path)
            import warnings

            warnings.warn(
                f"rebalance falling back to a full-column count scan at "
                f"{path} (metadata counts unavailable — a stats-less add "
                "or live delete files); expected only after vec_id "
                "retractions",
                stacklevel=3,
            )
        REBALANCE_STATS["count_scan_fallbacks"] += 1
        return {
            int(r["cell"]): int(r["n"])
            for r in _rdr(spark, path)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    counts = _counts()
    # step 0: ghost sweep — cells beyond the sidecar were written by a
    # run that crashed BEFORE its swap; their vectors still live in the
    # (unswapped) parent, so a plain delete loses nothing and frees the
    # ids for clean reallocation
    ghosts = sorted(c for c in counts if c >= len(p["centroids"]))
    _delete_cells(spark, path, fmt, ghosts)

    # step 1: retired sweep — rescue-then-GC via the recorded map
    retired_map = {
        int(k): v for k, v in (p.get("retired") or {}).items()
    }
    sweep = sorted(
        c
        for c, v in enumerate(p["centroids"])
        if v is None and counts.get(c)
    )
    rescued = 0
    for c in sweep:
        rescued += _rescue_then_gc(
            spark, path, fmt, c, retired_map.get(c) or [], p["centroids"]
        )
    if ghosts or sweep:
        # RECOUNT after the sweeps (round-10 advisor): rows rescued into
        # sub-cells can push one past the threshold — a stale count would
        # defer its split a full run (convergence delay), and the ghost
        # deletes changed the live population the mean derives from.
        counts = _counts()

    live = _live_centroids(p)
    live_counts = [counts.get(i, 0) for i, _ in live]
    if max_rows_per_cell is None:
        mean = (sum(live_counts) / max(len(live), 1)) if live else 0
        max_rows_per_cell = max(1, math.ceil(2 * mean))
    oversized = sorted(
        i for i, _ in live if counts.get(i, 0) > max_rows_per_cell
    )
    split: dict[int, list[int]] = {}
    unsplittable: list[int] = []
    moved = 0
    for parent in oversized:
        # fresh sidecar each turn: per-parent generations — ids allocate
        # from the CURRENT list, and earlier parents are already final
        p = read_ann_params(path)
        centroids = [
            list(c) if c is not None else None for c in p["centroids"]
        ]
        base = len(centroids)
        cell_df = _read_cell(spark, path, fmt, parent).select(
            "vec_id", "embedding"
        )
        # ORDER-INSENSITIVE split sample (r13): the re-fit trains on the
        # cap rows with the lowest (xxhash64(vec_id), vec_id) — a
        # deterministic function of the cell's row SET. The old plain
        # limit() sampled in file order, which coupled post-split
        # generations to the table's write layout and blocked the
        # cell-clustered build layout (OPTIMIZATION_r12.md §6).
        subs = ivf_centroids(
            cell_df,
            "embedding",
            split_factor,
            seed=int(p.get("seed", 42)) + 7919 * (parent + 1),
            as_list=True,
            hash_sample_col="vec_id",
        )
        pairs = [(base + j, list(vec)) for j, (_, vec) in enumerate(subs)]
        assigned = ivf_assign(cell_df, pairs, "embedding").select(
            "cell",
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        ).localCheckpoint(eager=False)  # feeds guard AND write once
        # unsplittable guard: one-sub splits can never converge
        sub_counts = {
            int(r["cell"]): int(r["n"])
            for r in assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if len(sub_counts) < 2:
            unsplittable.append(parent)
            continue
        # step 2: idempotent append — app per PARENT, version = first
        # sub id (monotone across generations, collision-free across
        # parents; see the skip-vs-ghost note in the docstring)
        _write_table(
            assigned, path, fmt, txn=(f"ann-rebalance-{parent}", base)
        )
        new_ids = [i for i, _ in pairs]
        for cid, vec in pairs:
            assert cid == len(centroids)
            centroids.append([float(x) for x in vec])
        centroids[parent] = None  # retire (visibility flips at swap)

        # step 3: ATOMIC sidecar swap — the visibility switch
        retired_rec = dict(p.get("retired") or {})
        retired_rec[str(parent)] = new_ids
        new_params = dict(
            p,
            centroids=centroids,
            retired=retired_rec,
            rebalance_generation=base,
        )
        tmp = _params_path(path) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(new_params, f)
        os.replace(tmp, _params_path(path))

        # step 4: rescue the swap-window racers, then GC the parent
        rescued += _rescue_then_gc(
            spark, path, fmt, parent, new_ids, centroids
        )
        split[parent] = new_ids
        moved += counts.get(parent, 0)

    return {"split": split, "moved": moved, "rescued": rescued,
            "gc_cells": sweep, "unsplittable": unsplittable}
