"""Operational loop for the persisted indexes: after many small streaming
appends, the standard maintenance verbs (Delta OPTIMIZE / Iceberg major
compaction) must compact the index tables WITHOUT changing any gating or
serving result — the indexes are ordinary engine tables, so the whole
maintenance surface applies to them."""

from __future__ import annotations

import glob
import os

import numpy as np
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators import ann_index as AI
from mysoftware_nocnetintel_spark.operators import dedup_index as DI

TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "pyspark structured streaming processes unbounded data in micro batches",
    "minhash signatures estimate jaccard similarity between shingle sets",
    "delta tables commit atomically through the transaction log protocol",
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _vec_rows(n, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, 8))
    return [
        (seed * 1000 + i, (centers[i % 4] + 0.1 * rng.normal(size=8)).tolist())
        for i in range(n)
    ]


def test_optimize_compacts_dedup_index_without_changing_verdicts(
    spark, tmp_path
):
    from mysoftware_nocnetintel_spark.sources.delta import optimize_delta_table

    path = str(tmp_path / "didx")
    DI.build_minhash_index(_docs(spark, [(0, TEXTS[0])]), path)
    for i, t in enumerate(TEXTS[1:], start=1):  # many tiny appends
        DI.append_to_minhash_index(_docs(spark, [(i, t)]), path)
    batch = _docs(spark, [(100, TEXTS[2]), (101, "wholly novel text here")])
    before = {
        (r.doc, r.dup_of, r.source, r.est_jaccard)
        for r in DI.dedup_against_minhash_index(spark, batch, path).collect()
    }
    assert (100, 2, "index", 1.0) in before
    n_files_before = len(glob.glob(os.path.join(path, "*.parquet")))
    optimize_delta_table(spark, path)
    n_files_after = len(
        [
            f
            for f in glob.glob(os.path.join(path, "*.parquet"))
        ]
    )
    after = {
        (r.doc, r.dup_of, r.source, r.est_jaccard)
        for r in DI.dedup_against_minhash_index(spark, batch, path).collect()
    }
    assert after == before
    assert n_files_before >= 4  # the appends really fragmented it
    from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot

    live = read_delta_snapshot(spark, path).inputFiles()
    assert len(live) < n_files_before  # compaction actually reduced live files


def test_iceberg_compaction_preserves_ann_serving(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        rewrite_iceberg_table,
    )

    path = str(tmp_path / "aidx")
    base = spark.createDataFrame(
        _vec_rows(40, seed=1), "vec_id bigint, embedding array<double>"
    )
    AI.build_ivf_index(base, path, n_cells=4, table_format="iceberg")
    for s in (2, 3, 4):  # fragment every cell with small appends
        AI.append_to_ivf_index(
            spark.createDataFrame(
                _vec_rows(10, seed=s), "vec_id bigint, embedding array<double>"
            ),
            path,
        )
    queries = spark.createDataFrame(
        [(9, _vec_rows(1, seed=7)[0][1])], "qid bigint, qv array<double>"
    )
    before = [
        (r.qid, r.vec_id, r.rn, round(r.score, 12))
        for r in AI.query_ivf_index(spark, queries, path, k=5, nprobe=4).collect()
    ]
    rewrite_iceberg_table(spark, path, min_files_per_partition=2)
    after = [
        (r.qid, r.vec_id, r.rn, round(r.score, 12))
        for r in AI.query_ivf_index(spark, queries, path, k=5, nprobe=4).collect()
    ]
    assert after == before
    # partition pruning still holds post-compaction: corrupt unprobed cells
    from mysoftware_nocnetintel_spark.sources.readers import (
        _iceberg_snapshot_files,
    )

    probes = AI._probe_cells_np(
        [(r.qid, list(r.qv)) for r in queries.collect()],
        AI.read_ann_params(path)["centroids"],
        2,
    )
    probed = {c for cs in probes.values() for c in cs}
    corrupted = 0
    for e in _iceberg_snapshot_files(path, None, None)[0]:
        if int((e.partition or {}).get("cell")) in probed:
            continue
        with open(e.path, "wb") as f:
            f.write(b"corrupt")
        corrupted += 1
    assert corrupted > 0
    got = AI.query_ivf_index(spark, queries, path, k=3, nprobe=2).collect()
    assert len(got) == 3


def test_delta_ann_index_optimize_preserves_serving(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.delta import optimize_delta_table

    path = str(tmp_path / "didx2")
    AI.build_ivf_index(
        spark.createDataFrame(
            _vec_rows(40, seed=1), "vec_id bigint, embedding array<double>"
        ),
        path,
        n_cells=4,
    )
    for s in (2, 3):
        AI.append_to_ivf_index(
            spark.createDataFrame(
                _vec_rows(10, seed=s), "vec_id bigint, embedding array<double>"
            ),
            path,
        )
    queries = spark.createDataFrame(
        [(9, _vec_rows(1, seed=7)[0][1])], "qid bigint, qv array<double>"
    )
    before = [
        (r.qid, r.vec_id, r.rn)
        for r in AI.query_ivf_index(spark, queries, path, k=5, nprobe=3).collect()
    ]
    optimize_delta_table(spark, path)
    after = [
        (r.qid, r.vec_id, r.rn)
        for r in AI.query_ivf_index(spark, queries, path, k=5, nprobe=3).collect()
    ]
    assert after == before
