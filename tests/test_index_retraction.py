"""Retraction propagates to the persisted indexes through the ORDINARY
table verbs — the GDPR/takedown flow: delete a document's rows from the
corpus AND its signature/vector rows from the indexes, and the gates
stop matching against it. No index-specific machinery needed: the index
IS a table, so deletion vectors (Delta) and equality deletes (Iceberg)
apply verbatim."""

from __future__ import annotations

import numpy as np

from mysoftware_nocnetintel_spark.operators import ann_index as AI
from mysoftware_nocnetintel_spark.operators import dedup_index as DI

TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "pyspark structured streaming processes unbounded data in micro batches"),
    (2, "document scheduled for takedown mentioning sensitive material"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_delta_dedup_index_retraction_stops_gating(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.delta import delete_delta_rows

    path = str(tmp_path / "didx")
    DI.build_minhash_index(_docs(spark, TEXTS), path)
    batch = _docs(spark, [(100, TEXTS[2][1])])  # re-submission of the doc
    before = {
        (r.doc, r.dup_of)
        for r in DI.dedup_against_minhash_index(spark, batch, path).collect()
    }
    assert (100, 2) in before  # gated while the signature is registered
    delete_delta_rows(spark, path, "doc = 2")  # takedown: MOR deletion vector
    after = {
        (r.doc, r.dup_of)
        for r in DI.dedup_against_minhash_index(spark, batch, path).collect()
    }
    assert (100, 2) not in after
    assert {d for d, _ in after} - {100} == set()  # nothing else changed


def test_iceberg_ann_index_retraction_stops_serving(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_equality_deletes,
    )

    path = str(tmp_path / "aidx")
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 8))
    rows = [
        (i, (centers[i % 4] + 0.05 * rng.normal(size=8)).tolist())
        for i in range(40)
    ]
    AI.build_ivf_index(
        spark.createDataFrame(rows, "vec_id bigint, embedding array<double>"),
        path,
        n_cells=4,
        table_format="iceberg",
    )
    q = spark.createDataFrame(
        [(9, rows[7][1])], "qid bigint, qv array<double>"
    )
    before = AI.query_ivf_index(spark, q, path, k=1, nprobe=2).collect()
    assert before[0].vec_id == 7  # self-hit while the vector is indexed
    write_iceberg_equality_deletes(  # takedown: equality delete on the key
        spark, path, spark.createDataFrame([(7,)], "vec_id bigint")
    )
    after = AI.query_ivf_index(spark, q, path, k=1, nprobe=2).collect()
    assert after and after[0].vec_id != 7  # served from the survivors
