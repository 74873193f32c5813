"""Hashing-trick text embeddings (functions/text.hashed_embedding +
operators/embed.hashed_embeddings): bit-identical HOF/pipeline parity,
unit normalization, determinism, cosine separation, and the zero-gram
contracts."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.functions.text import hashed_embedding
from mysoftware_nocnetintel_spark.operators.embed import hashed_embeddings

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "completely different text about quantum physics"),
    (3, "another unrelated sentence mentioning medieval castles"),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pipeline_and_hof_forms_bit_identical(spark):
    """Sign sums are small integers (exact doubles), so aggregation order
    cannot perturb them: the explode/groupBy pipeline must equal the
    per-row HOF expression BIT-FOR-BIT."""
    df = _df(spark)
    dist = {r.doc: list(r.embedding) for r in hashed_embeddings(df, dim=32).collect()}
    hof = {
        r.doc_id: list(r.e)
        for r in df.select("doc_id", hashed_embedding("text", 32).alias("e")).collect()
    }
    assert set(dist) == set(hof)
    for d in dist:
        assert dist[d] == hof[d]  # exact equality, not approx


def test_unit_norm_and_determinism(spark):
    df = _df(spark)
    a = {r.doc: np.array(r.embedding) for r in hashed_embeddings(df).collect()}
    b = {r.doc: np.array(r.embedding) for r in hashed_embeddings(df).collect()}
    for d in a:
        assert np.array_equal(a[d], b[d])
        assert abs(np.linalg.norm(a[d]) - 1.0) < 1e-12


def test_cosine_separates_neardup_from_unrelated(spark):
    e = {r.doc: np.array(r.embedding) for r in hashed_embeddings(_df(spark)).collect()}
    near = float(e[0] @ e[1])
    far = max(float(e[0] @ e[2]), float(e[0] @ e[3]))
    assert near > 0.8
    assert far < 0.4


def test_zero_gram_contracts(spark):
    df = _df(spark, [(0, "hi"), (1, "a text long enough for trigrams")])
    # pipeline form: doc 0 ("hi" has no trigram) produces NO row
    assert {r.doc for r in hashed_embeddings(df).collect()} == {1}
    # HOF form: zero vector
    got = {
        r.doc_id: list(r.e)
        for r in df.select("doc_id", hashed_embedding("text", 16).alias("e")).collect()
    }
    assert got[0] == [0.0] * 16


def test_dim_parameter(spark):
    df = _df(spark, ROWS[:1])
    for dim in (8, 128):
        (row,) = hashed_embeddings(df, dim=dim).collect()
        assert len(row.embedding) == dim


def test_feeds_persisted_ann_index_end_to_end(spark, tmp_path):
    """text -> hashed embedding -> persisted IVF index -> self retrieval:
    each unique text's own embedding must retrieve itself at rank 1."""
    from mysoftware_nocnetintel_spark.operators import ann_index as AI

    df = _df(spark)
    emb = hashed_embeddings(df).select(
        F.col("doc").alias("vec_id"), "embedding"
    )
    path = str(tmp_path / "sem")
    AI.build_ivf_index(emb, path, n_cells=2)
    queries = hashed_embeddings(df).select(
        F.col("doc").alias("qid"), F.col("embedding").alias("qv")
    )
    got = AI.query_ivf_index(spark, queries, path, k=1, nprobe=2).collect()
    assert {(r.qid, r.vec_id) for r in got} == {(i, i) for i in range(4)}
    assert all(r.score >= 1 - 1e-9 for r in got)
