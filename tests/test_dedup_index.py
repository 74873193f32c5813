"""Incremental near-dup gating against the persisted MinHash signature
index (operators/dedup_index.py): build/append/query lifecycle, banding
bit-compatibility with the batch LSH operator, signature-agreement
verification, param pinning, idempotent appends, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators import dedup_index as DI
from mysoftware_nocnetintel_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "pyspark structured streaming processes unbounded data in micro batches",
    "minhash signatures estimate jaccard similarity between shingle sets",
    "delta tables commit atomically through the transaction log protocol",
    "completely unrelated sentence about cooking pasta with fresh basil",
]


def _near(s: str) -> str:
    """A near-duplicate: drop the last word (high shingle overlap)."""
    return s.rsplit(" ", 1)[0]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_build_query_lifecycle_finds_index_and_batch_dups(spark, tmp_path):
    path = str(tmp_path / "idx")
    corpus = _docs(spark, list(enumerate(BASE)))
    DI.build_minhash_index(corpus, path)
    # batch: one near-dup of corpus doc 0, one exact dup of corpus doc 2,
    # two copies of a novel text (within-batch dup), one novel text
    batch = _docs(
        spark,
        [
            (100, _near(BASE[0])),
            (101, BASE[2]),
            (102, "brand new document text that matches nothing else at all"),
            (103, "brand new document text that matches nothing else at all"),
            (104, "another genuinely novel document mentioning quantum ducks"),
        ],
    )
    got = DI.dedup_against_minhash_index(spark, batch, path, threshold=0.5)
    rows = {(r.doc, r.dup_of, r.source) for r in got.collect()}
    assert (100, 0, "index") in rows
    assert (101, 2, "index") in rows
    assert (103, 102, "batch") in rows  # keep-one: lower id survives
    docs_flagged = {r[0] for r in rows}
    assert 102 not in docs_flagged and 104 not in docs_flagged
    # exact dup agrees on every position
    ej = {(r.doc, r.dup_of): r.est_jaccard for r in got.collect()}
    assert ej[(101, 2)] == 1.0
    assert 0.5 <= ej[(100, 0)] <= 1.0


def test_banding_is_bit_compatible_with_batch_lsh(spark):
    """An index built today must bucket identically to the batch operator:
    sig_band_rows over stored signatures == the banding inside
    lsh_candidate_pairs. Compare candidate sets on the same corpus."""
    rows = list(enumerate(BASE)) + [(50 + i, _near(t)) for i, t in enumerate(BASE)]
    df = _docs(spark, rows)
    via_batch = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(df, "doc_id", "text").collect()
    }
    sigs = minhash_signatures(df, "doc_id", "text", 32, 3)
    banded = DI.sig_band_rows(sigs, bands=8, rows_per_band=4)
    a = banded.select(F.col("doc").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("doc").alias("id_b"), "band", "bucket")
    via_index = {
        (r.id_a, r.id_b)
        for r in a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    assert via_batch == via_index


def test_params_pinned_and_validated(spark, tmp_path):
    path = str(tmp_path / "idx")
    DI.build_minhash_index(
        _docs(spark, list(enumerate(BASE))), path, num_hashes=16, bands=4
    )
    assert DI.read_index_params(path) == {
        "num_hashes": 16,
        "bands": 4,
        "shingle_k": 3,
        "table_format": "delta",
    }
    # rebuild refused
    with pytest.raises(ValueError, match="already exists"):
        DI.build_minhash_index(_docs(spark, list(enumerate(BASE))), path)
    # append + query run under the pinned space (16 hashes, not the default)
    DI.append_to_minhash_index(_docs(spark, [(10, BASE[0] + " extra")]), path)
    got = DI.dedup_against_minhash_index(
        spark, _docs(spark, [(200, BASE[0])]), path, threshold=0.5
    )
    assert {(r.doc, r.dup_of) for r in got.collect()} >= {(200, 0)}


def test_bad_band_geometry_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="divisible"):
        DI.build_minhash_index(
            _docs(spark, list(enumerate(BASE))),
            str(tmp_path / "idx"),
            num_hashes=32,
            bands=7,
        )


def test_append_txn_idempotent(spark, tmp_path):
    path = str(tmp_path / "idx")
    DI.build_minhash_index(_docs(spark, list(enumerate(BASE))), path)
    batch = _docs(spark, [(10, "some novel text appended exactly once")])
    v1 = DI.append_to_minhash_index(batch, path, txn=("ingest", 1))
    v2 = DI.append_to_minhash_index(batch, path, txn=("ingest", 1))  # replay
    assert v2 == v1  # skipped, not re-committed
    from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot

    n = read_delta_snapshot(spark, path).filter(F.col("doc") == 10).count()
    assert n == 1


def test_zero_shingle_docs_produce_no_index_rows(spark, tmp_path):
    path = str(tmp_path / "idx")
    DI.build_minhash_index(
        _docs(spark, [(0, BASE[0]), (1, "a b")]), path  # 1: too short for k=3
    )
    from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot

    assert {r.doc for r in read_delta_snapshot(spark, path).collect()} == {0}


def test_query_plan_has_no_cartesian(spark, tmp_path):
    path = str(tmp_path / "idx")
    DI.build_minhash_index(_docs(spark, list(enumerate(BASE))), path)
    got = DI.dedup_against_minhash_index(
        spark, _docs(spark, [(100, BASE[0])]), path
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_iceberg_format_lifecycle(spark, tmp_path):
    """The index rides Iceberg identically: build, pinned-param append
    with txn idempotency, and gating verdicts equal to the Delta build."""
    ice, dlt = str(tmp_path / "ice"), str(tmp_path / "dlt")
    corpus = _docs(spark, list(enumerate(BASE)))
    DI.build_minhash_index(corpus, ice, table_format="iceberg")
    DI.build_minhash_index(corpus, dlt, table_format="delta")
    assert DI.read_index_params(ice)["table_format"] == "iceberg"
    batch = _docs(
        spark,
        [(100, _near(BASE[0])), (101, "a wholly novel iceberg-side text")],
    )
    got_i = {
        (r.doc, r.dup_of, r.source, round(r.est_jaccard, 6))
        for r in DI.dedup_against_minhash_index(
            spark, batch, ice, threshold=0.5
        ).collect()
    }
    got_d = {
        (r.doc, r.dup_of, r.source, round(r.est_jaccard, 6))
        for r in DI.dedup_against_minhash_index(
            spark, batch, dlt, threshold=0.5
        ).collect()
    }
    assert got_i == got_d and (100, 0, "index", 1.0) not in got_i  # near, not exact
    assert {r[0] for r in got_i} == {100}
    # idempotent append under the pinned format
    add = _docs(spark, [(7, "registered exactly once on the iceberg side")])
    v1 = DI.append_to_minhash_index(add, ice, txn=("ing", 3))
    v2 = DI.append_to_minhash_index(add, ice, txn=("ing", 3))
    assert v1 == v2
    from mysoftware_nocnetintel_spark.sources.readers import (
        read_iceberg_snapshot,
    )

    assert read_iceberg_snapshot(spark, ice).filter("doc = 7").count() == 1
