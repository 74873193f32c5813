"""Persisted Hamming signature index (operators/hamming_index.py): one
incremental gate for every 64-bit signature family — lifecycle with image
dHashes and audio fingerprints, family pinning, banding compatibility
with the batch operator, idempotent appends, and plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators import audio as AU
from mysoftware_nocnetintel_spark.operators import hamming_index as HI
from mysoftware_nocnetintel_spark.operators import multimodal as MM
from mysoftware_nocnetintel_spark.operators.dedup import hamming_band_pairs


def _img(seed, size=16):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def _img_sigs(spark, rows):
    df = spark.createDataFrame(rows, "doc bigint, media binary")
    return (
        MM.image_hashes(df, "media")
        .where(F.col("dhash").isNotNull())
        .select("doc", F.col("dhash").alias("sig"))
    )


def test_image_lifecycle_gates_neardups(spark, tmp_path):
    path = str(tmp_path / "hidx")
    corpus = _img_sigs(spark, [(i, MM.png_encode(_img(i))) for i in range(10)])
    HI.build_hamming_index(corpus, path, family="dhash")
    # batch: a brightness-shifted near-dup of img 3 + a novel image + a
    # within-batch duplicate pair
    shifted = np.clip(_img(3).astype(np.int32) + 8, 0, 255).astype(np.uint8)
    batch = _img_sigs(
        spark,
        [
            (100, MM.png_encode(shifted)),
            (101, MM.png_encode(_img(555))),
            (102, MM.png_encode(_img(556))),
            (103, MM.png_encode(_img(556))),
        ],
    )
    got = {
        (r.doc, r.dup_of, r.source)
        for r in HI.dedup_against_hamming_index(
            spark, batch, path, family="dhash"
        ).collect()
    }
    assert (100, 3, "index") in got
    assert (103, 102, "batch") in got  # keep-one: 102 survives
    assert {d for d, _, _ in got} == {100, 103}  # 101/102 novel


def test_audio_family_same_machinery(spark, tmp_path):
    path = str(tmp_path / "hidx")
    clips = [(i, AU.wav_encode(AU._synth_samples(f"c{i}", 4000, 0.5), 4000))
             for i in range(8)]
    df = spark.createDataFrame(clips, "doc bigint, media binary")
    sigs = (
        AU.audio_hashes(df, "media")
        .where(F.col("afp").isNotNull())
        .select("doc", F.col("afp").alias("sig"))
    )
    HI.build_hamming_index(sigs, path, family="afp")
    # gain-scaled re-encode of clip 2: different bytes, hamming ~0
    arr, rate = AU.wav_decode(clips[2][1])
    quiet = AU.wav_encode((arr[:, 0].astype(np.int64) * 0.6).astype(np.int16), rate)
    batch = spark.createDataFrame([(200, quiet)], "doc bigint, media binary")
    bsigs = (
        AU.audio_hashes(batch, "media")
        .where(F.col("afp").isNotNull())
        .select("doc", F.col("afp").alias("sig"))
    )
    got = {
        (r.doc, r.dup_of)
        for r in HI.dedup_against_hamming_index(
            spark, bsigs, path, family="afp"
        ).collect()
    }
    assert (200, 2) in got


def test_family_pinning_refuses_mixing(spark, tmp_path):
    path = str(tmp_path / "hidx")
    corpus = _img_sigs(spark, [(1, MM.png_encode(_img(1)))])
    HI.build_hamming_index(corpus, path, family="dhash")
    with pytest.raises(ValueError, match="holds 'dhash'"):
        HI.append_to_hamming_index(corpus, path, family="afp")
    with pytest.raises(ValueError, match="holds 'dhash'"):
        HI.dedup_against_hamming_index(spark, corpus, path, family="simhash")
    with pytest.raises(ValueError, match="already exists"):
        HI.build_hamming_index(corpus, path, family="dhash")
    with pytest.raises(ValueError, match="hamming <= 3"):
        HI.dedup_against_hamming_index(
            spark, corpus, path, family="dhash", max_hamming=5
        )


def test_index_gate_matches_batch_operator(spark, tmp_path):
    """Gating batch-vs-index must find exactly the cross pairs the batch
    operator finds on the union corpus (banding bit-compatibility)."""
    path = str(tmp_path / "hidx")
    corpus_rows = [(i, MM.png_encode(_img(i))) for i in range(12)]
    batch_rows = [
        (100 + i, MM.png_encode(
            np.clip(_img(i).astype(np.int32) + 8, 0, 255).astype(np.uint8)
        ))
        for i in range(12)
    ]
    corpus = _img_sigs(spark, corpus_rows)
    batch = _img_sigs(spark, batch_rows)
    HI.build_hamming_index(corpus, path, family="dhash")
    via_index = {
        (r.doc, r.dup_of)
        for r in HI.dedup_against_hamming_index(
            spark, batch, path, family="dhash"
        ).collect()
        if r.source == "index"
    }
    union_sigs = corpus.unionByName(batch)
    via_batch = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b))
        for r in hamming_band_pairs(union_sigs, "doc", "sig", 3).collect()
        if (r.id_a < 100) != (r.id_b < 100)  # cross pairs only
    }
    assert via_index == via_batch


def test_append_txn_idempotent(spark, tmp_path):
    path = str(tmp_path / "hidx")
    HI.build_hamming_index(
        _img_sigs(spark, [(1, MM.png_encode(_img(1)))]), path, family="dhash"
    )
    add = _img_sigs(spark, [(2, MM.png_encode(_img(2)))])
    v1 = HI.append_to_hamming_index(add, path, family="dhash", txn=("h", 0))
    v2 = HI.append_to_hamming_index(add, path, family="dhash", txn=("h", 0))
    assert v1 == v2
    from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot

    assert read_delta_snapshot(spark, path).filter("doc = 2").count() == 1


def test_gate_plan_has_no_cartesian(spark, tmp_path):
    path = str(tmp_path / "hidx")
    sigs = _img_sigs(spark, [(i, MM.png_encode(_img(i))) for i in range(4)])
    HI.build_hamming_index(sigs, path, family="dhash")
    plan = HI.dedup_against_hamming_index(
        spark, sigs, path, family="dhash"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
