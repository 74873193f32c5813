"""Perceptual image near-dup tier (round 8 — the image sibling of the
SimHash text tier): dHash/aHash hashing, planted-near-duplicate recall
through the Hamming-band join, and the plan-shape guarantee that pair
generation is a banded equi-join, never an all-pairs product."""

from __future__ import annotations

import numpy as np
import pytest

from mysoftware_nocnetintel_spark.operators import multimodal as MM


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _img(seed: int, size: int = 16) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def test_dhash_invariant_under_brightness_shift():
    base = _img(1)
    shifted = np.clip(base.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    h1 = MM.dhash64_bytes(MM.png_encode(base))
    h2 = MM.dhash64_bytes(MM.png_encode(shifted))
    # gradients survive a uniform shift except where clipping flips a
    # comparison — a handful of bits at most
    assert _ham(h1, h2) <= 4


def test_dhash_separates_unrelated_images():
    dists = []
    for s in range(10):
        h1 = MM.dhash64_bytes(MM.png_encode(_img(s)))
        h2 = MM.dhash64_bytes(MM.png_encode(_img(s + 100)))
        dists.append(_ham(h1, h2))
    # random 64-bit-ish signatures: expected hamming ~32
    assert min(dists) > 10


def test_ahash_detects_near_and_rejects_far():
    base = _img(3)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]  # one-pixel flip
    far = _img(4)
    hb = MM.ahash64_bytes(MM.png_encode(base))
    hn = MM.ahash64_bytes(MM.png_encode(near))
    hf = MM.ahash64_bytes(MM.png_encode(far))
    assert _ham(hb, hn) <= 3
    assert _ham(hb, hf) > 10


def test_hash_none_for_undecodable_payload():
    assert MM.dhash64_bytes(b"not a png at all") is None
    assert MM.ahash64_bytes(b"\x00" * 64) is None


def test_image_hashes_schema_and_null_passthrough(spark):
    rows = [(1, MM.png_encode(_img(1))), (2, b"garbage"), (3, None)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    got = {r.id: r for r in MM.image_hashes(df).collect()}
    assert got[1].dhash is not None and got[1].ahash is not None
    assert got[2].dhash is None and got[3].dhash is None
    assert "media" not in MM.image_hashes(df).columns  # hash-then-shed


def test_planted_near_duplicate_recall(spark):
    """20 base images + a brightness-shifted re-encode of each: the
    banded join must recover >= 80% of the planted pairs at hamming<=3
    and pair no unrelated images below that radius (seeded images are
    ~32 bits apart)."""
    base_rows = [(i, MM.png_encode(_img(i))) for i in range(20)]
    near_rows = [
        (
            i + 1000,
            MM.png_encode(
                np.clip(_img(i).astype(np.int32) + 8, 0, 255).astype(
                    np.uint8
                )
            ),
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        base_rows + near_rows, "id bigint, media binary"
    )
    pairs = MM.image_near_dup_pairs(df, "id", "media", max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 1000) for i in range(20)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.8, f"recall {recall}: {sorted(planted - got)}"
    assert got <= planted, f"false pairs: {sorted(got - planted)}"


def test_perturb_png_media_changes_bytes_not_perception(spark):
    rows = [(i, MM.png_encode(_img(i))) for i in range(5)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    orig = {r.id: bytes(r.media) for r in df.collect()}
    pert = {r.id: bytes(r.media) for r in MM.perturb_png_media(df).collect()}
    for i in orig:
        assert orig[i] != pert[i]  # exact-byte dedup misses it
        d = _ham(MM.dhash64_bytes(orig[i]), MM.dhash64_bytes(pert[i]))
        assert d <= 3  # perceptual hash pairs it


def test_image_near_dup_plan_has_no_cartesian(spark):
    rows = [(i, MM.png_encode(_img(i))) for i in range(4)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    plan = MM.image_near_dup_pairs(df, "id", "media")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
