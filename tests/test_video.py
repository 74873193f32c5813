"""Video media tier (round 8 — completes the image/audio/video triple):
container codec round-trip with exact per-frame decode, in-stage frame
sampling (no payload replication), mean-frame dHash signature invariance,
planted-near-duplicate recall through the shared Hamming-band join, and
the plan-shape guarantee that pair generation is a banded equi-join."""

from __future__ import annotations

import numpy as np

from mysoftware_nocnetintel_spark.operators import video as V

N_FRAMES = 12
SIZE = 8


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _clip(key: str, n_frames: int = N_FRAMES) -> bytes:
    return V.vpng_encode(V._synth_frames(key, n_frames, SIZE), fps=24.0)


def _perturb_bytes(data: bytes, delta: int = 8) -> bytes:
    head = V.vpng_header(data)
    frames = [
        np.clip(
            V.vpng_decode_frame(data, i).astype(np.int32) + delta, 0, 255
        ).astype(np.uint8)
        for i in range(head[0])
    ]
    return V.vpng_encode(frames, head[1])


def test_container_round_trip_every_frame_exact():
    frames = V._synth_frames("rt", N_FRAMES, SIZE)
    blob = V.vpng_encode(frames, fps=23.98)
    n, fps = V.vpng_header(blob)
    assert n == N_FRAMES and abs(fps - 23.98) < 0.005
    for i, fr in enumerate(frames):
        assert np.array_equal(V.vpng_decode_frame(blob, i), fr)


def test_container_rejects_garbage_and_truncation():
    blob = _clip("trunc")
    assert V.vpng_header(b"not a container") is None
    assert V.vpng_decode_frame(blob, N_FRAMES) is None  # out of range
    assert V.vpng_decode_frame(blob, -1) is None
    assert V.vpng_frame_offsets(blob[: len(blob) // 2]) is None  # truncated
    assert V.vhash64_bytes(b"junk") is None


def test_offsets_walk_touches_only_length_prefixes():
    blob = _clip("seek")
    offsets = V.vpng_frame_offsets(blob)
    assert len(offsets) == N_FRAMES
    # each frame slice is a standalone PNG (decodable independently)
    off, length = offsets[7]
    from mysoftware_nocnetintel_spark.operators.multimodal import png_decode

    assert png_decode(blob[off : off + length]).shape == (SIZE, SIZE, 3)


def test_vhash_invariant_under_brightness_shift():
    blob = _clip("bright")
    assert _ham(V.vhash64_bytes(blob), V.vhash64_bytes(_perturb_bytes(blob))) <= 3


def test_vhash_separates_unrelated_clips():
    sigs = [V.vhash64_bytes(_clip(f"sep-{i}")) for i in range(12)]
    dists = [
        _ham(sigs[i], sigs[j])
        for i in range(len(sigs))
        for j in range(i + 1, len(sigs))
    ]
    assert np.mean(dists) > 15
    assert min(dists) > 3


def test_sampled_frame_features_no_explode_and_values(spark):
    rows = [(1, _clip("feat")), (2, b"garbage"), (3, None)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    out = V.sampled_frame_features(df, every_n=4)
    assert "media" not in out.columns  # features-then-shed
    got = out.collect()
    # undecodable payloads emit zero rows; clip 1 emits frames 0,4,8
    assert sorted((r.id, r.frame_idx) for r in got) == [(1, 0), (1, 4), (1, 8)]
    by_idx = {r.frame_idx: r for r in got}
    assert abs(by_idx[4].ts_s - 4 / 24.0) < 1e-9
    # features match a direct decode of the same frame
    g = V._to_gray(V.vpng_decode_frame(_clip("feat"), 4)).astype(np.float64)
    assert abs(by_idx[4].brightness - g.mean()) < 1e-6
    assert abs(by_idx[4].contrast - g.std()) < 1e-6


def test_sampling_is_in_stage_no_payload_shuffle(spark):
    """The sampled-frame plan must be scan -> mapInPandas -> (nothing that
    shuffles the binary column): a single stage, no Exchange below the
    Arrow eval. Guards the no-explode-over-payload design decision."""
    rows = [(i, _clip(str(i))) for i in range(4)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    plan = V.sampled_frame_features(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Exchange" not in plan  # payload never shuffles
    assert "Generate" not in plan  # no explode over the payload


def test_video_hashes_schema_and_null_passthrough(spark):
    rows = [(1, _clip("x")), (2, b"garbage"), (3, None)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    out = V.video_hashes(df)
    assert "media" not in out.columns  # hash-then-shed
    got = {r.id: r.vhash for r in out.collect()}
    assert got[1] == V.vhash64_bytes(_clip("x"))
    assert got[2] is None and got[3] is None


def test_attach_vpng_media_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id bigint, text string"
    )
    got = {r.doc_id: (bytes(r.media), r.media_meta) for r in
           V.attach_vpng_media(df).collect()}
    assert got[1][0] == got[3][0]  # duplicate text -> byte-identical clip
    assert got[1][0] != got[2][0]
    meta = got[1][1]
    assert (meta["format"], meta["n_frames"], meta["width"]) == (
        "vpng", N_FRAMES, SIZE,
    )
    assert got[1][0] == _clip("alpha")  # pinned to the sha256 seed


def test_planted_near_duplicate_recall(spark):
    """20 base clips + an all-frames brightness-shifted re-encode of each:
    the banded join must recover >= 80% of the planted pairs at hamming<=3
    and pair no unrelated clips below that radius."""
    base_rows = [(i, _clip(f"recall-{i}")) for i in range(20)]
    near_rows = [(i + 1000, _perturb_bytes(b)) for i, b in base_rows]
    df = spark.createDataFrame(base_rows + near_rows, "id bigint, media binary")
    pairs = V.video_near_dup_pairs(df, "id", "media", max_hamming=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 1000) for i in range(20)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.8, f"recall {recall}: {sorted(planted - got)}"
    assert got <= planted, f"false pairs: {sorted(got - planted)}"


def test_perturb_vpng_media_changes_every_frame_not_signature(spark):
    rows = [(i, _clip(f"pvm-{i}")) for i in range(5)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    orig = {r.id: bytes(r.media) for r in df.collect()}
    pert = {r.id: bytes(r.media) for r in V.perturb_vpng_media(df).collect()}
    for i in orig:
        assert orig[i] != pert[i]  # exact-byte dedup misses it
        # every individual frame's bytes changed too
        o_off, p_off = V.vpng_frame_offsets(orig[i]), V.vpng_frame_offsets(pert[i])
        for (oo, ol), (po, pl) in zip(o_off, p_off):
            assert orig[i][oo:oo + ol] != pert[i][po:po + pl]
        assert _ham(V.vhash64_bytes(orig[i]), V.vhash64_bytes(pert[i])) <= 3


def test_video_near_dup_plan_has_no_cartesian(spark):
    rows = [(i, _clip(str(i))) for i in range(4)]
    df = spark.createDataFrame(rows, "id bigint, media binary")
    plan = V.video_near_dup_pairs(df, "id", "media")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sampled_frames_decode_lazily(monkeypatch):
    """Round-11 advisor fix: video_sampled_frames yields (idx, frame)
    one at a time — an abandoned iterator decodes only what was pulled,
    so peak memory inside the Arrow loop is O(frame), not
    O(n_frames/every_n) materialized RGB frames."""
    blob = _clip("lazy")
    calls = []
    real = V.vpng_decode_frame

    def counting(data, idx):
        calls.append(idx)
        return real(data, idx)

    monkeypatch.setattr(V, "vpng_decode_frame", counting)
    frames, n_frames, fps = V.video_sampled_frames(blob, 4)
    assert n_frames == N_FRAMES and fps == 24.0
    assert not isinstance(frames, (list, tuple))  # lazy, not materialized
    assert calls == []  # nothing decoded before the first pull
    idx0, img0 = next(iter(frames))
    assert idx0 == 0 and img0 is not None
    assert calls == [0]  # exactly the pulled frame
