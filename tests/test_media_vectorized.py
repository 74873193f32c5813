"""Bit-exactness pins for the r12 batch-vectorized media kernels.

The Arrow media stages (image dHash/aHash, audio spectral fingerprint,
video mean-frame hash) were rewritten to run their numpy math over whole
batch stacks instead of image-at-a-time (guide §4.2 — per-call overhead
dominated the profile). These tests pin the optimization's correctness
contract: every batch kernel produces BIT-IDENTICAL results to its scalar
reference on fuzzed inputs, so the rows-only registry queries built on
them (q147/q148/q149/q150/q151/q118) compute exactly what they did before.
No SparkSession needed — the kernels are plain numpy.
"""

from __future__ import annotations

import numpy as np
import pytest

from mysoftware_nocnetintel_spark.operators import audio as AU
from mysoftware_nocnetintel_spark.operators import multimodal as MM
from mysoftware_nocnetintel_spark.operators import video as VD


def test_area_resize_and_pack_batch_bit_identical():
    rng = np.random.RandomState(7)
    for _ in range(120):
        H, W = rng.randint(1, 40), rng.randint(1, 40)
        ch = rng.choice([1, 3, 4])
        n = rng.randint(1, 9)
        imgs = [
            rng.randint(0, 256, size=(H, W, ch)).astype(np.uint8)
            for _ in range(n)
        ]
        if ch == 1:
            imgs = [im[:, :, 0] for im in imgs]
        grays = [MM._to_gray(im) for im in imgs]
        G = np.stack(grays)
        D = MM._area_resize_batch(G, 8, 9)
        A = MM._area_resize_batch(G, 8, 8)
        am = A.reshape(n, 64).mean(axis=1)
        dv = MM._pack_bits_batch((D[:, :, :-1] < D[:, :, 1:]).reshape(n, 64))
        av = MM._pack_bits_batch((A > am[:, None, None]).reshape(n, 64))
        for j, g in enumerate(grays):
            d = MM._area_resize(g, 8, 9)
            a = MM._area_resize(g, 8, 8)
            assert (d == D[j]).all() and (a == A[j]).all()
            assert a.mean() == am[j]
            assert MM._pack_bits(d[:, :-1] < d[:, 1:]) == int(dv[j])
            assert MM._pack_bits(a > a.mean()) == int(av[j])


def test_pack_bits_batch_sign_and_order():
    # bit 63 set → negative int64 (two's complement), LSB-first order
    bits = np.zeros((3, 64), dtype=bool)
    bits[0, 0] = True
    bits[1, 63] = True
    bits[2, :] = True
    vals = MM._pack_bits_batch(bits)
    assert int(vals[0]) == 1
    assert int(vals[1]) == -(2**63)
    assert int(vals[2]) == -1
    for j in range(3):
        assert MM._pack_bits(bits[j]) == int(vals[j])


def test_png_decode_fast_path_round_trip_and_writable():
    rng = np.random.RandomState(1)
    for _ in range(60):
        h, w = rng.randint(1, 30), rng.randint(1, 30)
        arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        dec = MM.png_decode(MM.png_encode(arr))
        assert (dec == arr).all()
        assert dec.flags.writeable  # the fast path must copy, not view


def test_afp64_batch_bit_identical():
    rng = np.random.RandomState(3)
    for _ in range(60):
        n = rng.randint(8, 5000)
        B = rng.randint(1, 8)
        X = (rng.randn(B, n) * rng.uniform(0.001, 1.0)).astype(np.float64)
        vals = AU.afp64_samples_batch(X)
        for j in range(B):
            assert AU.afp64_samples(X[j]) == int(vals[j])


def test_split_bounds_matches_array_split():
    rng = np.random.RandomState(11)
    for _ in range(200):
        total = rng.randint(1, 500)
        parts = rng.randint(1, 17)
        x = np.arange(total)
        ref = [(int(s[0]), int(s[-1]) + 1) if len(s) else None
               for s in np.array_split(x, parts)]
        got = AU._split_bounds(total, parts)
        for (lo, hi), r in zip(got, ref):
            if r is None:
                assert lo == hi
            else:
                assert (lo, hi) == r


def test_wav_fast_parse_matches_wave_module():
    rng = np.random.RandomState(9)
    for _ in range(60):
        n = rng.randint(8, 4000)
        ch = int(rng.choice([1, 2]))
        rate = int(rng.choice([4000, 8000, 44100]))
        samples = (rng.randn(n, ch) * 10000).astype(np.int16)
        data = AU.wav_encode(samples, rate)
        fast = AU._wav_fast_parse(data)
        assert fast is not None
        assert fast[1] == rate and (fast[0] == samples).all()
    # non-canonical payloads defer to the stdlib parser (None, not wrong)
    assert AU._wav_fast_parse(b"garbage") is None
    assert AU._wav_fast_parse(b"RIFF\x00\x00\x00\x00WAVEjunk") is None
    data = AU.wav_encode(np.zeros((100, 1), dtype=np.int16), 4000)
    assert AU._wav_fast_parse(data[:-10]) is None  # truncated data chunk


def test_audio_hashes_group_math_matches_scalar_fp():
    wavs = [
        AU.wav_encode(AU._synth_samples(f"clip {i}", 4000, 0.5), 4000)
        for i in range(50)
    ]
    by_shape: dict = {}
    for i, w in enumerate(wavs):
        dec = AU.audio_decode(w)
        idxs, arrs = by_shape.setdefault(dec[0].shape, ([], []))
        idxs.append(i)
        arrs.append(dec[0])
    got = {}
    for idxs, arrs in by_shape.values():
        stacked = np.stack(arrs)
        if stacked.shape[2] == 1:
            X = stacked[:, :, 0].astype(np.float64) / 32768.0
        else:
            X = stacked.astype(np.float64).mean(axis=2) / 32768.0
        vals = AU.afp64_samples_batch(X)
        for j, i in enumerate(idxs):
            got[i] = int(vals[j])
    for i, w in enumerate(wavs):
        assert AU.afp64_bytes(w) == got[i]


def test_wav_encode_matches_stdlib_wave_writer():
    import io
    import wave

    def ref(samples, rate):
        arr = np.asarray(samples, dtype=np.int16)
        if arr.ndim == 1:
            arr = arr[:, None]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(arr.shape[1])
            w.setsampwidth(2)
            w.setframerate(int(rate))
            w.writeframes(arr.astype("<i2").tobytes())
        return buf.getvalue()

    rng = np.random.RandomState(2)
    for _ in range(40):
        n, ch = rng.randint(1, 3000), int(rng.choice([1, 2, 3]))
        rate = int(rng.choice([4000, 8000, 44100]))
        s = (rng.randn(n, ch) * 9000).astype(np.int16)
        assert AU.wav_encode(s, rate) == ref(s, rate)
        assert AU.wav_encode(s[:, 0], rate) == ref(s[:, 0], rate)


def test_png_encode_matches_per_row_reference():
    import struct
    import zlib

    def ref(arr):
        def chunk(tag, body):
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        h, w, _ = arr.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
        return (
            MM._PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(4)
    for _ in range(40):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert MM.png_encode(arr) == ref(arr)


def test_synth_samples_batch_bit_identical():
    keys = [f"clip {i} text" for i in range(60)]
    for rate, seconds in [(4000, 0.5), (8000, 0.25)]:
        batch = AU._synth_samples_batch(keys, rate, seconds)
        for j, k in enumerate(keys):
            assert (AU._synth_samples(k, rate, seconds) == batch[j]).all()


def test_synth_frames_crossfade_bit_identical():
    def ref(key, n_frames, size):
        a = VD._seed_img(key + "/a", size).astype(np.float64)
        b = VD._seed_img(key + "/b", size).astype(np.float64)
        out = []
        for k in range(n_frames):
            t = k / max(1, n_frames - 1)
            out.append(((1 - t) * a + t * b).astype(np.uint8))
        return out

    for i, (nf, size) in enumerate([(1, 8), (4, 16), (12, 16), (20, 8)]):
        got = VD._synth_frames(f"key{i}", nf, size)
        exp = ref(f"key{i}", nf, size)
        assert len(got) == len(exp)
        for r, g in zip(exp, got):
            assert (r == g).all()


def test_video_batch_tail_matches_vhash64_bytes():
    rng = np.random.RandomState(5)
    for trial in range(12):
        size = int(rng.choice([8, 16, 24]))
        nf = int(rng.choice([4, 12, 20]))
        clips = [
            VD.vpng_encode(VD._synth_frames(f"k{trial}-{i}", nf, size), fps=24.0)
            for i in range(5)
        ]
        means = []
        for c in clips:
            frames, _n, _f = VD.video_sampled_frames(c, 4)
            acc, cnt = None, 0
            for _i, img in frames:
                g = VD._to_gray(img).astype(np.float64)
                acc = g if acc is None else acc + g
                cnt += 1
            means.append(acc / cnt)
        D = MM._area_resize_batch(np.stack(means), 8, 9)
        vals = MM._pack_bits_batch(
            (D[:, :, :-1] < D[:, :, 1:]).reshape(len(clips), 64)
        )
        for j, c in enumerate(clips):
            assert VD.vhash64_bytes(c, 4) == int(vals[j])


def test_wav_fast_parse_rejects_understated_riff_size():
    """r13 (r12 advisor): a payload whose declared RIFF size understates
    the real chunk extents must NOT decode via the fast path — the stdlib
    fallback bounds inner reads by the outer size and fails it, and both
    paths must give the same verdict for the same malformed bytes."""
    import struct

    import io
    import wave

    data = AU.wav_encode(np.ones((200, 1), dtype=np.int16), 8000)
    assert AU._wav_fast_parse(data) is not None  # canonical: accepted
    # understate the container size so the data chunk extends past it
    bad = data[:4] + struct.pack("<I", 40) + data[8:]
    assert AU._wav_fast_parse(bad) is None
    # the stdlib is the arbiter for size-inconsistent payloads: it bounds
    # the data chunk by the declared container size and TRUNCATES — the
    # whole decode must return that verdict, not the fast path's full
    # 200-frame read (the r12 divergence)
    with wave.open(io.BytesIO(bad), "rb") as w:
        stdlib_raw = w.readframes(w.getnframes())
    got = AU.wav_decode(bad)
    assert got is not None
    assert got[0].shape[0] == len(stdlib_raw) // 2 < 200
    assert got[0].astype("<i2").tobytes() == stdlib_raw
    # a size that exactly covers the chunks stays accepted
    good = data[:4] + struct.pack("<I", len(data) - 8) + data[8:]
    parsed = AU._wav_fast_parse(good)
    assert parsed is not None and parsed[0].shape == (200, 1)


def test_audio_hashes_chunked_groups_bit_identical():
    """r13: the per-group clip stacks are chunked (memory bound) and the
    mono path fills the float64 stack directly — both must be
    bit-identical to the scalar fingerprint, across a group LARGER than
    the chunk size."""
    old_chunk = AU._GROUP_CHUNK_CLIPS
    AU._GROUP_CHUNK_CLIPS = 7  # force many chunks without a 256-clip corpus
    try:
        wavs = [
            AU.wav_encode(AU._synth_samples(f"chunk clip {i}", 4000, 0.1), 4000)
            for i in range(23)
        ]
        # drive the stage body exactly as audio_hashes does
        import pandas as pd

        pdf = pd.DataFrame({"doc_id": range(len(wavs)), "media": wavs})
        out = {}
        by_shape: dict = {}
        for i, p in enumerate(pdf["media"]):
            dec = AU.audio_decode(bytes(p))
            idxs, arrs = by_shape.setdefault(dec[0].shape, ([], []))
            idxs.append(i)
            arrs.append(dec[0])
        for idxs, arrs in by_shape.values():
            for clo in range(0, len(idxs), AU._GROUP_CHUNK_CLIPS):
                c_idxs = idxs[clo: clo + AU._GROUP_CHUNK_CLIPS]
                c_arrs = arrs[clo: clo + AU._GROUP_CHUNK_CLIPS]
                X = np.empty((len(c_arrs), c_arrs[0].shape[0]), np.float64)
                for j, a in enumerate(c_arrs):
                    X[j] = a[:, 0]
                X /= 32768.0
                vals = AU.afp64_samples_batch(X)
                for j, i in enumerate(c_idxs):
                    out[i] = int(vals[j])
    finally:
        AU._GROUP_CHUNK_CLIPS = old_chunk
    for i, w in enumerate(wavs):
        assert AU.afp64_bytes(w) == out[i]


def test_image_hashes_chunked_groups_bit_identical(monkeypatch):
    """r13: image/video group chunking must not move a single hash bit —
    compare the chunked batch tail against the scalar dhash/ahash."""
    from mysoftware_nocnetintel_spark.operators.multimodal import (
        ahash64_bytes,
        dhash64_bytes,
    )

    monkeypatch.setattr(MM, "_GROUP_CHUNK_IMGS", 3)
    pngs = [
        MM.png_encode(VD._seed_img(f"img {i}", 16)) for i in range(10)
    ]
    grays = [MM._to_gray(MM.decode_image(p, "png")) for p in pngs]
    got_d, got_a = {}, {}
    idxs = list(range(len(pngs)))
    for clo in range(0, len(idxs), MM._GROUP_CHUNK_IMGS):
        c_idxs = idxs[clo: clo + MM._GROUP_CHUNK_IMGS]
        g = np.stack([grays[i] for i in c_idxs])
        d = MM._area_resize_batch(g, 8, 9)
        a = MM._area_resize_batch(g, 8, 8)
        dvals = MM._pack_bits_batch(
            (d[:, :, :-1] < d[:, :, 1:]).reshape(len(c_idxs), 64)
        )
        amean = a.reshape(len(c_idxs), 64).mean(axis=1)
        avals = MM._pack_bits_batch(
            (a > amean[:, None, None]).reshape(len(c_idxs), 64)
        )
        for j, i in enumerate(c_idxs):
            got_d[i] = int(dvals[j])
            got_a[i] = int(avals[j])
    for i, p in enumerate(pngs):
        assert dhash64_bytes(p) == got_d[i]
        assert ahash64_bytes(p) == got_a[i]
