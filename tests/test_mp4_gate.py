"""Round-10: MP4/ISO-BMFF intake behind the video capability gate — the
video twin of the JPEG/Pillow and MP3/miniaudio gates.
`video_sampled_frames` sniffs vpng for the stdlib path and ISO-BMFF
(size-prefixed `ftyp` box) for the PUBLIC PyAV decoder when importable;
without it, ISO-BMFF payloads take the documented passthrough — NULL
signatures, zero feature rows, ingestion gates pass the rows un-gated.
No hand-rolled MPEG-4 decoder anywhere.

PyAV is NOT in this container, so the gate is proved three ways:
(1) the without-decoder passthrough against the real import state,
(2) driver-side routing units against a faked `av` module (signature
    format-invariance vs the vpng path over the same pixels),
(3) an end-to-end Spark subprocess whose WORKERS import the fake av
    from PYTHONPATH — the Hamming ingestion gate BLOCKS planted MP4
    re-encodes of corpus videos and ADMITS novel clips.
A real-decoder recall test runs (skipif-gated) wherever PyAV exists.
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys
import textwrap
import zlib

import numpy as np
import pytest

from mysoftware_nocnetintel_spark.operators import video as VD

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _frames(key: str, n: int = 6, size: int = 16, shift: int = 0):
    base = VD._synth_frames(key, n, size)
    if not shift:
        return base
    return [
        np.clip(f.astype(np.int32) + shift, 0, 255).astype(np.uint8)
        for f in base
    ]


def _fake_mp4_bytes(frames, fps: float = 24.0) -> bytes:
    """ftyp-signed container only the fake av understands: a real ISO-BMFF
    ftyp box header, then (n_frames, fps_x100) + per-frame zlib RGB.
    Exercises the exact routing decision (ftyp sniff -> av branch)
    without a real codec."""
    head = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x00\x01"
    body = [struct.pack("<HH", len(frames), int(round(fps * 100)))]
    for f in frames:
        h, w, _ = f.shape
        blob = struct.pack("<HH", h, w) + zlib.compress(f.tobytes())
        body.append(struct.pack("<I", len(blob)))
        body.append(blob)
    return head + b"".join(body)


_FAKE_AV = textwrap.dedent(
    """
    import struct
    import zlib

    import numpy as np


    class _Frame:
        def __init__(self, arr):
            self._arr = arr

        def to_ndarray(self, format):
            assert format == "rgb24"
            return self._arr


    class _Stream:
        def __init__(self, fps, frames):
            self.average_rate = fps
            # real PyAV exposes the container-declared frame count here
            self.frames = frames


    class _Container:
        def __init__(self, data):
            if data[4:8] != b"ftyp":
                raise ValueError("fake av: not an ISO-BMFF payload")
            pos = 16
            n, fps_x100 = struct.unpack_from("<HH", data, pos)
            pos += 4
            self._frames = []
            for _ in range(n):
                (length,) = struct.unpack_from("<I", data, pos)
                pos += 4
                blob = data[pos:pos + length]
                pos += length
                h, w = struct.unpack_from("<HH", blob, 0)
                self._frames.append(
                    np.frombuffer(
                        zlib.decompress(blob[4:]), dtype=np.uint8
                    ).reshape(h, w, 3)
                )
            stream = _Stream(fps_x100 / 100.0, n)

            class _V:
                video = [stream]

            self.streams = _V()

        def decode(self, stream):
            for arr in self._frames:
                yield _Frame(arr)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False


    def open(fileobj):
        data = fileobj.read() if hasattr(fileobj, "read") else bytes(fileobj)
        return _Container(bytes(data))
    """
)


def test_isobmff_sniff():
    assert VD.sniff_isobmff(_fake_mp4_bytes(_frames("a")))
    assert VD.sniff_isobmff(
        struct.pack(">I", 20) + b"ftypmp42" + b"\x00" * 8
    )
    assert not VD.sniff_isobmff(VD.vpng_encode(_frames("a")))
    assert not VD.sniff_isobmff(b"short")
    assert not VD.sniff_isobmff(b"\x00" * 24)


@pytest.mark.skipif(
    VD._AV_PRESENT,
    reason="PyAV installed: the no-decoder passthrough is unreachable",
)
def test_mp4_without_decoder_is_null_passthrough():
    payload = _fake_mp4_bytes(_frames("a"))
    assert VD.sniff_isobmff(payload)
    assert VD.mp4_sampled_frames(payload, 4) is None
    assert VD.video_sampled_frames(payload, 4) is None
    assert VD.vhash64_bytes(payload) is None  # NULL signature downstream


def test_mp4_routes_through_gate(monkeypatch, tmp_path):
    """With (a fake) av present, an ftyp-sniffed payload decodes via the
    gate and signs bit-identically to the SAME frames through the vpng
    path — format invariance of the video signature."""
    import importlib.util

    spec_path = tmp_path / "fakeav.py"
    spec_path.write_text(_FAKE_AV)
    spec = importlib.util.spec_from_file_location("fakeav", spec_path)
    fake_av = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fake_av)

    monkeypatch.setattr(VD, "_AV_PRESENT", True)
    monkeypatch.setattr(VD, "_av", fake_av, raising=False)
    fr = _frames("route")
    dec = VD.video_sampled_frames(_fake_mp4_bytes(fr), 4)
    assert dec is not None
    frames, n_frames, fps = dec
    assert n_frames == len(fr) and fps == 24.0
    frames = list(frames)  # LAZY single-pass iterator (round-11 contract)
    assert [i for i, _ in frames] == list(range(0, len(fr), 4))
    assert all(
        np.array_equal(img, fr[i]) for i, img in frames
    )
    via_mp4 = VD.vhash64_bytes(_fake_mp4_bytes(fr))
    via_vpng = VD.vhash64_bytes(VD.vpng_encode(fr))
    assert via_mp4 == via_vpng is not None
    # corrupt ftyp-signed payloads degrade to None, never raise
    assert VD.video_sampled_frames(
        struct.pack(">I", 16) + b"ftypgarb" + b"\x00\xff" * 3, 4
    ) is None
    # vpng payloads never touch the av branch
    assert VD.video_sampled_frames(VD.vpng_encode(fr), 4) is not None


@pytest.mark.slow
def test_mp4_gate_end_to_end_spark(tmp_path):
    """Workers import the fake av from PYTHONPATH: planted fake-MP4
    re-encodes (brightness-shifted frames, the lossy-codec analogue) of
    corpus vpng videos are BLOCKED by the Hamming ingestion gate, novel
    MP4 clips are ADMITTED and registered, undecodable ftyp garbage
    passes through un-gated."""
    pkg = tmp_path / "fakeav"
    pkg.mkdir()
    (pkg / "av.py").write_text(_FAKE_AV)
    script = tmp_path / "child.py"
    script.write_text(
        textwrap.dedent(
            """
            import struct
            import sys
            import zlib

            import numpy as np

            sys.path.insert(0, sys.argv[1])   # fake av first
            sys.path.insert(1, sys.argv[2])   # repo
            import av  # noqa: F401 - must resolve to the fake

            from pyspark.sql import functions as F

            from mysoftware_nocnetintel_spark.session import get_spark
            from mysoftware_nocnetintel_spark.operators import video as VD
            from mysoftware_nocnetintel_spark.operators.hamming_index import (
                build_hamming_index,
            )
            from mysoftware_nocnetintel_spark.sources.delta import (
                write_delta_append,
            )
            from mysoftware_nocnetintel_spark.sources.readers import (
                read_delta_snapshot,
            )
            from mysoftware_nocnetintel_spark.streaming.ops import (
                media_gate_batch,
            )

            assert VD._AV_PRESENT, "driver gate must see the fake av"

            def frames(key, shift=0):
                base = VD._synth_frames(key, 6, 16)
                if not shift:
                    return base
                return [
                    np.clip(f.astype(np.int32) + shift, 0, 255).astype(
                        np.uint8
                    )
                    for f in base
                ]

            def fake_mp4(frs):
                head = struct.pack(">I", 16) + b"ftypisom" + bytes(4)
                body = [struct.pack("<HH", len(frs), 2400)]
                for f in frs:
                    h, w, _ = f.shape
                    blob = struct.pack("<HH", h, w) + zlib.compress(
                        f.tobytes()
                    )
                    body.append(struct.pack("<I", len(blob)))
                    body.append(blob)
                return head + b"".join(body)

            def signer(df):
                return (
                    VD.video_hashes(df.select("doc_id", "media"), "media")
                    .where(F.col("vhash").isNotNull())
                    .select(
                        F.col("doc_id").alias("doc"),
                        F.col("vhash").alias("sig"),
                    )
                )

            spark = get_spark(
                app_name="mp4-gate-child", shuffle_partitions=4
            )
            corpus, index = sys.argv[3], sys.argv[4]
            seed = spark.createDataFrame(
                [(i, bytearray(VD.vpng_encode(frames(f"s{i}"))))
                 for i in range(3)],
                "doc_id bigint, media binary",
            )
            write_delta_append(seed, corpus)
            build_hamming_index(signer(seed), index, family="vhash")

            batch = spark.createDataFrame(
                [
                    # brightness-shifted RE-ENCODE of corpus video 1 ->
                    # BLOCKED (dHash-of-mean is shift invariant)
                    (10, bytearray(fake_mp4(frames("s1", shift=6)))),
                    # novel clip in MP4 -> ADMITTED + registered
                    (11, bytearray(fake_mp4(frames("novel")))),
                    # ftyp-signed garbage -> undecodable, passes through
                    (12, bytearray(
                        struct.pack(">I", 16) + b"ftypjunk" + bytes(9)
                    )),
                ],
                "doc_id bigint, media binary",
            )
            media_gate_batch(
                batch, 0, corpus, index, app_id="mp4g",
                signer=signer, family="vhash",
            )
            got = sorted(
                r.doc_id for r in read_delta_snapshot(spark, corpus).collect()
            )
            assert got == [0, 1, 2, 11, 12], got
            reg = sorted(
                r.doc for r in read_delta_snapshot(spark, index).collect()
            )
            assert reg == [0, 1, 2, 11], reg
            print("MP4_GATE_E2E_OK", flush=True)
            spark.stop()
            """
        )
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{pkg}:{REPO}:" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable, str(script), str(pkg), REPO,
            str(tmp_path / "corpus"), str(tmp_path / "index"),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "MP4_GATE_E2E_OK" in proc.stdout


@pytest.mark.skipif(not VD._AV_PRESENT, reason="PyAV not installed")
def test_real_mp4_planted_recall(spark):
    """The real-decoder path (runs wherever PyAV exists): genuine H.264
    MP4 re-encodes of the synthesized clips still sign within Hamming 3
    of their vpng sources."""
    import io

    import av

    def to_mp4(frs) -> bytes:
        buf = io.BytesIO()
        with av.open(buf, "w", format="mp4") as c:
            stream = c.add_stream("h264", rate=24)
            stream.width, stream.height = frs[0].shape[1], frs[0].shape[0]
            stream.pix_fmt = "yuv420p"
            for f in frs:
                frame = av.VideoFrame.from_ndarray(f, format="rgb24")
                c.mux(stream.encode(frame))
            c.mux(stream.encode())
        return buf.getvalue()

    rows = []
    for i, key in enumerate(("a", "b", "c", "d")):
        frs = _frames(key, n=8, size=64)
        rows.append((i, bytearray(VD.vpng_encode(frs))))
        rows.append((100 + i, bytearray(to_mp4(frs))))
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    pairs = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in VD.video_near_dup_pairs(df, "doc_id", max_hamming=3).collect()
    }
    expected = {(i, 100 + i) for i in range(4)}
    assert expected <= pairs, f"planted MP4 pairs missed: {expected - pairs}"
