"""Round-10 verdict task 5: MP3 intake behind the audio capability gate
— the audio twin of the JPEG/Pillow gate (test_jpeg_gate.py).
`audio_decode` sniffs RIFF for the stdlib WAV codec and MPEG audio
(ID3v2 / 0xFFEx frame sync) for the PUBLIC `miniaudio` decoder when it
is importable; without it, MPEG payloads take the documented
passthrough — NULL fingerprints/features, ingestion gates pass the rows
un-gated. No hand-rolled MPEG decoder anywhere.

miniaudio is NOT in this container, so the gate is proved three ways:
(1) the without-decoder passthrough against the real import state,
(2) driver-side routing units against a faked miniaudio module,
(3) an end-to-end Spark subprocess whose WORKERS import a fake
    miniaudio from PYTHONPATH — planted fake-MP3 re-encodes of corpus
    clips are BLOCKED by the Hamming ingestion gate and novel MP3 clips
    ADMITTED, over the real Arrow hash + band join + gate txns.
A real-decoder planted-recall test runs (skipif-gated) wherever
miniaudio plus an MP3 encoder exist.
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

from mysoftware_nocnetintel_spark.operators import audio as AU

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RATE = 8000


def _fake_mp3_bytes(samples: np.ndarray, rate: int = RATE) -> bytes:
    """ID3-signed container only the fake miniaudio understands: ID3 +
    (channels, rate) + zlib'd int16 PCM. Exercises the exact routing
    decision (MPEG sniff -> miniaudio branch) without a real lossy
    codec."""
    mono = samples.reshape(-1)
    return (
        b"ID3"
        + struct.pack(">BI", 1, rate)
        + zlib.compress(mono.astype("<i2").tobytes())
    )


_FAKE_MINIAUDIO = textwrap.dedent(
    """
    import struct
    import zlib

    import numpy as np


    class _Decoded:
        def __init__(self, samples, nchannels, sample_rate):
            self.samples = samples
            self.nchannels = nchannels
            self.sample_rate = sample_rate


    def decode(data):
        data = bytes(data)
        if data[:3] != b"ID3":
            raise ValueError("fake miniaudio: not a fake-MP3 payload")
        nch, rate = struct.unpack(">BI", data[3:8])
        samples = np.frombuffer(zlib.decompress(data[8:]), dtype="<i2")
        return _Decoded(samples, nch, rate)
    """
)


class _FakeMiniaudio:
    @staticmethod
    def decode(data):
        data = bytes(data)
        if data[:3] != b"ID3":
            raise ValueError("fake miniaudio: not a fake-MP3 payload")
        nch, rate = struct.unpack(">BI", data[3:8])
        samples = np.frombuffer(zlib.decompress(data[8:]), dtype="<i2")

        class _Decoded:
            pass

        d = _Decoded()
        d.samples, d.nchannels, d.sample_rate = samples, nch, rate
        return d


def _clip(key: str, seconds: float = 0.6) -> np.ndarray:
    return AU._synth_samples(key, RATE, seconds)


def test_mpeg_sniff():
    assert AU.sniff_mpeg_audio(b"ID3\x04\x00rest")
    assert AU.sniff_mpeg_audio(b"\xff\xfb\x90\x00frame")  # 0xFFFB sync
    assert AU.sniff_mpeg_audio(b"\xff\xe2junk")
    assert not AU.sniff_mpeg_audio(b"RIFF....WAVE")
    assert not AU.sniff_mpeg_audio(b"\xff\x1bnot-sync")
    assert not AU.sniff_mpeg_audio(b"")


@pytest.mark.skipif(
    AU._MINIAUDIO_PRESENT,
    reason="miniaudio installed: the no-decoder passthrough is unreachable",
)
def test_mp3_without_decoder_is_null_passthrough():
    payload = _fake_mp3_bytes(_clip("a"))
    assert AU.sniff_mpeg_audio(payload)
    assert AU.mp3_decode(payload) is None  # documented passthrough
    assert AU.audio_decode(payload) is None
    assert AU.afp64_bytes(payload) is None  # NULL fingerprint downstream


def test_mp3_routes_through_gate(monkeypatch):
    """With (a fake) miniaudio present, an MPEG-sniffed payload decodes
    via the gate and fingerprints bit-identically to the SAME samples
    through the stdlib WAV path — format invariance of the audio
    fingerprint (the property the ingestion gate rides on)."""
    monkeypatch.setattr(AU, "_MINIAUDIO_PRESENT", True)
    monkeypatch.setattr(AU, "_miniaudio", _FakeMiniaudio, raising=False)
    x = _clip("route")
    dec = AU.audio_decode(_fake_mp3_bytes(x))
    assert dec is not None
    arr, rate = dec
    assert rate == RATE and np.array_equal(arr.reshape(-1), x.reshape(-1))
    via_mp3 = AU.afp64_bytes(_fake_mp3_bytes(x))
    via_wav = AU.afp64_bytes(AU.wav_encode(x, RATE))
    assert via_mp3 == via_wav is not None
    # corrupt MPEG-signed payloads degrade to None, never raise
    assert AU.audio_decode(b"ID3garbage-not-a-frame") is None
    assert AU.audio_decode(b"\xff\xfb\x00") is None
    # RIFF payloads never touch the MPEG branch
    assert AU.audio_decode(AU.wav_encode(x, RATE)) is not None


@pytest.mark.slow
def test_mp3_gate_end_to_end_spark(tmp_path):
    """Workers import the fake miniaudio from PYTHONPATH: planted
    fake-MP3 re-encodes (gain-perturbed, the lossy-codec analogue) of
    corpus WAV clips are BLOCKED by the Hamming ingestion gate, novel
    MP3 clips are ADMITTED and registered, undecodable MPEG-signed
    garbage passes through un-gated — the full media_gate_batch txn
    path over Arrow audio_hashes."""
    pkg = tmp_path / "fakema"
    pkg.mkdir()
    (pkg / "miniaudio.py").write_text(_FAKE_MINIAUDIO)
    script = tmp_path / "child.py"
    script.write_text(
        textwrap.dedent(
            """
            import struct
            import sys
            import zlib

            import numpy as np

            sys.path.insert(0, sys.argv[1])   # fake miniaudio first
            sys.path.insert(1, sys.argv[2])   # repo
            import miniaudio  # noqa: F401 - must resolve to the fake

            from pyspark.sql import functions as F

            from mysoftware_nocnetintel_spark.session import get_spark
            from mysoftware_nocnetintel_spark.operators import audio as AU
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

            assert AU._MINIAUDIO_PRESENT, "driver gate must see the fake"

            RATE = 8000

            def clip(key):
                return AU._synth_samples(key, RATE, 0.6)

            def fake_mp3(x):
                return (
                    b"ID3"
                    + struct.pack(">BI", 1, RATE)
                    + zlib.compress(x.reshape(-1).astype("<i2").tobytes())
                )

            def signer(df):
                return (
                    AU.audio_hashes(df.select("doc_id", "media"), "media")
                    .where(F.col("afp").isNotNull())
                    .select(
                        F.col("doc_id").alias("doc"),
                        F.col("afp").alias("sig"),
                    )
                )

            spark = get_spark(
                app_name="mp3-gate-child", shuffle_partitions=4
            )
            corpus, index = sys.argv[3], sys.argv[4]
            seed = spark.createDataFrame(
                [(i, bytearray(AU.wav_encode(clip(f"s{i}"), RATE)))
                 for i in range(3)],
                "doc_id bigint, media binary",
            )
            write_delta_append(seed, corpus)
            build_hamming_index(signer(seed), index, family="afp")

            # the MP3 micro-batch: a gain-perturbed RE-ENCODE of corpus
            # clip 1 (lossy-codec analogue -> must be BLOCKED), a novel
            # clip (ADMITTED + registered), MPEG-signed garbage
            # (undecodable -> passes through un-gated)
            re_enc = np.clip(
                clip("s1").astype(np.int64) * 102 // 100, -32768, 32767
            ).astype(np.int16)
            batch = spark.createDataFrame(
                [
                    (10, bytearray(fake_mp3(re_enc))),
                    (11, bytearray(fake_mp3(clip("novel")))),
                    (12, bytearray(b"ID3 but not a frame at all")),
                ],
                "doc_id bigint, media binary",
            )
            media_gate_batch(
                batch, 0, corpus, index, app_id="mp3g",
                signer=signer, family="afp",
            )
            got = sorted(
                r.doc_id for r in read_delta_snapshot(spark, corpus).collect()
            )
            assert got == [0, 1, 2, 11, 12], got  # 10 blocked as near-dup
            reg = sorted(
                r.doc for r in read_delta_snapshot(spark, index).collect()
            )
            assert reg == [0, 1, 2, 11], reg
            print("MP3_GATE_E2E_OK", flush=True)
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
    assert "MP3_GATE_E2E_OK" in proc.stdout


def _has_mp3_encoder() -> bool:
    try:
        import lameenc  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not (AU._MINIAUDIO_PRESENT and _has_mp3_encoder()),
    reason="needs miniaudio (decode) + lameenc (encode) for real MP3s",
)
def test_real_mp3_planted_recall(spark):
    """The real-decoder path (runs wherever miniaudio + lameenc exist):
    genuine lossy MP3 re-encodes of the synthesized clips still
    fingerprint within Hamming 3 of their WAV sources."""
    import lameenc

    from pyspark.sql import functions as F  # noqa: F401

    def to_mp3(x: np.ndarray) -> bytes:
        enc = lameenc.Encoder()
        enc.set_bit_rate(128)
        enc.set_in_sample_rate(RATE)
        enc.set_channels(1)
        enc.set_quality(2)
        return bytes(enc.encode(x.astype("<i2").tobytes()) + enc.flush())

    rows = []
    for i, key in enumerate(("a", "b", "c", "d")):
        x = _clip(key, seconds=1.0)
        rows.append((i, bytearray(AU.wav_encode(x, RATE))))
        rows.append((100 + i, bytearray(to_mp3(x))))
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    pairs = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in AU.audio_near_dup_pairs(df, "doc_id", max_hamming=3).collect()
    }
    expected = {(i, 100 + i) for i in range(4)}
    assert expected <= pairs, f"planted MP3 pairs missed: {expected - pairs}"
