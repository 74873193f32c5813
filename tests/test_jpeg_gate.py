"""Round-9 verdict task 6: JPEG decode behind the Pillow capability
gate. `decode_image` sniffs PNG for the stdlib decoder and routes
everything else (JPEG by SOI marker included) through PIL when
installed; without PIL, non-PNG payloads take the documented
passthrough — NULL perceptual hashes, `decoded=False` stub features.

Pillow is NOT in this container, so the gate is proved three ways:
(1) the without-PIL passthrough against the real import state,
(2) driver-side routing units against a faked PIL module, and
(3) an end-to-end Spark subprocess whose WORKERS import a fake PIL
    package from PYTHONPATH — the full mapInPandas decode+hash+band
    join runs over JPEG-SOI payloads the fake codec understands.
A real-Pillow planted-recall test runs (skipif-gated) wherever Pillow
exists.
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

from mysoftware_nocnetintel_spark.operators import multimodal as MM

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _grad(h: int = 16, w: int = 16, shift: int = 0, tilt: int = 64) -> np.ndarray:
    """Smooth deterministic gradient image (JPEG-friendly: survives a
    lossy re-encode with a near-identical dHash). ``tilt`` varies the
    vertical slope so distinct fixtures hash far apart."""
    y, x = np.mgrid[0:h, 0:w]
    base = ((x * 255) // max(w - 1, 1) + (y * tilt) // max(h - 1, 1)) % 256
    img = np.stack([base, 255 - base, (base * 2) % 256], axis=2)
    return np.clip(img.astype(np.int32) + shift, 0, 255).astype(np.uint8)


def _fake_jpeg_bytes(img: np.ndarray) -> bytes:
    """JPEG-SOI-signed container only the fake PIL understands: SOI +
    dims + zlib raw RGB. Exercises the exact routing decision (non-PNG
    signature -> PIL branch) without needing a real lossy codec."""
    h, w, _ = img.shape
    return b"\xff\xd8\xff" + struct.pack(">HH", h, w) + zlib.compress(
        img.tobytes()
    )


_FAKE_PIL = {
    "PIL/__init__.py": "",
    "PIL/Image.py": textwrap.dedent(
        """
        import struct
        import zlib

        import numpy as np


        class _Img:
            def __init__(self, arr):
                self._arr = arr

            def convert(self, mode):
                assert mode == "RGB"
                return self

            def __array__(self, dtype=None, copy=None):
                return self._arr

        def open(buf):
            data = buf.read() if hasattr(buf, "read") else bytes(buf)
            if data[:3] != b"\\xff\\xd8\\xff":
                raise OSError("fake PIL: not a fake-JPEG payload")
            h, w = struct.unpack(">HH", data[3:7])
            arr = np.frombuffer(
                zlib.decompress(data[7:]), dtype=np.uint8
            ).reshape(h, w, 3)
            return _Img(arr)

        def fromarray(arr, mode):
            raise NotImplementedError("fake PIL cannot encode")
        """
    ),
}


class _FakeImageModule:
    @staticmethod
    def open(buf):
        data = buf.read() if hasattr(buf, "read") else bytes(buf)
        if data[:3] != b"\xff\xd8\xff":
            raise OSError("fake PIL: not a fake-JPEG payload")
        h, w = struct.unpack(">HH", data[3:7])
        arr = np.frombuffer(zlib.decompress(data[7:]), dtype=np.uint8)

        class _Img:
            def convert(self, mode):
                return self

            def __array__(self, dtype=None, copy=None):
                return arr.reshape(h, w, 3)

        return _Img()


class _FakePIL:
    Image = _FakeImageModule


@pytest.mark.skipif(MM._PIL_PRESENT, reason="Pillow installed: the "
                    "no-codec passthrough branch is unreachable")
def test_jpeg_without_pil_is_null_passthrough():
    payload = _fake_jpeg_bytes(_grad())
    assert MM.decode_image(payload, "jpeg") is None
    assert MM.dhash64_bytes(payload, "jpeg") is None
    vec, decoded = MM.decode_media(payload, "jpeg")
    assert decoded is False  # stub byte histogram, honestly flagged
    assert vec.shape == (16,)
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.jpeg_encode(_grad())


def test_jpeg_routes_through_pil_gate(monkeypatch):
    """With (a fake) PIL present, a JPEG-SOI payload decodes via the PIL
    branch and hashes bit-identically to the SAME pixels through the
    stdlib PNG path — format invariance of the perceptual hash."""
    img = _grad()
    monkeypatch.setattr(MM, "_PIL_PRESENT", True)
    monkeypatch.setattr(MM, "PIL", _FakePIL, raising=False)
    out = MM.decode_image(_fake_jpeg_bytes(img), "jpeg")
    assert out is not None and np.array_equal(np.asarray(out), img)
    via_jpeg = MM.dhash64_bytes(_fake_jpeg_bytes(img), "jpeg")
    via_png = MM.dhash64_bytes(MM.png_encode(img), "png")
    assert via_jpeg == via_png is not None
    # a corrupt JPEG-signed payload degrades to None, never raises
    assert MM.decode_image(b"\xff\xd8\xff\x00garbage", "jpeg") is None


@pytest.mark.slow
def test_jpeg_gate_end_to_end_spark(tmp_path):
    """Workers import the fake PIL from PYTHONPATH: JPEG-SOI payloads
    flow through the real Arrow image_hashes stage + Hamming band join;
    planted brightness-shifted JPEG re-encodes must all pair with their
    source (recall 1.0) and distinct gradients must not (0 false)."""
    pkg = tmp_path / "fakepil"
    for rel, body in _FAKE_PIL.items():
        p = pkg / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(body)
    script = tmp_path / "child.py"
    script.write_text(
        textwrap.dedent(
            """
            import struct
            import sys
            import zlib

            import numpy as np

            sys.path.insert(0, sys.argv[1])   # fake PIL first
            sys.path.insert(1, sys.argv[2])   # repo
            import PIL.Image  # noqa: F401 - must resolve to the fake

            from mysoftware_nocnetintel_spark.session import get_spark
            from mysoftware_nocnetintel_spark.operators import multimodal as MM

            assert MM._PIL_PRESENT, "driver gate must see the fake PIL"

            def grad(shift, tilt):
                y, x = np.mgrid[0:16, 0:16]
                base = ((x * 255) // 15 + (y * tilt) // 15) % 256
                img = np.stack([base, 255 - base, (base * 2) % 256], 2)
                return np.clip(img.astype(np.int32) + shift, 0, 255).astype(
                    np.uint8
                )

            def fake_jpeg(img):
                return (
                    b"\\xff\\xd8\\xff"
                    + struct.pack(">HH", *img.shape[:2])
                    + zlib.compress(img.tobytes())
                )

            spark = get_spark(
                app_name="jpeg-gate-child", shuffle_partitions=4
            )
            rows = []
            for i, tilt in enumerate((16, 64, 128, 192)):
                rows.append((i, bytearray(fake_jpeg(grad(0, tilt)))))
                rows.append(
                    (100 + i, bytearray(fake_jpeg(grad(2, tilt))))
                )  # planted near-dup of i
            df = spark.createDataFrame(rows, "doc_id long, media binary")
            hashed = MM.image_hashes(df, "media").collect()
            assert all(r.dhash is not None for r in hashed), hashed
            pairs = {
                (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
                for r in MM.image_near_dup_pairs(
                    df, "doc_id", max_hamming=3
                ).collect()
            }
            expected = {(i, 100 + i) for i in range(4)}
            missing = expected - pairs
            false = pairs - expected
            assert not missing, f"planted pairs missed: {missing}"
            assert not false, f"false pairs: {false}"
            print("JPEG_GATE_E2E_OK", flush=True)
            spark.stop()
            """
        )
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{pkg}:{REPO}:" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), str(pkg), REPO],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "JPEG_GATE_E2E_OK" in proc.stdout


@pytest.mark.skipif(not MM._PIL_PRESENT, reason="Pillow not installed")
def test_real_jpeg_planted_recall(spark):
    """The real-Pillow path (runs wherever Pillow exists): lossy Q95
    re-encodes of brightness-shifted gradients still pair with their
    PNG-decoded sources within Hamming 3."""
    rows = []
    for i, tilt in enumerate((16, 64, 128, 192)):
        rows.append((i, bytearray(MM.png_encode(_grad(tilt=tilt)))))
        rows.append(
            (
                100 + i,
                bytearray(MM.jpeg_encode(_grad(shift=3, tilt=tilt), quality=95)),
            )
        )
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    hashed = MM.image_hashes(df, "media").collect()
    assert all(r.dhash is not None for r in hashed)
    pairs = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in MM.image_near_dup_pairs(df, "doc_id", max_hamming=3).collect()
    }
    expected = {(i, 100 + i) for i in range(4)}
    assert expected <= pairs, f"planted JPEG pairs missed: {expected - pairs}"
    assert not (pairs - expected), f"false pairs: {pairs - expected}"


def test_corrupt_png_signed_payload_degrades_to_null(monkeypatch):
    """Round-9 review fix: a payload carrying the PNG signature but
    corrupt bytes after it (truncated, zlib garbage, missing IHDR) must
    take the documented None/NULL-hash path — one bad crawl document
    must not kill the Arrow batch or the ingestion stream."""
    monkeypatch.setattr(MM, "_PIL_PRESENT", False)
    good = MM.png_encode(_grad())
    for bad in (
        good[:12],                      # truncated before IHDR payload
        good[:30] + b"\x00" * 20,       # mangled mid-structure
        MM._PNG_SIG + b"not a png at all",
        good[:40] + b"\xff" * 10 + good[50:],  # garbled IDAT stream
    ):
        assert MM.decode_image(bad, "png") is None, bad[:16]
        assert MM.dhash64_bytes(bad, "png") is None
        vec, decoded = MM.decode_media(bad, "png")
        assert decoded is False and vec.shape == (16,)
