"""Video modality: multi-frame binary payloads + typed metadata, with REAL
per-frame decode (the stdlib PNG codec from operators/multimodal.py),
sampled-frame feature extraction, and a video-level perceptual signature
whose near-duplicate pairs come from the SAME Hamming-band pigeonhole join
the text/image/audio tiers use.

Beyond-reference capability (the build brief's image/audio/video
requirement; the reference README describes no media handling). The
container has no video codec, so the CONTAINER is ours — a deliberately
simple length-prefixed sequence of PNG frames ("vpng") — but everything
under it is real: byte-level header parsing, per-frame PNG decode, numpy
pixel math. A deployment swaps the container parser for ffmpeg/pyav behind
the same function signatures; every Spark-side plan is unchanged.

Container layout (little-endian):

    b"VPNG" | u8 version=1 | u16 n_frames | u16 fps_x100
    then per frame: u32 byte_length | PNG bytes

THE scale decision in this module: frame sampling happens INSIDE the Arrow
stage, never via an explode over the payload column. Exploding k sampled
frame indices against the binary column would replicate every payload k
times through a shuffle — at 100 TB of video that is the whole job's cost.
Instead ONE mapInPandas pass parses the header, seeks straight to the
sampled offsets (length-prefixed frames make the seek O(frames), no
decode), decodes ONLY the sampled frames, and emits ~50-byte feature rows.
The index-explode plan (multimodal.sample_frames) remains the right shape
for metadata-only fan-out where no bytes ride along.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import (
    _GROUP_CHUNK_IMGS,
    _area_resize,
    _area_resize_batch,
    _pack_bits,
    _pack_bits_batch,
    _to_gray,
    png_decode,
    png_encode,
)

VIDEO_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
    ]
)

_MAGIC = b"VPNG"
_HEADER = struct.Struct("<4sBHH")  # magic, version, n_frames, fps*100


# --------------------------------------------------------------------------
# Container codec: length-prefixed PNG frames. Real byte-level parsing.
# --------------------------------------------------------------------------
def vpng_encode(frames: list[np.ndarray], fps: float = 24.0) -> bytes:
    """Encode RGB uint8 frames into the vpng container."""
    parts = [_HEADER.pack(_MAGIC, 1, len(frames), int(round(fps * 100)))]
    for fr in frames:
        blob = png_encode(fr)
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def vpng_header(data: bytes) -> tuple[int, float] | None:
    """(n_frames, fps) from the container header; None if not vpng."""
    if len(data) < _HEADER.size:
        return None
    magic, version, n_frames, fps_x100 = _HEADER.unpack_from(data)
    if magic != _MAGIC or version != 1:
        return None
    return n_frames, fps_x100 / 100.0


def vpng_frame_offsets(data: bytes) -> list[tuple[int, int]] | None:
    """(offset, length) per frame — an O(n_frames) seek table walk that
    touches only the 4-byte length prefixes, never the frame bytes."""
    head = vpng_header(data)
    if head is None:
        return None
    n_frames, _ = head
    offsets, pos = [], _HEADER.size
    for _ in range(n_frames):
        if pos + 4 > len(data):
            return None
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if pos + length > len(data):
            return None
        offsets.append((pos, length))
        pos += length
    return offsets


def vpng_decode_frame(data: bytes, idx: int) -> np.ndarray | None:
    """Decode exactly ONE frame (real PNG decode); None when the container
    or index is invalid. Only the requested frame's bytes are inflated."""
    offsets = vpng_frame_offsets(data)
    if offsets is None or not 0 <= idx < len(offsets):
        return None
    off, length = offsets[idx]
    try:
        return png_decode(data[off : off + length])
    except Exception:
        return None


# --------------------------------------------------------------------------
# Deterministic synthesized corpus: a crossfade between two hash-seeded
# images — smooth per-frame evolution (real motion for the sampler to see)
# and a non-degenerate mean frame (the video signature below).
# --------------------------------------------------------------------------
def _seed_img(key: str, size: int) -> np.ndarray:
    seed = hashlib.sha256(key.encode()).digest()
    need = size * size * 3
    return np.frombuffer(
        (seed * (need // len(seed) + 1))[:need], dtype=np.uint8
    ).reshape(size, size, 3)


def _synth_frames(key: str, n_frames: int, size: int) -> list[np.ndarray]:
    a = _seed_img(key + "/a", size).astype(np.float64)
    b = _seed_img(key + "/b", size).astype(np.float64)
    # one broadcast crossfade over all frames (r12 optimization) — same
    # elementwise (1-t)·a + t·b per frame as the former per-frame loop,
    # bit-identical (pinned by tests/test_media_vectorized.py)
    t = (np.arange(n_frames) / max(1, n_frames - 1))[:, None, None, None]
    frames = ((1 - t) * a + t * b).astype(np.uint8)
    return list(frames)


def attach_vpng_media(
    df: DataFrame,
    text_col: str = "text",
    n_frames: int = 12,
    size: int = 8,
    fps: float = 24.0,
) -> DataFrame:
    """Append ``media`` (a real vpng container of PNG frames, text-seeded)
    and ``media_meta``. Deployments replace this stage with a scan of real
    video bytes — downstream operators are unchanged."""
    fields = list(df.schema.fields)
    out_schema = T.StructType(
        fields
        + [
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", VIDEO_META),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for txt in pdf[text_col]:
                blobs.append(vpng_encode(_synth_frames(str(txt), n_frames, size), fps))
                metas.append(
                    {
                        "format": "vpng",
                        "width": size,
                        "height": size,
                        "n_frames": n_frames,
                        "fps": fps,
                    }
                )
            out = pdf.copy()
            out["media"] = blobs
            out["media_meta"] = metas
            yield out

    return df.mapInPandas(run, out_schema)


def perturb_vpng_media(
    df: DataFrame, payload_col: str = "media", delta: int = 8
) -> DataFrame:
    """Re-encode every frame with a uniform brightness shift — different
    bytes in every frame (exact dedup scores 0), nearly identical perceptual
    signature (the mean-frame dHash pairs it). Non-vpng payloads pass
    through unchanged."""
    out_schema = T.StructType(list(df.schema.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for payload in pdf[payload_col]:
                data = bytes(payload) if payload is not None else None
                head = vpng_header(data) if data else None
                if head is None:
                    blobs.append(payload)
                    continue
                offsets = vpng_frame_offsets(data)
                frames = []
                ok = offsets is not None
                if ok:
                    for i in range(len(offsets)):
                        img = vpng_decode_frame(data, i)
                        if img is None or img.shape[2] != 3:
                            ok = False
                            break
                        frames.append(
                            np.clip(img.astype(np.int32) + delta, 0, 255).astype(
                                np.uint8
                            )
                        )
                blobs.append(vpng_encode(frames, head[1]) if ok else payload)
            out = pdf.copy()
            out[payload_col] = blobs
            yield out

    return df.mapInPandas(run, out_schema)


# --------------------------------------------------------------------------
# Sampled-frame features: sampling INSIDE the Arrow stage (see module
# docstring — no payload replication through an explode).
# --------------------------------------------------------------------------
def sampled_frame_features(
    df: DataFrame, payload_col: str = "media", every_n: int = 4
) -> DataFrame:
    """One Arrow pass: parse the container header, seek to every
    ``every_n``-th frame, decode ONLY those (real PNG decode; ISO-BMFF
    payloads via the PyAV gate — :func:`video_sampled_frames`), emit one
    row per sampled frame with brightness / contrast / edge-energy
    features. Payload bytes never leave the stage; undecodable payloads
    emit zero rows (count them upstream via vpng_header if needed)."""
    fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_s", T.DoubleType()),
            T.StructField("brightness", T.DoubleType()),
            T.StructField("contrast", T.DoubleType()),
            T.StructField("edge_energy", T.DoubleType()),
        ]
    )
    passthrough = [f.name for f in fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            # column-wise iteration, NOT pdf.iterrows(): iterrows builds a
            # pandas Series object per row — measured pure overhead in the
            # profile (r12 optimization); values/feature math unchanged
            pass_cols = {k: pdf[k].values for k in passthrough}
            for ri, payload in enumerate(pdf[payload_col]):
                data = bytes(payload) if payload is not None else None
                dec = video_sampled_frames(data, every_n) if data else None
                if dec is None:
                    continue
                frames, _n_frames, fps = dec
                for idx, img in frames:
                    if img is None:
                        continue
                    g = _to_gray(img).astype(np.float64)
                    row = {k: v[ri] for k, v in pass_cols.items()}
                    row.update(
                        frame_idx=idx,
                        ts_s=idx / fps if fps > 0 else 0.0,
                        brightness=float(g.mean()),
                        contrast=float(g.std()),
                        edge_energy=float(
                            np.abs(np.diff(g, axis=1)).mean()
                            + np.abs(np.diff(g, axis=0)).mean()
                        ),
                    )
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return df.mapInPandas(run, out_schema)


# --------------------------------------------------------------------------
# Video signature + near-dup pairs (shared Hamming-band machinery).
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# ISO-BMFF tier (round 10 — the video twin of the image PIL gate and the
# audio miniaudio gate): payloads sniffed as an ISO base-media container
# (MP4/MOV/M4V — a size-prefixed ``ftyp`` box leads the file) route
# through the PUBLIC PyAV decoder when it is importable; without it they
# are a DOCUMENTED PASSTHROUGH — sampled decode returns None, so
# signatures/features go NULL/zero-rows and ingestion gates pass the
# rows un-gated, exactly the image/audio no-codec contract. The gate is
# evaluated ONCE at import, never probed inside the Arrow batch loop,
# and the engine never hand-rolls an MPEG-4 decoder.
# --------------------------------------------------------------------------
try:
    import av as _av  # public pip package (PyAV), decodes MP4 to frames

    _AV_PRESENT = True
except ImportError:
    _av = None
    _AV_PRESENT = False


def sniff_isobmff(data: bytes) -> bool:
    """True when the payload looks like an ISO base-media file: a
    size-prefixed ``ftyp`` box at offset 4. A sniff, not a parse — the
    decode attempt is what settles it."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def mp4_sampled_frames(data: bytes, every_n: int):
    """``(frames_iter, n_frames|None, fps)`` for every ``every_n``-th
    frame of an ISO-BMFF payload via the PyAV gate; None without the
    decoder (documented passthrough) or for payloads whose container
    the decoder rejects outright — the same fail-closed contract as the
    other media codecs. ``frames_iter`` yields ``(idx, rgb_frame)``
    LAZILY from ONE sequential decode pass (round-11 advisor fix: the
    materialized list made peak executor memory scale with
    n_frames/every_n full RGB frames inside the Arrow batch loop —
    consumers like vhash64_bytes keep only their accumulator now).
    ``n_frames`` is the container-declared count (``stream.frames``)
    when the demuxer knows it, else None; a MID-STREAM decode failure
    surfaces as a final ``(idx, None)`` entry, which every consumer
    already treats as a void frame. A container that opens but decodes
    ZERO frames yields an empty iterator (consumers produce the same
    NULL/zero-row passthrough as an outright rejection). The container
    is closed by the ``with`` inside the generator — on normal
    exhaustion, and promptly on abandonment via CPython's refcounting
    (GeneratorExit runs the ``with`` exit)."""
    if not _AV_PRESENT:
        return None
    import io

    try:
        c = _av.open(io.BytesIO(data))
    except Exception:
        return None
    try:
        stream = c.streams.video[0]
        fps = float(stream.average_rate) if stream.average_rate else 0.0
        n_frames = getattr(stream, "frames", 0) or None
    except Exception:
        # r11 advisor: close the container explicitly on the probe
        # failure path instead of relying on refcounting/GC
        try:
            c.close()
        except Exception:
            pass
        return None

    def _gen():
        n = 0
        try:
            with c:
                for frame in c.decode(stream):
                    if n % every_n == 0:
                        yield n, frame.to_ndarray(format="rgb24")
                    n += 1
        except Exception:
            yield n, None  # decode died mid-stream: explicit void frame

    return _gen(), n_frames, fps


def video_sampled_frames(data: bytes, every_n: int):
    """Container-sniffed sampled decode — the single entry the signature
    and feature stages use: vpng via the stdlib PNG codec (seek-table
    random access), ISO-BMFF via the PyAV gate (one sequential pass),
    anything else None. Both produce the SAME deterministic grid
    ``range(0, n_frames, every_n)``, so signatures are format-invariant,
    and both yield ``(idx, frame)`` LAZILY — one decoded frame in
    flight, so peak memory inside the Arrow loop is O(frame), not
    O(n_frames/every_n). Per-frame decode failures surface as
    ``(idx, None)`` entries — consumers choose skip-vs-void semantics.
    Single-pass: iterate the returned frames once."""
    head = vpng_header(data)
    if head is not None:
        n_frames, fps = head

        def _gen():
            for idx in range(0, n_frames, every_n):
                yield idx, vpng_decode_frame(data, idx)

        return _gen(), n_frames, fps
    if sniff_isobmff(data):
        return mp4_sampled_frames(data, every_n)
    return None


def vhash64_bytes(data: bytes, every_n: int = 4) -> int | None:
    """Video perceptual signature: dHash of the MEAN of sampled decoded
    grayscale frames. Brightness-shift invariant (the mean shifts uniformly
    and dHash compares adjacent pixels); frame-count robust (sampling grid
    is deterministic given the container). Routes through
    :func:`video_sampled_frames`, so ISO-BMFF payloads sign identically
    to vpng ones carrying the same pixels when the PyAV gate is up."""
    dec = video_sampled_frames(data, every_n)
    if dec is None:
        return None
    frames, _n_frames, _fps = dec
    acc, n = None, 0
    for _idx, img in frames:
        if img is None:
            return None
        g = _to_gray(img).astype(np.float64)
        acc = g if acc is None else acc + g
        n += 1
    if acc is None:
        return None
    mean = acc / n
    d = _area_resize(mean, 8, 9)
    return _pack_bits(d[:, :-1] < d[:, 1:])


def video_hashes(
    df: DataFrame, payload_col: str = "media", every_n: int = 4
) -> DataFrame:
    """Append a ``vhash`` BIGINT signature column (NULL for undecodable
    payloads) via one Arrow pass; the payload column is dropped on output
    (hash-then-shed — downstream shuffles 8 bytes per row)."""
    fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(fields + [T.StructField("vhash", T.LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            hs: list = [None] * n
            # per-clip sampled decode + mean-frame accumulation (inherently
            # per-row: container parse, lazy frame generator), then the
            # resize/pack tail batched per mean-frame shape — guide §4.2;
            # the mean-accumulate order matches vhash64_bytes exactly
            by_shape: dict[tuple, tuple[list, list]] = {}
            for i, p in enumerate(pdf[payload_col]):
                if p is None:
                    continue
                dec = video_sampled_frames(bytes(p), every_n)
                if dec is None:
                    continue
                frames, _n_frames, _fps = dec
                acc, cnt, void = None, 0, False
                for _idx, img in frames:
                    if img is None:
                        void = True
                        break
                    g = _to_gray(img).astype(np.float64)
                    acc = g if acc is None else acc + g
                    cnt += 1
                if void or acc is None:
                    continue
                mean = acc / cnt
                idxs, means = by_shape.setdefault(mean.shape, ([], []))
                idxs.append(i)
                means.append(mean)
            for idxs, means in by_shape.values():
                # bounded chunks per group (r12 advisor, same shape as
                # the audio/image stages): cap the (N, H, W) float64
                # stack; per-row math is independent, so chunking is
                # bit-identical.
                for clo in range(0, len(idxs), _GROUP_CHUNK_IMGS):
                    c_idxs = idxs[clo: clo + _GROUP_CHUNK_IMGS]
                    d = _area_resize_batch(
                        np.stack(means[clo: clo + _GROUP_CHUNK_IMGS]), 8, 9
                    )
                    vals = _pack_bits_batch(
                        (d[:, :, :-1] < d[:, :, 1:]).reshape(len(c_idxs), 64)
                    )
                    for j, i in enumerate(c_idxs):
                        hs[i] = int(vals[j])
            out = pdf.drop(columns=[payload_col])
            out["vhash"] = pd.array(hs, dtype="Int64")
            yield out

    return df.mapInPandas(run, out_schema)


def video_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str = "media",
    max_hamming: int = 3,
    every_n: int = 4,
) -> DataFrame:
    """VIDEO near-duplicate pairs by mean-frame dHash Hamming distance
    <= ``max_hamming``: decode+hash in one Arrow pass, then the shared
    banded equi-join (dedup.hamming_band_pairs) — candidates come from a
    bucket join, never an all-pairs product. Returns (id_a, id_b, hamming)."""
    from .dedup import hamming_band_pairs

    sig = (
        video_hashes(df.select(id_col, payload_col), payload_col, every_n)
        .where(F.col("vhash").isNotNull())
        .select(F.col(id_col).alias("doc"), F.col("vhash").alias("sig"))
    )
    return hamming_band_pairs(sig, "doc", "sig", max_hamming)
