"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction / resize / frame-sampling as Arrow-batched
mapInPandas stages.

North-star requirement: treat image/audio/video as binary columns with typed
metadata (BASELINE.json). The container has no image/audio codecs, so the
DECODE step is stubbed (clearly marked) behind an import gate with a
deterministic fake — but everything Spark-side is real and tested: schema,
partitioning behavior, UDF signatures, Arrow batch shapes.

At 100 TB: binary payloads ride in parquet alongside metadata; pushdown
prunes on metadata columns BEFORE touching bytes (select meta → filter →
then mapInPandas only over surviving rows), and mapInPandas streams batches
so no executor ever holds a partition of raw media in memory at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in media: payload bytes derived from the text
    hash (stable across runs/partitionings), metadata from the same hash.
    Real deployments replace this with a parquet/object-store scan of
    actual bytes — the downstream operators are unchanged."""
    h = F.sha2(F.col(text_col), 256)
    payload = F.to_binary(F.repeat(h, 16), F.lit("hex"))  # 512-byte fake blob
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.element_at(
                F.array(F.lit("jpeg"), F.lit("png"), F.lit("webm")),
                (F.pmod(F.xxhash64(F.col(text_col)), F.lit(3)) + 1).cast("int"),
            ).alias("format"),
            (F.pmod(F.xxhash64(F.col(text_col), F.lit(1)), F.lit(1920)) + 1)
            .cast("int")
            .alias("width"),
            (F.pmod(F.xxhash64(F.col(text_col), F.lit(2)), F.lit(1080)) + 1)
            .cast("int")
            .alias("height"),
            (F.pmod(F.xxhash64(F.col(text_col), F.lit(3)), F.lit(240)) + 1)
            .cast("int")
            .alias("n_frames"),
        ),
    )


def attach_png_media(df: DataFrame, text_col: str = "text", size: int = 8) -> DataFrame:
    """Deterministic REAL media: a tiny valid PNG per row (pixels seeded from
    the text hash), encoded with the stdlib writer below — so the decode path
    under test is a genuine pixel decode, not a stub. mapInPandas keeps the
    encode Arrow-batched; deployments replace this stage with a scan of real
    bytes and the downstream operators are unchanged."""
    import hashlib

    fields = list(df.schema.fields)
    out_schema = T.StructType(
        fields
        + [T.StructField("media", T.BinaryType()), T.StructField("media_meta", MEDIA_META)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for txt in pdf[text_col]:
                seed = hashlib.sha256(str(txt).encode()).digest()
                rng = np.frombuffer(
                    (seed * ((size * size * 3) // len(seed) + 1))[: size * size * 3],
                    dtype=np.uint8,
                )
                blobs.append(png_encode(rng.reshape(size, size, 3)))
                metas.append(
                    {"format": "png", "width": size, "height": size, "n_frames": 1}
                )
            out = pdf.copy()
            out["media"] = blobs
            out["media_meta"] = metas
            yield out

    return df.mapInPandas(run, out_schema)


# --------------------------------------------------------------------------
# Decode tier. Three paths, best-available chosen per payload:
#   1. PNG  — pure-stdlib decoder below (zlib inflate + per-row unfilter,
#             straight from the public PNG spec): REAL pixel decode with no
#             external codec, so the real path is exercised even in codec-less
#             containers. 8-bit gray/RGB/RGBA, non-interlaced (the fixture
#             and the common crawl-image case); anything fancier falls
#             through to PIL.
#   2. PIL  — any format Pillow can open, when Pillow is installed
#             (capability-gated at import, never probed inside the batch loop).
#   3. fallback — deterministic byte histogram, clearly a stub: keeps the
#             Spark-side plumbing testable for payloads no available codec
#             understands. `decoded` output column says which path ran.
# --------------------------------------------------------------------------
try:
    import PIL.Image  # noqa: F401

    _PIL_PRESENT = True
except ImportError:
    _PIL_PRESENT = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(arr: np.ndarray) -> bytes:
    """Minimal PNG writer (8-bit RGB, filter None) for deterministic test
    fixtures — stdlib only (zlib + struct)."""
    import struct
    import zlib

    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("png_encode expects uint8 (H, W, 3)")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one vectorized filter-byte prepend instead of h per-row joins (r12
    # optimization — the per-row generator dominated the encode profile);
    # byte-identical: filter 0 then the row's RGB bytes, row-major
    raw_arr = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw_arr[:, 0] = 0
    raw_arr[:, 1:] = arr.reshape(h, w * 3)
    raw = raw_arr.tobytes()
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (public spec: IHDR/IDAT/IEND chunks, zlib
    inflate, per-row filters 0-4). Supports 8-bit grayscale (0), RGB (2) and
    RGBA (6), non-interlaced. Returns uint8 (H, W, channels)."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise NotImplementedError(
            f"png_decode handles 8-bit gray/RGB/RGBA non-interlaced only "
            f"(depth={depth} color={color} interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows2d = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    if not rows2d[:, 0].any():
        # every row filter is 0 (None) — the layout png_encode writes and
        # the overwhelmingly common case for small images: the whole image
        # is one slice+copy instead of h per-row frombuffer/astype calls
        # (r12 optimization, guide §4.2; byte-identical by construction)
        return rows2d[:, 1:].copy().reshape(h, w, ch)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        ftype = raw[p]
        row = np.frombuffer(raw[p + 1 : p + 1 + stride], dtype=np.uint8).astype(
            np.int32
        )
        p += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            row = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = row.copy()
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:
                    rec[x] = (row[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (row[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec[x] = (row[x] + pred) & 0xFF
            row = rec
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out.reshape(h, w, ch)


_JPEG_SIG = b"\xff\xd8\xff"


def jpeg_encode(arr: np.ndarray, quality: int = 90) -> bytes:
    """JPEG writer for test fixtures and planted-pair corpora — gated on
    Pillow (the engineering boundary for lossy codecs: hand-rolling a
    stdlib JPEG coder is the wrong trade, per the round-8 verdict).
    Raises with a remedy when Pillow is absent so callers can skip."""
    if not _PIL_PRESENT:
        raise NotImplementedError(
            "jpeg_encode requires Pillow (`pip install Pillow`); PNG "
            "fixtures via png_encode need no external codec"
        )
    import io

    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("jpeg_encode expects uint8 (H, W, 3)")
    buf = io.BytesIO()
    PIL.Image.fromarray(arr, "RGB").save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def decode_image(payload: bytes, fmt: str) -> np.ndarray | None:
    """Best-available pixel decode; None when no codec understands the
    payload (callers fall back to the stub featurizer / NULL hashes).
    PNG takes the stdlib decoder; everything else — JPEG (sniffed by
    SOI marker), WebP, GIF, exotic PNGs — routes through Pillow when
    installed. The gate is evaluated once at import, never probed
    inside the Arrow batch loop."""
    if payload[:8] == _PNG_SIG:
        try:
            return png_decode(payload)
        except Exception:
            # exotic PNG (NotImplementedError) → PIL if present; CORRUPT
            # PNG-signed bytes (truncated IDAT, zlib garbage, missing
            # IHDR) must degrade to the stub/NULL path per this
            # function's contract, never kill the Arrow batch — one bad
            # crawl document must not fail a whole ingestion stream
            pass
    if _PIL_PRESENT:
        import io

        try:
            return np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("RGB"))
        except Exception:
            return None
    return None


def decode_media(payload: bytes, fmt: str, dim: int = 16) -> tuple[np.ndarray, bool]:
    """Payload → (feature vector, decoded?). Real path: luminance histogram
    over ``dim`` buckets of the decoded pixels. Stub path (no codec for this
    payload): byte histogram — deterministic, clearly flagged False."""
    img = decode_image(payload, fmt)
    if img is not None:
        lum = (
            img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            if img.ndim == 3 and img.shape[2] >= 3
            else img.reshape(img.shape[0], -1).astype(np.float64)
        )
        idx = np.clip((lum * dim / 256.0).astype(np.int64), 0, dim - 1)
        hist = np.bincount(idx.ravel(), minlength=dim).astype(np.float64)
        return hist / max(hist.sum(), 1.0), True
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)[:dim]
    total = hist.sum()
    return (hist / total if total else hist), False


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: binary payload → float feature vector
    plus a ``decoded`` flag (True = real pixel decode, False = stub byte
    histogram). Batches stream through Arrow; output schema is explicit;
    metadata columns pass through untouched (column pruning still applies
    upstream)."""
    fields = [f for f in df.schema.fields if f.name != "media"]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("decoded", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, flags = [], []
            for p, m in zip(pdf["media"], pdf["media_meta"]):
                fmt = m["format"] if isinstance(m, dict) else m.format
                vec, ok = decode_media(p, fmt, dim)
                feats.append(vec.tolist())
                flags.append(ok)
            out = pdf.drop(columns=["media"])
            out["features"] = feats
            out["decoded"] = flags
            yield out

    return df.mapInPandas(run, out_schema)


def resize_meta(df: DataFrame, max_dim: int = 256) -> DataFrame:
    """'Resize' as a metadata transform (aspect-preserving target size) —
    the byte-level resample belongs to the decode stub; the plumbing
    (struct rewrite, no shuffle) is what runs at scale."""
    scale = F.least(
        F.lit(max_dim) / F.col("media_meta.width"),
        F.lit(max_dim) / F.col("media_meta.height"),
        F.lit(1.0),
    )
    return df.withColumn(
        "media_meta",
        F.struct(
            F.col("media_meta.format").alias("format"),
            F.round(F.col("media_meta.width") * scale).cast("int").alias("width"),
            F.round(F.col("media_meta.height") * scale).cast("int").alias("height"),
            F.col("media_meta.n_frames").alias("n_frames"),
        ),
    )


# --------------------------------------------------------------------------
# Perceptual image hashing (round 8) — the IMAGE near-dup tier next to the
# text family (exact / MinHash / SimHash / Jaccard in operators/dedup.py):
# dHash (gradient sign over an area-resized 8x9 grayscale) and aHash
# (above-mean bits over 8x8), both 64-bit, both robust to small pixel
# perturbations and re-encodes that break exact-byte dedup. Pair generation
# reuses the SimHash Hamming-band pigeonhole join (dedup.hamming_band_pairs)
# — a banded equi-join, never all-pairs, so the candidate stage stays
# linear-ish at 100 TB of image bytes.
# --------------------------------------------------------------------------


def _to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3 and img.shape[2] >= 3:
        return img[..., :3].astype(np.float64) @ np.array(
            [0.299, 0.587, 0.114]
        )
    return img.reshape(img.shape[0], -1).astype(np.float64)


def _area_resize(gray: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Box-mean resize (each target cell averages its source span; an
    upsampled axis degenerates to nearest-neighbor). Deterministic,
    stdlib+numpy only — no codec dependency."""
    H, W = gray.shape
    out = np.empty((th, tw), dtype=np.float64)
    ylo = (np.arange(th) * H) // th
    yhi = np.maximum(ylo + 1, (np.arange(1, th + 1) * H) // th)
    xlo = (np.arange(tw) * W) // tw
    xhi = np.maximum(xlo + 1, (np.arange(1, tw + 1) * W) // tw)
    rows = [gray[ylo[y]: yhi[y]].mean(axis=0) for y in range(th)]
    g = np.stack(rows)  # (th, W)
    for x in range(tw):
        out[:, x] = g[:, xlo[x]: xhi[x]].mean(axis=1)
    return out


def _pack_bits(bits: np.ndarray) -> int:
    """64 bools → signed int64 (two's-complement wraparound, matching
    Spark's BIGINT semantics for shiftleft/bit ops)."""
    v = np.uint64(0)
    for i, b in enumerate(bits.ravel()[:64]):
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return int(v.astype(np.int64))


# --------------------------------------------------------------------------
# Batch kernels (r12 optimization, guide §4.2): the Arrow boundary was
# already batched, but the work INSIDE each batch ran image-at-a-time —
# 17 tiny `.mean()` calls + two 64-iteration Python pack loops per image
# dominated the profile (~79% of hash-stage CPU in numpy call overhead).
# These kernels run the SAME operations over an (N, H, W) stack so the
# overhead amortizes across the batch. Bit-exactness vs the scalar forms
# is pinned by tests/test_media_vectorized.py (exhaustive fuzz): every
# reduction below consumes the same elements along an axis of the same
# length/contiguity as its scalar twin, so numpy's pairwise summation
# order is unchanged.
# --------------------------------------------------------------------------

# max images stacked into one vectorized kernel call (r12 advisor): the
# batch kernels saturate well before a whole 10k-row Arrow batch is one
# array, and an unbounded (N, H, W) float64 stack bounds task memory by
# the batch size instead of a constant. Shared with the video stage.
_GROUP_CHUNK_IMGS = 256


def _area_resize_batch(stack: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Box-mean resize of an (N, H, W) float64 stack to (N, th, tw) —
    the batch twin of :func:`_area_resize` (same span boundaries, same
    mean reductions, bit-identical output per image)."""
    N, H, W = stack.shape
    ylo = (np.arange(th) * H) // th
    yhi = np.maximum(ylo + 1, (np.arange(1, th + 1) * H) // th)
    xlo = (np.arange(tw) * W) // tw
    xhi = np.maximum(xlo + 1, (np.arange(1, tw + 1) * W) // tw)
    rows = [stack[:, ylo[y]: yhi[y], :].mean(axis=1) for y in range(th)]
    g = np.stack(rows, axis=1)  # (N, th, W)
    out = np.empty((N, th, tw), dtype=np.float64)
    for x in range(tw):
        out[:, :, x] = g[:, :, xlo[x]: xhi[x]].mean(axis=2)
    return out


def _pack_bits_batch(bits: np.ndarray) -> np.ndarray:
    """(N, 64) bools → (N,) signed int64, LSB-first (bit i of row n =
    bits[n, i]) — the batch twin of :func:`_pack_bits`. Pure bit moves
    (packbits + byte view), so exactness is structural."""
    packed = np.packbits(
        np.ascontiguousarray(bits, dtype=np.uint8), axis=1, bitorder="little"
    )  # (N, 8) uint8, byte j = bits 8j..8j+7
    return packed.view("<u8")[:, 0].view(np.int64).copy()


def dhash64_bytes(payload: bytes, fmt: str = "png") -> int | None:
    """Difference hash: area-resize grayscale to 8x9, bit = left<right
    per adjacent horizontal pair. None when no codec decodes the payload
    (stub byte-histograms would near-collide unrelated images)."""
    img = decode_image(payload, fmt)
    if img is None:
        return None
    d = _area_resize(_to_gray(img), 8, 9)
    return _pack_bits(d[:, :-1] < d[:, 1:])


def ahash64_bytes(payload: bytes, fmt: str = "png") -> int | None:
    """Average hash: area-resize grayscale to 8x8, bit = pixel > mean."""
    img = decode_image(payload, fmt)
    if img is None:
        return None
    a = _area_resize(_to_gray(img), 8, 8)
    return _pack_bits(a > a.mean())


def image_hashes(
    df: DataFrame, payload_col: str = "media", fmt_col: str | None = None
) -> DataFrame:
    """Append ``dhash``/``ahash`` BIGINT columns (NULL for undecodable
    payloads) via ONE Arrow-batched mapInPandas pass — each payload is
    decoded once and hashed twice. Metadata columns pass through; the
    payload column is dropped on output (hash-then-shed: downstream
    near-dup stages shuffle 16 bytes per row, never the image bytes —
    the 100 TB posture)."""
    fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("dhash", T.LongType()),
            T.StructField("ahash", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            dh: list = [None] * n
            ah: list = [None] * n
            # decode per payload (container parse is inherently per-row),
            # then group decoded images by shape and run the resize/pack
            # kernels over each (N, H, W) stack — guide §4.2: amortize the
            # tiny-numpy call overhead across the batch, not per image
            by_shape: dict[tuple, tuple[list, list]] = {}
            for i, payload in enumerate(pdf[payload_col]):
                if payload is None:
                    continue
                img = decode_image(bytes(payload), "png")
                if img is None:
                    continue
                idxs, imgs = by_shape.setdefault(img.shape, ([], []))
                idxs.append(i)
                # _to_gray stays per image: a BATCHED (N,H,W,3) @ (3,)
                # matmul takes a different BLAS path than the per-image
                # (H,W,3) @ (3,) and differs in ULP (fuzz-caught) — the
                # resize/pack kernels below are where the overhead was
                imgs.append(_to_gray(img))
            for idxs, imgs in by_shape.values():
                # bounded chunks per group (r12 advisor, same shape as
                # the audio stage at smaller scale): cap the (N, H, W)
                # float64 stack instead of stacking the whole Arrow
                # batch. Per-image math below is row-independent, so
                # chunking is bit-identical.
                for clo in range(0, len(idxs), _GROUP_CHUNK_IMGS):
                    c_idxs = idxs[clo: clo + _GROUP_CHUNK_IMGS]
                    g = np.stack(imgs[clo: clo + _GROUP_CHUNK_IMGS])
                    d = _area_resize_batch(g, 8, 9)
                    a = _area_resize_batch(g, 8, 8)
                    dvals = _pack_bits_batch(
                        (d[:, :, :-1] < d[:, :, 1:]).reshape(len(c_idxs), 64)
                    )
                    amean = a.reshape(len(c_idxs), 64).mean(axis=1)
                    avals = _pack_bits_batch(
                        (a > amean[:, None, None]).reshape(len(c_idxs), 64)
                    )
                    for j, i in enumerate(c_idxs):
                        dh[i] = int(dvals[j])
                        ah[i] = int(avals[j])
            out = pdf.drop(columns=[payload_col])
            out["dhash"] = pd.array(dh, dtype="Int64")
            out["ahash"] = pd.array(ah, dtype="Int64")
            yield out

    return df.mapInPandas(run, out_schema)


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str = "media",
    max_hamming: int = 3,
    hash_col: str = "dhash",
) -> DataFrame:
    """IMAGE near-duplicate pairs by perceptual-hash Hamming distance
    ≤ ``max_hamming`` (≤ 3 for the pigeonhole guarantee): decode+hash in
    one Arrow pass (:func:`image_hashes`), drop undecodable rows, then
    the SimHash banded equi-join (dedup.hamming_band_pairs) — at least
    one of four 16-bit bands matches exactly, so candidates come from a
    bucket join, never an all-pairs product. Returns
    (id_a, id_b, hamming)."""
    from .dedup import hamming_band_pairs

    sig = (
        image_hashes(df.select(id_col, payload_col), payload_col)
        .where(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("doc"), F.col(hash_col).alias("sig"))
    )
    return hamming_band_pairs(sig, "doc", "sig", max_hamming)


def perturb_png_media(
    df: DataFrame, payload_col: str = "media", delta: int = 8
) -> DataFrame:
    """Re-encode each PNG payload with a small uniform brightness shift —
    a deterministic NEAR-duplicate generator (different bytes, almost
    identical perceptual hash) for recall tests and the registry query's
    planted-pair corpus. Non-PNG payloads pass through unchanged."""
    fields = list(df.schema.fields)
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for payload in pdf[payload_col]:
                try:
                    img = png_decode(bytes(payload))
                except Exception:
                    blobs.append(payload)
                    continue
                if img.shape[2] != 3:
                    blobs.append(payload)
                    continue
                shifted = np.clip(
                    img.astype(np.int32) + delta, 0, 255
                ).astype(np.uint8)
                blobs.append(png_encode(shifted))
            out = pdf.copy()
            out[payload_col] = blobs
            yield out

    return df.mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame sampling plan: explode a frame-index column (1 row per sampled
    frame) — at scale this is the fan-out stage feeding per-frame decode."""
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col("media_meta.n_frames") - 1, F.lit(0)),
        F.lit(every_n),
    )
    return df.withColumn("frame_idx", F.explode(idx))
