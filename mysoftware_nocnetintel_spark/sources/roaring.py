"""RoaringBitmapArray + deletion-vector codec for the minimal Delta
reader/writer, built from PUBLIC specifications only:

- delta.io PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Descriptor
  Schema" + "Deletion Vector File Storage Format": descriptor fields
  (storageType u/i/p, pathOrInlineDv, offset, sizeInBytes, cardinality),
  Z85 encoding for inline bytes and the UUID of on-disk DV files, the
  ``deletion_vector_<uuid>.bin`` naming rule, and the file layout
  (format-version byte, then per DV: big-endian int32 dataSize, the
  serialized bitmap, big-endian int32 CRC-32 of the bitmap bytes);
- the RoaringBitmapArray "portable" serialization delta references:
  little-endian int32 magic 1681511377, little-endian int64 number of
  32-bit bitmaps (index = high 32 bits of the 64-bit row index, gaps
  serialized as empty bitmaps), then each bitmap in the standard 32-bit
  Roaring portable format (github.com/RoaringBitmap/RoaringFormatSpec):
  cookie 12346 (no run containers) / 12347 (embedded container count,
  run-flag bitset), per-container uint16 key + uint16 cardinality-1
  descriptors, optional int32 offset table, then array (sorted uint16[]),
  bitmap (1024×uint64), or run (uint16 count, then value/length-1 pairs)
  container payloads — everything little-endian.

The DECODER accepts all three container types and both cookies (what any
real engine may have written). The ENCODER emits array or bitmap
containers only (spec-legal; run detection is an optimization the
minimal writer doesn't need). ``decode(encode(S)) == S`` is
property-tested, and byte-exact vectors are pinned in
tests/test_delta_deletion_vectors.py so the formats can't drift into a
self-consistent-but-wrong pair.
"""

from __future__ import annotations

import struct
import zlib

# --- Z85 (ZeroMQ spec 32) — NOT RFC-1924 base85 (python's b85decode) ---

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"Z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for c in s[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if acc > 0xFFFFFFFF:
            raise ValueError("Z85 group overflows 32 bits")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        group = []
        for _ in range(5):
            group.append(_Z85_ALPHABET[acc % 85])
            acc //= 85
        out += reversed(group)
    return "".join(out)


# --- 32-bit Roaring portable format ---

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4  # RoaringFormatSpec: offsets omitted below this
_ARRAY_MAX = 4096  # cardinality above which a bitmap container is used


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one 32-bit roaring bitmap at ``pos``; return (sorted
    values, next position)."""
    start = pos
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE:
        n = (cookie32 >> 16 & 0xFFFF) + 1
        pos += 4
        run_flags = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys: list[int] = []
    cards: list[int] = []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c + 1)
        pos += 4
    if has_offsets:
        pos += 4 * n  # offsets are relative to `start`; sequential decode
    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        is_run = bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                v0, ln = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(v0, v0 + ln + 1))
        elif cards[i] > _ARRAY_MAX:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
    return values, pos


def _encode_rb32(values: list[int]) -> bytes:
    """Encode sorted uint32 values as one roaring bitmap (cookie 12346,
    array/bitmap containers only)."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    head = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", k, len(by_key[k]) - 1) for k in keys
    )
    payloads: list[bytes] = []
    for k in keys:
        vals = by_key[k]
        if len(vals) > _ARRAY_MAX:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payloads.append(struct.pack("<1024Q", *words))
        else:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
    offs = []
    base = len(head) + len(desc) + 4 * n
    for p in payloads:
        offs.append(base)
        base += len(p)
    return (
        head
        + desc
        + struct.pack(f"<{n}i", *offs)
        + b"".join(payloads)
    )


# --- RoaringBitmapArray (64-bit) portable format ---

_RBM_ARRAY_MAGIC = 1681511377


def decode_rbm_array(buf: bytes) -> list[int]:
    """Serialized RoaringBitmapArray → sorted 64-bit row indexes."""
    if len(buf) < 12:
        raise ValueError("deletion vector bitmap too short")
    magic, n_bitmaps = struct.unpack_from("<iq", buf, 0)
    if magic != _RBM_ARRAY_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} "
            f"(expected {_RBM_ARRAY_MAGIC})"
        )
    pos = 12
    out: list[int] = []
    for hi in range(n_bitmaps):
        vals, pos = _decode_rb32(buf, pos)
        out.extend((hi << 32) | v for v in vals)
    if pos != len(buf):
        raise ValueError(
            f"trailing bytes after bitmap {n_bitmaps - 1} "
            f"({len(buf) - pos} left)"
        )
    return out


def encode_rbm_array(positions: "list[int]") -> bytes:
    """Sorted (or sortable) 64-bit row indexes → serialized
    RoaringBitmapArray (gaps in the high-32 key space become empty
    bitmaps, per the format's index-is-key rule)."""
    positions = sorted(set(int(p) for p in positions))
    if positions and positions[0] < 0:
        raise ValueError("row positions must be non-negative")
    by_hi: dict[int, list[int]] = {}
    for p in positions:
        by_hi.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n_bitmaps = (max(by_hi) + 1) if by_hi else 0
    out = bytearray(struct.pack("<iq", _RBM_ARRAY_MAGIC, n_bitmaps))
    for hi in range(n_bitmaps):
        out += _encode_rb32(by_hi.get(hi, []))
    return bytes(out)


# --- 64-bit Roaring "portable" serialization (RoaringFormatSpec, the
# 64-bit extension's portable format) — what Iceberg v3 deletion
# vectors carry inside Puffin ``deletion-vector-v1`` blobs (round 11).
# Differs from Delta's RoaringBitmapArray above in FRAMING only: an
# 8-byte little-endian bucket count, then per non-empty bucket
# (strictly ascending) a 4-byte little-endian high-32-bit key followed
# by the standard 32-bit portable bitmap — no magic word, sparse keyed
# buckets instead of a dense index with empty-bitmap gaps. The 32-bit
# container payloads are byte-identical, so both codecs share
# _decode_rb32/_encode_rb32 (and the Delta suite's pinned byte vectors
# cover the container layer for this format too). ---


def decode_portable64(buf: bytes) -> list[int]:
    """Portable-format 64-bit Roaring bitmap → sorted row indexes."""
    if len(buf) < 8:
        raise ValueError("portable64 bitmap too short")
    (n_buckets,) = struct.unpack_from("<q", buf, 0)
    if n_buckets < 0:
        raise ValueError(f"portable64 bucket count {n_buckets} negative")
    pos = 8
    out: list[int] = []
    last_hi = -1
    for _ in range(n_buckets):
        if pos + 4 > len(buf):
            raise ValueError("portable64 truncated at bucket key")
        (hi,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if hi <= last_hi:
            raise ValueError(
                f"portable64 bucket keys not strictly ascending "
                f"({hi} after {last_hi})"
            )
        last_hi = hi
        vals, pos = _decode_rb32(buf, pos)
        if not vals:
            raise ValueError(f"portable64 empty bucket {hi} (forbidden)")
        out.extend((hi << 32) | v for v in vals)
    if pos != len(buf):
        raise ValueError(
            f"trailing bytes after portable64 bucket ({len(buf) - pos} left)"
        )
    return out


def encode_portable64(positions: "list[int]") -> bytes:
    """Sorted (or sortable) 64-bit row indexes → portable-format 64-bit
    Roaring bitmap (empty buckets omitted, keys ascending, per spec)."""
    positions = sorted(set(int(p) for p in positions))
    if positions and positions[0] < 0:
        raise ValueError("row positions must be non-negative")
    by_hi: dict[int, list[int]] = {}
    for p in positions:
        by_hi.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(by_hi)))
    for hi in sorted(by_hi):
        out += struct.pack("<I", hi)
        out += _encode_rb32(by_hi[hi])
    return bytes(out)


# --- Deletion-vector file / inline IO (PROTOCOL.md file format v1) ---

_DV_FILE_VERSION = 1


def read_dv_file(path: str, offset: int, size_in_bytes: int) -> bytes:
    """Read one DV's bitmap bytes from a DV file, verifying the format
    version byte, the recorded dataSize, and the CRC-32 checksum."""
    with open(path, "rb") as fh:
        version = fh.read(1)
        if not version or version[0] != _DV_FILE_VERSION:
            raise ValueError(
                f"unsupported DV file format version "
                f"{version[0] if version else 'EOF'} in {path}"
            )
        fh.seek(offset)
        (data_size,) = struct.unpack(">i", fh.read(4))
        if data_size != size_in_bytes:
            raise ValueError(
                f"DV dataSize {data_size} != descriptor sizeInBytes "
                f"{size_in_bytes} in {path} @ {offset}"
            )
        data = fh.read(data_size)
        if len(data) != data_size:
            raise ValueError(f"truncated DV in {path} @ {offset}")
        (crc,) = struct.unpack(">I", fh.read(4))
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError(f"DV checksum mismatch in {path} @ {offset}")
    return data


def write_dv_file(path: str, bitmaps: "list[bytes]") -> list[tuple[int, int]]:
    """Write serialized bitmaps into one DV file; returns each DV's
    (offset, sizeInBytes) for the descriptors."""
    spans: list[tuple[int, int]] = []
    with open(path, "wb") as fh:
        fh.write(bytes([_DV_FILE_VERSION]))
        pos = 1
        for data in bitmaps:
            spans.append((pos, len(data)))
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            pos += 4 + len(data) + 4
    return spans


def dv_positions_from_descriptor(table_path: str, desc: dict) -> list[int]:
    """Deletion-vector descriptor (an add action's ``deletionVector``
    struct) → sorted deleted row indexes. Handles all three storage
    types: ``u`` (UUID-named file under the table, optional random
    prefix), ``p`` (absolute path), ``i`` (inline Z85 bytes)."""
    import os
    import uuid as uuid_mod

    st = desc["storageType"]
    payload = desc["pathOrInlineDv"]
    if st == "i":
        # inline bytes are zero-PADDED to Z85's 4-byte group size;
        # sizeInBytes carries the true serialized length to truncate to
        data = z85_decode(payload)[: int(desc["sizeInBytes"])]
        return decode_rbm_array(data)
    if st == "u":
        prefix, z = payload[:-20], payload[-20:]
        u = uuid_mod.UUID(bytes=z85_decode(z))
        name = f"deletion_vector_{u}.bin"
        path = os.path.join(table_path, prefix, name) if prefix else (
            os.path.join(table_path, name)
        )
    elif st == "p":
        path = payload
    else:
        raise NotImplementedError(
            f"deletion vector storageType {st!r}: use the delta-spark "
            "connector"
        )
    data = read_dv_file(path, int(desc["offset"]), int(desc["sizeInBytes"]))
    positions = decode_rbm_array(data)
    card = int(desc.get("cardinality", len(positions)))
    if card != len(positions):
        raise ValueError(
            f"DV cardinality {card} != decoded {len(positions)} positions"
        )
    return positions
