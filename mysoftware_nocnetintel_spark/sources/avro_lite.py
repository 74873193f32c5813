"""Minimal Apache Avro object-container codec (stdlib only).

Implements just enough of the PUBLIC Avro 1.11 spec
(avro.apache.org/docs/current/specification/) to read — and, for test
fixtures, write — Avro object container files: the ``Obj\\x01`` header with
its metadata map (``avro.schema`` JSON, ``avro.codec``), sync-marker framed
data blocks (null and deflate codecs), and the binary encoding of every
Avro type (zigzag varint ints/longs, length-prefixed bytes/strings,
IEEE float/double, records, enums, fixed, unions, and block-encoded
arrays/maps).

Why it exists: Apache Iceberg stores its manifest-list and manifest files
as Avro (iceberg.apache.org/spec/#manifests); this container has no Avro
or Iceberg jar, and those files are driver-side KB-scale metadata — a
pure-Python decode is appropriate there (the table DATA scan remains a
distributed parquet read). The production path is still the Iceberg
connector; see :func:`..readers.read_table_format`.

Not supported (fail fast): snappy/zstd codecs, schema resolution against a
reader schema, logical-type conversion (values surface as their base type).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, BinaryIO

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decoding
class _Reader:
    def __init__(self, buf: bytes):
        self._b = buf
        self._i = 0

    def read(self, n: int) -> bytes:
        if self._i + n > len(self._b):
            raise EOFError("truncated Avro data")
        out = self._b[self._i : self._i + n]
        self._i += n
        return out

    def at_end(self) -> bool:
        return self._i >= len(self._b)

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def value(self, schema: Any) -> Any:
        if isinstance(schema, list):  # union: branch index, then value
            return self.value(schema[self.long()])
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                return {
                    f["name"]: self.value(f["type"]) for f in schema["fields"]
                }
            if t == "array":
                out = []
                while True:
                    n = self.long()
                    if n == 0:
                        break
                    if n < 0:  # negative count: byte size follows, skip it
                        n = -n
                        self.long()
                    for _ in range(n):
                        out.append(self.value(schema["items"]))
                return out
            if t == "map":
                out = {}
                while True:
                    n = self.long()
                    if n == 0:
                        break
                    if n < 0:
                        n = -n
                        self.long()
                    for _ in range(n):
                        k = self.read(self.long()).decode()
                        out[k] = self.value(schema["values"])
                return out
            if t == "enum":
                return schema["symbols"][self.long()]
            if t == "fixed":
                return self.read(schema["size"])
            return self.value(t)  # {"type": "string", ...} wrapper
        # primitive names
        if schema == "null":
            return None
        if schema == "boolean":
            return self.read(1) == b"\x01"
        if schema in ("int", "long"):
            return self.long()
        if schema == "float":
            return struct.unpack("<f", self.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", self.read(8))[0]
        if schema == "bytes":
            return self.read(self.long())
        if schema == "string":
            return self.read(self.long()).decode()
        raise NotImplementedError(f"avro type {schema!r}")


def _resolve_named(schema: Any, names: dict[str, Any]) -> Any:
    """Register/inline named-type references (record/enum/fixed by name)."""
    if isinstance(schema, list):
        return [_resolve_named(s, names) for s in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            names[schema["name"]] = schema
            if schema.get("namespace"):  # references may use the fullname
                names[f"{schema['namespace']}.{schema['name']}"] = schema
            if t == "record":
                for f in schema["fields"]:
                    f["type"] = _resolve_named(f["type"], names)
        elif t == "array":
            schema["items"] = _resolve_named(schema["items"], names)
        elif t == "map":
            schema["values"] = _resolve_named(schema["values"], names)
        else:
            schema["type"] = _resolve_named(t, names)
        return schema
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def read_avro_file(path: str) -> tuple[Any, list[Any]]:
    """Read an Avro object container file → (writer schema, records)."""
    with open(path, "rb") as fh:
        data = fh.read()
    rd = _Reader(data)
    if rd.read(4) != _MAGIC:
        raise ValueError(f"not an Avro object container file: {path}")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = rd.value(meta_schema)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} (null/deflate only)")
    schema = _resolve_named(json.loads(meta["avro.schema"].decode()), {})
    sync = rd.read(16)
    records: list[Any] = []
    while not rd.at_end():
        n = rd.long()
        size = rd.long()
        block = rd.read(size)
        if codec == "deflate":  # raw DEFLATE, no zlib header (per spec)
            block = zlib.decompress(block, -15)
        brd = _Reader(block)
        for _ in range(n):
            records.append(brd.value(schema))
        if rd.read(16) != sync:
            raise ValueError(f"sync marker mismatch in {path}")
    return schema, records


# ---------------------------------------------------------------- encoding
# Writer subset used by tests to fabricate spec-compliant fixtures (and to
# round-trip-test the decoder). Null codec only.
def _union_branch(schema: list, v: Any) -> tuple[int, Any]:
    """Pick the union branch for a Python value by TYPE, in two passes:
    exact type match first (so ``["null","long","string"]`` holding a str
    selects ``string``, never ``long``), then a lenient pass that admits
    int→float/double widening. Record branches match when every field
    without a default is present in the value; among several matching
    record branches the first wins (Avro's own resolution is also
    first-match within a kind)."""

    def kind(b):
        return b if isinstance(b, str) else b["type"]

    def matches(b, strict: bool) -> bool:
        k = kind(b)
        if v is None:
            return k == "null"
        if isinstance(v, bool):
            return k == "boolean"
        if isinstance(v, int):
            if k in ("int", "long"):
                return True
            return not strict and k in ("float", "double")
        if isinstance(v, float):
            return k in ("float", "double")
        if isinstance(v, str):
            if k == "string":
                return True
            return k == "enum" and v in b.get("symbols", [])
        if isinstance(v, (bytes, bytearray)):
            if k == "bytes":
                return True
            return k == "fixed" and len(v) == b.get("size")
        if isinstance(v, list):
            return k == "array"
        if isinstance(v, dict):
            if k == "map":
                return True
            if k == "record":
                need = {
                    f["name"] for f in b["fields"] if "default" not in f
                }
                return need <= set(v)
            return False
        return False

    for strict in (True, False):
        for i, b in enumerate(schema):
            if matches(b, strict):
                return i, b
    raise ValueError(f"no union branch for {v!r} in {schema!r}")


class _Writer:
    def __init__(self):
        self._out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self._out.write(b)

    def long(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63)  # zigzag
        while True:
            bits = v & 0x7F
            v >>= 7
            if v:
                self.write(bytes([bits | 0x80]))
            else:
                self.write(bytes([bits]))
                break

    def value(self, schema: Any, v: Any) -> None:
        if isinstance(schema, list):
            i, branch = _union_branch(schema, v)
            self.long(i)
            self.value(branch, v)
            return
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                for f in schema["fields"]:
                    if f["name"] in v:
                        fv = v[f["name"]]
                    elif "default" in f:
                        fv = f["default"]  # absent key: encode the default
                    else:
                        raise KeyError(
                            f"record value missing field {f['name']!r} "
                            "and the schema declares no default"
                        )
                    self.value(f["type"], fv)
                return
            if t == "array":
                if v:
                    self.long(len(v))
                    for item in v:
                        self.value(schema["items"], item)
                self.long(0)
                return
            if t == "map":
                if v:
                    self.long(len(v))
                    for k, mv in v.items():
                        self.value("string", k)
                        self.value(schema["values"], mv)
                self.long(0)
                return
            if t == "enum":
                self.long(schema["symbols"].index(v))
                return
            if t == "fixed":
                self.write(v)
                return
            self.value(t, v)
            return
        if schema == "null":
            return
        if schema == "boolean":
            self.write(b"\x01" if v else b"\x00")
        elif schema in ("int", "long"):
            self.long(v)
        elif schema == "float":
            self.write(struct.pack("<f", v))
        elif schema == "double":
            self.write(struct.pack("<d", v))
        elif schema == "bytes":
            self.long(len(v))
            self.write(v)
        elif schema == "string":
            enc = v.encode()
            self.long(len(enc))
            self.write(enc)
        else:
            raise NotImplementedError(f"avro type {schema!r}")

    def getvalue(self) -> bytes:
        return self._out.getvalue()


def write_avro_file(
    path: str, schema: Any, records: list[Any], codec: str = "null"
) -> None:
    """Write records as an Avro object container file (null/deflate)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    sync = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"
    head = _Writer()
    head.write(_MAGIC)
    head.value(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        },
    )
    head.write(sync)
    body = _Writer()
    resolved = _resolve_named(json.loads(json.dumps(schema)), {})
    for r in records:
        body.value(resolved, r)
    payload = body.getvalue()
    if codec == "deflate":  # raw DEFLATE, no zlib header (per spec)
        payload = zlib.compress(payload)[2:-4]
    block = _Writer()
    block.long(len(records))
    block.long(len(payload))
    with open(path, "wb") as fh:
        fh.write(head.getvalue())
        if records:
            fh.write(block.getvalue())
            fh.write(payload)
            fh.write(sync)
