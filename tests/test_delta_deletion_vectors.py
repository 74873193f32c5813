"""Delta DELETION VECTORS: merge-on-read DELETE + masked reads.

Covers the full chain built from delta.io PROTOCOL.md ("Deletion
Vectors", descriptor schema, DV file format v1) and the public
RoaringBitmapArray/Roaring portable serialization specs:

- byte-PINNED codec vectors (so encoder+decoder can't drift into a
  self-consistent-but-wrong pair) + a randomized round-trip property,
- ``delete_delta_rows`` → masked ``read_delta_snapshot``, stacked
  deletes (DV merge), time travel to the pre-delete version,
- hand-built fixtures for inline (``i``) and absolute-path (``p``)
  storage types and for run-container bitmaps another engine may write,
- corruption (CRC) and unbounded-DELETE refusals.
"""

from __future__ import annotations

import json
import os
import random
import struct
import zlib

import pytest

from mysoftware_nocnetintel_spark.sources.delta import (
    delete_delta_rows,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot
from mysoftware_nocnetintel_spark.sources.roaring import (
    decode_rbm_array,
    encode_rbm_array,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


# ---------- codec ----------

def test_z85_published_vector():
    # ZeroMQ RFC 32's reference test case
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw


def test_roaring_pinned_bytes():
    """{0,2,5} serialized by hand per RoaringFormatSpec + the
    RoaringBitmapArray wrapper (magic 1681511377, int64 bitmap count)."""
    rb32 = (
        struct.pack("<ii", 12346, 1)        # cookie, 1 container
        + struct.pack("<HH", 0, 2)          # key 0, cardinality-1 = 2
        + struct.pack("<i", 16)             # offset of the payload
        + struct.pack("<3H", 0, 2, 5)       # array container values
    )
    pinned = struct.pack("<iq", 1681511377, 1) + rb32
    assert encode_rbm_array([0, 2, 5]) == pinned
    assert decode_rbm_array(pinned) == [0, 2, 5]


def test_roaring_run_container_decodes():
    """Another engine may serialize run containers (cookie 12347 +
    run-flag bitset): hand-built runs {10..14, 100..101} must decode."""
    rb32 = (
        struct.pack("<i", 12347 | ((1 - 1) << 16))  # 1 container
        + bytes([0b1])                               # container 0 is a run
        + struct.pack("<HH", 0, 6)                   # key, cardinality-1
        + struct.pack("<H", 2)                       # 2 runs
        + struct.pack("<HH", 10, 4)                  # 10 len-1=4 → 10..14
        + struct.pack("<HH", 100, 1)                 # 100..101
    )
    buf = struct.pack("<iq", 1681511377, 1) + rb32
    assert decode_rbm_array(buf) == [10, 11, 12, 13, 14, 100, 101]


@pytest.mark.parametrize("seed", [3, 19])
def test_roaring_roundtrip_property(seed):
    rng = random.Random(seed)
    for _ in range(30):
        n = rng.randint(0, 6000)
        hi_bits = rng.choice([16, 17, 20, 33, 34])
        s = [rng.randrange(0, 1 << hi_bits) for _ in range(n)]
        assert decode_rbm_array(encode_rbm_array(s)) == sorted(set(s))
    dense = list(range(5000)) + [1 << 33]  # forces a bitmap container
    assert decode_rbm_array(encode_rbm_array(dense)) == sorted(set(dense))


# ---------- merge-on-read DELETE ----------

def _table(spark, tmp_path, name="dvt", n=20):
    root = str(tmp_path / name)
    write_delta_append(
        spark.createDataFrame(
            [(i, chr(97 + i % 26)) for i in range(n)],
            "id bigint, val string",
        ).coalesce(2),
        root,
    )
    return root


def test_delete_masks_rows_and_time_travel(spark, tmp_path):
    root = _table(spark, tmp_path)
    all_rows = _rows(read_delta_snapshot(spark, root))
    v = delete_delta_rows(spark, root, "id % 3 = 0")
    got = _rows(read_delta_snapshot(spark, root))
    assert got == {(i, v_) for i, v_ in all_rows if i % 3 != 0}
    # the data files were NOT rewritten (merge-on-read)
    assert _rows(read_delta_snapshot(spark, root, version=v - 1)) == all_rows
    # a DV file exists and the add actions carry descriptors
    assert any(
        f.startswith("deletion_vector_") for f in os.listdir(root)
    )


def test_stacked_deletes_merge(spark, tmp_path):
    root = _table(spark, tmp_path, "dvt2")
    delete_delta_rows(spark, root, "id < 5")
    delete_delta_rows(spark, root, "id >= 15")
    got = {r.id for r in read_delta_snapshot(spark, root).collect()}
    assert got == set(range(5, 15))
    # second DV descriptor's cardinality covers the union for any file
    # both deletes touched
    log_dir = os.path.join(root, "_delta_log")
    with open(os.path.join(log_dir, f"{2:020d}.json")) as fh:
        descs = [
            json.loads(line)["add"]["deletionVector"]
            for line in fh
            if line.strip() and "add" in json.loads(line)
        ]
    assert descs and all(d["storageType"] == "u" for d in descs)


def test_delete_then_append_then_read(spark, tmp_path):
    root = _table(spark, tmp_path, "dvt3")
    delete_delta_rows(spark, root, "id = 7")
    write_delta_append(
        spark.createDataFrame([(100, "zz")], "id bigint, val string"), root
    )
    got = {r.id for r in read_delta_snapshot(spark, root).collect()}
    assert 7 not in got and 100 in got and len(got) == 20


def test_delete_refusals(spark, tmp_path):
    root = _table(spark, tmp_path, "dvt4")
    with pytest.raises(ValueError, match="matched no rows"):
        delete_delta_rows(spark, root, "id = 9999")
    import mysoftware_nocnetintel_spark.sources.delta as delta_mod

    orig = delta_mod._MAX_DELETE_POSITIONS
    delta_mod._MAX_DELETE_POSITIONS = 3
    try:
        with pytest.raises(NotImplementedError, match="copy-on-write"):
            delete_delta_rows(spark, root, "id >= 0")
    finally:
        delta_mod._MAX_DELETE_POSITIONS = orig


def test_dv_checksum_corruption_detected(spark, tmp_path):
    root = _table(spark, tmp_path, "dvt5")
    delete_delta_rows(spark, root, "id % 2 = 0")
    dv_file = next(
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.startswith("deletion_vector_")
    )
    data = bytearray(open(dv_file, "rb").read())
    data[7] ^= 0xFF  # flip a bitmap byte, leave the stored CRC
    open(dv_file, "wb").write(bytes(data))
    with pytest.raises(Exception, match="checksum|magic|cookie"):
        read_delta_snapshot(spark, root).collect()


# ---------- foreign-engine fixture shapes ----------

def _manual_table(spark, tmp_path, name, dv_desc):
    """One-file table whose single add action carries ``dv_desc``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"id": list(range(10)), "val": [str(i) for i in range(10)]}),
        os.path.join(root, "part-0000.parquet"),
    )
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors"],
                        "writerFeatures": ["deletionVectors"],
                    }
                }
            )
            + "\n"
        )
        fh.write(
            json.dumps(
                {
                    "add": {
                        "path": "part-0000.parquet",
                        "partitionValues": {},
                        "dataChange": True,
                        "deletionVector": dv_desc,
                    }
                }
            )
            + "\n"
        )
    return root


def test_inline_dv_storage(spark, tmp_path):
    """storageType ``i``: Z85 inline bytes, zero-padded to the codec's
    4-byte group size; sizeInBytes restores the true length on decode."""
    bitmap = encode_rbm_array([0, 3, 4])
    pad = (-len(bitmap)) % 4
    root = _manual_table(
        spark,
        tmp_path,
        "dv-inline",
        {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(bitmap + b"\x00" * pad),
            "sizeInBytes": len(bitmap),
            "cardinality": 3,
        },
    )
    got = {int(r.id) for r in read_delta_snapshot(spark, root).collect()}
    assert got == {1, 2, 5, 6, 7, 8, 9}


def test_absolute_path_dv_storage(spark, tmp_path):
    bitmap = encode_rbm_array([1, 2])
    dv_path = str(tmp_path / "external_dv.bin")
    ((offset, size),) = write_dv_file(dv_path, [bitmap])
    root = _manual_table(
        spark,
        tmp_path,
        "dv-abspath",
        {
            "storageType": "p",
            "pathOrInlineDv": dv_path,
            "offset": offset,
            "sizeInBytes": size,
            "cardinality": 2,
        },
    )
    got = {int(r.id) for r in read_delta_snapshot(spark, root).collect()}
    assert got == {0, 3, 4, 5, 6, 7, 8, 9}


# ---------- vacuum ----------

def test_vacuum_reclaims_tombstones_and_orphan_dvs(spark, tmp_path):
    """After overwrite + stacked deletes: vacuum with retention 0 removes
    tombstoned data files and superseded DV files, keeps everything the
    head snapshot references, and breaks only EXPIRED time travel."""
    from mysoftware_nocnetintel_spark.sources.delta import (
        vacuum_delta,
        write_delta_overwrite,
    )

    root = _table(spark, tmp_path, "dvv", n=12)
    delete_delta_rows(spark, root, "id < 3")      # DV #1
    delete_delta_rows(spark, root, "id >= 10")    # DV #2 (supersedes #1)
    head_before = _rows(read_delta_snapshot(spark, root))
    write_delta_append(
        spark.createDataFrame([(50, "x")], "id bigint, val string"), root
    )
    v_ow = write_delta_overwrite(
        spark.createDataFrame(
            sorted(head_before | {(50, "x")}), "id bigint, val string"
        ),
        root,
    )
    head = _rows(read_delta_snapshot(spark, root))

    # a generous retention removes nothing
    assert vacuum_delta(root) == []
    assert _rows(read_delta_snapshot(spark, root)) == head

    deleted = vacuum_delta(root, retention_ms=0, now_ms=2**62)
    assert deleted, "expected tombstoned data files + orphan DVs removed"
    assert any(d.startswith("deletion_vector_") for d in deleted)
    # head still reads exactly the same
    assert _rows(read_delta_snapshot(spark, root)) == head
    # expired time travel now fails at scan (files physically gone)
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_delta_snapshot(spark, root, version=v_ow - 1).collect()


def test_vacuum_refuses_foreign_table(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.delta import vacuum_delta

    root = _manual_table(
        spark,
        tmp_path,
        "dv-foreign",
        {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(
                encode_rbm_array([0]) + b"\x00" * ((-len(encode_rbm_array([0]))) % 4)
            ),
            "sizeInBytes": len(encode_rbm_array([0])),
            "cardinality": 1,
        },
    )
    with pytest.raises(NotImplementedError, match="another writer"):
        vacuum_delta(root)
