"""Iceberg v3 deletion-vector READ path (round 11 — the first "do" row
of docs/iceberg_v3_scope.md): Puffin container codec, the
`deletion-vector-v1` blob layout, the portable-64 roaring framing, and
the ORACLE-STYLE differential — a v3 table converted from a v2
position-delete table reads EXACTLY the same rows. The v3 gate narrows:
DV-bearing v3 tables read natively; row lineage / default values / new
types / v4 still refuse loudly, and every WRITER verb refuses v3.
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from glob import glob

import pytest

from mysoftware_nocnetintel_spark.sources import puffin as P
from mysoftware_nocnetintel_spark.sources import roaring as R
from mysoftware_nocnetintel_spark.sources.iceberg import (
    write_iceberg_append,
    write_iceberg_position_deletes,
)
from mysoftware_nocnetintel_spark.sources.puffin import (
    convert_iceberg_position_deletes_to_dvs,
)
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "id bigint, val string"
    )


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


def _meta(path):
    vs = sorted(
        glob(os.path.join(path, "metadata", "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )
    with open(vs[-1]) as fh:
        return json.load(fh), vs[-1]


# ------------------------------------------------------------- codec


def test_portable64_round_trip_and_framing():
    cases = [
        [],
        [0],
        [0, 1, 2, 65535, 65536, 100_000],
        list(range(0, 10_000, 3)),
        [7, (1 << 32) + 1, (1 << 32) + 2, (5 << 32) + 123456],
    ]
    for pos in cases:
        buf = R.encode_portable64(pos)
        assert R.decode_portable64(buf) == sorted(set(pos))
    # framing pins: LE bucket count, LE high key, then the SAME 32-bit
    # portable payload the Delta codec emits (shared containers)
    buf = R.encode_portable64([3, 9])
    (n,) = struct.unpack_from("<q", buf, 0)
    (hi,) = struct.unpack_from("<I", buf, 8)
    assert (n, hi) == (1, 0)
    assert buf[12:] == R.encode_rbm_array([3, 9])[12:]  # skip magic+count
    # empty buckets are forbidden on read
    bad = struct.pack("<q", 1) + struct.pack("<I", 0) + R._encode_rb32([])
    with pytest.raises(ValueError, match="empty bucket"):
        R.decode_portable64(bad)
    # non-ascending keys refused
    two = (
        struct.pack("<q", 2)
        + struct.pack("<I", 5)
        + R.encode_portable64([1])[12:]
        + struct.pack("<I", 5)
        + R.encode_portable64([2])[12:]
    )
    with pytest.raises(ValueError, match="ascending"):
        R.decode_portable64(two)


def test_dv_blob_layout_and_checks():
    pos = [1, 2, 100]
    blob = P.encode_dv_blob(pos)
    # layout: int32 BE len(magic+vector) | D1 D3 39 64 | vector | CRC BE
    (combined,) = struct.unpack_from(">i", blob, 0)
    assert combined == len(blob) - 8
    assert blob[4:8] == b"\xd1\xd3\x39\x64"
    # the blob magic IS Delta's RoaringBitmapArray magic, little-endian
    assert blob[4:8] == struct.pack("<i", 1681511377)
    (crc,) = struct.unpack_from(">I", blob, len(blob) - 4)
    assert crc == (zlib.crc32(blob[4:-4]) & 0xFFFFFFFF)
    assert P.decode_dv_blob(blob) == pos
    # corrupt one vector byte -> CRC mismatch
    bad = bytearray(blob)
    bad[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        P.decode_dv_blob(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        P.decode_dv_blob(blob[:4] + b"XXXX" + blob[8:])
    with pytest.raises(ValueError, match="length"):
        P.decode_dv_blob(blob + b"\x00")


def test_puffin_container_round_trip(tmp_path):
    p = str(tmp_path / "t.puffin")
    blobs = [
        {
            "type": P.DV_BLOB_TYPE,
            "data": P.encode_dv_blob([1, 5]),
            "snapshot-id": 42,
            "sequence-number": 7,
            "properties": {"referenced-data-file": "a.parquet",
                           "cardinality": "2"},
        },
        {
            "type": P.DV_BLOB_TYPE,
            "data": P.encode_dv_blob([0]),
            "properties": {"referenced-data-file": "b.parquet",
                           "cardinality": "1"},
        },
    ]
    metas = P.write_puffin_file(p, blobs, properties={"created-by": "test"})
    foot = P.read_puffin_footer(p)
    assert foot["properties"] == {"created-by": "test"}
    assert [b["offset"] for b in foot["blobs"]] == [m["offset"] for m in metas]
    assert foot["blobs"][0]["offset"] == 4  # first blob right after magic
    assert foot["blobs"][0]["snapshot-id"] == 42
    for m, want in zip(metas, ([1, 5], [0])):
        assert P.dv_positions_from_puffin(p, m["offset"], m["length"]) == want
    # structural refusals
    with open(p, "rb") as fh:
        raw = bytearray(fh.read())
    bad = str(tmp_path / "bad.puffin")
    with open(bad, "wb") as fh:
        fh.write(b"XXXX" + raw[4:])
    with pytest.raises(ValueError, match="magic"):
        P.read_puffin_footer(bad)
    # compressed-footer flag refused (flags live at [-8:-4], byte 0)
    comp = bytearray(raw)
    comp[-8] |= 0x01
    with open(bad, "wb") as fh:
        fh.write(comp)
    with pytest.raises(NotImplementedError, match="LZ4"):
        P.read_puffin_footer(bad)


# ------------------------------------------- conversion + differential


def test_v3_dv_table_reads_exactly_like_v2(spark, tmp_path):
    """The oracle-style differential the verdict asks for: the same
    logical table as (a) v2 + position-delete files and (b) v3 + Puffin
    deletion vectors returns IDENTICAL rows, across multiple data files
    and multiple delete commits touching the same file (positions
    merged into one DV per data file)."""
    v2 = str(tmp_path / "v2")
    v3 = str(tmp_path / "v3")
    from pyspark.sql import functions as F

    for root in (v2, v3):
        write_iceberg_append(_df(spark, 0, 10), root)
        write_iceberg_append(_df(spark, 10, 20), root)
        write_iceberg_position_deletes(spark, root, F.col("id") % 3 == 0)
        write_iceberg_position_deletes(spark, root, F.col("id") == 1)
    expect = _rows(read_iceberg_snapshot(spark, v2))
    assert len(expect) == 12  # 20 - 7 multiples of 3 - id 1

    convert_iceberg_position_deletes_to_dvs(v3)
    meta, _ = _meta(v3)
    assert meta["format-version"] == 3
    got = read_iceberg_snapshot(spark, v3)
    assert _rows(got) == expect
    assert got.schema == read_iceberg_snapshot(spark, v2).schema

    # the conversion really did produce PUFFIN DV entries: one blob per
    # referenced data file, merged across the two delete commits
    from mysoftware_nocnetintel_spark.sources.avro_lite import read_avro_file

    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, manifests = read_avro_file(snap["manifest-list"])
    dv_entries = []
    for m in manifests:
        if m.get("content", 0) != 1:
            continue
        _, entries = read_avro_file(m["manifest_path"])
        dv_entries.extend(e for e in entries if e.get("status") != 2)
    assert dv_entries and all(
        e["data_file"]["file_format"] == "PUFFIN" for e in dv_entries
    )
    refs = [e["data_file"]["referenced_data_file"] for e in dv_entries]
    assert len(refs) == len(set(refs))  # at most ONE DV per data file
    puffins = {e["data_file"]["file_path"] for e in dv_entries}
    assert len(puffins) == 1  # one container for the whole commit


def test_v3_dv_time_travel_and_empty_delete_convert(spark, tmp_path):
    root = str(tmp_path / "tt")
    write_iceberg_append(_df(spark, 0, 5), root)
    pre_meta, _ = _meta(root)
    pre_snap = pre_meta["current-snapshot-id"]
    from pyspark.sql import functions as F

    write_iceberg_position_deletes(spark, root, F.col("id") < 2)
    convert_iceberg_position_deletes_to_dvs(root)
    assert {r.id for r in read_iceberg_snapshot(spark, root).collect()} == {
        2, 3, 4,
    }
    # pre-conversion snapshot still reads (v2-era manifests untouched)
    old = read_iceberg_snapshot(spark, root, snapshot_id=pre_snap)
    assert {r.id for r in old.collect()} == {0, 1, 2, 3, 4}
    # converting a table with NO position deletes still bumps cleanly
    plain = str(tmp_path / "plain")
    write_iceberg_append(_df(spark, 0, 3), plain)
    convert_iceberg_position_deletes_to_dvs(plain)
    meta, _ = _meta(plain)
    assert meta["format-version"] == 3
    assert read_iceberg_snapshot(spark, plain).count() == 3


# ------------------------------------------------------- gate narrowing


def test_v3_gate_refuses_unhandled_features(spark, tmp_path):
    root = str(tmp_path / "g")
    write_iceberg_append(_df(spark, 0, 3), root)
    meta, last = _meta(root)
    meta_dir = os.path.dirname(last)
    v = int(os.path.basename(last)[1:].split(".")[0])

    def _bump(m):
        nonlocal v
        v += 1
        with open(os.path.join(meta_dir, f"v{v}.metadata.json"), "w") as fh:
            json.dump(m, fh)

    # plain v3 (no lineage/defaults/new types) now READS
    m3 = dict(meta, **{"format-version": 3})
    _bump(m3)
    assert read_iceberg_snapshot(spark, root).count() == 3

    # row lineage refused (both spellings)
    _bump(dict(m3, **{"next-row-id": 100}))
    with pytest.raises(NotImplementedError, match="row lineage"):
        read_iceberg_snapshot(spark, root).count()
    lineage_snaps = [
        dict(s, **{"first-row-id": 0}) for s in m3["snapshots"]
    ]
    _bump(dict(m3, snapshots=lineage_snaps))
    with pytest.raises(NotImplementedError, match="row lineage"):
        read_iceberg_snapshot(spark, root).count()

    # default values refused
    m_def = json.loads(json.dumps(m3))
    m_def["schemas"][0]["fields"][1]["initial-default"] = "x"
    _bump(m_def)
    with pytest.raises(NotImplementedError, match="default values"):
        read_iceberg_snapshot(spark, root).count()

    # v3-only types refused
    m_typ = json.loads(json.dumps(m3))
    m_typ["schemas"][0]["fields"][1]["type"] = "variant"
    _bump(m_typ)
    with pytest.raises(NotImplementedError, match="variant"):
        read_iceberg_snapshot(spark, root).count()

    # v4 refused outright
    _bump(dict(meta, **{"format-version": 4}))
    with pytest.raises(NotImplementedError, match="format-version 4"):
        read_iceberg_snapshot(spark, root).count()


def test_writer_verbs_refuse_v3(spark, tmp_path):
    """Every metadata-loading write/maintenance verb fails closed on a
    v3 table — committing v2-shaped snapshots would drop v3 invariants."""
    root = str(tmp_path / "w")
    write_iceberg_append(_df(spark, 0, 4), root)
    from pyspark.sql import functions as F

    write_iceberg_position_deletes(spark, root, F.col("id") == 0)
    convert_iceberg_position_deletes_to_dvs(root)
    with pytest.raises(NotImplementedError, match="format-version 3"):
        write_iceberg_append(_df(spark, 4, 6), root)
    with pytest.raises(NotImplementedError, match="format-version 3"):
        write_iceberg_position_deletes(spark, root, F.col("id") == 2)
    # re-converting is refused by the same gate (idempotence = refusal)
    with pytest.raises(NotImplementedError, match="format-version 3"):
        convert_iceberg_position_deletes_to_dvs(root)


def test_puffin_entry_missing_coordinates_refused(spark, tmp_path):
    root = str(tmp_path / "m")
    write_iceberg_append(_df(spark, 0, 4), root)
    from pyspark.sql import functions as F

    write_iceberg_position_deletes(spark, root, F.col("id") == 0)
    convert_iceberg_position_deletes_to_dvs(root)
    # strip the coordinates from the DV manifest -> loud refusal
    from mysoftware_nocnetintel_spark.sources.avro_lite import (
        read_avro_file,
        write_avro_file,
    )
    from mysoftware_nocnetintel_spark.sources.puffin import (
        MANIFEST_ENTRY_SCHEMA_V3_DV,
    )

    meta, _ = _meta(root)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, manifests = read_avro_file(snap["manifest-list"])
    dv_m = next(m for m in manifests if m.get("content", 0) == 1)
    _, entries = read_avro_file(dv_m["manifest_path"])
    for e in entries:
        e["data_file"]["referenced_data_file"] = None
    write_avro_file(
        dv_m["manifest_path"], MANIFEST_ENTRY_SCHEMA_V3_DV, entries
    )
    with pytest.raises(NotImplementedError, match="PUFFIN delete entry"):
        read_iceberg_snapshot(spark, root).count()


def test_v3_gate_recurses_into_nested_types(spark, tmp_path):
    """Round-11 review fix: defaults and v3-only types hiding inside
    struct/list/map nesting are refused, not misread."""
    root = str(tmp_path / "nest")
    write_iceberg_append(_df(spark, 0, 2), root)
    meta, last = _meta(root)
    meta_dir = os.path.dirname(last)
    v = int(os.path.basename(last)[1:].split(".")[0])
    m3 = dict(meta, **{"format-version": 3})

    def _bump(m):
        nonlocal v
        v += 1
        with open(os.path.join(meta_dir, f"v{v}.metadata.json"), "w") as fh:
            json.dump(m, fh)

    # variant nested inside a struct
    m = json.loads(json.dumps(m3))
    m["schemas"][0]["fields"].append(
        {
            "id": 99,
            "name": "s",
            "required": False,
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 100, "name": "g", "required": False,
                     "type": "variant"}
                ],
            },
        }
    )
    _bump(m)
    with pytest.raises(NotImplementedError, match="variant"):
        read_iceberg_snapshot(spark, root).count()
    # initial-default nested inside a list<struct>
    m = json.loads(json.dumps(m3))
    m["schemas"][0]["fields"].append(
        {
            "id": 99,
            "name": "l",
            "required": False,
            "type": {
                "type": "list",
                "element-id": 101,
                "element-required": False,
                "element": {
                    "type": "struct",
                    "fields": [
                        {"id": 102, "name": "d", "required": False,
                         "type": "int", "initial-default": 7}
                    ],
                },
            },
        }
    )
    _bump(m)
    with pytest.raises(NotImplementedError, match="default values"):
        read_iceberg_snapshot(spark, root).count()
    # geometry as a map value
    m = json.loads(json.dumps(m3))
    m["schemas"][0]["fields"].append(
        {
            "id": 99,
            "name": "m",
            "required": False,
            "type": {
                "type": "map",
                "key-id": 103,
                "key": "string",
                "value-id": 104,
                "value-required": False,
                "value": "geometry(srid)",
            },
        }
    )
    _bump(m)
    with pytest.raises(NotImplementedError, match="geometry"):
        read_iceberg_snapshot(spark, root).count()


def test_convert_guards_no_snapshot_and_true_noop(spark, tmp_path):
    """Round-11 review fixes: a snapshot-less table converts with a
    clean error (no bare StopIteration), and a table with NO position
    deletes bumps the format version WITHOUT minting a no-op snapshot."""
    import json as _json

    root = str(tmp_path / "plain2")
    write_iceberg_append(_df(spark, 0, 3), root)
    meta, last = _meta(root)
    pre_snap = meta["current-snapshot-id"]
    out = convert_iceberg_position_deletes_to_dvs(root)
    assert out == pre_snap  # NO new snapshot for a delete-less table
    meta2, _ = _meta(root)
    assert meta2["format-version"] == 3
    assert meta2["current-snapshot-id"] == pre_snap
    assert len(meta2["snapshots"]) == len(meta["snapshots"])
    assert read_iceberg_snapshot(spark, root).count() == 3

    # snapshot-less metadata: clean ValueError, not StopIteration
    bare = str(tmp_path / "bare")
    write_iceberg_append(_df(spark, 0, 1), bare)
    m, last = _meta(bare)
    m = dict(m, **{"current-snapshot-id": -1, "snapshots": []})
    meta_dir = os.path.dirname(last)
    v = int(os.path.basename(last)[1:].split(".")[0]) + 1
    with open(os.path.join(meta_dir, f"v{v}.metadata.json"), "w") as fh:
        _json.dump(m, fh)
    with pytest.raises(ValueError, match="no current snapshot"):
        convert_iceberg_position_deletes_to_dvs(bare)


def test_readonly_inspectors_work_on_v3(spark, tmp_path):
    """Round-11 review fix: the read-only metadata verbs (snapshot
    listing/diff, refs, partition specs, row counts, incremental read)
    accept a v3 table — only write/maintenance verbs refuse."""
    from pyspark.sql import functions as F

    from mysoftware_nocnetintel_spark.sources.iceberg import (
        iceberg_partition_specs,
        iceberg_refs,
        iceberg_snapshot_diff,
        iceberg_snapshots,
        partition_row_counts,
        read_iceberg_incremental,
        resolve_iceberg_ref,
    )

    root = str(tmp_path / "ro")
    write_iceberg_append(_df(spark, 0, 4), root)
    meta0, _ = _meta(root)
    first_snap = meta0["current-snapshot-id"]
    write_iceberg_append(_df(spark, 4, 8), root)
    write_iceberg_position_deletes(spark, root, F.col("id") == 0)
    convert_iceberg_position_deletes_to_dvs(root)

    snaps = iceberg_snapshots(spark, root).collect()
    assert len(snaps) >= 3
    assert iceberg_refs(spark, root).count() >= 1
    assert resolve_iceberg_ref(root, "main") == _meta(root)[0][
        "current-snapshot-id"
    ]
    assert iceberg_partition_specs(spark, root).count() >= 1
    # partitioned v3 twin: DV delete content present -> exact metadata
    # counts must DECLINE (None), never overcount — but the verb runs
    part = str(tmp_path / "rop")
    both = spark.createDataFrame(
        [("d1", 0, "a"), ("d2", 1, "b")], "day string, id bigint, val string"
    )
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        write_iceberg_append as _wa,
    )

    _wa(both, part, partition_by=("day",))
    write_iceberg_position_deletes(spark, part, F.col("id") == 0)
    convert_iceberg_position_deletes_to_dvs(part)
    assert partition_row_counts(part, "day") is None
    # incremental read reaches its own (documented) non-append refusal
    # on this range — i.e. the v3 gate admits the verb; the range rule,
    # not the format version, decides
    with pytest.raises(NotImplementedError, match="not appends"):
        read_iceberg_incremental(spark, root, first_snap).count()
    diff = iceberg_snapshot_diff(
        spark, root, first_snap, _meta(root)[0]["current-snapshot-id"]
    )
    assert diff.count() >= 1


# ------------------------------------------------------- DV write path


def test_dv_write_replace_discipline(spark, tmp_path):
    """write_iceberg_dv_deletes (the scope doc's write-path row): two
    successive DV deletes leave at most ONE DV per data file at the
    head (replacement = union of old and new positions), intermediate
    snapshots time-travel exactly, re-deleting dead rows is a no-op,
    and the result matches a v2 position-delete twin row-for-row."""
    from pyspark.sql import functions as F

    from mysoftware_nocnetintel_spark.sources.avro_lite import read_avro_file
    from mysoftware_nocnetintel_spark.sources.puffin import (
        write_iceberg_dv_deletes,
    )

    v2 = str(tmp_path / "v2")
    v3 = str(tmp_path / "v3")
    for root in (v2, v3):
        write_iceberg_append(_df(spark, 0, 10), root)
        write_iceberg_append(_df(spark, 10, 20), root)
    convert_iceberg_position_deletes_to_dvs(v3)  # plain v3, no deletes

    s1 = write_iceberg_dv_deletes(spark, v3, F.col("id") % 3 == 0)
    assert s1 is not None
    write_iceberg_position_deletes(spark, v2, F.col("id") % 3 == 0)
    assert _rows(read_iceberg_snapshot(spark, v3)) == _rows(
        read_iceberg_snapshot(spark, v2)
    )
    s2 = write_iceberg_dv_deletes(spark, v3, F.col("id") == 1)
    write_iceberg_position_deletes(spark, v2, F.col("id") == 1)
    assert _rows(read_iceberg_snapshot(spark, v3)) == _rows(
        read_iceberg_snapshot(spark, v2)
    )
    # time travel: the intermediate snapshot still masks only %3
    mid = {r.id for r in read_iceberg_snapshot(
        spark, v3, snapshot_id=s1
    ).collect()}
    assert mid == {i for i in range(20) if i % 3 != 0}
    # at most ONE live DV entry per data file at the head
    meta, _ = _meta(v3)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, manifests = read_avro_file(snap["manifest-list"])
    refs = []
    for m in manifests:
        if m.get("content", 0) != 1:
            continue
        _, entries = read_avro_file(m["manifest_path"])
        refs.extend(
            e["data_file"]["referenced_data_file"]
            for e in entries
            if e.get("status") != 2
        )
    assert refs and len(refs) == len(set(refs)), refs
    # the file holding id 1 (first append) carries the UNION dv: its
    # old %3 positions plus the new id==1 position
    assert s2 is not None and s2 != s1
    # re-deleting already-dead rows: no live match -> no-op, no commit
    before = _meta(v3)[0]["current-snapshot-id"]
    assert write_iceberg_dv_deletes(spark, v3, F.col("id") == 0) is None
    assert _meta(v3)[0]["current-snapshot-id"] == before


def test_dv_write_refusals(spark, tmp_path):
    from pyspark.sql import functions as F

    from mysoftware_nocnetintel_spark.sources.puffin import (
        write_iceberg_dv_deletes,
    )

    v2 = str(tmp_path / "v2only")
    write_iceberg_append(_df(spark, 0, 4), v2)
    with pytest.raises(ValueError, match="format-version-3"):
        write_iceberg_dv_deletes(spark, v2, F.col("id") == 0)


def test_tailer_with_pin_ref_survives_v3_conversion(spark, tmp_path):
    """Round-11 review fix: a pinned-ref tailer consuming a table that
    is CONVERTED to format-version 3 mid-consumption keeps working —
    poll() reads v3 natively and commit() moves the pin ref through the
    (pointer-only, now v3-admitting) ref verbs instead of wedging at
    the offset commit after downstream work was already done."""
    from pyspark.sql import functions as F

    from mysoftware_nocnetintel_spark.streaming.ops import IcebergTailer

    path = str(tmp_path / "t")
    write_iceberg_append(_df(spark, 0, 3), path)
    t = IcebergTailer(
        spark,
        path,
        str(tmp_path / "ckpt"),
        pin_ref="consumer-x",
        net_changes=True,  # the conversion range masks rows (delete)
    )
    assert {r.id for r in t.poll().collect()} == {0, 1, 2}
    t.commit()  # pins the ref on the v2 table
    write_iceberg_append(_df(spark, 3, 5), path)
    write_iceberg_position_deletes(spark, path, F.col("id") == 0)
    convert_iceberg_position_deletes_to_dvs(path)  # table is v3 now
    batch = t.poll()  # delete+replace range -> full-diff consumption
    assert batch is not None
    t.commit()  # ref move on a v3 table must succeed (pointer-only)
    assert t.poll() is None  # caught up on the v3 table


# ------------------------------------------------- property (hypothesis)

from hypothesis import given, settings
from hypothesis import strategies as st

_POSITIONS = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=200_000),  # dense low range
        st.integers(min_value=0, max_value=(1 << 40) - 1),  # multi-bucket
    ),
    max_size=400,
)


@given(_POSITIONS)
@settings(max_examples=200, deadline=None)
def test_portable64_property_round_trip(positions):
    assert R.decode_portable64(R.encode_portable64(positions)) == sorted(
        set(positions)
    )


@given(_POSITIONS)
@settings(max_examples=200, deadline=None)
def test_dv_blob_property_round_trip(positions):
    blob = P.encode_dv_blob(positions)
    assert P.decode_dv_blob(blob) == sorted(set(positions))


@given(st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_dv_blob_decoder_never_misreads_garbage(data):
    """Arbitrary bytes either decode to a valid position list or raise
    ValueError/struct.error — never a silent wrong answer or a crash of
    another kind (the fail-fast posture of every codec here)."""
    try:
        out = P.decode_dv_blob(data)
    except (ValueError, struct.error):
        return
    assert out == sorted(set(out)) and all(p >= 0 for p in out)
    # anything that decodes must re-encode to the same position set
    assert P.decode_dv_blob(P.encode_dv_blob(out)) == out
