"""Training-shard export (operators/shards.py): portable deterministic
placement, reproducible writes, manifest integrity, and trainer-side
verification."""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators import shards as SH

ROWS = [(i, f"document number {i} with some text body " * (1 + i % 3))
        for i in range(200)]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string")


def test_assignment_is_portable_and_balanced(spark):
    """The Spark expression must equal a pure-Python md5 derivation (the
    portability contract the oracle relies on), and buckets must be
    roughly balanced."""
    import hashlib

    got = {
        r.doc_id: r.shard
        for r in _df(spark)
        .select("doc_id", SH.shard_assignment("doc_id", 16).alias("shard"))
        .collect()
    }
    for i, _ in ROWS:
        want = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 16
        assert got[i] == want
    sizes = sorted(
        sum(1 for v in got.values() if v == s) for s in range(16)
    )
    assert sizes[0] >= 3 and sizes[-1] <= 30  # 200 rows / 16 buckets


def test_write_shards_layout_manifest_and_round_trip(spark, tmp_path):
    path = str(tmp_path / "shards")
    manifest = SH.write_training_shards(_df(spark), path, n_shards=8)
    dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert len(dirs) == 8
    for d in dirs:  # one task per shard -> one file per shard
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    on_disk = json.load(open(os.path.join(path, SH.MANIFEST_FILE)))
    assert on_disk == manifest
    assert sum(s["n_docs"] for s in manifest["shards"]) == len(ROWS)
    # round trip: the written corpus is exactly the input set
    back = spark.read.parquet(path)
    assert back.count() == len(ROWS)
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        i for i, _ in ROWS
    }


def test_shard_file_content_is_reproducible(spark, tmp_path):
    """Two writes of the same corpus produce row-identical shard files
    (content-hash sort inside each shard — not just set-equal)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    SH.write_training_shards(_df(spark), a, n_shards=4)
    SH.write_training_shards(_df(spark), b, n_shards=4)
    for s in range(4):
        fa = glob.glob(os.path.join(a, f"shard={s}", "*.parquet"))[0]
        fb = glob.glob(os.path.join(b, f"shard={s}", "*.parquet"))[0]
        ta, tb = pq.read_table(fa), pq.read_table(fb)
        assert ta.column("doc_id").to_pylist() == tb.column("doc_id").to_pylist()


def test_verify_passes_then_catches_tampering(spark, tmp_path):
    path = str(tmp_path / "shards")
    SH.write_training_shards(_df(spark), path, n_shards=4)
    assert SH.verify_training_shards(spark, path).count() == 0
    # tamper: rewrite one shard file with a row dropped
    victim = glob.glob(os.path.join(path, "shard=1", "*.parquet"))[0]
    t = pq.read_table(victim)
    pq.write_table(t.slice(1), victim)
    # hadoop local FS keeps .crc sidecars; the rewritten bytes no longer
    # match, so drop the stale checksum (a real tamperer would too)
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.refreshByPath(path)  # drop the cached pre-tamper file size
    bad = SH.verify_training_shards(spark, path).collect()
    assert [r.shard for r in bad] == [1]
    assert bad[0].got_docs == bad[0].want_docs - 1


def test_plan_matches_manifest(spark, tmp_path):
    path = str(tmp_path / "shards")
    manifest = SH.write_training_shards(_df(spark), path, n_shards=8)
    plan = {
        r.shard: (r.n_docs, r.n_chars_total, r.content_xor)
        for r in SH.shard_plan(_df(spark), n_shards=8).collect()
    }
    for s in manifest["shards"]:
        assert plan[s["shard"]] == (
            s["n_docs"], s["n_chars_total"], s["content_xor"],
        )
