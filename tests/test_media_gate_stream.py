"""Streaming MEDIA ingestion gate (streaming/ops.media_gate_batch /
media_gated_stream_append): micro-batches of image payloads are
perceptual-hash gated against the persisted Hamming index; novel media
lands in the corpus AND its signature registers — both exactly-once
under replay."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators import multimodal as MM
from mysoftware_nocnetintel_spark.operators.hamming_index import (
    build_hamming_index,
)
from mysoftware_nocnetintel_spark.sources.readers import read_delta_snapshot
from mysoftware_nocnetintel_spark.streaming.ops import (
    media_gate_batch,
    media_gated_stream_append,
)

SCHEMA = "doc_id bigint, media binary"


def _img(seed, size=16):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def _signer(df):
    return (
        MM.image_hashes(df.select("doc_id", "media"), "media")
        .where(F.col("dhash").isNotNull())
        .select(F.col("doc_id").alias("doc"), F.col("dhash").alias("sig"))
    )


def _setup(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus")
    index_path = str(tmp_path / "index")
    seed_rows = [(i, MM.png_encode(_img(i))) for i in range(3)]
    seed = spark.createDataFrame(seed_rows, SCHEMA)
    from mysoftware_nocnetintel_spark.sources.delta import write_delta_append

    write_delta_append(seed, corpus_path)
    build_hamming_index(_signer(seed), index_path, family="dhash")
    return corpus_path, index_path


def _corpus_ids(spark, corpus_path):
    return sorted(
        r.doc_id for r in read_delta_snapshot(spark, corpus_path).collect()
    )


def test_media_gate_filters_neardups_and_registers_novel(spark, tmp_path):
    corpus_path, index_path = _setup(spark, tmp_path)
    shifted = np.clip(_img(1).astype(np.int32) + 8, 0, 255).astype(np.uint8)
    batch = spark.createDataFrame(
        [
            (10, MM.png_encode(shifted)),      # near-dup of corpus img 1
            (11, MM.png_encode(_img(900))),    # novel
            (12, b"not an image at all"),      # undecodable -> passes
        ],
        SCHEMA,
    )
    media_gate_batch(
        batch, 0, corpus_path, index_path, app_id="mg",
        signer=_signer, family="dhash",
    )
    assert _corpus_ids(spark, corpus_path) == [0, 1, 2, 11, 12]
    idx = read_delta_snapshot(spark, index_path)
    assert sorted(r.doc for r in idx.collect()) == [0, 1, 2, 11]
    # replay of the same batch id: both txn skips fire
    media_gate_batch(
        batch, 0, corpus_path, index_path, app_id="mg",
        signer=_signer, family="dhash",
    )
    assert _corpus_ids(spark, corpus_path) == [0, 1, 2, 11, 12]
    assert read_delta_snapshot(spark, index_path).count() == 4


def test_media_stream_end_to_end_available_now(spark, tmp_path):
    corpus_path, index_path = _setup(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([20, 21], pa.int64()),
                "media": pa.array(
                    [MM.png_encode(_img(2)), MM.png_encode(_img(901))],
                    pa.binary(),
                ),
            }
        ),
        str(src / "a.parquet"),
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = media_gated_stream_append(
        stream, corpus_path, index_path, str(tmp_path / "ckpt"),
        app_id="mgs", signer=_signer, family="dhash",
    )
    q.awaitTermination(120)
    # 20 is byte-identical to corpus img 2 -> gated; 21 novel -> ingested
    assert _corpus_ids(spark, corpus_path) == [0, 1, 2, 21]
