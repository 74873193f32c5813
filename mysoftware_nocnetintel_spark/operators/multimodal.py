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


# Capability check evaluated ONCE at import (plan-build) time — never inside
# the Arrow batch loop, so an unexpected codec install fails fast at plan
# construction with a clear message instead of a mid-job executor exception.
try:
    import PIL.Image  # noqa: F401 — not installed in this container

    _REAL_CODECS_PRESENT = True
except ImportError:
    _REAL_CODECS_PRESENT = False


def decode_media(payload: bytes, fmt: str) -> np.ndarray:
    """STUB: real decode requires an image/audio codec not present in this
    environment. The deterministic fake below keeps the pipeline testable;
    swap this function for PIL/torchvision/ffmpeg in deployment."""
    # deterministic fake: byte histogram over 16 buckets, L1-normalized
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    total = hist.sum()
    return hist / total if total else hist


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: binary payload → float feature vector.
    Batches stream through Arrow; output schema is explicit; metadata
    columns pass through untouched (column pruning still applies upstream)."""
    if _REAL_CODECS_PRESENT:
        raise NotImplementedError(
            "image codecs detected but the real decode path is not wired: "
            "replace decode_media's fake with PIL/ffmpeg decode before use"
        )
    fields = [f for f in df.schema.fields if f.name != "media"]
    out_schema = T.StructType(
        fields + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, m["format"] if isinstance(m, dict) else m.format).tolist()
                for p, m in zip(pdf["media"], pdf["media_meta"])
            ]
            out = pdf.drop(columns=["media"])
            out["features"] = feats
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


def sample_frames(df: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame sampling plan: explode a frame-index column (1 row per sampled
    frame) — at scale this is the fan-out stage feeding per-frame decode."""
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col("media_meta.n_frames") - 1, F.lit(0)),
        F.lit(every_n),
    )
    return df.withColumn("frame_idx", F.explode(idx))
