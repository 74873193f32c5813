"""Round-8 coverage: the IMAGE near-duplicate tier — perceptual hashing
over the multimodal binary column (reference README.md:101-103 corpus
tables; the round-7 verdict's task 6).

The text dedup family (exact / MinHash-LSH / SimHash / n-gram Jaccard /
SemDeDup) covered every text tier but images only via exact bytes
(q8-style hash groupBy). q147 adds dHash/aHash perceptual hashing
(operators/multimodal.py) with pair generation through the SAME
Hamming-band pigeonhole join SimHash uses (dedup.hamming_band_pairs) —
a banded equi-join on 16-bit signature bands, never an all-pairs
product, so the candidate stage stays linear-ish at 100 TB of images.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q147_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3/J8 image tier: perceptual near-duplicate detection over the
    multimodal binary column. Corpus = one deterministic 8x8 PNG per
    document (pixels seeded from the text hash — attach_png_media, a
    REAL pixel decode path) UNIONed with a planted near-duplicate per
    document: the same image re-encoded with a +8 brightness shift
    (different bytes — exact-byte dedup scores 0 on it; nearly identical
    gradients — dHash pairs it). Planted ids are original + 10^7.

    Pipeline: decode+hash each payload ONCE in an Arrow mapInPandas pass
    (hash-then-shed: the 64-bit dhash travels downstream, never the
    bytes), band the signatures into four 16-bit buckets, equi-join on
    (band, bucket) (pigeonhole: hamming <= 3 implies >= 1 exact band),
    bit_count verify. Output: per-hamming pair counts split into
    planted (id_b = id_a + 10^7) vs organic (exact-text duplicate docs
    produce byte-identical PNGs at hamming 0), plus the planted-recall
    numerator the unit tests gate at >= 0.8.

    Rows-only by design: stdlib PNG decode + numpy box-resize inside an
    Arrow UDF has no single-statement SQL twin; the value oracle is the
    planted-pair recall unit (tests/test_multimodal_neardup.py) and the
    deterministic seed (sha256 of text) that pins every hash bit.

    At 100 TB: hashing is one linear scan (Arrow-batched, payloads never
    shuffled); the band join shuffles 16 bytes x 4 bands per image; the
    verify filter bounds bucket collisions. No stage is quadratic in the
    corpus — the same argument as the SimHash text tier."""
    from ..operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # Arrow-stage task sizing (the q48 dispatch lesson): the cached
    # documents table is spread to one partition per core for JVM regex
    # stages, but every mapInPandas stage here pays a Python-worker
    # dispatch PER TASK — at serving SF that's 64 dispatches of ~80 rows
    # each. Bound the fan-in to cores/4 (floor 8): measured best-of-3 at
    # sf0.1: 3.55 s @ 32/64 tasks → 2.20 s @ 8. On a real cluster
    # defaultParallelism scales with executors, so the floor never
    # throttles a large scan.
    docs = docs.coalesce(
        max(8, spark.sparkContext.defaultParallelism // 4)
    )
    base = MM.attach_png_media(docs, text_col="text").select(
        "doc_id", "media"
    )
    planted = MM.perturb_png_media(base, delta=8).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "media"
    )
    corpus = base.unionByName(planted)
    pairs = MM.image_near_dup_pairs(
        corpus, id_col="doc_id", payload_col="media", max_hamming=3
    )
    return (
        pairs.withColumn(
            "planted", F.col("id_b") - F.col("id_a") == F.lit(10_000_000)
        )
        .groupBy("hamming", "planted")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming", "planted")
    )


R10_QUERIES = {
    "q147_image_neardup": q147_image_neardup,
}
