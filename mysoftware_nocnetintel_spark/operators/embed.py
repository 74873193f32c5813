"""Deterministic text embeddings by the hashing trick — the pipeline
(explode → groupBy) form of functions/text.hashed_embedding, one vector
per document with NO model artifact and NO RNG.

Why it exists: corpus pipelines need embeddings for near-dup,
decontamination, clustering, and ANN indexing; hashed n-gram features
(Weinberger et al. 2009 — feature hashing; the fastText bag-of-ngrams
input layer uses the same trick) give a reproducible vector anywhere,
so two engines (or two rounds) make the SAME dedup decision. Semantic
quality is below a trained encoder, but determinism and zero
serving-infrastructure is the trade a data pipeline often wants.

Scale shape: one explode over char n-grams (the same fan-out every
shingle operator pays), partial-aggregated groupBy (doc, bucket), then
the per-doc map fold — two shuffles total, both on keys that
partition evenly. Sign sums are small integers (exactly representable
doubles), so this form is BIT-IDENTICAL to the per-row HOF expression
regardless of aggregation order (test-pinned parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams


def hashed_embeddings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    ngram: int = 3,
) -> DataFrame:
    """(doc, embedding array<double>) — L2-normalized signed-hash n-gram
    counts. Documents with zero n-grams produce NO row (the
    minhash_signatures contract); the per-row HOF form returns a zero
    vector for them instead — callers gating on presence should use
    this form."""
    grams = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            char_ngrams(F.lower(F.col(text_col)), ngram)
        ).alias("g"),
    )
    bucketed = grams.select(
        "doc",
        F.pmod(F.xxhash64("g", F.lit("fh-bucket")), F.lit(dim)).alias("bucket"),
        F.when(
            F.pmod(F.xxhash64("g", F.lit("fh-sign")), F.lit(2)) == 0, F.lit(1.0)
        )
        .otherwise(F.lit(-1.0))
        .alias("s"),
    )
    sums = bucketed.groupBy("doc", "bucket").agg(F.sum("s").alias("val"))
    vecs = (
        sums.groupBy("doc")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "val"))
            ).alias("m")
        )
        .select(
            "doc",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("m", i.cast("bigint")), F.lit(0.0)
                ),
            ).alias("raw"),
        )
    )
    norm = F.sqrt(F.aggregate("raw", F.lit(0.0), lambda a, x: a + x * x))
    return vecs.select(
        "doc",
        F.when(
            norm > 0, F.transform("raw", lambda x: x / norm)
        )
        .otherwise(F.col("raw"))
        .alias("embedding"),
    )
