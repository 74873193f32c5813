"""Round-7 coverage: the two corpus-maintenance operations every
long-running training-data pipeline performs between full rebuilds —
incremental-ingest dedup gating and per-stratum balanced sampling.

Reference parity: the reference ingests continuously (reference
README.md:24,26) and its corpus surface is the documents table
(README.md:11,101-103); these queries are the U3/O2 north-star
extensions of SURVEY.md §2 for that surface. Both are pure relational
plans — fully value-hash oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q127_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 incremental tier: dedup a NEW BATCH against an EXISTING corpus
    (the ingestion-gate shape: the historical corpus is only touched as a
    fingerprint set, never rescanned as text). The corpus/batch split is
    the q97 deterministic md5 trick (~80% corpus), the fingerprint is the
    shared order-insensitive token fingerprint (functions/text.py, same
    expression as q8/q39), and each batch doc is triaged:

    - ``dup_vs_corpus``  — fingerprint already exists in the corpus;
    - ``dup_in_batch``   — first seen inside this batch by a LOWER doc_id
      (the keep-one rule: the minimum id of a batch-fingerprint group is
      the group's canonical doc and does NOT get this label);
    - ``novel``          — kept for ingestion.

    Scale shape: ONE shuffle by fingerprint serves both decisions — the
    corpus left-semi membership probe and the within-batch min-id window
    are co-partitioned on the same key (no broadcast of the corpus
    fingerprint set, which at 100 TB is itself huge). Output is the
    per-(lang, status) ingestion report."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        TX.fingerprint("text").alias("fp"),
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
        ).alias("bucket"),
    )
    corpus_fps = (
        docs.filter(F.col("bucket") < "cd").select("fp").distinct()
    )
    batch = docs.filter(F.col("bucket") >= "cd")
    in_corpus = batch.join(corpus_fps, "fp", "left_semi").select(
        "doc_id", F.lit(True).alias("__hit")
    )
    w = Window.partitionBy("fp")
    labeled = (
        batch.join(in_corpus, "doc_id", "left")
        .withColumn("__min_id", F.min("doc_id").over(w))
        .select(
            "lang",
            "n_chars",
            F.when(F.col("__hit"), "dup_vs_corpus")
            .when(F.col("doc_id") > F.col("__min_id"), "dup_in_batch")
            .otherwise("novel")
            .alias("status"),
        )
    )
    return (
        labeled.groupBy("lang", "status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        )
        .orderBy("lang", "status")
    )


def q128_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/U3 corpus balancing: per-(lang, source) QUOTA sampling by
    deterministic hash rank — the standard move when one stratum dwarfs
    the rest and the training mixture wants bounded representation.
    Ranking by ``md5(doc_id)`` (tie-broken by doc_id) is reproducible
    across engines, re-runs, and re-partitioning — no RNG state — so the
    sampled corpus is the SAME SET anywhere, and adding documents later
    only perturbs each stratum marginally (hash rank is stable, unlike
    offset-based sampling).

    Scale shape: one shuffle on the stratum key for the rank window; the
    quota filter collapses each stratum to ≤ quota rows immediately after
    ranking (no global sort of the corpus). Output reports per-stratum
    kept/candidate counts plus the kept-set id-sum as a set witness the
    oracle hash-checks exactly."""
    quota = 50
    docs = _t(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("lang", "source").orderBy(
            F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
        )
    )
    ranked = docs.select(
        "lang", "source", "doc_id", "n_chars", rk.alias("rk")
    )
    return (
        ranked.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum((F.col("rk") <= quota).cast("bigint")).alias("n_kept"),
            F.sum(
                F.when(F.col("rk") <= quota, F.col("doc_id"))
            ).cast("bigint").alias("kept_id_sum"),
            F.sum(
                F.when(F.col("rk") <= quota, F.col("n_chars"))
            ).cast("bigint").alias("kept_chars"),
        )
        .orderBy("lang", "source")
    )


R7_QUERIES = {
    "q127_incremental_ingest": q127_incremental_ingest,
    "q128_balanced_sample": q128_balanced_sample,
}
