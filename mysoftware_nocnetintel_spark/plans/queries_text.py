"""Text-analysis and similarity query surface over documents / embeddings.

SURVEY.md §2 rows F5, F7, U3, J8, X5 — the north-star training-data-pipeline
operators (token stats, document frequency, quality scoring, fingerprint
dedup, embedding near-dup, batch kNN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions import vectors as V
from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# F7: token statistics per language (tokenize + counts; README.md:11 KB text).
def q31_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            TX.token_count("text").cast("bigint").alias("n_tokens"),
            TX.distinct_token_count("text").cast("bigint").alias("n_distinct"),
        )
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_distinct").alias("sum_distinct_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


# X5/F7: UDTF-style token expansion → document frequency of top terms
# (explode is Spark's generator op; feeds tf-idf).
def q32_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(F.array_distinct(TX.tokens("text"))).alias("term")
    )
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("term"))
        .limit(20)
    )


# F7: composite quality scoring per language (length/diversity/stopword).
def q33_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", TX.quality_score("text").alias("q"))
        .groupBy("lang")
        .agg(
            F.round(F.avg("q"), 6).alias("avg_quality"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


# U3: permutation-insensitive fingerprint dedup (sorted-distinct-token md5) —
# catches shuffled near-dups that raw-text hashing (q8) misses.
def q39_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    fp = docs.withColumn("fp", TX.fingerprint("text"))
    return (
        fp.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique_fp"),
        )
        .orderBy("lang")
    )


# U3/J8: embedding-cosine near-duplicate pairs — exact O(n²) baseline tier
# (the LSH tier in operators.dedup is the 100 TB path, rows-only checked).
def q35_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).withColumn(
        "cos_raw", V.cosine_similarity("va", "vb")
    )
    return (
        pairs.filter(F.col("cos_raw") >= 0.9)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine_sim"))
        .orderBy("id_a", "id_b")
    )


# J8: batch kNN — top-3 neighbors for each of 5 query vectors (broadcast the
# tiny query side; per-query windowed top-k).
def q36_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cos_raw", V.cosine_similarity("embedding", "qv"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            "qid", "vec_id", F.round("cos_raw", 6).alias("cosine_sim"), "rn"
        )
    )


TEXT_QUERIES = {
    "q31_token_stats": q31_token_stats,
    "q32_term_df": q32_term_df,
    "q33_quality_scores": q33_quality_scores,
    "q35_embedding_neardup": q35_embedding_neardup,
    "q36_knn_batch": q36_knn_batch,
    "q39_fingerprint_dedup": q39_fingerprint_dedup,
}
