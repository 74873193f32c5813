"""Round-8 coverage: three more first-class training-data-pipeline
operations over the documents/embeddings surface (reference README.md:11,
101-103 corpus tables; README.md:24,26 continuous ingestion):

- q141: CCNet-style bigram-LM perplexity scoring of held-out docs
  (the classic LM quality filter, arXiv:1911.00359 §4.3 shape);
- q142: per-label embedding-cluster cohesion (centroid cosine), the
  embedding-quality audit run before any semantic dedup/ANN stage;
- q143: snapshot diff — the dataset-versioning compare (added / removed
  / changed / unchanged between two corpus versions) every incremental
  crawl pipeline reports.

All three are value-hash oracle-paired relational plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_Q141_VOCAB = 500  # top-K unigram vocabulary; OOV folds to <unk>


def q141_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/F7 LM quality filter: train an add-one-smoothed BIGRAM language
    model on a TRAIN split of the corpus (deterministic md5 bucket, same
    trick as q97/q127), score every HELD-OUT doc by its average negative
    log-likelihood, and return the 20 worst (highest-perplexity) docs —
    the candidates a CCNet-style pipeline drops or down-tiers.

    The scale design is the vocabulary CAP, not the joins: raw bigram
    tables are unbounded at 100 TB, so tokens outside the top-K unigrams
    (K=500, ties broken by token text for determinism) fold to ``<unk>``
    FIRST — the LM tables are then bounded by K and K² by construction,
    which is what justifies broadcasting them at the score join (this is
    exactly how CCNet bounds its KenLM vocabulary). Unseen bigrams get
    probability 1/(c_a + V) from the add-one smoothing via a LEFT join
    (coalesce(c_ab, 0)); unseen left-contexts back off to the uniform
    1/V. One shuffle trains the counts; scoring is a narrow pass +
    broadcast joins."""
    from ..operators.dedup import shingle_rows

    docs = _t(spark, sf_dir, "documents")
    grams = shingle_rows(docs, "doc_id", "text", 2).select(
        "doc",
        F.split_part(F.col("s"), F.lit(" "), F.lit(1)).alias("a0"),
        F.split_part(F.col("s"), F.lit(" "), F.lit(2)).alias("b0"),
        F.substring(
            F.md5(F.col("doc").cast("string").cast("binary")), 1, 2
        ).alias("bucket"),
    )
    train = grams.filter(F.col("bucket") < "cd")
    # top-K vocabulary via orderBy+limit, which Spark compiles to
    # TakeOrderedAndProject (per-partition top-K + driver merge of K·P
    # candidates) — a global row_number window would funnel every
    # distinct token through ONE partition
    vocab = (
        train.select(F.col("a0").alias("w"))
        .union(train.select(F.col("b0").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(_Q141_VOCAB)
        .select("w")
    )

    va = vocab.select(F.col("w").alias("a0"), F.lit(1).alias("__in_a"))
    vb = vocab.select(F.col("w").alias("b0"), F.lit(1).alias("__in_b"))

    def _mapped(g: DataFrame) -> DataFrame:
        return (
            g.join(F.broadcast(va), "a0", "left")
            .join(F.broadcast(vb), "b0", "left")
            .select(
                "doc",
                F.when(F.col("__in_a").isNotNull(), F.col("a0"))
                .otherwise(F.lit("<unk>"))
                .alias("a"),
                F.when(F.col("__in_b").isNotNull(), F.col("b0"))
                .otherwise(F.lit("<unk>"))
                .alias("b"),
            )
        )

    train_m = _mapped(train)
    big = train_m.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = train_m.groupBy("a").agg(F.count(F.lit(1)).alias("c_a"))
    v = _Q141_VOCAB + 1  # + <unk>
    heldout_m = _mapped(grams.filter(F.col("bucket") >= "cd"))
    scored = (
        heldout_m.join(F.broadcast(big), ["a", "b"], "left")
        .join(F.broadcast(uni), "a", "left")
        .select(
            "doc",
            (
                -F.log(
                    (F.coalesce(F.col("c_ab"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c_a"), F.lit(0)) + F.lit(v)).cast(
                        "double"
                    )
                )
            ).alias("nll"),
        )
    )
    return (
        scored.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
        .select(F.col("doc").alias("doc_id"), "n_bigrams", "avg_nll")
        .orderBy(F.col("avg_nll").desc(), "doc_id")
        .limit(20)
    )


def q142_embedding_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/A4 embedding-quality audit: per-label centroid and cluster
    COHESION (mean cosine of each vector to its label centroid) — the
    sanity gate run on an embedding column before trusting it for
    semantic dedup (q123) or ANN recall targets. Labels whose cohesion
    is near zero have embeddings that won't cluster.

    Shape: posexplode to (label, pos, val) rows, ONE shuffle aggregates
    centroids per (label, pos) — partial map-side combine does most of
    the work; the centroid table (labels × dim) is broadcast back and
    each vector's dot/cos folds in a co-partitioned (label, vec_id)
    aggregate. No vector ever crosses the wire whole except in the
    original scan."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("pos", "v0"),
    ).select("label", "vec_id", "pos", F.col("v0").cast("double").alias("v"))
    cent = emb.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    cnorm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("c_norm")
    )
    per_vec = (
        emb.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("v_norm"),
        )
        .join(F.broadcast(cnorm), "label")
        .select(
            "label",
            (F.col("dot") / (F.col("v_norm") * F.col("c_norm"))).alias(
                "cos"
            ),
        )
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos"), 6).alias("avg_cos"),
            F.round(F.min("cos"), 6).alias("min_cos"),
        )
        .join(F.broadcast(cnorm.select("label", F.round("c_norm", 6).alias("centroid_norm"))), "label")
        .orderBy("label")
    )


def q143_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2 dataset-versioning diff: classify every doc key across two
    corpus snapshots as added / removed / changed / unchanged and report
    counts per (lang, status) — what an incremental crawl publishes with
    each release. The two snapshots derive deterministically from the
    documents table (md5 doc-id buckets: the OLD snapshot misses the
    newest ids, the NEW one drops a retention slice and rewrites a
    middle slice's content), so the oracle can rebuild them exactly.

    Scale shape: content equality compares md5 FINGERPRINTS, never
    payloads — the wire carries (key, 32-byte hash) per side, and the
    FULL OUTER join co-partitions both snapshots on the key in one
    shuffle. At 100 TB snapshot diffs are fingerprint joins or they
    don't run."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "bucket",
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
        ),
    )
    old = docs.filter(F.col("bucket") < "f0").select(
        "doc_id", "lang", F.md5(F.col("text").cast("binary")).alias("fp")
    )
    new = (
        docs.filter(F.col("bucket") >= "08")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.md5(
                F.when(
                    (F.col("bucket") >= "40") & (F.col("bucket") < "48"),
                    F.reverse(F.col("text")),
                )
                .otherwise(F.col("text"))
                .cast("binary")
            ).alias("fp"),
        )
    )
    diff = old.alias("o").join(
        new.alias("n"), F.col("o.doc_id") == F.col("n.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.fp") != F.col("n.fp"), "changed")
        .otherwise("unchanged")
    )
    return (
        diff.select(
            F.coalesce(F.col("o.lang"), F.col("n.lang")).alias("lang"),
            status.alias("status"),
            F.coalesce(F.col("n.n_chars"), F.lit(0)).alias("nc"),
        )
        .groupBy("lang", "status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nc").cast("bigint").alias("new_chars"),
        )
        .orderBy("lang", "status")
    )


R8_QUERIES = {
    "q141_doc_lm_score": q141_doc_lm_score,
    "q142_embedding_cohesion": q142_embedding_cohesion,
    "q143_snapshot_diff": q143_snapshot_diff,
}
