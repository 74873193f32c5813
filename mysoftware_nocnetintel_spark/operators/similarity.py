"""Similarity search over embedding columns: exact top-k and LSH/IVF ANN.

Reference parity: knowledge-base retrieval ("Suggests resolutions from a
growing knowledge base", reference README.md:11) over root-cause embeddings
(README.md:52). North-star: similarity search as a first-class training-data
operator (SURVEY.md §2.3 J8).

Scale design:
- exact :func:`brute_force_topk` — broadcast the (small) query side, stream
  the corpus, per-query windowed top-k. Linear in corpus size, no corpus
  shuffle until the final k rows; the baseline and the correctness oracle.
- :func:`random_hyperplane_lsh` — sign-bit bucket of seeded hyperplanes
  (plan constants, deterministic); ANN = equi-join on bucket (optionally
  multi-probe via Hamming-adjacent buckets). Sub-linear candidate sets.
- :func:`ivf_assign` / :func:`ivf_topk` — inverted-file index: MLlib KMeans
  (seeded) centroids; search only the ``nprobe`` nearest cells. The
  centroid table is tiny → broadcast; corpus is partitioned by cell.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "qid",
    query_vec: str = "qv",
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query (queries broadcast; corpus streamed)."""
    score = (
        V.cosine_similarity(corpus_vec, query_vec)
        if metric == "cosine"
        else -V.l2_distance(corpus_vec, query_vec)
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .withColumn("score", score)
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(query_id, corpus_id, "score", "rn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _array_lit(values: list[float]) -> Column:
    """Literal array<double> in ONE py4j call. ``F.lit(list)`` (and per
    element ``F.lit``) costs one JVM round-trip per element — ~10k calls and
    ~10 s of pure gateway latency per plan build at 12 tables × 6 planes ×
    64 dims. A SQL array literal parses JVM-side instead."""
    return F.expr("array(" + ",".join(format(x, ".17g") + "D" for x in values) + ")")


def _lsh_bucket_sql(vec_name: str, dim: int, n_planes: int, seed: int) -> str:
    """The whole bucket expression as ONE SQL string. Building it from
    pyspark Column/HOF calls costs ~30 py4j round-trips per plane — ~10 s of
    gateway latency per plan at 12 tables × 6 planes × 2 sides; the SQL text
    parses JVM-side in one call. Semantics identical to the Column form."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for i, plane in enumerate(planes):
        arr = "array(" + ",".join(format(x, ".17g") + "D" for x in plane) + ")"
        dot = (
            f"aggregate(zip_with(`{vec_name}`, {arr}, "
            "(a, p) -> CAST(a AS DOUBLE) * p), 0.0D, (acc, x) -> acc + x)"
        )
        bits.append(f"IF({dot} > 0D, shiftleft(1L, {i}), 0L)")
    return " | ".join(bits)


def random_hyperplane_lsh(
    vec: Column | str, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Bucket id = sign bits of <vec, plane_i> packed into a bigint. The
    planes are derived from ``seed`` at plan-build time and inlined as
    literals → deterministic across runs and cluster layouts. ``vec`` given
    as a column NAME takes the fast one-call SQL build path."""
    if isinstance(vec, str):
        return F.expr(_lsh_bucket_sql(vec, dim, n_planes, seed))
    planes = _hyperplanes(dim, n_planes, seed)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    _array_lit(plane),
                    lambda a, p: a.cast("double") * p,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "qid",
    query_vec: str = "qv",
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe: int = 0,
    n_tables: int = 1,
) -> DataFrame:
    """ANN: candidates share the query's LSH bucket; exact re-rank within.
    Recall < 1 by construction (rows-only checked); candidate volume is
    corpus/2^n_planes per bucket in expectation.

    ``multiprobe`` ≥ 1 also probes every bucket at Hamming distance 1 from
    the query's bucket (each near-miss of one hyperplane) — the standard
    multi-probe LSH recall lift: the QUERY side fans out ×(n_planes+1),
    the corpus is untouched, so cost stays sub-linear in corpus size.

    ``n_tables`` > 1 is OR-amplification: L independent plane sets (seeded
    seed+1000t), a candidate matches if it collides in ANY table — recall
    1-(1-p^b)^L at the cost of an ×L corpus index (the classic LSH-forest
    trade; the corpus explode stays one narrow stage, the join is still an
    equi-join on (table, bucket))."""
    tables = list(range(max(1, n_tables)))

    def buckets(vec_col: str) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    random_hyperplane_lsh(
                        vec_col, dim, n_planes, seed + 1000 * t
                    ).alias("bucket"),
                )
                for t in tables
            ]
        )

    c = corpus.withColumn("__tb", F.explode(buckets(corpus_vec))).select(
        F.col("__tb.tbl").alias("tbl"),
        F.col("__tb.bucket").alias("bucket"),
        *[F.col(x) for x in corpus.columns],
    )
    q = queries.withColumn("__tb", F.explode(buckets(query_vec))).select(
        F.col("__tb.tbl").alias("tbl"),
        F.col("__tb.bucket").alias("bucket"),
        *[F.col(x) for x in queries.columns],
    )
    if multiprobe >= 1:
        flips = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)
            ],
        )
        q = (
            q.withColumn("bucket", F.explode(flips))
        )
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .dropDuplicates([query_id, corpus_id])
        .withColumn("score", V.cosine_similarity(corpus_vec, query_vec))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(query_id, corpus_id, "score", "rn")
    )


def ivf_centroids(
    corpus: DataFrame, vec_col: str = "embedding", n_cells: int = 16, seed: int = 42
) -> DataFrame:
    """KMeans cell centroids (MLlib, seeded) → DataFrame(cell, centroid)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    assembled = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(assembled)
    spark = corpus.sparkSession
    centers = [c.tolist() for c in model.clusterCenters()]
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], ["cell", "centroid"]
    ).select("cell", F.col("centroid").cast("array<double>").alias("centroid"))


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame | list,
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest cell — ZERO shuffle.

    The centroid table is tiny and already driver-materialized (it comes from
    ``model.clusterCenters()``), so it is inlined as a literal
    array<struct<cell,centroid>> and the argmin is a per-row ``aggregate``
    fold over that literal — a pure narrow projection, no join, no exchange
    (mirrors how the LSH planes are inlined above). Ties break toward the
    lowest cell id, same as the previous windowed-argmin formulation."""
    if isinstance(centroids, DataFrame):
        rows = centroids.select("cell", "centroid").collect()
        cents = sorted((int(r["cell"]), list(r["centroid"])) for r in rows)
    else:
        cents = sorted((int(c), list(v)) for c, v in centroids)
    def arr(values: list[float]) -> str:
        return "array(" + ",".join(format(x, ".17g") + "D" for x in values) + ")"

    cent_arrays = "array(" + ",".join(arr(cvec) for _, cvec in cents) + ")"
    cell_ids = "array(" + ",".join(str(cell) for cell, _ in cents) + ")"
    dists = (
        f"transform({cent_arrays}, c -> aggregate(zip_with(`{corpus_vec}`, c, "
        "(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        "0.0D, (s, x) -> s + x))"
    )
    # argmin via array_position over the (re-evaluated, JVM-cheap) distance
    # array; ties resolve to the first = lowest cell id, matching the old
    # windowed-argmin order
    best = (
        f"element_at({cell_ids}, "
        f"CAST(array_position({dists}, array_min({dists})) AS INT))"
    )
    return corpus.withColumn("cell", F.expr(best))


def ivf_topk(
    assigned_corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "qid",
    query_vec: str = "qv",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Search only the ``nprobe`` nearest cells per query (ANN; rows-only)."""
    qcells = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", V.l2_distance(query_vec, "centroid")
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col("cell"))
    probe = (
        qcells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, query_vec, "cell")
    )
    scored = assigned_corpus.join(F.broadcast(probe), "cell").withColumn(
        "score", V.cosine_similarity(corpus_vec, query_vec)
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(query_id, corpus_id, "score", "rn")
    )
