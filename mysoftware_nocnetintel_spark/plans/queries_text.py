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


# U3/J8: embedding-cosine near-duplicates — exact O(n²) baseline tier, top-20
# most-similar pairs (threshold-free so the result is non-trivial at every
# scale; the LSH tier in operators.similarity is the 100 TB path). The guard
# below makes the tier un-misusable: above ~1M pairwise-feasible rows you
# MUST take the banded path instead.
_EXACT_PAIRS_MAX_ROWS = int(1e6)


def q35_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    if n > _EXACT_PAIRS_MAX_ROWS:
        raise ValueError(
            f"exact all-pairs tier refused for {n} rows (> {_EXACT_PAIRS_MAX_ROWS}): "
            "use operators.similarity.lsh_bucketed_topk / ivf_topk (the banded "
            "100 TB path) for corpora of this size"
        )
    # spread the STREAM side of the nested-loop join: the single-file scan
    # arrives as one partition, which would put all n²/2 cosine evaluations
    # on one core (measured 34 s single-task at 2k vectors); the broadcast
    # side stays as-is.
    from ..operators.dedup import spread_narrow

    a = spread_narrow(emb).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b")).withColumn(
        "cos_raw", V.cosine_similarity("va", "vb")
    )
    return (
        pairs.orderBy(F.col("cos_raw").desc(), "id_a", "id_b")
        .limit(20)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cosine_sim"))
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


# U3 tier 2: exact n-gram Jaccard near-dup pairs via inverted-index join
# (operators.dedup). Oracle replicates shingling + pair join in DuckDB SQL.
def q41_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as DD

    docs = _t(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_k=3, threshold=0.5
    ).orderBy("id_a", "id_b")


# U3 tier 3: MinHash+LSH near-dup (rows-only: signature hashes are engine-
# specific). The pytest suite separately asserts recall vs the exact tier.
def q37_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as DD

    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_near_dup_pairs(
        docs, "doc_id", "text", threshold=0.5, num_hashes=32, bands=8
    ).orderBy("id_a", "id_b")


# U3 tier 4: SimHash near-dup (rows-only).
def q38_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as DD

    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=6).orderBy(
        "id_a", "id_b"
    )


# F7: heuristic language ID vs declared lang (rows-only: heuristic).
def q40_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", TX.lang_id("text").alias("detected"))
        .groupBy("lang", "detected")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "detected")
    )


# J8 scale path: LSH-bucketed ANN top-k (rows-only: approximate). Operating
# point: 12 OR-amplified tables × 6 planes + Hamming-1 multiprobe — measured
# recall@5 = 1.0 on the (near-random, hence LSH-hostile) synthetic embeddings
# (tests/test_similarity.py pins ≥ 0.8).
def q42_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return SIM.lsh_bucketed_topk(
        emb.filter(F.col("vec_id") >= 5),
        q,
        dim=64,
        k=5,
        n_planes=6,
        multiprobe=1,
        n_tables=12,
    ).select("qid", "vec_id", F.round("score", 6).alias("cosine_sim"), "rn")


# J8 scale path: IVF (inverted-file) ANN top-k (rows-only: approximate,
# KMeans-seeded).
def q48_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    # centroids stay a driver-side list: the fit is index METADATA, and
    # the list form skips a createDataFrame+collect roundtrip per
    # invocation and turns the probe step into a narrow literal
    # projection (round-6; see operators/similarity.py)
    centroids = SIM.ivf_centroids(corpus, n_cells=8, as_list=True)
    assigned = SIM.ivf_assign(corpus, centroids)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return SIM.ivf_topk(assigned, centroids, q, k=5, nprobe=5).select(
        "qid", "vec_id", F.round("score", 6).alias("cosine_sim"), "rn"
    )


# J8 scale path, tier 3: product-quantization ANN (rows-only: approximate).
# 64-dim float vectors compress to 16 one-byte codes; the scan is m array
# lookups per row (ADC) and only the 50-row shortlist touches full vectors.
# Measured recall@5 = 0.92 on the synthetic embeddings (gate >= 0.8 in
# tests/test_similarity.py).
def q76_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    books = SIM.pq_codebooks(corpus, m=16, k=16)
    enc = SIM.pq_encode(corpus, books)
    return SIM.pq_topk(enc, books, q, k=5, shortlist=50).select(
        "qid", "vec_id", F.round("score", 6).alias("cosine_sim"), "rn"
    )


# J8 scale path, tier composition: IVF+PQ ANN (rows-only: approximate) — the
# FAISS IVFPQ serving shape. IVF narrows the scan to nprobe cells, ADC scores
# the survivors with m array lookups each, and only the shortlist touches full
# vectors for exact re-rank. This composition IS the 100 TB answer: per query,
# cost ≈ (nprobe/cells)·|corpus| code lookups + 50 full vectors; index metadata
# (centroids + codebooks) is deliberately driver-scale and inlined as literals.
# Recall unit gate in tests/test_similarity.py (ivfpq recall@5 >= 0.8).
def q90_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    centroids = SIM.ivf_centroids(corpus, n_cells=8, as_list=True)
    books = SIM.pq_codebooks(corpus, m=16, k=16)
    return SIM.ivfpq_topk(
        corpus, centroids, books, q, k=5, nprobe=4, shortlist=50
    ).select("qid", "vec_id", F.round("score", 6).alias("cosine_sim"), "rn")


# F7/U3-adjacent: repetition signals (Gopher-style quality filters) — the
# top-bigram occupancy and duplicate-line ratio that flag boilerplate and
# looping generations in a training corpus. The bigram mode is computed via
# explode -> two-level groupBy (linear, one shuffle per level) rather than
# the per-row quadratic HOF; duplicate-line ratio is a per-row expression.
def q79_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", TX.tokens("text").alias("t"))
    n1 = F.greatest(F.size("t") - 1, F.lit(0))
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice("t", 1, n1),
                F.slice("t", 2, n1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("g"),
    )
    cnt = bg.groupBy("doc_id", "lang", "g").agg(F.count(F.lit(1)).alias("c"))
    per = cnt.groupBy("doc_id", "lang").agg(
        F.max("c").alias("top"), F.sum("c").alias("total")
    )
    dl = docs.select(
        "doc_id", TX.duplicate_line_ratio("text").alias("dup_line_ratio")
    )
    joined = (
        docs.select("doc_id", "lang")
        .join(per.select("doc_id", "top", "total"), "doc_id", "left")
        .join(dl, "doc_id")
        .withColumn(
            "top_bigram_frac",
            F.coalesce(
                F.col("top").cast("double") / F.col("total"), F.lit(0.0)
            ),
        )
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("top_bigram_frac"), 6).alias("avg_top_bigram_frac"),
            F.round(F.max("top_bigram_frac"), 6).alias("max_top_bigram_frac"),
            F.round(F.avg("dup_line_ratio"), 6).alias("avg_dup_line_ratio"),
        )
        .orderBy("lang")
    )


# Corpus hygiene: PII scrub + DETERMINISTIC stratified sampling. Sampling by
# hash-rank (not Bernoulli) is reproducible across cluster layouts and
# exactly SQL-expressible, so the oracle checks the whole selection — the
# property a training-data pipeline needs for auditable subsets.
def q80_scrub_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    scrubbed = docs.select(
        "doc_id",
        "lang",
        TX.scrub_pii("text").alias("text"),
    )
    # md5 hex as the sort key: portable across engines (same string in
    # DuckDB), unlike engine-native hashes
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    n_lang = Window.partitionBy("lang")
    ranked = scrubbed.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(n_lang)
    )
    sampled = ranked.filter(
        F.col("rn") <= F.floor(F.col("n") * 0.3)
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("n").cast("bigint").alias("n_total"),
            F.round(
                F.avg(F.length("text")).cast("double"), 6
            ).alias("avg_scrubbed_len"),
        )
        .orderBy("lang")
    )


# Pretokenization chunking (training-data fan-out): fixed 64-token windows
# at stride 48 per document, exploded to chunk rows. The chunk text itself
# rides through the oracle (array_join on both engines), so window/stride
# boundary arithmetic is verified exactly.
def q83_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id",
        "lang",
        F.explode(TX.chunk_tokens("text", size=64, stride=48)).alias("c"),
    )
    flat = chunks.select(
        "doc_id",
        "lang",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.md5(F.col("c.chunk_text")).alias("chunk_md5"),
    )
    return (
        flat.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_md5").alias("n_distinct_chunks"),
            F.round(F.avg("n_tokens"), 6).alias("avg_chunk_tokens"),
            F.max("chunk_id").cast("bigint").alias("max_chunks_per_doc"),
        )
        .orderBy("lang")
    )


# J8 scale path, rotated tier: OPQ-style PQ ANN (rows-only: approximate).
# A seeded orthogonal rotation (FAISS OPQ's data-free initialization)
# spreads variance across the m subspaces before quantization; encode, ADC
# and exact re-rank all run in the rotated space (cosine is rotation-
# invariant). Recall unit gate: tests/test_similarity.py (orthogonality,
# cosine invariance, recall@5 >= 0.8).
def q92_ann_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return SIM.opq_topk(corpus, q, dim=64, m=16, k=5, shortlist=50).select(
        "qid", "vec_id", F.round("score", 6).alias("cosine_sim"), "rn"
    )


# U3 cluster step: duplicate-CLUSTER assignment via connected components
# (hash-min label propagation over the union of two dup-pair sources:
# exact text-hash stars and token-permutation fingerprint stars — chains
# across the two relations exercise real transitive closure). Per doc:
# its component (min doc_id reachable) and the cluster size. The oracle is
# a DuckDB recursive CTE over the identical edge set, so the iterative
# Spark algorithm is value-hash-checked, not just rows-counted.
# Keep-one dedup = filter doc_id = component; canonicalization = groupBy
# component. Star edges keep candidate generation LINEAR (each doc joins
# its group's min, never all pairs).
_DUP_SMALL_BUDGET = 512 << 20  # documents parquet bytes; edges ≤ 1/doc


def _dup_components(
    spark: SparkSession, sf_dir: str, with_sizes: bool = False
) -> DataFrame:
    """(doc_id, lang, component[, cluster_size]) for every document —
    component = min doc_id connected through exact-hash OR fingerprint star
    edges. ``with_sizes`` sources the member count from the clustering
    itself (singletons default to 1), so callers avoid a groupBy +
    join-back that would consume this whole pipeline twice."""
    from ..operators.dedup import connected_components, spread_narrow

    # The hash scan (md5 + fingerprint) feeds ONLY the star-edge branch; the
    # probe side of the final join re-scans just (doc_id, lang) — a plain
    # column-pruned parquet read. Sharing one hashed DataFrame between both
    # branches (the previous shape) forced either a blocking checkpoint job
    # or, with a lazy checkpoint, a concurrent-stage RACE under AQE where
    # both branches computed the hash scan anyway.
    keyed = spread_narrow(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h_exact"),
        TX.fingerprint("text").alias("h_fp"),
    )
    # Both star relations from ONE pass over the hash scan: unpivot the two
    # hash columns into prefixed keys and run a single min-window over the
    # combined key space (two separate windows would each re-evaluate the
    # md5/fingerprint scan — no automatic subplan reuse).
    kv = keyed.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.lit("e:"), "h_exact"),
                F.concat(F.lit("f:"), "h_fp"),
            )
        ).alias("k"),
    )
    w = Window.partitionBy("k")
    edges = (
        kv.withColumn("root", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("doc_id").alias("dst"))
    )
    # Star edges are ≤ one per document BY CONSTRUCTION (each doc links to
    # its group min), and gated here on the documents footprint: the whole
    # clustering then runs as one job (no blocking count) via the
    # single-task union-find inside connected_components.
    import os

    try:
        small = (
            os.path.getsize(os.path.join(sf_dir, "documents.parquet"))
            <= _DUP_SMALL_BUDGET
        )
    except OSError:
        small = False
    cc = connected_components(edges, assume_small=small, with_sizes=with_sizes)
    cols = [
        "doc_id",
        "lang",
        F.coalesce("component", "doc_id").alias("component"),
    ]
    if with_sizes:
        cols.append(
            F.coalesce("component_size", F.lit(1)).alias("cluster_size")
        )
    probe = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return probe.join(cc, probe.doc_id == cc.node, "left").select(*cols)


def q91_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _dup_components(spark, sf_dir, with_sizes=True)
    return out.select("doc_id", "component", "cluster_size").orderBy("doc_id")


# U3 final step — keep-one dedup: per language, how much of the corpus survives
# cluster-canonical selection (keep the min doc_id of each duplicate
# cluster). This is the materialization step of the dedup pipeline: the
# kept set IS the training corpus. Oracle: same recursive-CTE components.
def q93_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = _dup_components(spark, sf_dir)
    return (
        comp.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("doc_id") == F.col("component")).cast("bigint")
            ).alias("n_kept"),
            F.sum(
                (F.col("doc_id") != F.col("component")).cast("bigint")
            ).alias("n_removed"),
        )
        .orderBy("lang")
    )


# F7 token budgeting: whitespace vs BPE-style subword token counts per
# language — the corpus-size estimate a training pipeline budgets with.
# The subword tokenizer is one regex scan (functions/text.SUBWORD_REGEX)
# whose constructs behave identically under Java regex (Spark) and RE2
# (DuckDB), so the whole tokenization is value-hash oracle-checked.
def q94_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import spread_narrow

    # spread_narrow: the subword regex scan is the CPU stage and a
    # byte-packed KB-scale scan arrives as ONE partition (no-op at
    # cluster scale where inputs already exceed core count)
    docs = spread_narrow(_t(spark, sf_dir, "documents"))
    # regexp_count, not size(split/extract_all): only the COUNTS are
    # needed, so skip materializing token arrays per row (verified equal
    # output; measured 0.39 s → 0.30 s at sf0.1). '\\S+' matches ≡
    # non-empty pieces of the whitespace split.
    per = docs.select(
        "lang",
        F.regexp_count("text", F.lit(r"\S+")).alias("n_ws"),
        F.regexp_count("text", F.lit(TX.SUBWORD_REGEX)).alias("n_sw"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").cast("bigint").alias("ws_tokens"),
            F.sum("n_sw").cast("bigint").alias("subword_tokens"),
            F.round(
                F.avg(F.try_divide(F.col("n_sw").cast("double"), F.col("n_ws"))), 6
            ).alias("avg_expansion"),
        )
        .orderBy("lang")
    )


# Training-corpus assembly, step 1 — deterministic train/val/test split.
# Random splits are not reproducible across engines or re-runs at 100 TB;
# the standard pipeline trick is hashing a stable key into [0, 256) and
# cutting on fixed boundaries: assignment is pure projection (no shuffle
# beyond the final tiny agg), stable under re-partitioning, re-ingestion,
# and engine swap. md5 hex is byte-identical in Spark and DuckDB, so the
# WHOLE split is value-hash oracle-checked — the oracle proves a user can
# recompute the exact same split in another engine.
def q97_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    )
    split = (
        F.when(bucket < "cd", "train")      # 205/256 ~ 80.1%
        .when(bucket < "e6", "val")         #  25/256 ~  9.8%
        .otherwise("test")                  #  26/256 ~ 10.2%
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        )
        .orderBy("split", "lang")
    )


# Training-corpus assembly, step 2 — weighted source mixture. A pretraining
# corpus is a weighted blend of sources (the Pile/LLaMA recipe); at scale
# the sample must again be deterministic, so the keep decision is a hash
# bucket compared to the source's sampling rate — a narrow projection that
# subsamples 100 TB without a shuffle and reproduces exactly on re-run.
# Rates here derive from the numeric source suffix (src7 -> 11/16) so the
# query is self-contained; production callers broadcast-join a rate table.
def q98_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # hex char -> [0, 15] via instr on the hex alphabet: identical semantics
    # (and 1-based position) in Spark and DuckDB, no base-conversion builtin
    # needed (DuckDB has no conv())
    bucket16 = (
        F.expr(
            "instr('0123456789abcdef', "
            "substring(md5(CAST(doc_id AS STRING) || ':mix'), 1, 1))"
        )
        - 1
    )
    rate16 = F.substring("source", 4, 10).cast("int") % 8 + 4  # 4/16..11/16
    kept = docs.select(
        "source",
        "n_chars",
        rate16.alias("rate16"),
        (bucket16 < rate16).cast("bigint").alias("keep"),
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            F.round(
                F.first("rate16").cast("double") / F.lit(16.0), 6
            ).alias("target_rate"),
            F.sum(F.col("keep") * F.col("n_chars")).cast("bigint").alias(
                "kept_chars"
            ),
        )
        .orderBy("source")
    )


# U3 capstone — NEAR-dup clusters (rows-only: MinHash candidate recall is
# probabilistic). q91 clusters EXACT-key edges; this composes the full
# fuzzy pipeline: MinHash-LSH candidates -> exact-Jaccard verify (edges) ->
# star-contraction connected components -> cluster census. Star CC (not
# hash-min) because similarity edges can chain A~B~C~... — contraction
# converges in O(log^2 n) rounds regardless of chain length.
def q99_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as DD

    docs = _t(spark, sf_dir, "documents")
    edges = DD.minhash_near_dup_pairs(
        docs, "doc_id", "text", threshold=0.5, num_hashes=32, bands=8
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = DD.connected_components_star(edges)
    return (
        cc.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("node").alias("keep_doc"),
        )
        .orderBy(F.col("cluster_size").desc(), "component")
    )


TEXT_QUERIES = {
    "q31_token_stats": q31_token_stats,
    "q32_term_df": q32_term_df,
    "q33_quality_scores": q33_quality_scores,
    "q35_embedding_neardup": q35_embedding_neardup,
    "q36_knn_batch": q36_knn_batch,
    "q37_minhash_neardup": q37_minhash_neardup,
    "q38_simhash_neardup": q38_simhash_neardup,
    "q39_fingerprint_dedup": q39_fingerprint_dedup,
    "q40_lang_id": q40_lang_id,
    "q41_ngram_jaccard": q41_ngram_jaccard,
    "q42_ann_lsh": q42_ann_lsh,
    "q48_ann_ivf": q48_ann_ivf,
    "q76_ann_pq": q76_ann_pq,
    "q90_ann_ivfpq": q90_ann_ivfpq,
    "q91_dedup_clusters": q91_dedup_clusters,
    "q92_ann_opq": q92_ann_opq,
    "q93_dedup_keep_one": q93_dedup_keep_one,
    "q94_token_budget": q94_token_budget,
    "q97_corpus_split": q97_corpus_split,
    "q98_corpus_mixture": q98_corpus_mixture,
    "q99_neardup_clusters": q99_neardup_clusters,
    "q79_repetition_signals": q79_repetition_signals,
    "q80_scrub_sample": q80_scrub_sample,
    "q83_chunking": q83_chunking,
}


