"""Round-6 coverage: semantic dedup and ranked retrieval over the document
corpus — the two LLM-pipeline staples not yet in the registry.

- q123 SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-clustered
  embedding-space dedup, the standard semantic tier above MinHash/SimHash
  (q37/q38) and exact-cosine near-dup (q35). Rows-only by design (seeded
  k-means has no SQL twin); the greedy keep-one semantics are covered by
  a brute-force differential in tests/test_similarity_semdedup.py.
- q124 BM25 ranked retrieval: the classic probabilistic relevance score
  (Robertson-Spärck Jones; the Okapi BM25 formula every search engine
  ships). Fully oracle-paired — tokenization, tf/df/dl statistics, the
  log/ratio formula, and the top-k window are all constructs with
  identical semantics in Spark and DuckDB.

Reference parity: the reference's knowledge-base text surface (reference
README.md:11,101-103) supplies the corpus; retrieval and semantic dedup
are north-star training-pipeline additions per SURVEY.md §2 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q123_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 semantic tier: SemDeDup over the embeddings table. Returns one
    row per vector — (vec_id, cell, keep, dup_of) — sorted for a stable
    rows-only signal. Scale notes live on operators/similarity.semdedup:
    one shuffle on cell id, per-cell numpy greedy, memory bounded by
    blocking; n_cells grows with the corpus to hold cell size constant.

    tau=0.35 is tuned to this synthetic corpus (near-random 64-dim
    vectors, max pairwise cosine ≈0.51): like SemDeDup's epsilon it is a
    corpus-specific knob, chosen so the registry query exercises both the
    keep and drop paths; real text embeddings cluster far tighter and use
    0.9+."""
    from ..operators.similarity import semdedup

    emb = _t(spark, sf_dir, "embeddings")
    return semdedup(
        emb, id_col="vec_id", vec_col="embedding", n_cells=8, tau=0.35
    ).orderBy("vec_id")


# Fixed query workload for q124: three queries over the corpus vocabulary.
_BM25_QUERIES: list[tuple[int, str]] = [
    (0, "spark"),
    (0, "join"),
    (1, "table"),
    (1, "scan"),
    (2, "window"),
    (2, "agg"),
    (2, "vector"),
]
_BM25_K1 = 1.2
_BM25_B = 0.75


def q124_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/J8 retrieval: Okapi BM25 top-10 per query over documents.

    score(q,d) = Σ_t ln(1 + (N-df+0.5)/(df+0.5))
                     · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))

    Scale shape: NO shuffle ever touches the token stream — there is no
    token stream. Each document is TOKENIZED ONCE (``split`` on the
    corpus's single-space delimiter) into an in-memory array, and dl plus
    every per-term tf are equality counts over that one array — one
    string scan per document total, versus the previous formulation's
    eight independent ``regexp_count`` passes (one lookaround scan per
    vocabulary term plus one for dl). The token array never leaves the
    projection: no explode, no shuffle, whole-stage codegen end to end
    (an Arrow ``mapInPandas`` tokenize-once variant was measured SLOWER
    at sf0.1 — the Python worker round-trip exceeds the regex work it
    saves — and loses codegen; the split/array form keeps the same
    single-tokenize work profile JVM-side). The per-term counters pivot
    to (doc_id, term, tf) rows via an explode of a 7-element literal
    struct array (narrow). df/avgdl/N are scalar-or-tiny side tables and
    broadcast; the only data shuffles are the candidate-set score
    aggregation and the per-query top-k window. Ties break on rounded
    score then doc_id, so the ordering is engine-independent.

    ``filter(toks, x -> x = term)`` counts exactly the occurrences of
    ``term`` as a whole space-delimited token, including consecutive
    ones — identical to the oracle's unnest-then-count by construction
    (the oracle keeps the unnest formulation: semantic twin, not a
    transliteration). Multiple consecutive spaces yield empty tokens,
    which dl's ``x != ''`` filter drops, matching the oracle's
    ``u.t <> ''``.
    """
    from ..operators.dedup import spread_narrow

    # the tokenize projection is the CPU stage: spread a byte-packed scan
    # to all cores (no-op at cluster scale where inputs already exceed
    # them, and when the table cache pre-spread the scan at cache build)
    docs = spread_narrow(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    vocab = sorted({t for _q, t in _BM25_QUERIES})
    k1, b = _BM25_K1, _BM25_B
    # The WHOLE statement is built as ONE SQL string over a private temp
    # view and handed to a single ``spark.sql`` call. Two measured
    # reasons, both per-statement driver cost, not execution:
    # Column-object chains pay one py4j round-trip per expression node
    # (~0.7 s of driver chatter on this scoring tree), and even
    # selectExpr-chained DataFrames pay EAGER ANALYSIS per intermediate
    # Dataset — each link re-analyzes the whole growing tree, quadratic
    # in depth (measured: 0.17 s build as five chained DataFrames vs
    # 0.085 s as one parsed statement; total 0.51 s → 0.41 s at sf0.1).
    #
    # __toks / __vt stay in their own subquery layers: CollapseProject
    # only inlines cheap/single-use aliases, so the split runs once per
    # row and the counters share the arrays. The full token array is
    # traversed exactly TWICE — once for dl, once to prefilter to the
    # query vocabulary (a 7-literal IN compiles to an InSet hash probe
    # per token) — and the per-term tf counts then scan only the tiny
    # vocabulary-token remnant, instead of one full-array pass per term.
    #
    # Scores materialize as PLAIN COLUMNS in one projection BEFORE the
    # explode, and the exploded struct array references only those
    # columns: putting the formulas inside the array makes the optimizer
    # duplicate the whole expression into every extracted struct field
    # (measured at several hundred ms of extra per-statement planning).
    # A zero-tf term contributes exactly 0, so no conditional is needed;
    # docs matching no term of a query are dropped — the oracle's
    # candidate set. The one-row side CTE of global statistics (N, avgdl
    # over docs with tokens — matching the oracle's dl CTE — and per-term
    # document frequencies) is BROADCAST by hint, so the whole formula
    # needs exactly one broadcast instead of a join per statistic.
    docs.createOrReplaceTempView("__q124_docs")
    in_list = ", ".join(f"'{t}'" for t in vocab)
    tf_cols = ", ".join(
        f"cast(size(filter(__vt, x -> x = '{t}')) as double) as __tf{i}"
        for i, t in enumerate(vocab)
    )
    # Round 8: the side-statistics job is TOKENIZE-FREE. The BROADCAST
    # side runs as its own sequential sub-job before the scoring job
    # (measured at sf1, AQE off: side-as-second-counters-pass 0.147 s of
    # the 0.55 s statement), so its scan must be as cheap as possible —
    # and every replacement below is ORACLE-EXACT, not approximate:
    #   dl  = regexp_count(text, '[^ ]+')   — maximal runs of non-space
    #         chars ARE the non-empty split(' ') tokens (tokens may
    #         contain \t/\n; those are non-space, so runs and tokens
    #         coincide exactly); no array allocation, one regex scan.
    #   df  = contains(' '||text||' ', ' t ') — a term t (no spaces in
    #         the vocabulary) occurs as a split-token iff it appears
    #         space-bounded in the padded text, so presence ⇔ tf>0.
    # Verified value-identical to the tf-based side at sf1 (n, avgdl,
    # all seven df) and by the sf0.01 oracle hash. Measured best-of-5 x3
    # draws at sf1: 0.54/0.58/0.62 → 0.46/0.49/0.52 s (~10%); the
    # remaining gap to DuckDB is the two-sequential-job statement floor
    # (trivial-statement noop on the same box: ~0.08-0.11 s).
    df_like_cols = ", ".join(
        f"sum(cast(contains(__pt, ' {t} ') as double)) as __df{i}"
        for i, t in enumerate(vocab)
    )

    def _term_score(i: int) -> str:
        idf = f"ln(1.0D + (n - __df{i} + 0.5D) / (__df{i} + 0.5D))"
        tf_part = (
            f"__tf{i} * {k1 + 1.0}D / (__tf{i} + {k1}D"
            f" * (1.0D - {b}D + {b}D * dl / avgdl))"
        )
        return f"{idf} * {tf_part}"

    by_query: dict[int, list[int]] = {}
    for qid, t in _BM25_QUERIES:
        by_query.setdefault(qid, []).append(vocab.index(t))
    score_cols = ", ".join(
        f"round({' + '.join(_term_score(i) for i in idxs)}, 6)"
        f" as __score{qid}"
        for qid, idxs in sorted(by_query.items())
    )
    hit_cols = ", ".join(
        f"{' + '.join(f'__tf{i}' for i in idxs)} as __hits{qid}"
        for qid, idxs in sorted(by_query.items())
    )
    structs = ", ".join(
        f"struct({qid} as query_id, __score{qid} as score,"
        f" __hits{qid} as hits)"
        for qid in sorted(by_query)
    )
    return spark.sql(f"""
        WITH counters AS (
          SELECT doc_id,
                 cast(size(filter(__toks, x -> x != '')) as double) as dl,
                 {tf_cols}
          FROM (
            SELECT doc_id, __toks,
                   filter(__toks, x -> x IN ({in_list})) as __vt
            FROM (
              SELECT doc_id, split(text, ' ') as __toks FROM __q124_docs
            )
          )
        ),
        side AS (
          SELECT cast(count(*) as double) as n,
                 avg(if(dl > 0, dl, null)) as avgdl,
                 {df_like_cols}
          FROM (
            SELECT cast(regexp_count(text, '[^ ]+') as double) as dl,
                   concat(' ', text, ' ') as __pt
            FROM __q124_docs
          )
        ),
        per_doc AS (
          SELECT /*+ BROADCAST(side) */ doc_id, {score_cols}, {hit_cols}
          FROM counters CROSS JOIN side
        ),
        scored AS (
          SELECT s.query_id as query_id, doc_id, s.score as score
          FROM (
            SELECT doc_id, explode(array({structs})) as s FROM per_doc
          )
          WHERE s.hits > 0
        )
        SELECT query_id, doc_id, score, rk FROM (
          SELECT query_id, doc_id, score,
                 row_number() over (
                   partition by query_id order by score desc, doc_id
                 ) as rk
          FROM scored
        )
        WHERE rk <= 10
        ORDER BY query_id, rk
    """)


def q125_mllib_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 MLlib seam: distributed assembler→scaler→LogisticRegression
    Pipeline on a planted-signal label, metrics on the md5-held-out split
    (rows-only: LBFGS training has no SQL twin; the planted-signal
    recovery gate lives in tests/test_ml_pipeline.py)."""
    from ..ml.pipeline import mllib_failure_pipeline

    return mllib_failure_pipeline(spark, sf_dir)


def q126_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 fuzzy tier: EDIT-DISTANCE near-dup pairs (title/prefix dedup —
    the cheap fuzzy tier below shingle Jaccard). Candidate generation is
    a (lang, length-bucket) equi-self-join — the banding is what makes
    this scale: Levenshtein is O(m·n) per pair, so the join key must
    bound the candidate set (here: same language, 50-char document-length
    bands; measured ~10× candidate reduction on this corpus), never
    all-pairs. Verification is the built-in JVM ``levenshtein`` over
    40-char prefixes. Fully oracle-paired: DuckDB's levenshtein uses the
    same unit-cost Wagner-Fischer definition.

    BAND-BOUNDARY RECALL: every document enters TWO buckets, ``band``
    and ``band + 1``, so two docs in the same or ADJACENT length bands
    (e.g. 49 vs 51 chars straddling the 50-char boundary) always share a
    bucket — an equality-only band join silently never compares them.
    Same-band pairs share both buckets, so candidates are deduplicated
    (distinct on the pair) BEFORE the Levenshtein verify runs. Docs two
    or more bands apart (≥50 chars of length difference) are still never
    compared: that is the operator's contract, not a recall gap — their
    prefix edit distance is bounded below by the length gap only for
    full-text distance; for 40-char prefixes the band is a length
    blocking heuristic, disclosed as such."""
    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "lang",
        "substring(text, 1, 40) as pre",
        "cast(n_chars div 50 as bigint) as band",
    )
    e = docs.select(
        "lang",
        "doc_id",
        "pre",
        F.explode(
            F.array(F.col("band"), F.col("band") + F.lit(1))
        ).alias("bucket"),
    )
    a = e.select(
        "lang",
        "bucket",
        F.col("doc_id").alias("id_a"),
        F.col("pre").alias("pre_a"),
    )
    b = e.select(
        "lang",
        "bucket",
        F.col("doc_id").alias("id_b"),
        F.col("pre").alias("pre_b"),
    )
    cand = (
        a.join(b, ["lang", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("lang", "id_a", "id_b", "pre_a", "pre_b")
        .distinct()
    )
    return (
        cand.select(
            "lang",
            "id_a",
            "id_b",
            F.levenshtein("pre_a", "pre_b").alias("dist"),
        )
        .filter(F.col("dist") <= 18)
        .orderBy("lang", "id_a", "id_b")
    )


R6_QUERIES = {
    "q123_semdedup": q123_semdedup,
    "q124_bm25": q124_bm25,
    "q125_mllib_pipeline": q125_mllib_pipeline,
    "q126_edit_distance_pairs": q126_edit_distance_pairs,
}
