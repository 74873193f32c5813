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


def q129_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/X5 tokenizer induction: the first BPE merge statistic — the 20
    most frequent ADJACENT CHARACTER PAIRS across the corpus, weighted by
    word frequency (Sennrich et al. 2016's algorithm computes exactly
    this table every merge round; the top pair becomes the next merge).

    Scale shape: the corpus collapses to the DISTINCT-WORD table first
    (one shuffle on the word; Heaps' law makes this table sublinear in
    corpus size), so the char-pair explode runs over distinct words ×
    word length, never over the token stream. Pair counting is the only
    other shuffle, on a key space bounded by |alphabet|². Ties break on
    the pair string, so top-20 is engine-independent."""
    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


def q130_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 quality signal: intra-document REPETITION — the fraction of
    word 3-gram occurrences that are duplicates of an earlier 3-gram in
    the SAME document (the Gopher/MassiveText repetition family, Rae et
    al. 2021 §A1.1; boilerplate and looped generations score high and
    get filtered before training).

    Scale shape: ZERO shuffle until the final per-language aggregate —
    the 3-gram array, its distinct count, and the duplicate fraction are
    all computed INSIDE one narrow projection per document
    (``transform(sequence(...))`` over the split token array; no explode,
    no gram stream, whole-stage codegen). This is the cheap first-pass
    formulation; the cross-document tiers (q37/q38/q41) pay the gram
    shuffle only for the survivors."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.selectExpr(
        "lang",
        "filter(split(text, ' '), x -> x != '') as __t",
    ).selectExpr(
        "lang",
        # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty
        "if(size(__t) >= 3,"
        " transform(sequence(1, size(__t) - 2),"
        " i -> concat_ws(' ', element_at(__t, i), element_at(__t, i + 1),"
        " element_at(__t, i + 2))),"
        " array()) as __g",
    ).selectExpr(
        "lang",
        "size(__g) as total",
        "size(array_distinct(__g)) as n_distinct",
    ).selectExpr(
        "lang",
        "if(total > 0,"
        " (total - n_distinct) / cast(total as double), 0.0d) as dup_frac",
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dup_frac"), 6).alias("avg_dup_frac"),
            F.round(F.max("dup_frac"), 6).alias("max_dup_frac"),
            F.sum((F.col("dup_frac") > 0.3).cast("bigint")).alias(
                "n_repetitive"
            ),
        )
        .orderBy("lang")
    )


def q131_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5/U1 corpus prep: OVERLAPPING CHUNKING — split each document's
    token stream into chunk windows of 64 tokens with 16-token overlap
    (stride 48), the standard RAG/embedding preprocessing fan-out. Chunk
    starts follow the no-redundant-tail rule: a new chunk starts while
    ``start <= n_tok - overlap`` (so the final chunk may be short but is
    never fully contained in its predecessor), and every chunk i covers
    ``min(64, n_tok - start + 1)`` tokens.

    Scale shape: the chunk fan-out is a narrow per-row explode of an
    arithmetic ``sequence`` (no shuffle; each chunk row would feed the
    embedding stage downstream exactly like q123's input), and the
    report aggregate is the only shuffle. Chunk geometry is pure
    arithmetic on token counts, so the whole fan-out value-hash matches
    the oracle."""
    chunk, overlap, stride = 64, 16, 48
    docs = _t(spark, sf_dir, "documents")
    chunks = docs.selectExpr(
        "source",
        "doc_id",
        "size(filter(split(text, ' '), x -> x != '')) as n_tok",
    ).selectExpr(
        "source",
        "doc_id",
        "n_tok",
        f"explode(sequence(1, greatest(n_tok - {overlap}, 1), {stride}))"
        " as start",
    ).selectExpr(
        "source",
        f"least({chunk}, n_tok - start + 1) as chunk_tokens",
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_tokens").cast("bigint").alias("sum_chunk_tokens"),
            F.sum((F.col("chunk_tokens") == chunk).cast("bigint")).alias(
                "n_full"
            ),
            F.round(F.avg("chunk_tokens"), 6).alias("avg_chunk_tokens"),
        )
        .orderBy("source")
    )


def q132_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/A7 behavioral funnel: ORDERED step conversion login →
    purchase → error (the classic product-analytics funnel over the
    reference's event stream). A user converts step k iff a step-k
    event happens AT OR AFTER their first step-(k-1) conversion time —
    strict ordering, not mere co-occurrence.

    Scale shape: each pass is a groupBy(user_id) conditional-min
    aggregate joined back to events on the SAME key (co-partitioned —
    Catalyst reuses the hash partitioning, no broadcast of the user
    table needed at 100 TB), and the final rollup is one scalar row.
    No windows, no explode, no self-join on time ranges."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "login", F.col("ts"))).alias(
            "t1"
        )
    )
    t2 = (
        ev.join(t1, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t1")),
                    F.col("ts"),
                )
            ).alias("t2")
        )
    )
    t3 = (
        ev.join(t2, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "error")
                    & (F.col("ts") >= F.col("t2")),
                    F.col("ts"),
                )
            ).alias("t3")
        )
    )
    steps = t1.join(t2, "user_id").join(t3, "user_id")
    return steps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("t1").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("step1_login"),
        F.sum(F.col("t2").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("step2_purchase"),
        F.sum(F.col("t3").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("step3_error"),
    )


def q133_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W4 RFM SEGMENTATION: score every customer 1-4 on Recency
    (last order date), Frequency (order count) and Monetary (total
    spend), then report segment sizes — the classic CRM cut over the
    TPC-H orders surface.

    Scale-first scoring: NOT ntile — a global ntile window funnels the
    whole per-customer table through one partition (exactly the shape
    the plan sweep gates). Instead ONE scalar aggregate row computes the
    nine exact quartile boundaries (``percentile``, the interpolated
    definition DuckDB's ``quantile_cont`` shares) and broadcasts; scores
    are then pure comparisons (1 + Σ v > boundary) in a narrow
    projection. Boundary comparisons are parity-robust: interpolated
    boundaries either fall BETWEEN data values (comparison unaffected by
    last-ulp noise) or exactly ON one (frac = 0 → exact arithmetic in
    both engines). Recency uses integer days from a fixed epoch so the
    percentile input is numeric and engine-identical."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.lit("1990-01-01").cast("date"))
        .cast("double")
        .alias("rec_days"),
        F.count(F.lit(1)).cast("double").alias("freq"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    qs = per_cust.agg(
        *[
            F.expr(f"percentile({c}, {p})").alias(f"{c}_{int(p * 100)}")
            for c in ("rec_days", "freq", "monetary")
            for p in (0.25, 0.5, 0.75)
        ]
    )

    def _score(c: str):
        return (
            F.lit(1)
            + (F.col(c) > F.col(f"{c}_25")).cast("int")
            + (F.col(c) > F.col(f"{c}_50")).cast("int")
            + (F.col(c) > F.col(f"{c}_75")).cast("int")
        )

    scored = per_cust.crossJoin(F.broadcast(qs)).select(
        _score("rec_days").alias("r_score"),
        _score("freq").alias("f_score"),
        _score("monetary").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg(F.col("m_score").cast("double")), 6).alias(
                "avg_m_score"
            ),
        )
        .orderBy("r_score", "f_score")
    )


def q134_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4 data-quality PROFILE of the events table: one row per
    column — row count, null count, exact distinct count, numeric
    min/max (as double) and string min/max — the first thing any
    pipeline runs against a new source.

    Scale shape: ONE aggregation pass computes every statistic (the
    multiple exact count-distincts plan through Spark's Expand — one
    scan, rows multiplied by the distinct-column count with map-side
    partial aggregation; at 100 TB swap ``countDistinct`` for
    ``approx_count_distinct`` and Expand disappears). The per-column
    pivot is an explode of a literal struct array over the ONE result
    row. Numeric extremes stay typed (double) and string extremes stay
    strings — no float-to-string formatting, which differs between
    engines."""
    ev = _t(spark, sf_dir, "events")
    num_cols = ["event_id", "user_id", "value"]
    str_cols = ["event_type", "props"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols + str_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__dist"),
        ]
    for c in num_cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    for c in str_cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    one = ev.agg(*aggs)
    structs = ", ".join(
        f"struct('{c}' as column, n_rows, {c}__nulls as n_nulls,"
        f" {c}__dist as n_distinct,"
        + (
            f" {c}__min as min_num, {c}__max as max_num,"
            " cast(null as string) as min_str,"
            " cast(null as string) as max_str)"
            if c in num_cols
            else " cast(null as double) as min_num,"
            " cast(null as double) as max_num,"
            f" {c}__min as min_str, {c}__max as max_str)"
        )
        for c in num_cols + str_cols
    )
    return (
        one.selectExpr(f"explode(array({structs})) as s")
        .select("s.*")
        .orderBy("column")
    )


def q135_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 EXACT-SUBSTRING dedup tier (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499, operator family): find every 8-word shingle that
    occurs in MORE THAN ONE document, merge each document's hit
    positions into maximal covered spans (gaps-and-islands interval
    merge), and report per-language how much of the corpus is
    cross-document duplicated text — the statistic that decides whether
    span-removal (vs whole-doc dedup) is worth running.

    Scale shape: two shuffles — gram → distinct-doc count (the same
    bounded-key shuffle as q107 decontamination) and the gram→doc hit
    join — then a PER-DOCUMENT window (partitioned by doc_id, never
    global) for the interval merge. The paper's suffix array is a
    single-machine construct; the shingle-join formulation is its
    distributed equivalent and finds the identical ≥8-token repeats."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    base = docs.selectExpr(
        "doc_id",
        "lang",
        "filter(split(text, ' '), x -> x != '') as __t",
    ).selectExpr("doc_id", "lang", "size(__t) as n_tok", "__t")
    grams = (
        base.filter("n_tok >= 8")
        .selectExpr(
            "doc_id",
            "explode(transform(sequence(1, n_tok - 7),"
            " i -> struct(i as s,"
            " concat_ws(' ', slice(__t, i, 8)) as g))) as e",
        )
        .select("doc_id", F.col("e.s").alias("s"), F.col("e.g").alias("g"))
    )
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter("nd > 1")
        .select("g")
    )
    hits = grams.join(dup, "g").select(
        "doc_id", "s", (F.col("s") + F.lit(7)).alias("e")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        hits.withColumn("pmax", F.max("e").over(w_prev))
        .withColumn(
            "ni",
            F.when(
                F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1
            ).otherwise(0),
        )
        .withColumn("isl", F.sum("ni").over(w_run))
        .groupBy("doc_id", "isl")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
    )
    cov = spans.groupBy("doc_id").agg(
        F.sum(F.col("me") - F.col("ms") + 1).alias("covered")
    )
    per_doc = (
        base.select("doc_id", "lang", "n_tok")
        .join(cov, "doc_id", "left")
        .select(
            "lang",
            "n_tok",
            F.coalesce("covered", F.lit(0)).alias("covered"),
        )
        .withColumn(
            "frac",
            F.coalesce(
                F.try_divide(
                    F.col("covered").cast("double"),
                    F.col("n_tok").cast("double"),
                ),
                F.lit(0.0),
            ),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("covered").cast("bigint").alias("covered_tokens"),
            F.round(F.avg("frac"), 6).alias("avg_cover_frac"),
            F.sum((F.col("frac") > 0.5).cast("bigint")).alias("n_heavy_dup"),
        )
        .orderBy("lang")
    )


def q136_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/X3 corpus assembly: TEMPERATURE-reweighted multilingual /
    multi-source sampling (Lample & Conneau 2019 XLM §3.1, also mT5):
    sampling probability q_s ∝ p_s^α with α = 0.5 flattens the source
    distribution so low-resource sources are upsampled. Since
    p_s^α = n_s^α / N^α, the normalizer cancels: q_s = √n_s / Σ√n.
    Reports, per source, its natural share, temperature share, the
    token budget it receives out of a 1M-token draw, and the
    oversampling factor q/p the loader must apply.

    Scale shape: one partial-agg shuffle to the per-source token table
    (|sources| rows), then a BROADCAST of the one-row normalizer onto
    it — no window over a single partition, no second pass over the
    corpus."""
    docs = _t(spark, sf_dir, "documents")
    per = (
        docs.select(
            "source",
            F.regexp_count("text", F.lit(r"\S+")).alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.sum("n_tok").cast("double").alias("toks"))
    )
    tot = per.agg(
        F.sum("toks").alias("tot"),
        F.sum(F.sqrt("toks")).alias("tot_a"),
    )
    budget = F.lit(1_000_000.0)
    q = F.sqrt(F.col("toks")) / F.col("tot_a")
    p = F.col("toks") / F.col("tot")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("toks").cast("bigint").alias("n_tokens"),
            F.round(p, 6).alias("p_natural"),
            F.round(q, 6).alias("q_temp"),
            F.round(q * budget).cast("bigint").alias("budget_tokens"),
            F.round(q / p, 6).alias("oversample"),
        )
        .orderBy("source")
    )


def q137_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/P6 document-level QUALITY-FILTER FUNNEL in the style of the
    Gopher / MassiveText heuristic rules (Rae et al. 2021,
    arXiv:2112.11446 §A.1.1): five independent per-document rules —
    word-count bounds, mean-word-length bounds, alphabetic-word
    fraction, minimum stopword hits, symbol-token ratio — evaluated in
    ONE pass, reported per language as a removal funnel (per-rule fail
    counts + survivors + keep rate). Thresholds are scaled to the
    synthetic corpus (docs are 1-2 sentences, vs Gopher's 50-100k-word
    web pages) but the rule structure is the paper's.

    Scale shape: one narrow projection computing all five flags with
    higher-order array functions (zero explode — the token array never
    leaves the row), then a single per-lang partial-agg shuffle. The
    whole rule battery is whole-stage-codegen JVM work; at 100 TB this
    is a map-side pipeline with a |langs|-row result."""
    docs = _t(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in TX.STOPWORDS)
    flags = docs.selectExpr(
        "lang",
        r"filter(split(text, '\\s+'), x -> x != '') as __t",
    ).selectExpr(
        "lang",
        "size(__t) as n",
        "aggregate(__t, 0, (a, x) -> a + length(x)) as sumlen",
        "size(filter(__t, x -> x rlike '[A-Za-z]')) as n_alpha",
        f"size(filter(__t, x -> array_contains(array({stop_list}),"
        " lower(x)))) as n_stop",
        "size(filter(__t, x -> contains(x, '#') or contains(x, '...')))"
        " as n_sym",
    ).selectExpr(
        "lang",
        "n between 5 and 5000 as r_wordcount",
        "case when n = 0 then false else"
        " (sumlen / cast(n as double)) between 2.0 and 12.0 end"
        " as r_meanlen",
        "case when n = 0 then false else"
        " n_alpha / cast(n as double) >= 0.6 end as r_alpha",
        "n_stop >= 2 as r_stopword",
        "case when n = 0 then true else"
        " n_sym / cast(n as double) <= 0.1 end as r_symbol",
    )
    keep = (
        F.col("r_wordcount")
        & F.col("r_meanlen")
        & F.col("r_alpha")
        & F.col("r_stopword")
        & F.col("r_symbol")
    )
    fail = lambda c: F.sum((~F.col(c)).cast("bigint")).alias(f"f_{c[2:]}")
    return (
        flags.withColumn("keep", keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            fail("r_wordcount"),
            fail("r_meanlen"),
            fail("r_alpha"),
            fail("r_stopword"),
            fail("r_symbol"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.round(
                F.avg(F.col("keep").cast("double")), 6
            ).alias("keep_rate"),
        )
        .orderBy("lang")
    )


def q138_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/F2 bivariate-statistics aggregates: Pearson correlation,
    sample covariance, and least-squares regression line
    (slope/intercept/R²) of extended price on quantity per
    (returnflag, linestatus) group — the SQL-standard REGR_* family
    the reference's stats surface implies (SURVEY.md §2 A4; reference
    README.md:44 "statistical aggregation").

    Scale shape: all six statistics are algebraic aggregates with O(1)
    mergeable partials (co-moment updating, Spark's own corr/covar/regr
    implementations), so this is ONE map-side-combined shuffle to
    |flag×status| rows — the cheapest possible shape. Covariance-family
    outputs are rounded to 4 decimals (correlation-class to 6): both
    engines use numerically stable one-pass co-moment updates, but the
    accumulation ORDER differs across engines/partitionings, so the
    last digits of the raw doubles are not contract."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.corr(y, x), 6).alias("corr_price_qty"),
            F.round(F.covar_samp(y, x), 4).alias("covar_price_qty"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q139_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 EXACT percentile_cont per group (the exact-tier complement of
    q26's approx_percentile): p25/p50/p75/p90 of event value per event
    type with SQL-standard linear interpolation — the spec that makes
    exact percentiles engine-portable (Spark ``percentile`` and DuckDB
    ``quantile_cont`` implement the same PERCENTILE_CONT definition, so
    the oracle pins interpolation arithmetic, not just ordering).

    Scale shape: one partial-agg shuffle keyed by event_type. Exact
    percentiles require the per-group value multiset on one reducer —
    correct here because |event_type| is small and bounded; for
    high-cardinality groups or global percentiles the q26 sketch tier is
    the scale path (that trade-off is the point of having both)."""
    ev = _t(spark, sf_dir, "events")
    pct = lambda p, a: F.round(
        F.percentile("value", F.lit(p)), 6
    ).alias(a)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pct(0.25, "p25"),
            pct(0.5, "p50"),
            pct(0.75, "p75"),
            pct(0.9, "p90"),
        )
        .orderBy("event_type")
    )


def q140_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/W3-family DRIFT MONITOR: Population Stability Index between
    two deterministic halves of the event stream (even/odd event_id
    standing in for baseline vs current window), per event type.
    PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) over 10 equal-width value bins
    with add-one smoothing (so empty bins stay finite) — the standard
    scorecard-monitoring statistic (> 0.2 ≈ significant shift). This is
    the batch twin of the streaming drift detector
    (streaming/ops.py) with an exact SQL oracle.

    Scale shape: one scalar min/max aggregate BROADCAST onto the
    stream, one partial-agg shuffle to (type, split, bin) — ≤ |types|·20
    rows — then driver-scale arithmetic. Bin edges are global, so both
    halves bin identically by construction."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    binned = ev.crossJoin(F.broadcast(stats)).selectExpr(
        "event_type",
        "pmod(event_id, 2) as split",
        "case when mx = mn then 0L else"
        " least(cast(floor((value - mn) / ((mx - mn) / 10.0)) as bigint),"
        " 9L) end as bin",
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("split") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("split") == 1, 1).otherwise(0)).alias("c1"),
    )
    # per-type totals via a WINDOW over the post-agg table (≤ |types|·10
    # rows) — a self-join here would re-execute the whole scan subtree
    w = Window.partitionBy("event_type")
    withtot = counts.withColumn("n0", F.sum("c0").over(w)).withColumn(
        "n1", F.sum("c1").over(w)
    )
    p = (F.col("c0") + F.lit(1.0)) / (F.col("n0") + F.lit(10.0))
    q = (F.col("c1") + F.lit(1.0)) / (F.col("n1") + F.lit(10.0))
    return (
        withtot
        .select(
            "event_type",
            "n0",
            "n1",
            ((p - q) * F.log(p / q)).alias("term"),
        )
        .groupBy("event_type")
        .agg(
            F.max("n0").cast("bigint").alias("n_baseline"),
            F.max("n1").cast("bigint").alias("n_current"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


R7_QUERIES = {
    "q127_incremental_ingest": q127_incremental_ingest,
    "q128_balanced_sample": q128_balanced_sample,
    "q129_bpe_pairs": q129_bpe_pairs,
    "q130_repetition": q130_repetition,
    "q131_chunk_overlap": q131_chunk_overlap,
    "q132_session_funnel": q132_session_funnel,
    "q133_rfm_segments": q133_rfm_segments,
    "q134_profile": q134_profile,
    "q135_repeated_spans": q135_repeated_spans,
    "q136_temperature_mix": q136_temperature_mix,
    "q137_gopher_rules": q137_gopher_rules,
    "q138_regression_aggs": q138_regression_aggs,
    "q139_exact_percentiles": q139_exact_percentiles,
    "q140_psi_drift": q140_psi_drift,
}
