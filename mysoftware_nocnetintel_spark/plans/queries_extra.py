"""Additional oracle-paired coverage: subquery shapes, remaining window
functions (lead, first/last value, ntile, percent_rank, time-range frames),
set-op variants, LIKE predicates, date arithmetic, and the grid-alignment
pipeline (resample + as-of) the reference's preprocessing implies
(reference README.md:37 "Timestamp alignment, interpolation").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import timeseries as TS
from ..sources import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Scalar subquery: parts above the average retail price, per type.
def q54_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT p_type, count(*) AS n_premium,
               round(avg(p_retailprice), 6) AS avg_premium_price
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        GROUP BY p_type
        ORDER BY p_type
        """
    )


# IN subquery over a filtered set (decorrelates to a semi join).
def q55_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# W-family: lead — time-to-next-event per entity. Gap is computed as
# floor(microsecond diff / 1e6) on BOTH engines: Spark's timestampdiff(SECOND)
# counts full elapsed seconds while DuckDB's date_diff('second') counts
# boundary crossings — they disagree on sub-second offsets.
def q56_lead_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    next_ts = F.lead("ts").over(w)
    gap_sec = F.expr("timestampdiff(MICROSECOND, ts, __next_ts) div 1000000")
    return (
        ev.withColumn("__next_ts", next_ts)
        .withColumn("gap_seconds", gap_sec.cast("bigint"))
        .select("event_id", "user_id", "ts", "gap_seconds")
    )


# W-family: first/last value with explicit frames per entity.
def q57_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.first("value").over(w_full).alias("first_value"),
        F.last("value").over(w_full).alias("last_value"),
    )


# W-family: ntile quartiles + percent_rank over global value order.
#
# Scale-safe formulation: a global `Window.orderBy` would funnel every row
# through ONE task. Instead: (1) approxQuantile picks ~P value boundaries,
# (2) each row gets a deterministic range-bucket from those literal
# boundaries, (3) exact per-bucket counts (tiny, ≤P rows) are collected and
# turned into literal rank offsets, (4) a PER-BUCKET window assigns local
# row_number, and global_rank = offset[bucket] + local_rn. percent_rank and
# ntile(4) are then closed-form in the global rank — bit-identical to the
# single-window answer, but the big side never leaves P-way parallelism.
#
# EAGER-BUILD WARNING: constructing this plan RUNS two Spark jobs
# (approxQuantile + the per-bucket counts) before a DataFrame is returned —
# query construction is not free and the input is scanned twice overall.
# That is the deliberate trade against the single-partition global window
# (tests/test_plans.py pins "no SinglePartition exchange"); callers building
# plans in a latency-sensitive loop should cache the input first. See
# SCALING.md "Operator runbook" → eager-build plans.
def q58_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    n_buckets = 32
    qs = [i / n_buckets for i in range(1, n_buckets)]
    boundaries = sorted(set(ev.approxQuantile("value", qs, 0.001)))
    if boundaries:
        blit = F.array(*[F.lit(float(b)) for b in boundaries])
        bucket = F.size(F.filter(blit, lambda b: b <= F.col("value")))
    else:  # constant column → single bucket
        bucket = F.lit(0)
    bucketed = ev.withColumn("__b", bucket)
    counts = {
        r["__b"]: r["n"]
        for r in bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off = F.element_at(
        F.create_map(
            *[x for b in sorted(offsets) for x in (F.lit(b), F.lit(offsets[b]))]
        ),
        F.col("__b"),
    )
    w_local = Window.partitionBy("__b").orderBy("value", "event_id")
    grn = (off + F.row_number().over(w_local)).cast("bigint")
    # ntile(N into 4): first (N mod 4) buckets get (N div 4)+1 rows
    q, r = divmod(n_total, 4)
    cut = r * (q + 1)
    quartile = (
        F.when(F.col("__grn") <= cut, ((F.col("__grn") - 1) / (q + 1)).cast("bigint") + 1)
        .otherwise(r + ((F.col("__grn") - cut - 1) / max(q, 1)).cast("bigint") + 1)
        .cast("bigint")
    )
    return (
        bucketed.withColumn("__grn", grn)
        .select(
            "event_id",
            "value",
            quartile.alias("quartile"),
            F.round((F.col("__grn") - 1) / max(n_total - 1, 1), 6).alias("pct_rank"),
        )
    )


# Time-range window frame: trailing 1-hour average per entity (rangeBetween
# on epoch MICROseconds — exact precision, matching DuckDB's RANGE INTERVAL
# frame bit-for-bit even when a pair's gap straddles a whole-second boundary).
def q59_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    usec = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__usec"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.withColumn("__usec", usec)
        .withColumn("trailing_1h_avg", F.round(F.avg("value").over(w), 6))
        .select("event_id", "user_id", "ts", "trailing_1h_avg")
    )


# Set-op variant: UNION (distinct) of entity populations.
def q60_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.union(b).distinct()


# Set-op variant: EXCEPT ALL (multiplicity-preserving difference).
def q61_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return views.exceptAll(buys)


# LIKE predicates (F3): pattern filters on entity names.
def q62_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_name").like("%001%"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


# Date arithmetic (F1): order-to-ship latency in days.
def q63_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.round(F.avg(lat), 6).alias("avg_latency_days"),
            F.max(lat).cast("bigint").alias("max_latency_days"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


# Grid alignment pipeline: per-entity hourly resample grid + backward as-of
# carry of the latest observation (README.md:37 "Timestamp alignment") —
# resample_grid and asof_join composed; oracle uses generate_series + native
# ASOF JOIN.
def q64_resample_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    grid = TS.resample_grid(ev, "user_id", "ts", "1 hour")
    obs = ev.select("user_id", "ts", "value")
    out = TS.asof_join(grid, obs, keys="user_id", right_cols=["value"], suffix="_obs")
    return out.select(
        "user_id",
        "ts",
        F.col("ts_obs").alias("obs_ts"),
        F.col("value_obs").alias("last_value"),
    )


# Conditional aggregation over a join (TPC-H Q12 shape): urgent-vs-other
# order mix per line status.
def q65_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# Skew-mitigation: two-phase salted aggregation ≡ plain aggregation (the
# oracle is the PLAIN SQL aggregate — proving the salted plan is
# result-identical, which is the whole point of the technique).
def q66_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import skew as SK

    ev = _t(spark, sf_dir, "events")
    out = SK.salted_agg(ev, "event_type", "value", n_salts=16)
    return out.select(
        "event_type",
        F.round("sum_value", 6).alias("sum_value"),
        F.col("count_value").alias("count_value"),
        "min_value",
        "max_value",
        F.round("avg_value", 6).alias("avg_value"),
    ).orderBy("event_type")


# F7: native TF-IDF (tf × ln(N/df)), top-3 terms per document — fully
# SQL-expressible, no MLlib hashing trick, so exactly oracle-checkable.
def q67_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TX

    docs = _t(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        terms.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf_raw",
            F.col("tf") * F.log(F.col("n_docs") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_raw").desc(), F.col("term")
    )
    return (
        scored.filter(F.col("doc_id") < 10)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", F.round("tfidf_raw", 6).alias("tfidf"), "rn")
    )


# A4 completion: variance family (sample + population — both engines use
# the standard definitions) and Pearson correlation / sample covariance.
def q68_variance_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.var_samp("value"), 6).alias("var_samp_v"),
            F.round(F.var_pop("value"), 6).alias("var_pop_v"),
            F.round(F.stddev_pop("value"), 6).alias("stddev_pop_v"),
            F.round(F.corr("value", "k"), 6).alias("corr_vk"),
            F.round(F.covar_samp("value", "k"), 6).alias("covar_vk"),
        )
        .orderBy("event_type")
    )


# F5 completion: array transforms over embeddings — per-cluster norm stats
# computed with higher-order functions (sort/slice/aggregate).
def q69_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import vectors as V

    emb = _t(spark, sf_dir, "embeddings")
    head3 = F.slice(F.reverse(F.array_sort(V.as_double("embedding"))), 1, 3)
    return (
        emb.select(
            "label",
            V.l2_norm("embedding").alias("nrm"),
            F.aggregate(head3, F.lit(0.0), lambda a, x: a + x).alias("top3_sum"),
            F.size("embedding").alias("dim"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.avg("top3_sum"), 6).alias("avg_top3_sum"),
            F.max("dim").cast("bigint").alias("dim"),
        )
        .orderBy("label")
    )


# P2: explicit null-cleansing surface — mask, then dropna vs fillna tallies.
def q70_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    masked = ev.withColumn(
        "v",
        F.when(F.col("event_type") == "view", F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    dropped = masked.na.drop(subset=["v"])
    filled = masked.na.fill({"v": 0.0})
    return (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.round(F.sum("v"), 6).alias("sum_filled"),
        )
        .join(
            dropped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_kept")),
            "event_type",
            "left",
        )
        .select(
            "event_type",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "sum_filled",
        )
        .orderBy("event_type")
    )


# F4 scale path: Spark 4 VARIANT — parse semi-structured JSON once into a
# binary-encoded column, then cheap typed extraction (vs re-parsing the
# string per access as get_json_object does). The 100 TB answer for raw-log
# props; results must equal the string-path q6 semantics.
def q72_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.withColumn("pv", F.parse_json("props"))
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.avg(F.variant_get(F.col("pv"), "$.k", "double")), 6
            ).alias("avg_k"),
            F.max(F.variant_get(F.col("pv"), "$.k", "bigint")).alias("max_k"),
        )
        .orderBy("event_type")
    )


# A7: per-entity time-ordered sequence assembly (LSTM model input, reference
# README.md:47). The query materializes the array<struct> via
# assemble_sequences, then projects SQL-comparable facts DERIVED FROM the
# array — length, first/last element timestamps, and an order-sensitive
# Σ i·valueᵢ checksum over the array elements — so the oracle verifies both
# membership and the internal sort order without brittle nested-type hashing.
def q75_sequence_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seqs = TS.assemble_sequences(
        ev, "user_id", "ts", ["value"], tiebreak="event_id"
    )
    idx = F.sequence(F.lit(1), F.size("sequence"))
    checksum = F.aggregate(
        F.zip_with(
            F.col("sequence"), idx, lambda s, i: i.cast("double") * s["value"]
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return seqs.select(
        "user_id",
        F.col("seq_len").cast("bigint").alias("seq_len"),
        F.element_at("sequence", 1)["__ts"].alias("first_ts"),
        F.element_at("sequence", -1)["__ts"].alias("last_ts"),
        F.round(checksum, 4).alias("ord_checksum"),
    ).orderBy("user_id")


# Funnel / ordered-pattern match: purchases preceded by a view within 1 hour
# (MATCH_RECOGNIZE-lite; the alarm→ticket ordered-correlation shape of
# reference README.md:32 applied to event funnels). The conditional running max over the per-entity
# window replaces the naive self-join — one shuffle, no pair blowup, the
# formulation that survives 100 TB event streams.
def q77_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    purchases = (
        ev.withColumn("__lv", last_view)
        .filter(F.col("event_type") == "purchase")
        .withColumn(
            "converted",
            (
                F.col("__lv").isNotNull()
                & (F.col("ts") - F.col("__lv") <= F.expr("INTERVAL '1' HOUR"))
            ).cast("int"),
        )
    )
    return (
        purchases.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.round(F.avg("converted"), 6).alias("conversion_rate"),
        )
        .orderBy("day")
    )


# A3 completion: MERGEABLE distinct sketches (Datasketches HLL; the
# distinct-count rollups behind reference README.md:68 zone summaries). Daily
# sketches roll up to a global estimate via hll_union_agg without touching
# row data again — the reaggregatable-cube property that makes distinct
# counts cheap at 100 TB (per-partition sketches merge in the metastore
# tier; exact distinct would re-shuffle everything). Rows-only: estimates
# are approximate by construction; the ±5% accuracy band vs exact is pinned
# in tests/test_plans.py's companion unit test.
def q78_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("approx_distinct_users"),
    )


# Root-cause correlation (reference README.md:52 "root-cause analysis"):
# which event types disproportionately precede an error? For every error,
# count each type in the trailing 10-minute window per entity (conditional
# RANGE-frame windows — no self-join), then lift = P(type precedes error) /
# P(type overall). Lift > 1 marks candidate precursors.
def q81_root_cause_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    usec = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("long")
    base = ev.withColumn("__u", usec)
    w = (
        Window.partitionBy("user_id")
        .orderBy("__u")
        .rangeBetween(-600_000_000, -1)  # strictly-before, 10 min
    )
    kinds = ["click", "purchase", "signup", "view"]
    counts = [
        F.count(F.when(F.col("event_type") == k, 1)).over(w).alias(f"n_{k}")
        for k in kinds
    ]
    errors = base.select("event_type", "__u", "user_id", *counts).filter(
        F.col("event_type") == "error"
    )
    # Single pass over the window pipeline: one agg emits all four per-kind
    # presence fractions, stack() pivots them to rows (was: four .agg() jobs
    # unioned — the window pipeline recomputed 4x). Per-kind corpus totals are
    # a second tiny agg (bounded by #event types) joined lazily via broadcast;
    # no collect, fully lazy plan, two scans of `events` total.
    pre = errors.agg(
        *[
            F.avg((F.col(f"n_{k}") > 0).cast("double")).alias(f"p_{k}")
            for k in kinds
        ]
    )
    stacked = pre.selectExpr(
        "stack({}, {}) as (kind, p)".format(
            len(kinds), ", ".join(f"'{k}', p_{k}" for k in kinds)
        )
    )
    totals = (
        ev.groupBy(F.col("event_type").alias("kind"))
        .agg(F.count(F.lit(1)).alias("n_k"))
        .withColumn("n_all", F.sum("n_k").over(Window.partitionBy(F.lit(0))))
    )
    return (
        stacked.join(F.broadcast(totals), "kind")
        .select(
            "kind",
            F.round("p", 6).alias("p_precedes"),
            F.round(
                F.col("p") / (F.col("n_k").cast("double") / F.col("n_all")), 6
            ).alias("lift"),
        )
        .orderBy("kind")
    )


# Outage/burst detection (reference README.md:10 "Predicts outages",
# README.md:141 monitoring): per-entity 10-minute event-rate buckets scored
# against a trailing 12-bucket baseline; a bucket whose count exceeds
# mean + 3*stddev of its trailing window is a burst. Two shuffles total
# (bucket agg + per-entity window); the z-style score is exact SQL, so the
# whole detector is oracle-checked.
def q82_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bucket = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " div 600000000"
    ).cast("long")
    per_bucket = (
        ev.withColumn("__bk", bucket)
        .groupBy("user_id", "__bk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__bk")
        .rowsBetween(-12, -1)
    )
    scored = per_bucket.select(
        "user_id",
        "__bk",
        "cnt",
        F.avg("cnt").over(w).alias("base_avg"),
        F.stddev_samp("cnt").over(w).alias("base_sd"),
        F.count(F.lit(1)).over(w).alias("n_base"),
    )
    bursts = scored.withColumn(
        "is_burst",
        (
            (F.col("n_base") >= 6)
            & F.col("base_sd").isNotNull()
            & (F.col("base_sd") > 0)
            & (F.col("cnt") > F.col("base_avg") + 3 * F.col("base_sd"))
        ).cast("int"),
    )
    return (
        bursts.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("is_burst").cast("bigint").alias("n_bursts"),
            F.round(
                F.max(
                    F.when(
                        F.col("base_sd") > 0,
                        (F.col("cnt") - F.col("base_avg")) / F.col("base_sd"),
                    )
                ),
                6,
            ).alias("max_z"),
        )
        .orderBy("user_id")
    )


# Alert-pipeline hygiene 1 (reference README.md:141 alerting): maintenance-
# window suppression. Windows (every Sunday 02:00-04:00 over the data range)
# are generated as an interval TABLE and alerts are removed by a broadcast
# anti range-join — the generic calendar-suppression shape, not a hardcoded
# predicate.
def q84_maintenance_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("week", F.min("ts")).alias("t0"), F.max("ts").alias("t1")
    )
    windows = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL '7' DAY"))
        ).alias("week_start")
    ).select(
        # date_trunc('week') = Monday 00:00; Sunday 02:00 is +6d2h
        F.expr("week_start + INTERVAL '146' HOUR").alias("w_start"),
        F.expr("week_start + INTERVAL '148' HOUR").alias("w_end"),
    )
    alerts = ev.filter(F.col("event_type") == "error")
    suppressed_ids = alerts.join(
        F.broadcast(windows),
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
        "left_semi",
    ).select("event_id")
    return (
        alerts.join(suppressed_ids.withColumnRenamed("event_id", "sid"),
                    F.col("event_id") == F.col("sid"), "left")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_alerts"),
            F.sum(F.col("sid").isNotNull().cast("int")).cast("bigint").alias("n_suppressed"),
        )
        .orderBy("day")
    )


# Alert-pipeline hygiene 2: flap suppression — an error alert is DELIVERED
# only if the entity's previous error is more than 15 minutes older
# (cooldown); repeats inside the window are suppressed as flapping. Lag-gap
# window per entity, one shuffle.
def q85_flap_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    errs = ev.filter(F.col("event_type") == "error")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flagged = errs.withColumn(
        "delivered",
        (
            prev.isNull()
            | (F.col("ts") - prev > F.expr("INTERVAL '15' MINUTE"))
        ).cast("int"),
    )
    return (
        flagged.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum("delivered").cast("bigint").alias("n_delivered"),
            F.round(F.avg("delivered"), 6).alias("delivery_rate"),
        )
        .orderBy("day")
    )


# Correlated scalar subquery (TPC-H Q17 shape): lineitems below 20% of
# their part's average quantity — Catalyst decorrelates the per-row
# subquery into an aggregate + join; revenue impact per brand.
def q86_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT p_brand,
               count(*) AS n_small_orders,
               round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey
        )
        GROUP BY p_brand
        ORDER BY p_brand
        """
    )


# Windowed DISTINCT emulation: neither engine supports count(DISTINCT) over
# a moving frame natively in all versions — the portable formulation is a
# list aggregation + distinct size, identical semantics on both. Trailing
# 20-row distinct event-type diversity per entity.
def q87_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("bigint")
        .alias("trailing_type_diversity"),
    )


# Behavioral entropy per entity (A4 depth; anomaly signal — uniform
# activity vs single-type loops): H = -sum p ln p over the event-type
# distribution. Two grouped aggregations, exact SQL on both engines.
def q88_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = Window.partitionBy("user_id")
    p = F.col("c") / F.sum("c").over(tot)
    ent = per_type.withColumn("term", -p * F.log(p)).groupBy("user_id").agg(
        F.round(F.sum("term"), 6).alias("entropy"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    return ent.orderBy("user_id")


# Robust outliers via MAD (A4 depth): |x - median| > 3 * MAD per event
# type — resistant to the heavy tails that wreck mean/stddev z-scores.
# Grouped exact medians on both engines (Spark `percentile`, DuckDB
# `median` on doubles are both exact interpolated medians).
def q89_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > 3 * F.col("mad"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
        .orderBy("event_type")
    )


EXTRA_QUERIES = {
    "q54_scalar_subquery": q54_scalar_subquery,
    "q55_in_subquery": q55_in_subquery,
    "q56_lead_window": q56_lead_window,
    "q57_first_last_value": q57_first_last_value,
    "q58_ntile_percent_rank": q58_ntile_percent_rank,
    "q59_time_range_frame": q59_time_range_frame,
    "q60_union_distinct": q60_union_distinct,
    "q61_except_all": q61_except_all,
    "q62_like_filter": q62_like_filter,
    "q63_date_arithmetic": q63_date_arithmetic,
    "q64_resample_asof": q64_resample_asof,
    "q65_conditional_agg": q65_conditional_agg,
    "q66_salted_agg": q66_salted_agg,
    "q67_tfidf": q67_tfidf,
    "q68_variance_corr": q68_variance_corr,
    "q69_array_ops": q69_array_ops,
    "q70_null_handling": q70_null_handling,
    "q72_variant_json": q72_variant_json,
    "q75_sequence_assembly": q75_sequence_assembly,
    "q77_funnel": q77_funnel,
    "q78_hll_rollup": q78_hll_rollup,
    "q81_root_cause_lift": q81_root_cause_lift,
    "q82_burst_detection": q82_burst_detection,
    "q84_maintenance_suppression": q84_maintenance_suppression,
    "q85_flap_suppression": q85_flap_suppression,
    "q86_correlated_subquery": q86_correlated_subquery,
    "q87_window_distinct": q87_window_distinct,
    "q88_entropy": q88_entropy,
    "q89_mad_outliers": q89_mad_outliers,
}


