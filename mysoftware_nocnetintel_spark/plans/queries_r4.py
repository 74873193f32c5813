"""Round-4 coverage: time-spine gap-fill, CUSUM changepoints, keyed
snapshot diff (CDC classify), Bloom-filter join pruning, mergeable daily
histogram quantiles, seasonal-baseline residual outliers, and Markov
transition matrices. All oracle-paired.

Reference parity: the reference (README.md:37 "Timestamp alignment,
interpolation"; README.md:35-40 preprocessing/forecast pipeline) implies a
regular time grid, drift/changepoint awareness, and incremental snapshot
maintenance; the Bloom pruning mirrors the scan-reduction any 100 TB join
needs (Spark's own runtime row-level filtering, made explicit and testable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# W5/F1: per-user hourly time spine (sequence + explode) gap-filled with
# zeros. The spine derives from the *aggregated* hourly frame, so the raw
# events table is scanned per branch but the per-user bounds aggregation is
# over the already-reduced hourly rows. At cluster scale the spine explode
# is embarrassingly parallel (one array per user) and the left join
# shuffles on (user_id, hour) — the same key the hourly agg already
# produced, so AQE reuses the partitioning.
def q100_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    return (
        spine.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.col("h").alias("hour_start"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
        .orderBy("user_id", "hour_start")
    )


# X-family/W6: CUSUM changepoint candidate per entity — running sum of
# deviations from the entity mean; the |CUSUM| argmax is the classic
# changepoint location statistic. Pure window functions: one shuffle on
# user_id, every frame ordered by (ts, event_id) so the accumulation order
# is deterministic on both engines. Ranking uses the ROUNDED statistic so
# float noise in the running sum cannot flip the argmax between engines.
def q101_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id")
    w_ord = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = F.col("value") - F.avg("value").over(w_all)
    cs = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.count(F.lit(1)).over(w_all).alias("n_events"),
        F.round(F.abs(F.sum(dev).over(w_ord)), 6).alias("abs_cusum"),
    )
    w_rk = Window.partitionBy("user_id").orderBy(
        F.desc("abs_cusum"), "ts", "event_id"
    )
    return (
        cs.withColumn("r", F.row_number().over(w_rk))
        .filter(F.col("r") == 1)
        .select(
            "user_id",
            F.col("ts").alias("change_ts"),
            F.col("abs_cusum").alias("max_abs_cusum"),
            "n_events",
        )
        .orderBy("user_id")
    )


# CDC / snapshot diff: two keyed snapshots of per-(user, event_type)
# activity over overlapping 20-day windows, full-outer joined on the key
# and classified insert/delete/update/unchanged — the maintenance primitive
# every incremental 100 TB pipeline needs. One shuffle per snapshot agg +
# one join shuffle on the same key; at scale both sides would be bucketed
# on the key so the join is exchange-free.
def q102_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def snap(pred) -> DataFrame:
        return ev.filter(pred).groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
        )

    a = snap(F.col("ts") < F.lit("2024-01-21"))
    b = snap(F.col("ts") >= F.lit("2024-01-11"))
    j = a.alias("a").join(
        b.alias("b"), ["user_id", "event_type"], "full_outer"
    )
    op = (
        F.when(F.col("a.n").isNull(), F.lit("insert"))
        .when(F.col("b.n").isNull(), F.lit("delete"))
        .when(
            (F.col("a.n") == F.col("b.n"))
            & (F.col("a.total") == F.col("b.total")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("update"))
    )
    return j.select(
        "user_id",
        "event_type",
        op.alias("op"),
        F.col("a.n").alias("old_n"),
        F.col("b.n").alias("new_n"),
        F.col("a.total").alias("old_total"),
        F.col("b.total").alias("new_total"),
    ).orderBy("user_id", "event_type")


# J-family at scale: explicit Bloom-filter join pruning. The build side
# (hot orders) is hashed k ways into an m-bit filter ASSEMBLED
# DISTRIBUTEDLY (explode positions -> groupBy word -> bit_or), and only the
# <= m/64 longs of the finished bitmap ever reach the driver, where they are
# inlined as ONE array literal (a single py4j call). The probe side tests
# k bits before the exact semi join removes Bloom false positives, so the
# result is exactly the semi join — which is what the oracle checks.
# This is Spark's runtime row-level filtering made explicit; at 100 TB the
# bitmap (m sized ~10x build cardinality) stays megabytes while the probe
# scan skips ~(1 - selectivity) of the fact table before any shuffle.
# NOTE: eager plan build — the bitmap aggregation runs at construction time
# (same documented trade as q58's approxQuantile).
_BLOOM_M = 1 << 16  # bits
_BLOOM_K = 3


def _bloom_positions(col: F.Column) -> list[F.Column]:
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(_BLOOM_M)).cast("long")
        for seed in range(_BLOOM_K)
    ]


def q103_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    hot = orders.filter(F.col("o_totalprice") > 470000).select("o_orderkey")

    pos = hot.select(
        F.explode(F.array(*_bloom_positions(F.col("o_orderkey")))).alias("p")
    )
    # shiftleft/shiftrightunsigned take a column-valued shift only through
    # the SQL surface (the Python helpers require a literal int)
    words = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * (_BLOOM_M // 64)
    for row in words:
        bitmap[row["w"]] = row["word"]
    blit = F.lit(bitmap).cast("array<bigint>")  # ONE literal, one py4j call

    survivors = li.withColumn("_bloom", blit)
    for i, p in enumerate(_bloom_positions(F.col("l_orderkey"))):
        survivors = survivors.withColumn(f"_bp{i}", p)
    hit = " AND ".join(
        f"((shiftrightunsigned(element_at(_bloom, CAST(_bp{i} / 64 AS INT) + 1),"
        f" CAST(_bp{i} % 64 AS INT)) & 1) = 1)"
        for i in range(_BLOOM_K)
    )
    survivors = survivors.filter(F.expr(hit)).drop(
        "_bloom", *[f"_bp{i}" for i in range(_BLOOM_K)]
    )
    # exact semi join on the pre-pruned fact removes Bloom false positives
    exact = survivors.join(hot, survivors.l_orderkey == hot.o_orderkey, "left_semi")
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


# A3/A4 mergeable-sketch family (the q78 HLL pattern, for quantiles):
# per-DAY equi-width histograms (the mergeable partial) summed bin-wise
# into a global histogram, then p50/p90/p99 read off the cumulative counts
# as bin midpoints. Merging per-day counts is associative, so the daily
# rollup path is value-identical to a direct global histogram — which is
# exactly what the DuckDB oracle computes from raw rows. At 100 TB each
# day's sketch is `nbins` longs: the re-aggregation shuffles ~days*nbins
# rows, never the raw data.
_H_NBINS = 50
_H_WIDTH = 10.0


def q104_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bin_ = F.least(
        F.floor(F.col("value") / _H_WIDTH), F.lit(_H_NBINS - 1)
    ).alias("bin")
    daily = ev.groupBy(F.to_date("ts").alias("day"), bin_).agg(
        F.count(F.lit(1)).alias("c")
    )
    merged = daily.groupBy("bin").agg(F.sum("c").alias("c"))
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = merged.select(
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("total"),
    )

    def est(q: float) -> F.Column:
        qbin = F.min(
            F.when(F.col("cum") >= q * F.col("total"), F.col("bin"))
        )
        return F.round((qbin + 0.5) * _H_WIDTH, 6)

    return cum.agg(
        F.max("total").alias("n_total"),
        est(0.5).alias("p50_est"),
        est(0.9).alias("p90_est"),
        est(0.99).alias("p99_est"),
    )


# P3/A4 seasonal variant of q27: hour-of-day baseline per event_type
# (mean/stddev over the same seasonal slot), residual z-score, outlier
# counts per slot. Window-function formulation — one shuffle on
# (event_type, hour), no join back.
def q105_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    slot = ev.select(
        "event_type", F.hour("ts").alias("hh"), "value"
    )
    w = Window.partitionBy("event_type", "hh")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return (
        slot.withColumn("z", z)
        .groupBy("event_type", "hh")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.abs(F.col("z")) > 3, 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
        .orderBy("event_type", "hh")
    )


# A7/W-family sequence analytics: first-order Markov transition matrix over
# per-user event streams — lead() pairs, transition counts, and row-
# normalized probabilities. One shuffle for the window, one for the pair
# groupBy; the probability normalization is a window over the (small)
# transition matrix itself.
def q106_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_src = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(w_src), 6
        ).alias("p"),
    ).orderBy("src", "dst")


R4_QUERIES = {
    "q100_gapfill": q100_gapfill,
    "q101_cusum": q101_cusum,
    "q102_snapshot_diff": q102_snapshot_diff,
    "q103_bloom_prune": q103_bloom_prune,
    "q104_histogram_quantiles": q104_histogram_quantiles,
    "q105_seasonal_outliers": q105_seasonal_outliers,
    "q106_transition_matrix": q106_transition_matrix,
}
