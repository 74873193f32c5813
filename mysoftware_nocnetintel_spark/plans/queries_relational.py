"""Relational-core query surface: join family, set ops, rollup/cube/grouping
sets, pivot, quantiles, scalar-function families (date/string/map), subqueries.

SURVEY.md §2 rows J1-J5, A3-A6, U1-U2, O1-O3, F1-F4, F6, P3. Reference parity
cites per docstring. Conventions identical to :mod:`.queries`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table, register_views

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# J2: left outer join — enrich with optional data (README.md:42); inactive
# entities kept (count() over null right side = 0).
def q11_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("n_orders") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_inactive"),
            F.round(F.avg("n_orders"), 6).alias("avg_orders"),
        )
        .orderBy("c_mktsegment")
    )


# J5 semi: entities WITH urgent activity (EXISTS shape, README.md:43).
def q12_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# J5 anti: entities WITHOUT any activity (NOT EXISTS; KB novelty README.md:11).
def q13_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
        .orderBy("c_mktsegment")
    )


# A6: rollup — zone→region→network reporting levels (README.md:68).
def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 6).alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_bal",
        )
        .orderBy("region_name", "nation_name")
    )


# A6: cube over two categorical dimensions.
def q15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 6).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "total_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


# Full outer join: reconcile two per-entity aggregates (SURVEY.md §2.3 note).
def q16_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def per_user(kind: str, alias: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == kind)
            .groupBy("user_id")
            .agg(F.round(F.sum("value"), 6).alias(alias))
        )

    p = per_user("purchase", "purchase_value").alias("p")
    e = per_user("error", "error_value").alias("e")
    return p.join(e, F.col("p.user_id") == F.col("e.user_id"), "full").select(
        F.coalesce(F.col("p.user_id"), F.col("e.user_id")).alias("user_id"),
        "purchase_value",
        "error_value",
    )


# U1: union of heterogeneous slices with a source tag (README.md:32-33).
def q17_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def tagged(kind: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == kind)
            .groupBy("user_id")
            .agg(F.round(F.sum("value"), 6).alias("total"))
            .select(F.lit(kind).alias("kind"), "user_id", "total")
        )

    return tagged("purchase").unionByName(tagged("error"))


# U2: EXCEPT — entities seen in one population but not another.
def q18_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return viewers.subtract(buyers)


# Correlated EXISTS through the SQL API (Catalyst decorrelates to a semi join).
def q19_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_discount > 0.05
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# O1: global top-k — planned as TakeOrderedAndProject, no full sort at scale.
def q20_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(20)
        .select("event_id", "user_id", "event_type", "value")
    )


# F1: calendar bucketing — per-day rollup (README.md:41 "time of day...").
def q21_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("day")
    )


# F1: hour-of-day profile.
def q22_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").cast("bigint").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("hour_of_day")
    )


# F1: day-of-week profile (Spark dayofweek is 1=Sunday; oracle shifts DuckDB's
# 0=Sunday to match).
def q23_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.dayofweek("ts").cast("bigint").alias("day_of_week"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day_of_week")
    )


# F3: string functions — parse/format entity codes ("Site BGH-29 ...",
# README.md:71-79).
def q24_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("bigint").alias("name_num"),
        F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
    )


# Pivot: per-entity event-type histogram as columns.
def q25_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.groupBy("user_id").pivot("event_type", list(EVENT_TYPES)).count()
    cols = [
        F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return p.select("user_id", *cols)


# A4: exact interpolated quantiles (scaling/outlier bounds, README.md:36,38).
def q26_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


# P3: z-score outlier filter — stats join + predicate (README.md:36 "noise
# filtering"). Stats side is tiny → broadcast.
def q27_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("s")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("value") - F.col("m")) > 2 * F.col("s"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
        .orderBy("event_type")
    )


# J4: interval/range join — events within a bounded window after a trigger
# (maintenance windows / holiday calendars, README.md:41). Equi key + range
# predicate → sort-merge join with residual condition, no cross explosion.
def q29_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("u1"), F.col("ts").alias("err_ts")
    )
    buy = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("buy_ts")
    )
    pairs = err.join(
        buy,
        (F.col("u1") == F.col("u2"))
        & (F.col("buy_ts") > F.col("err_ts"))
        & (F.col("buy_ts") <= F.col("err_ts") + F.expr("INTERVAL '5' MINUTE")),
    )
    return (
        pairs.groupBy(F.col("u1").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


# W6: cumulative running total per entity (drift monitoring, README.md:141).
def q34_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 6).alias("running_total"),
    )


# F6: map construction + lookup (categorical dictionaries, README.md:38).
def q44_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("type_counts")
    )
    return m.select(
        "user_id",
        F.size(F.map_filter("type_counts", lambda k, v: v > 0))
        .cast("bigint")
        .alias("n_types"),
        F.coalesce(F.element_at("type_counts", "purchase"), F.lit(0))
        .cast("bigint")
        .alias("n_purchase"),
        F.coalesce(F.element_at("type_counts", "error"), F.lit(0))
        .cast("bigint")
        .alias("n_error"),
    )


# GROUPING SETS through the SQL API.
def q43_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 6) AS total_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
        """
    )


# U-family: unpivot/melt — the inverse of q25's pivot. Wide per-flag metric
# columns become (flag, metric, value) rows via DataFrame.unpivot (Spark's
# native Expand-based melt: one projection, no shuffle added). Oracle: the
# portable UNION-ALL stack of the same wide CTE.
def q95_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 6).alias("m_qty"),
        F.round(F.sum("l_extendedprice"), 6).alias("m_price"),
        F.round(F.sum("l_discount"), 6).alias("m_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["m_qty", "m_price", "m_disc"], "metric", "metric_value"
    ).orderBy("l_returnflag", "metric")


# A4/X2: NATIVE regression aggregates — the JVM-side single-pass twin of
# q50's pandas-UDF OLS (same math, zero Python): regr_slope/intercept and
# corr per entity against elapsed seconds. NaN-normalized to NULL (Spark
# yields NaN, DuckDB NULL, for zero-variance groups) so the hash compares.
def q96_regr_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("double")
    null_d = F.lit(None).cast("double")

    def clean(c: F.Column) -> F.Column:
        return F.nanvl(c, null_d)

    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(clean(F.regr_slope("value", x)), 9).alias("slope"),
            F.round(clean(F.regr_intercept("value", x)), 6).alias("intercept"),
            F.round(clean(F.corr("value", x)), 6).alias("corr_vt"),
        )
        .filter(F.col("n") >= 2)
        .orderBy("user_id")
    )


RELATIONAL_QUERIES = {
    "q11_left_join_agg": q11_left_join_agg,
    "q12_semi_join": q12_semi_join,
    "q13_anti_join": q13_anti_join,
    "q14_rollup": q14_rollup,
    "q15_cube": q15_cube,
    "q16_full_outer": q16_full_outer,
    "q17_union_all": q17_union_all,
    "q18_except": q18_except,
    "q19_exists_subquery": q19_exists_subquery,
    "q20_topk_global": q20_topk_global,
    "q21_daily_counts": q21_daily_counts,
    "q22_hourly_profile": q22_hourly_profile,
    "q23_dow_profile": q23_dow_profile,
    "q24_string_funcs": q24_string_funcs,
    "q25_pivot": q25_pivot,
    "q26_quantiles": q26_quantiles,
    "q27_zscore_outliers": q27_zscore_outliers,
    "q29_range_join": q29_range_join,
    "q34_running_total": q34_running_total,
    "q43_grouping_sets": q43_grouping_sets,
    "q44_map_ops": q44_map_ops,
    "q95_unpivot": q95_unpivot,
    "q96_regr_native": q96_regr_native,
}
