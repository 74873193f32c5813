"""Model-pipeline query surface: MLlib scoring, per-entity grouped-map
models, dispatch planning, metric aggregates. SURVEY.md §2.10 X1-X4, §2.4 A5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml import dispatch as DP
from ..ml import forecast as FC
from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# X1: feature pipeline → MLlib logistic regression → batch scoring
# (rows-only: trained-model outputs are not SQL-expressible).
def q49_forecast_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    feats = FC.build_features(ev)
    model = FC.fit_logistic(feats)
    scored = FC.score(model, feats)
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("risk_prob"), 6).alias("avg_risk"),
            F.round(F.avg("label"), 6).alias("error_rate"),
        )
        .orderBy("user_id")
    )


# X2: per-entity OLS via applyInPandas (Arrow grouped-map); DuckDB's
# regr_slope/regr_intercept is the oracle — this checks the pandas plumbing,
# not just shapes. Emitted precision is deliberately coarse (slope as
# 1e9-scaled bigint, intercept to 2 dp): numpy (pairwise summation) and
# DuckDB (streaming) accumulate in different orders, so identical math can
# differ by ULPs and flip a tight rounding boundary (round-3 q50 mismatch:
# one group at a 6-dp boundary). q96_regr_native is the tight-precision JVM
# twin of the same regression.
def q50_per_entity_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    fitted = FC.per_entity_ols(ev)
    return fitted.select(
        "user_id",
        "n",
        F.round(F.col("slope") * 1e9, 0).cast("long").alias("slope_1e9"),
        F.round("intercept", 2).alias("intercept"),
    ).orderBy("user_id")


# X3: dispatch plan — rank → cluster → greedy team assignment (rows-only:
# KMeans cluster ids are seed-stable but not SQL-expressible).
def q51_dispatch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries import q0_flagship_risk

    risk = q0_flagship_risk(spark, sf_dir)
    return DP.dispatch_plan(risk, n_clusters=4)


# A5/X4: confusion-matrix metrics of the deterministic rule predictor —
# fully SQL-expressible, so the metric arithmetic is oracle-checked.
def q52_model_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return FC.rule_based_metrics(ev, threshold=250.0)


# Multimodal pipeline (rows-only: binary payloads aren't SQL-expressible):
# binary media columns → mapInPandas feature extraction over REAL pixels —
# each row carries a genuine PNG payload and the pure-stdlib decoder in
# operators/multimodal.py does an actual pixel decode (luminance histogram),
# no external codec needed. The `decoded` flag asserts the real path ran.
def q53_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents")
    media = MM.resize_meta(MM.attach_png_media(docs), max_dim=256)
    feats = MM.extract_features(media)
    return feats.select(
        "doc_id",
        F.col("media_meta.format").alias("media_format"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        "decoded",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias(
            "feature_l1"
        ),
        F.round(F.element_at("features", 1), 6).alias("f0"),
    ).orderBy("doc_id")


# X1 pandas-UDF seam, oracle-checked: fixed-coefficient logistic scoring via
# a vectorized Arrow UDF must equal the same formula in SQL.
def q71_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    feats = FC.build_features(ev)
    coeffs = {"f_err_rate": 4.0, "f_roll_std": 0.01}
    scored = FC.score_with_pandas_udf(
        feats.select("event_id", "user_id", "f_err_rate", "f_roll_std"),
        coeffs,
        bias=-0.5,
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("risk_prob"), 6).alias("avg_risk"),
        )
        .orderBy("user_id")
    )


# A5 completion: RMSE of a deterministic baseline regressor (per-entity mean
# prediction) — the regression metric of reference README.md:53, fully
# SQL-expressible so the arithmetic is oracle-checked.
def q73_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    means = ev.groupBy("user_id").agg(F.avg("value").alias("pred"))
    joined = ev.join(F.broadcast(means), "user_id")
    err2 = (F.col("value") - F.col("pred")) * (F.col("value") - F.col("pred"))
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sqrt(F.avg(err2)), 6).alias("rmse"),
            F.round(F.avg(F.abs(F.col("value") - F.col("pred"))), 6).alias("mae"),
        )
        .orderBy("event_type")
    )


# A5 completion: ROC AUC via the tie-corrected Mann-Whitney rank statistic —
# AUC = Σ_s n_pos(s)·(cum_neg(<s) + n_neg(s)/2) / (n⁺·n⁻) — fully
# SQL-expressible, so the classification metric of reference README.md:53 is
# oracle-checked (the MLlib evaluator is asserted equal in tests/test_ml.py).
#
# Scale shape: scores are binned to integers first, so the ordered running
# sum runs over a BOUNDED table (≤ #bins rows) — the per-row global ranking
# a naive rank-based AUC needs never happens. The binned classifier's AUC is
# exact for the binned score (and the bin width is the caller's precision
# knob at 100 TB).
def q74_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    s = ev.select(
        F.floor("value").cast("bigint").alias("score"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("lab"),
    )
    agg = s.groupBy("score").agg(
        F.sum("lab").alias("n_pos"),
        F.sum(1 - F.col("lab")).alias("n_neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = agg.withColumn("cum_neg", F.coalesce(F.sum("n_neg").over(w), F.lit(0)))
    return cum.agg(
        F.round(
            F.sum(F.col("n_pos") * (F.col("cum_neg") + F.col("n_neg") / 2.0))
            / (F.sum("n_pos") * F.sum("n_neg")),
            6,
        ).alias("auc"),
        F.sum("n_pos").cast("bigint").alias("n_pos"),
        F.sum("n_neg").cast("bigint").alias("n_neg"),
    )


# X2 SEQUENCE model: per-entity AR(2) forecaster (the checkable stand-in
# for the reference's per-site LSTM, reference README.md:46-53) — lag
# features via window, closed-form normal-equation fit per entity in an
# Arrow grouped-map, in-sample RMSE. Both sides round coarsely (2-4 dp on
# ~1e0-1e2-magnitude outputs) because numpy and DuckDB accumulate the
# underlying sums in different orders (the q50 lesson); the arithmetic
# itself (Cramer determinants) is expression-identical.
def q122_ar2_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    fitted = FC.per_entity_ar2(ev)
    return fitted.select(
        "user_id",
        "n_steps",
        F.round("b0", 2).alias("b0"),
        F.round("b1", 4).alias("b1"),
        F.round("b2", 4).alias("b2"),
        F.round("rmse", 2).alias("rmse"),
    ).orderBy("user_id")


ML_QUERIES = {
    "q49_forecast_score": q49_forecast_score,
    "q50_per_entity_ols": q50_per_entity_ols,
    "q51_dispatch_plan": q51_dispatch_plan,
    "q52_model_metrics": q52_model_metrics,
    "q53_multimodal_features": q53_multimodal_features,
    "q71_pandas_udf_score": q71_pandas_udf_score,
    "q73_rmse": q73_rmse,
    "q74_auc": q74_auc,
    "q122_ar2_sequence": q122_ar2_sequence,
}

ML_ORACLES = {
    "q122_ar2_sequence": """
        WITH lagged AS (
            SELECT user_id, value AS y,
                   lag(value, 1) OVER w AS l1,
                   lag(value, 2) OVER w AS l2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        rows_ AS (SELECT * FROM lagged WHERE l2 IS NOT NULL),
        sums AS (
            SELECT user_id,
                   CAST(count(*) AS DOUBLE) AS n,
                   sum(l1) AS s1, sum(l2) AS s2, sum(y) AS sy,
                   sum(l1*l1) AS s11, sum(l2*l2) AS s22,
                   sum(l1*l2) AS s12,
                   sum(l1*y) AS s1y, sum(l2*y) AS s2y
            FROM rows_ GROUP BY user_id
        ),
        fit AS (
            SELECT user_id, n,
                   n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                     + s2*(s1*s12 - s11*s2) AS det,
                   sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
                     + s2*(s1y*s12 - s11*s2y) AS det0,
                   n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
                     + s2*(s1*s2y - s1y*s2) AS det1,
                   n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
                     + sy*(s1*s12 - s11*s2) AS det2
            FROM sums
        ),
        coefs AS (
            SELECT user_id, CAST(n AS BIGINT) AS n_steps,
                   det0/det AS b0, det1/det AS b1, det2/det AS b2
            FROM fit WHERE det <> 0
        )
        SELECT c.user_id, c.n_steps,
               CAST(round(c.b0, 2) AS DOUBLE) AS b0,
               CAST(round(c.b1, 4) AS DOUBLE) AS b1,
               CAST(round(c.b2, 4) AS DOUBLE) AS b2,
               CAST(round(
                   sqrt(avg(power(r.y - (c.b0 + c.b1*r.l1 + c.b2*r.l2), 2))),
                   2) AS DOUBLE) AS rmse
        FROM coefs c JOIN rows_ r USING (user_id)
        GROUP BY c.user_id, c.n_steps, c.b0, c.b1, c.b2
        ORDER BY c.user_id
    """,
    "q74_auc": """
        WITH s AS (
            SELECT CAST(floor(value) AS BIGINT) AS score,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS lab
            FROM events
        ),
        agg AS (
            SELECT score, sum(lab) AS n_pos, sum(1 - lab) AS n_neg
            FROM s GROUP BY score
        ),
        cum AS (
            SELECT score, n_pos, n_neg,
                   coalesce(sum(n_neg) OVER (ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_neg
            FROM agg
        )
        SELECT round(sum(n_pos * (cum_neg + n_neg / 2.0))
                     / (sum(n_pos) * sum(n_neg)), 6) AS auc,
               CAST(sum(n_pos) AS BIGINT) AS n_pos,
               CAST(sum(n_neg) AS BIGINT) AS n_neg
        FROM cum
    """,
    "q73_rmse": """
        WITH means AS (
            SELECT user_id, avg(value) AS pred FROM events GROUP BY user_id
        )
        SELECT e.event_type,
               count(*) AS n,
               round(sqrt(avg((e.value - m.pred) * (e.value - m.pred))), 6) AS rmse,
               round(avg(abs(e.value - m.pred)), 6) AS mae
        FROM events e JOIN means m USING (user_id)
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    "q71_pandas_udf_score": """
        WITH feat AS (
            SELECT user_id,
                   avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS f_err,
                   coalesce(stddev_samp(value)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 0.0) AS f_std
            FROM events
        ),
        s AS (
            SELECT user_id,
                   1.0 / (1.0 + exp(-(4.0 * f_err + 0.01 * f_std - 0.5))) AS p
            FROM feat
        )
        SELECT user_id, count(*) AS n_events, round(avg(p), 6) AS avg_risk
        FROM s
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q50_per_entity_ols": """
        SELECT user_id,
               count(*) AS n,
               CAST(round(regr_slope(value, date_diff('second',
                   TIMESTAMP '2024-01-01 00:00:00', ts)) * 1e9) AS BIGINT)
                   AS slope_1e9,
               CAST(round(regr_intercept(value, date_diff('second',
                   TIMESTAMP '2024-01-01 00:00:00', ts)), 2) AS DOUBLE)
                   AS intercept
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q52_model_metrics": """
        WITH scored AS (
            SELECT CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS label,
                   CASE WHEN value >= 250.0 THEN 1 ELSE 0 END AS pred
            FROM events
        ),
        c AS (
            SELECT
                CAST(sum(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                CAST(sum(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
            FROM scored
        )
        SELECT tp, fp, fn, tn,
               round(tp * 1.0 / nullif(tp + fp, 0), 6) AS precision,
               round(tp * 1.0 / nullif(tp + fn, 0), 6) AS recall,
               round(2.0 * (tp * 1.0 / nullif(tp + fp, 0)) * (tp * 1.0 / nullif(tp + fn, 0))
                     / nullif((tp * 1.0 / nullif(tp + fp, 0)) + (tp * 1.0 / nullif(tp + fn, 0)), 0),
                     6) AS f1
        FROM c
    """,
}
