"""Forecasting pipeline: feature assembly → model scoring → metrics.

Reference parity: the model stage of the reference pipeline — "Multi-head
LSTM → Dense heads (classification + regression)" over "Sequence of
multivariate time series" (reference README.md:46-53), evaluated with
"F1, AUC ... RMSE" (README.md:53). SURVEY.md §2.10 X1/X2/X4, §2.4 A5.

Spark-first split (SURVEY.md §7.4 risk 7):
- the FEATURE pipeline is pure DataFrame ops (lag/rolling windows — one
  shuffle on the entity key), shared by training and serving;
- the MODEL is MLlib logistic regression (distributed, seeded) standing in
  for the reference's LSTM head; swapping in a deep model is a
  ``predict_batch_udf`` at the same seam, no plan changes;
- per-entity custom models (X2) run as ``applyInPandas`` per key — the
  grouped-map pattern the reference's per-site scoring implies; the OLS
  variant is closed-form, so the DuckDB oracle (regr_slope/regr_intercept)
  can check the Arrow/pandas plumbing exactly;
- METRICS are SQL-expressible confusion/ RMSE aggregates (oracle-checkable)
  plus MLlib's AUC evaluator for parity with README.md:53.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import timeseries as TS

# epoch reference for TZ-independent numeric time (NTZ-safe)
_EPOCH_SECONDS = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
# Anchor for per-entity OLS regressors: near the data, not Unix epoch (see
# per_entity_ols docstring for the float-error rationale).
_OLS_X_SECONDS = "timestampdiff(SECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"


def build_features(events: DataFrame) -> DataFrame:
    """Per-event feature row: lag/rolling signals per entity + binary label
    (is this event an error?). One shuffle on user_id; every feature is a
    window expression (README.md:43-44 lag / moving average / failure rate)."""
    is_err = F.when(F.col("event_type") == "error", 1.0).otherwise(0.0)
    df = events.withColumn("is_error", is_err)
    df = TS.with_lag_features(df, "user_id", "ts", "value", lags=(1, 2), tiebreak="event_id")
    df = TS.with_rolling(
        df, "user_id", "ts", "value", window_rows=10, aggs=("avg", "stddev"), tiebreak="event_id"
    )
    df = TS.with_rolling(
        df, "user_id", "ts", "is_error", window_rows=20, aggs=("avg",), tiebreak="event_id"
    )
    return df.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.coalesce("value_lag1", F.lit(0.0)).alias("f_lag1"),
        F.coalesce("value_lag2", F.lit(0.0)).alias("f_lag2"),
        F.coalesce("value_roll_avg10", F.lit(0.0)).alias("f_roll_avg"),
        F.coalesce("value_roll_stddev10", F.lit(0.0)).alias("f_roll_std"),
        F.coalesce("is_error_roll_avg20", F.lit(0.0)).alias("f_err_rate"),
        F.col("is_error").alias("label"),
    )


_FEATURES = ["f_lag1", "f_lag2", "f_roll_avg", "f_roll_std", "f_err_rate"]


def fit_logistic(features: DataFrame, seed: int = 42):
    """X1: MLlib logistic regression over the feature pipeline (seeded)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml import Pipeline

    assembler = VectorAssembler(inputCols=_FEATURES, outputCol="features")
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=25, regParam=0.01
    )
    return Pipeline(stages=[assembler, lr]).fit(features)


def score(model, features: DataFrame) -> DataFrame:
    """Batch scoring; probability of the positive class as risk_prob."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(features)
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "label",
        vector_to_array("probability").getItem(1).alias("risk_prob"),
        F.col("prediction").alias("predicted"),
    )


def per_entity_ols(events: DataFrame) -> DataFrame:
    """X2: per-entity model fitting via applyInPandas — closed-form OLS of
    value against elapsed seconds. Arrow-batched grouped-map; one shuffle on
    the entity key. Deterministic → oracle-checkable against DuckDB
    regr_slope/regr_intercept.

    x is seconds since 2024-01-01 (not Unix epoch): the intercept's float
    error is ~slope_error × mean(x), so anchoring near the data (mean x
    ~1.3e6 s vs ~1.7e9 s) shrinks numpy-vs-DuckDB summation-order ULP
    divergence in the intercept by ~3 orders of magnitude."""
    src = events.select(
        "user_id", F.expr(_OLS_X_SECONDS).cast("double").alias("x"), F.col("value").alias("y")
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = pdf["x"].to_numpy(), pdf["y"].to_numpy()
        n = len(x)
        mx, my = x.mean(), y.mean()
        sxx = ((x - mx) ** 2).sum()
        slope = float(((x - mx) * (y - my)).sum() / sxx) if sxx > 0 else 0.0
        intercept = float(my - slope * mx)
        return pd.DataFrame(
            [
                {
                    "user_id": int(pdf["user_id"].iloc[0]),
                    "n": n,
                    "slope": slope,
                    "intercept": intercept,
                }
            ]
        )

    return src.groupBy("user_id").applyInPandas(
        fit, "user_id LONG, n LONG, slope DOUBLE, intercept DOUBLE"
    )


def per_entity_ar2(events: DataFrame) -> DataFrame:
    """X2 sequence model: per-entity AR(2) forecaster — the checkable
    stand-in for the reference's per-site LSTM sequence model (reference
    README.md:46-53): each entity's ordered value series is regressed on
    its own two previous steps (y_t ~ b0 + b1·y_{t-1} + b2·y_{t-2}), fit
    closed-form per entity inside an Arrow grouped-map, then scored
    in-sample (RMSE).

    The fit deliberately solves the 3x3 normal equations by Cramer's rule
    — NOT np.linalg.lstsq — so the arithmetic is expression-identical to
    the DuckDB oracle's SQL (both engines evaluate the same determinant
    formulas from their own float sums; only summation order differs, and
    the coarse output rounding absorbs those ULPs — the q50 lesson).

    Scale shape: one shuffle on the entity key; each entity's series is one
    Arrow batch. Millions of entities parallelize; a single entity's
    history must fit a task (same contract as any per-entity grouped-map).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    src = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("value").alias("y"),
            F.lag("value", 1).over(w).alias("l1"),
            F.lag("value", 2).over(w).alias("l2"),
        )
        .filter(F.col("l2").isNotNull())
        .select("user_id", "y", "l1", "l2")
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf["y"].to_numpy(dtype="float64")
        l1 = pdf["l1"].to_numpy(dtype="float64")
        l2 = pdf["l2"].to_numpy(dtype="float64")
        n = float(len(y))
        s1, s2, sy = l1.sum(), l2.sum(), y.sum()
        s11, s22, s12 = (l1 * l1).sum(), (l2 * l2).sum(), (l1 * l2).sum()
        s1y, s2y = (l1 * y).sum(), (l2 * y).sum()
        # Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] b = [sy,s1y,s2y]
        det = (
            n * (s11 * s22 - s12 * s12)
            - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2)
        )
        if det == 0.0:
            b0, b1, b2 = y.mean(), 0.0, 0.0
        else:
            b0 = (
                sy * (s11 * s22 - s12 * s12)
                - s1 * (s1y * s22 - s12 * s2y)
                + s2 * (s1y * s12 - s11 * s2y)
            ) / det
            b1 = (
                n * (s1y * s22 - s12 * s2y)
                - sy * (s1 * s22 - s12 * s2)
                + s2 * (s1 * s2y - s1y * s2)
            ) / det
            b2 = (
                n * (s11 * s2y - s1y * s12)
                - s1 * (s1 * s2y - s1y * s2)
                + sy * (s1 * s12 - s11 * s2)
            ) / det
        resid = y - (b0 + b1 * l1 + b2 * l2)
        rmse = float((resid * resid).mean()) ** 0.5
        return pd.DataFrame(
            [
                {
                    "user_id": int(pdf["user_id"].iloc[0]),
                    "n_steps": int(len(y)),
                    "b0": b0,
                    "b1": b1,
                    "b2": b2,
                    "rmse": rmse,
                }
            ]
        )

    return src.groupBy("user_id").applyInPandas(
        fit,
        "user_id LONG, n_steps LONG, b0 DOUBLE, b1 DOUBLE, b2 DOUBLE, "
        "rmse DOUBLE",
    )


def rule_based_metrics(events: DataFrame, threshold: float = 250.0) -> DataFrame:
    """A5/X4: confusion-matrix metrics for a deterministic rule predictor
    (value ≥ threshold ⇒ predict error) — the SQL-expressible stand-in that
    lets the oracle check the metric arithmetic (precision/recall/F1) the
    MLlib evaluator otherwise hides."""
    label = F.when(F.col("event_type") == "error", 1).otherwise(0)
    pred = F.when(F.col("value") >= threshold, 1).otherwise(0)
    scored = events.select(label.alias("label"), pred.alias("pred"))
    agg = scored.agg(
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    precision = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    recall = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    f1 = F.try_divide(2 * precision * recall, precision + recall)
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def score_with_pandas_udf(
    features: DataFrame, coefficients: dict[str, float], bias: float = -0.5
) -> DataFrame:
    """X1 alternate seam: vectorized scalar pandas UDF scoring (the
    Arrow-batched path a torch/LSTM model plugs into via predict_batch_udf).
    The logistic form over fixed coefficients is deterministic, so — unlike
    the trained MLlib model — this path IS oracle-checkable, pinning the
    pandas-UDF numeric plumbing exactly (q71)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    names = sorted(coefficients)
    weights = np.array([coefficients[n] for n in names])

    @pandas_udf("double")
    def logistic(*cols: pd.Series) -> pd.Series:
        x = np.column_stack([c.to_numpy(dtype=float) for c in cols])
        z = x @ weights + bias
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    return features.withColumn("risk_prob", logistic(*[F.col(n) for n in names]))


def auc(scored: DataFrame) -> float:
    """README.md:53 AUC via MLlib evaluator (rows-only; not oracle-checked)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.functions import array_to_vector

    ev = BinaryClassificationEvaluator(
        rawPredictionCol="raw", labelCol="label", metricName="areaUnderROC"
    )
    prepared = scored.select(
        array_to_vector(F.array(1 - F.col("risk_prob"), F.col("risk_prob"))).alias("raw"),
        F.col("label").cast("double").alias("label"),
    )
    return float(ev.evaluate(prepared))
