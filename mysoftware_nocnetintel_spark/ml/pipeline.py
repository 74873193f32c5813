"""MLlib Pipeline demo: distributed train/eval of a failure classifier.

Reference parity: the reference trains a sequence model on real outage
history (reference README.md:46-53). The synthetic test corpus carries no
organic signal (event_type is independent of every feature — verified:
per-type value/hour means are identical), so this demo PLANTS a linear
signal in the label and verifies the full pyspark.ml stack — assembler →
scaler → LogisticRegression → evaluator — recovers it. The checkable
sequence-model stand-ins with real oracles are q0/q49/q50/q121/q122; this
module covers the remaining seam: the distributed MLlib Pipeline API
itself (treeAggregate-based LBFGS over executors, the estimator/
transformer chain, metric evaluation on a held-out split).

Scale shape: training is MLlib's own distributed LBFGS (gradient
treeAggregate per iteration — no driver materialization of data); the
train/test split is the q97 md5-boundary determinism pattern; metrics
come back as bounded driver scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FEATURES = ["value", "hour", "dow"]


def _featurized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_id",
        "value",
        "cast(hour(ts) as double) as hour",
        "cast(dayofweek(ts) as double) as dow",
    )
    # planted signal: linear boundary + deterministic 10% label noise
    # (crc32 is stable across engines/sessions, unlike rand())
    return ev.selectExpr(
        "*",
        "cast((0.05D * value + 0.3D * hour - 5.0D > 0) != "
        "(crc32(cast(event_id as string)) % 10 = 0) as double) as label",
        # q97 pattern: md5-boundary split — deterministic, engine-portable
        "(crc32(md5(cast(event_id as string))) % 5) != 0 as is_train",
    )


def mllib_failure_pipeline(
    spark: SparkSession, sf_dir: str, seed: int = 42
) -> DataFrame:
    """Fit assembler→scaler→LogisticRegression on the deterministic train
    split, evaluate on the held-out split, and return ONE metrics row
    ``(n_train, n_test, auc, accuracy)`` (metrics rounded to 3 decimals:
    LBFGS gradient aggregation order varies with partitioning, so looser
    rounding keeps the row stable across runs). The row is emitted as
    pure literals over ``spark.range(1)`` — no LogicalRDD in the returned
    plan."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    data = _featurized(spark, sf_dir)
    # fixed partitioning → deterministic treeAggregate reduction topology
    train = data.filter("is_train").repartition(8, "event_id")
    test = data.filter("not is_train")

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=_FEATURES, outputCol="raw"),
            StandardScaler(inputCol="raw", outputCol="features"),
            LogisticRegression(
                featuresCol="features",
                labelCol="label",
                maxIter=25,
                regParam=0.01,
                standardization=False,  # the scaler already did it
            ),
        ]
    )
    model = pipe.fit(train)
    scored = model.transform(test)
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction"
    ).evaluate(scored)
    agg = scored.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double")).alias(
            "acc"
        ),
        F.count("*").alias("n_test"),
    ).collect()[0]
    n_train = train.count()
    return spark.range(1).selectExpr(
        f"cast({n_train} as bigint) as n_train",
        f"cast({agg.n_test} as bigint) as n_test",
        f"cast({round(auc, 3)!r} as double) as auc",
        f"cast({round(agg.acc, 3)!r} as double) as accuracy",
    )
