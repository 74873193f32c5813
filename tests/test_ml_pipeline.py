"""MLlib Pipeline demo (ml/pipeline.py, q125): the distributed
assembler→scaler→LogisticRegression chain must RECOVER the planted linear
signal on the held-out split, and the metrics row must be deterministic
across invocations on one session (fixed partitioning → fixed LBFGS
reduction topology; metrics rounded to 3 decimals)."""

from __future__ import annotations

from mysoftware_nocnetintel_spark.ml.pipeline import (
    _featurized,
    mllib_failure_pipeline,
)


def test_recovers_planted_signal(spark, sf_dir):
    row = mllib_failure_pipeline(spark, sf_dir).collect()[0]
    # the boundary is linear with 10% label noise: a working pipeline
    # lands far above chance (noise caps the ceiling near 0.9)
    assert row.auc >= 0.85, row
    assert row.accuracy >= 0.8, row
    assert row.n_train + row.n_test == _featurized(spark, sf_dir).count()
    # md5-boundary split: roughly 80/20
    assert 0.7 < row.n_train / (row.n_train + row.n_test) < 0.9


def test_metrics_deterministic(spark, sf_dir):
    a = mllib_failure_pipeline(spark, sf_dir).collect()[0]
    b = mllib_failure_pipeline(spark, sf_dir).collect()[0]
    assert a == b


def test_label_noise_rate_is_ten_percent(spark, sf_dir):
    feats = _featurized(spark, sf_dir)
    flipped = feats.selectExpr(
        "avg(cast((crc32(cast(event_id as string)) % 10 = 0) as double)) as r"
    ).collect()[0].r
    assert 0.05 < flipped < 0.15
