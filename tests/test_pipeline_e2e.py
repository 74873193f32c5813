"""End-to-end reference-lifecycle test (SURVEY.md §3.2): the full forecast
pipeline — ingest → cleanse → align → features → score → rank → dispatch →
persist — chained through the real module functions as one flow."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.ml import dispatch as DP
from mysoftware_nocnetintel_spark.ml import forecast as FC
from mysoftware_nocnetintel_spark.operators import timeseries as TS
from mysoftware_nocnetintel_spark.sources import load_table
from mysoftware_nocnetintel_spark.sources.sinks import append_forecasts


def test_full_forecast_pipeline(spark, sf_dir, tmp_path):
    # 1. ingest (S1)
    events = load_table(spark, sf_dir, "events")
    n_users = events.select("user_id").distinct().count()

    # 2. cleanse + align (P2/W5/J3): mask noisy rows, interpolate the gaps
    masked = events.withColumn(
        "value",
        F.when(F.col("value") < 0, F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    cleaned = TS.interpolate_linear(
        masked, "user_id", "ts", "value", out_col="value_c", tiebreak="event_id"
    ).withColumn("value", F.coalesce("value_c", "value")).drop("value_c")

    # 3. features (W1-W3) → 4. model scoring (X1)
    feats = FC.build_features(cleaned)
    model = FC.fit_logistic(feats)
    scored = FC.score(model, feats)

    # 5. per-entity risk: latest score per user → rank (W4)
    w_latest = (
        scored.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_seen"),
            F.round(F.avg("risk_prob"), 6).alias("risk_score"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    assert w_latest.count() == n_users

    # 6. dispatch (X3)
    plan = DP.dispatch_plan(w_latest, n_clusters=3)
    assert plan.count() == n_users
    assert set(plan.select("team").distinct().toPandas()["team"]) <= set(DP.TEAMS)

    # 7. persist (S4) and read back
    out = str(tmp_path / "forecasts")
    append_forecasts(
        w_latest.select("user_id", "last_seen", "risk_score", "n_events"), out
    )
    back = spark.read.parquet(out)
    assert back.count() == n_users
    assert {f.name for f in back.schema.fields} == {
        "user_id",
        "last_seen",
        "risk_score",
        "n_events",
    }
