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


def test_corpus_split_deterministic_and_balanced(spark, sf_dir):
    """q97/q98 split-and-mix guarantees that matter at 100 TB: assignment is
    a pure hash of the stable key, so it must be IDENTICAL under any
    physical layout (repartition), and the realized fractions must sit near
    the 80/10/10 boundary cuts."""
    from mysoftware_nocnetintel_spark.plans.queries_text import (
        q97_corpus_split,
        q98_corpus_mixture,
    )

    out = q97_corpus_split(spark, sf_dir).collect()
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    total = sum(by_split.values())
    assert by_split["train"] / total > 0.7
    assert 0.02 < by_split["val"] / total < 0.2
    assert 0.02 < by_split["test"] / total < 0.2

    # determinism under physical re-layout: hash the (split, lang) counts
    # from a 7-partition rerun of the same logical query
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(7)
    docs.createOrReplaceTempView("__docs_relayout")
    import pyspark.sql.functions as F

    bucket = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    )
    split = (
        F.when(bucket < "cd", "train")
        .when(bucket < "e6", "val")
        .otherwise("test")
    )
    relaid = (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        )
        .orderBy("split", "lang")
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, relaid))

    mix = q98_corpus_mixture(spark, sf_dir).collect()
    # every source's realized rate within 4 sigma of its target (n=25 at
    # sf0.01 is small; the gate is sanity, the oracle is exactness)
    for r in mix:
        p = r.target_rate
        sigma = (p * (1 - p) / r.n_docs) ** 0.5
        assert abs(r.n_kept / r.n_docs - p) <= 4 * sigma + 1e-9, r
