"""The multimodal scale claim, plan-gated: metadata predicates prune at
the PARQUET SCAN, below the Arrow decode stage — so at 100 TB a
format/size filter costs row-group skipping, not a decode of the whole
media corpus (operators/multimodal.py module docstring)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators import audio as AU


def _media_table(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text number {i} with enough words") for i in range(40)],
        "doc_id bigint, text string",
    )
    media = AU.attach_wav_media(docs).drop("text")
    # odd ids: re-mark as a foreign format (payload stays, format flips)
    out = media.withColumn(
        "media_meta",
        F.when(F.col("doc_id") % 2 == 0, F.col("media_meta")).otherwise(
            F.struct(
                F.lit("bin").alias("format"),
                F.col("media_meta.sample_rate").alias("sample_rate"),
                F.col("media_meta.n_samples").alias("n_samples"),
                F.col("media_meta.channels").alias("channels"),
            )
        ),
    )
    path = str(tmp_path / "media")
    out.write.parquet(path)
    return path


def test_meta_filter_prunes_at_scan_below_arrow_decode(spark, tmp_path):
    path = _media_table(spark, tmp_path)
    df = spark.read.parquet(path).filter(F.col("media_meta.format") == "wav")
    feats = AU.audio_features(df)
    assert feats.count() == 20  # only the wav-marked half decodes
    plan = feats._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, plan
    # the NESTED meta predicate reaches the scan's data filters — pruning
    # happens before any byte enters the Python stage
    assert "media_meta" in scan_lines[0] and "format" in scan_lines[0]
    assert "DataFilters: [" in scan_lines[0]
    # and the Arrow stage sits ABOVE the scan+filter in the plan tree
    arrow_at = plan.find("MapInPandas")
    scan_at = plan.find("FileScan parquet")
    assert 0 <= arrow_at < scan_at  # toString prints parents first


def test_meta_only_projection_never_reads_media_column(spark, tmp_path):
    """Column pruning: a metadata-only aggregate must not read the binary
    column at all (ReadSchema excludes it)."""
    path = _media_table(spark, tmp_path)
    agg = (
        spark.read.parquet(path)
        .groupBy("media_meta.format")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.format, r.n) for r in agg.collect()} == {("wav", 20), ("bin", 20)}
    plan = agg._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and "media:binary" not in scan[0]
    assert "media_meta" in scan[0]
