"""Round-4 operator units beyond the oracle pairs: Bloom pruning actually
prunes (and loses nothing), histogram quantile estimates land within one
bin of the exact percentiles, and the gap-fill spine is dense."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.plans.queries_r4 import (
    _BLOOM_K,
    _BLOOM_M,
    _H_WIDTH,
    _bloom_positions,
    q100_gapfill,
    q104_histogram_quantiles,
)
from mysoftware_nocnetintel_spark.sources import load_table


def test_bloom_prefilter_prunes_without_loss(spark, sf_dir):
    """The bit test alone must pass every true key (no false negatives)
    and reject a meaningful share of the fact table (the pruning payoff)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hot = orders.filter(F.col("o_totalprice") > 470000).select("o_orderkey")

    pos = hot.select(
        F.explode(F.array(*_bloom_positions(F.col("o_orderkey")))).alias("p")
    )
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

    def member(key: int) -> bool:
        for seed in range(_BLOOM_K):
            # mirror xxhash64-based positions via Spark itself is overkill
            # here; instead verify through a DataFrame round-trip below
            pass
        return True

    blit = F.lit(bitmap).cast("array<bigint>")
    probe = li.withColumn("_bloom", blit)
    for i, p in enumerate(_bloom_positions(F.col("l_orderkey"))):
        probe = probe.withColumn(f"_bp{i}", p)
    hit = " AND ".join(
        f"((shiftrightunsigned(element_at(_bloom, CAST(_bp{i} / 64 AS INT) + 1),"
        f" CAST(_bp{i} % 64 AS INT)) & 1) = 1)"
        for i in range(_BLOOM_K)
    )
    survivors = probe.filter(F.expr(hit))

    n_total = li.count()
    n_surv = survivors.count()
    n_true = li.join(
        hot, li.l_orderkey == hot.o_orderkey, "left_semi"
    ).count()

    # no false negatives: every true match survives the bit test
    assert n_surv >= n_true
    # real pruning: the bit test must cut the fact scan meaningfully
    # (selectivity ~6% of orders; m=64Ki bits vs ~900 keys -> tiny FPR)
    assert n_surv < n_total * 0.5


def test_histogram_quantiles_within_one_bin(spark, sf_dir):
    row = q104_histogram_quantiles(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    exact = ev.approxQuantile("value", [0.5, 0.9, 0.99], 0.0)
    for est, ex in zip(
        [row["p50_est"], row["p90_est"], row["p99_est"]], exact
    ):
        assert abs(est - ex) <= _H_WIDTH, (est, ex)


def test_gapfill_spine_is_dense_per_user(spark, sf_dir):
    out = q100_gapfill(spark, sf_dir)
    # hours between per-user min and max must all be present exactly once
    chk = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            (
                F.unix_timestamp(F.max("hour_start"))
                - F.unix_timestamp(F.min("hour_start"))
            )
            / 3600
            + 1
        ).alias("n_expected"),
    )
    bad = chk.filter(F.col("n_rows") != F.col("n_expected")).count()
    assert bad == 0
    # and gap rows really exist (zeros), else the test proves nothing
    assert out.filter(F.col("n_events") == 0).count() > 0
