"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

At 100 TB, hot keys (one site producing 30% of telemetry, reference
README.md:32's alarm floods) break the one-partition-per-key assumption of
hash shuffles. AQE's skew-join splitting handles the join case at runtime;
these operators are the *plan-level* tools for when AQE can't help:

- :func:`salted_agg` — two-phase aggregation: spread each key over
  ``n_salts`` partitions, partially aggregate, then merge. Works for any
  algebraic aggregate (sum/count/min/max and avg via sum+count). Results
  are EXACTLY equal to the plain aggregation (oracle-checked by q66).
- :func:`salted_broadcast_join` — replicate the small side ``n_salts``
  times so a skewed large side spreads its hot keys; equivalent output to
  the plain join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    aggs: Sequence[str] = ("sum", "count"),
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    Phase 1 groups by (keys, salt) — hot keys fan out over ``n_salts``
    reducers; phase 2 merges the partials per key. ``avg`` is derived as
    merged sum / merged count. The salt is a deterministic hash of a
    per-row unique expression (monotonically_increasing_id is fine here:
    it only spreads rows, it never reaches results)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(*key_list, "__salt").agg(
        F.sum(value_col).alias("__p_sum"),
        F.count(value_col).alias("__p_cnt"),
        F.min(value_col).alias("__p_min"),
        F.max(value_col).alias("__p_max"),
    )
    merged = partial.groupBy(*key_list).agg(
        F.sum("__p_sum").alias("sum_value"),
        F.sum("__p_cnt").alias("count_value"),
        F.min("__p_min").alias("min_value"),
        F.max("__p_max").alias("max_value"),
    )
    return merged.withColumn(
        "avg_value", F.try_divide(F.col("sum_value"), F.col("count_value"))
    )


def salted_broadcast_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Join a skew-prone large side to a small side by replicating the small
    side across ``n_salts`` salt values. Output ≡ ``large.join(small, on)``;
    each hot key's rows land on ``n_salts`` different reducers."""
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return salted_large.join(
        F.broadcast(exploded_small), [on, "__salt"]
    ).drop("__salt")
