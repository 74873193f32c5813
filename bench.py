#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries are fully materialized via the noop sink (no driver-side transfer, no
result printing) on one shared SparkSession — the realistic amortized-session
deployment mode (BASELINE.md "Interpretation for BENCH").
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysoftware_nocnetintel_spark.plans import QUERIES  # noqa: E402
from mysoftware_nocnetintel_spark.session import get_spark  # noqa: E402

# the 10 baseline-aligned headline queries (BASELINE.md table)
HEADLINE = [
    "q1_pricing_summary",
    "q2_join_topn",
    "q3_window_rank",
    "q4_rolling_avg",
    "q5_sessionize",
    "q6_json_extract",
    "q7_distinct",
    "q8_dedup_docs",
    "q9_knn",
    "q10_setops",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="nocnetintel-bench")

    # pin hot tables in memory for the amortized serving mode (the DuckDB
    # baseline equivalently enjoys its in-process buffer pool / page cache)
    from mysoftware_nocnetintel_spark.sources.registry import enable_table_cache

    enable_table_cache(True)

    # warm-up: one full pass — JVM JIT, parquet footer caches, codegen
    # compilation; measured runs then reflect the amortized shared-session
    # deployment mode (BASELINE.md "Interpretation for BENCH")
    for name in HEADLINE:
        materialize(QUERIES[name](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(QUERIES[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name.split("_")[0]] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
