"""mysoftware_nocnetintel_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities described by the reference system moses000/mysoftware-nocNetIntel
(an NOC outage-forecasting platform: telemetry ingestion, time-series feature
pipelines, risk scoring, knowledge-base retrieval — see /root/reference/README.md),
plus the LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) required for large-scale training-data work.

Design stance (SURVEY.md §7.1):
- DataFrame/SQL only; every operator is a composition of pyspark.sql primitives
  so Catalyst sees the whole plan (pushdown, pruning, join selection, AQE).
- Custom logic lives in pure functions ``DataFrame -> DataFrame``.
- No driver-side collects inside operators; everything scales by partitioning.
"""

__version__ = "0.1.0"

from .session import get_spark, tune  # noqa: F401
