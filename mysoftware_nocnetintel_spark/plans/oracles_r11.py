"""DuckDB oracles for the round-11 queries (the driver's correctness
twins — ANSI SQL over the same parquet views)."""

ORACLES_R11: dict[str, str] = {}

# q159: the post-DV state recomputed from the source parquet — the
# deleted bucket excluded — so the Puffin deletion-vector read chain is
# value-hash graded against DuckDB (same shape as the q157/q158
# retention oracles).
ORACLES_R11["q159_dv_read"] = """
SELECT
  CAST(event_id % 4 AS INTEGER) AS bucket,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS sum_value
FROM events
WHERE event_id % 4 <> 2
GROUP BY 1
ORDER BY 1
"""

# q160: two successive DV deletes (replace discipline) -> both buckets
# excluded from the recomputed state.
ORACLES_R11["q160_dv_write"] = """
SELECT
  CAST(event_id % 4 AS INTEGER) AS bucket,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS sum_value
FROM events
WHERE event_id % 4 NOT IN (2, 3)
GROUP BY 1
ORDER BY 1
"""
