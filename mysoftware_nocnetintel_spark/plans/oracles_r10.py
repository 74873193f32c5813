"""DuckDB oracle twins for the round-10 query block (the differential
harness side — see plans/oracles.py for the convention)."""

ORACLES_R10: dict[str, str] = {}

# q155: the shard plan is engine-portable BY DESIGN (md5 buckets + 60-bit
# content hashes — operators/shards.py docstring), so the oracle computes
# the byte-identical placement and checksums.
ORACLES_R10["q155_shard_plan"] = """
WITH s AS (
  SELECT
    CAST(
      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 16 AS INTEGER
    ) AS shard,
    CAST(length(text) AS BIGINT) AS len,
    CAST(
      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))
      AS BIGINT
    ) AS h
  FROM documents
)
SELECT
  shard,
  COUNT(*) AS n_docs,
  CAST(SUM(len) AS BIGINT) AS n_chars_total,
  CAST(bit_xor(h) AS BIGINT) AS content_xor
FROM s
GROUP BY shard
ORDER BY shard
"""


# q157: the post-drop state recomputed from the source parquet — the
# dropped bucket excluded — so the metadata-only partition drop's
# semantics are value-hash graded against DuckDB.
ORACLES_R10["q157_partition_drop"] = """
SELECT
  CAST(event_id % 4 AS INTEGER) AS bucket,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS sum_value
FROM events
WHERE event_id % 4 <> 2
GROUP BY 1
ORDER BY 1
"""

ORACLES_R10["q158_partition_drop_iceberg"] = ORACLES_R10[
    "q157_partition_drop"
]
