"""DuckDB oracle SQL for the round-7 queries. Both are exact relational
plans: the fingerprint expression is the q39 twin (md5 over the sorted
distinct lowercase token list — byte-identical in both engines), the
corpus/batch split is the q97 md5-bucket trick, and the hash-rank window
is deterministic, so every column value-hash-matches."""

ORACLES_R7: dict[str, str] = {}

ORACLES_R7["q127_incremental_ingest"] = """
WITH d AS (
    SELECT doc_id, lang, n_chars,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS fp,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
    FROM documents
),
corpus_fps AS (SELECT DISTINCT fp FROM d WHERE bucket < 'cd'),
batch AS (SELECT * FROM d WHERE bucket >= 'cd'),
labeled AS (
    SELECT b.lang, b.n_chars,
           CASE WHEN b.fp IN (SELECT fp FROM corpus_fps)
                    THEN 'dup_vs_corpus'
                WHEN b.doc_id > min(b.doc_id) OVER (PARTITION BY b.fp)
                    THEN 'dup_in_batch'
                ELSE 'novel' END AS status
    FROM batch b
)
SELECT lang, status,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_total
FROM labeled
GROUP BY lang, status
ORDER BY lang, status
"""

ORACLES_R7["q128_balanced_sample"] = """
WITH ranked AS (
    SELECT lang, source, doc_id, n_chars,
           row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rk
    FROM documents
)
SELECT lang, source,
       count(*) AS n_candidates,
       CAST(sum(CASE WHEN rk <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rk <= 50 THEN doc_id END) AS BIGINT)
           AS kept_id_sum,
       CAST(sum(CASE WHEN rk <= 50 THEN n_chars END) AS BIGINT)
           AS kept_chars
FROM ranked
GROUP BY lang, source
ORDER BY lang, source
"""
