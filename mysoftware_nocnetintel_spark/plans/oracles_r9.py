"""DuckDB oracle twins for the round-9 queries (queries_r9.py)."""

from __future__ import annotations

ORACLES_R9: dict[str, str] = {}

ORACLES_R9["q144_span_scrub"] = """
WITH toks AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
g AS (
    SELECT doc_id,
           unnest(range(1, len(t) - 6)) AS s,
           unnest(list_transform(range(1, len(t) - 6),
                  i -> array_to_string(list_slice(t, i, i + 7), ' '))) AS g8
    FROM toks WHERE len(t) >= 8
),
dup AS (SELECT g8 FROM g GROUP BY g8 HAVING count(DISTINCT doc_id) > 1),
hits AS (SELECT doc_id, s, s + 7 AS e FROM g JOIN dup USING (g8)),
affected AS (SELECT DISTINCT doc_id FROM hits),
removed AS (
    SELECT DISTINCT doc_id, pos FROM (
        SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM hits
    )
),
tok_rows AS (
    SELECT t.doc_id, unnest(t.t) AS tok, generate_subscripts(t.t, 1) AS pos
    FROM toks t JOIN affected a USING (doc_id)
),
kept AS (
    SELECT k.doc_id, k.pos, k.tok
    FROM tok_rows k
    ANTI JOIN removed r ON k.doc_id = r.doc_id AND k.pos = r.pos
),
rebuilt AS (
    SELECT doc_id, count(*) AS n_kept,
           string_agg(tok, ' ' ORDER BY pos) AS clean
    FROM kept GROUP BY doc_id
)
SELECT t.doc_id, t.lang,
       CAST(len(t.t) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       CAST(length(COALESCE(r.clean, '')) AS BIGINT) AS clean_len,
       md5(COALESCE(r.clean, '')) AS clean_fp
FROM toks t
JOIN affected a USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
ORDER BY t.doc_id
"""

ORACLES_R9["q145_embedding_decontam"] = """
WITH tr AS (
    SELECT vec_id, embedding FROM embeddings
    WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) <> 'a'
),
ev AS (
    SELECT vec_id AS qid, embedding AS qv FROM embeddings
    WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = 'a'
),
sc AS (
    SELECT t.vec_id,
           list_sum(list_transform(list_zip(t.embedding, e.qv),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(t.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(e.qv,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
    FROM tr t, ev e
)
SELECT vec_id,
       count(*) AS n_eval_hits,
       round(max(cos), 6) AS max_cos
FROM sc
WHERE cos >= 0.35
GROUP BY vec_id
ORDER BY vec_id
"""
