"""DuckDB oracle twins for the round-8 queries (queries_r8.py)."""

from __future__ import annotations

ORACLES_R8: dict[str, str] = {}

ORACLES_R8["q141_doc_lm_score"] = """
WITH toks AS (
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       x -> x <> '') AS t
    FROM documents
),
grams AS (
    SELECT doc_id AS doc, bucket,
           unnest(list_transform(range(1, len(t)), i -> t[i])) AS a0,
           unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS b0
    FROM toks
),
train AS (SELECT * FROM grams WHERE bucket < 'cd'),
vocab AS (
    SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rk
        FROM (SELECT a0 AS w FROM train
              UNION ALL SELECT b0 AS w FROM train)
        GROUP BY w
    ) WHERE rk <= 500
),
train_m AS (
    SELECT doc,
           CASE WHEN va.w IS NOT NULL THEN a0 ELSE '<unk>' END AS a,
           CASE WHEN vb.w IS NOT NULL THEN b0 ELSE '<unk>' END AS b
    FROM train
    LEFT JOIN vocab va ON train.a0 = va.w
    LEFT JOIN vocab vb ON train.b0 = vb.w
),
big AS (SELECT a, b, count(*) AS c_ab FROM train_m GROUP BY 1, 2),
uni AS (SELECT a, count(*) AS c_a FROM train_m GROUP BY 1),
held AS (
    SELECT doc,
           CASE WHEN va.w IS NOT NULL THEN a0 ELSE '<unk>' END AS a,
           CASE WHEN vb.w IS NOT NULL THEN b0 ELSE '<unk>' END AS b
    FROM grams
    LEFT JOIN vocab va ON grams.a0 = va.w
    LEFT JOIN vocab vb ON grams.b0 = vb.w
    WHERE bucket >= 'cd'
),
scored AS (
    SELECT h.doc,
           -ln((COALESCE(big.c_ab, 0) + 1)::DOUBLE
               / (COALESCE(uni.c_a, 0) + 501)) AS nll
    FROM held h
    LEFT JOIN big ON h.a = big.a AND h.b = big.b
    LEFT JOIN uni ON h.a = uni.a
)
SELECT doc AS doc_id, count(*) AS n_bigrams,
       round(avg(nll), 6) AS avg_nll
FROM scored GROUP BY doc
ORDER BY avg_nll DESC, doc_id
LIMIT 20
"""

ORACLES_R8["q142_embedding_cohesion"] = """
WITH pos AS (
    SELECT label, vec_id,
           generate_subscripts(embedding, 1) AS pos,
           unnest(embedding)::DOUBLE AS v
    FROM embeddings
),
cent AS (SELECT label, pos, avg(v) AS c FROM pos GROUP BY 1, 2),
cn AS (SELECT label, sqrt(sum(c * c)) AS c_norm FROM cent GROUP BY 1),
pv AS (
    SELECT p.label, p.vec_id,
           sum(p.v * c.c) AS dot,
           sqrt(sum(p.v * p.v)) AS v_norm
    FROM pos p JOIN cent c ON p.label = c.label AND p.pos = c.pos
    GROUP BY 1, 2
),
cosv AS (
    SELECT pv.label, pv.dot / (pv.v_norm * cn.c_norm) AS cos
    FROM pv JOIN cn USING (label)
)
SELECT c.label, count(*) AS n_vecs,
       round(avg(c.cos), 6) AS avg_cos,
       round(min(c.cos), 6) AS min_cos,
       round(any_value(cn.c_norm), 6) AS centroid_norm
FROM cosv c JOIN cn USING (label)
GROUP BY c.label
ORDER BY c.label
"""

ORACLES_R8["q143_snapshot_diff"] = """
WITH d AS (
    SELECT doc_id, lang, n_chars, text,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
    FROM documents
),
old AS (
    SELECT doc_id, lang, md5(text) AS fp
    FROM d WHERE bucket < 'f0'
),
new AS (
    SELECT doc_id, lang, n_chars,
           md5(CASE WHEN bucket >= '40' AND bucket < '48'
               THEN reverse(text) ELSE text END) AS fp
    FROM d WHERE bucket >= '08'
),
diff AS (
    SELECT COALESCE(o.lang, n.lang) AS lang,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           COALESCE(n.n_chars, 0) AS nc
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT lang, status, count(*) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS new_chars
FROM diff GROUP BY lang, status
ORDER BY lang, status
"""
