"""DuckDB oracle SQL for the round-6 queries (q123 is rows-only by design:
seeded k-means clustering has no SQL twin; its semantics are covered by a
brute-force greedy differential in tests/test_similarity_semdedup.py).

The BM25 oracle mirrors plans/queries_r6.py term for term. Every count is
cast to DOUBLE before entering the formula so DuckDB's DECIMAL literal
arithmetic can never produce a DECIMAL-typed score (the q104 lesson:
the driver's value hash is type-sensitive). Ties break on the ROUNDED
score then doc_id on both sides, making the ranking engine-independent.
"""

ORACLES_R6: dict[str, str] = {}

ORACLES_R6["q124_bm25"] = """
WITH toks AS (
    SELECT doc_id, u.t AS term
    FROM documents, unnest(string_split(text, ' ')) AS u(t)
    WHERE u.t <> ''
),
dl AS (
    SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id
),
stats AS (SELECT avg(dl) AS avgdl FROM dl),
ndocs AS (SELECT count(*)::DOUBLE AS n FROM documents),
qterms(query_id, term) AS (
    VALUES (0, 'spark'), (0, 'join'), (1, 'table'), (1, 'scan'),
           (2, 'window'), (2, 'agg'), (2, 'vector')
),
tf AS (
    SELECT doc_id, term, count(*)::DOUBLE AS tf
    FROM toks
    WHERE term IN (SELECT DISTINCT term FROM qterms)
    GROUP BY doc_id, term
),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
    SELECT q.query_id, tf.doc_id,
           round(sum(
               ln(1.0::DOUBLE + (n.n - dft.df + 0.5) / (dft.df + 0.5))
               * tf.tf * 2.2::DOUBLE
               / (tf.tf + 1.2::DOUBLE
                  * (1.0::DOUBLE - 0.75::DOUBLE
                     + 0.75::DOUBLE * dl.dl / s.avgdl))
           ), 6) AS score
    FROM tf
    JOIN qterms q USING (term)
    JOIN dft USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats s
    CROSS JOIN ndocs n
    GROUP BY q.query_id, tf.doc_id
),
ranked AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS rk
    FROM scored
)
SELECT query_id, doc_id, score, rk
FROM ranked
WHERE rk <= 10
ORDER BY query_id, rk
"""

# Band-boundary recall twin of the Spark plan: every doc enters buckets
# {band, band+1}, so same-band AND adjacent-band pairs share a bucket;
# same-band pairs share two and are deduplicated before the verify.
ORACLES_R6["q126_edit_distance_pairs"] = """
WITH p AS (
    SELECT doc_id, lang, substr(text, 1, 40) AS pre,
           CAST(n_chars // 50 AS BIGINT) AS band
    FROM documents
),
e AS (
    SELECT doc_id, lang, pre, band + x.i AS bucket
    FROM p, (VALUES (0), (1)) x(i)
),
cand AS (
    SELECT DISTINCT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
                    a.pre AS pre_a, b.pre AS pre_b
    FROM e a
    JOIN e b ON a.lang = b.lang AND a.bucket = b.bucket
            AND a.doc_id < b.doc_id
)
SELECT lang, id_a, id_b, levenshtein(pre_a, pre_b) AS dist
FROM cand
WHERE levenshtein(pre_a, pre_b) <= 18
ORDER BY lang, id_a, id_b
"""
