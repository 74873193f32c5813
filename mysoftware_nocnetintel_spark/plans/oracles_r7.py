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

ORACLES_R7["q129_bpe_pairs"] = """
WITH words AS (
    SELECT u.t AS w, count(*) AS cnt
    FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
    WHERE u.t <> ''
    GROUP BY u.t
),
pairs AS (
    SELECT substr(w, CAST(r.i AS INT), 2) AS pair, cnt
    FROM words, UNNEST(range(1, len(w))) AS r(i)
    WHERE len(w) >= 2
)
SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""

ORACLES_R7["q130_repetition"] = """
WITH toks AS (
    SELECT lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
grams AS (
    SELECT lang,
           list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
           ) AS g
    FROM toks
),
per AS (
    SELECT lang,
           CASE WHEN len(g) > 0
                THEN (len(g) - len(list_distinct(g))) * 1.0 / len(g)
                ELSE 0.0 END AS dup_frac
    FROM grams
)
SELECT lang,
       count(*) AS n_docs,
       round(avg(dup_frac), 6) AS avg_dup_frac,
       round(max(dup_frac), 6) AS max_dup_frac,
       CAST(sum(CASE WHEN dup_frac > 0.3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repetitive
FROM per
GROUP BY lang
ORDER BY lang
"""

ORACLES_R7["q131_chunk_overlap"] = """
WITH d AS (
    SELECT source, doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tok
    FROM documents
),
chunks AS (
    SELECT source,
           least(64, n_tok - CAST(s.start AS INT) + 1) AS chunk_tokens
    FROM d, UNNEST(generate_series(1, greatest(n_tok - 16, 1), 48))
               AS s(start)
)
SELECT source,
       count(*) AS n_chunks,
       CAST(sum(chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
       CAST(sum(CASE WHEN chunk_tokens = 64 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_full,
       round(avg(chunk_tokens), 6) AS avg_chunk_tokens
FROM chunks
GROUP BY source
ORDER BY source
"""

ORACLES_R7["q132_session_funnel"] = """
WITH t1 AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'login' THEN ts END) AS t1
    FROM events GROUP BY user_id
),
t2 AS (
    SELECT e.user_id,
           min(CASE WHEN e.event_type = 'purchase' AND e.ts >= t1.t1
                    THEN e.ts END) AS t2
    FROM events e JOIN t1 ON e.user_id = t1.user_id
    GROUP BY e.user_id
),
t3 AS (
    SELECT e.user_id,
           min(CASE WHEN e.event_type = 'error' AND e.ts >= t2.t2
                    THEN e.ts END) AS t3
    FROM events e JOIN t2 ON e.user_id = t2.user_id
    GROUP BY e.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS step1_login,
       CAST(sum(CASE WHEN t2.t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS step2_purchase,
       CAST(sum(CASE WHEN t3.t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS step3_error
FROM t1
JOIN t2 ON t1.user_id = t2.user_id
JOIN t3 ON t1.user_id = t3.user_id
"""

ORACLES_R7["q133_rfm_segments"] = """
WITH per_cust AS (
    SELECT o_custkey,
           CAST(datediff('day', DATE '1990-01-01', max(o_orderdate))
                AS DOUBLE) AS rec_days,
           CAST(count(*) AS DOUBLE) AS freq,
           round(sum(o_totalprice), 2) AS monetary
    FROM orders GROUP BY o_custkey
),
qs AS (
    SELECT quantile_cont(rec_days, 0.25) AS r25,
           quantile_cont(rec_days, 0.50) AS r50,
           quantile_cont(rec_days, 0.75) AS r75,
           quantile_cont(freq, 0.25) AS f25,
           quantile_cont(freq, 0.50) AS f50,
           quantile_cont(freq, 0.75) AS f75,
           quantile_cont(monetary, 0.25) AS m25,
           quantile_cont(monetary, 0.50) AS m50,
           quantile_cont(monetary, 0.75) AS m75
    FROM per_cust
),
scored AS (
    SELECT 1 + CAST(rec_days > r25 AS INT) + CAST(rec_days > r50 AS INT)
             + CAST(rec_days > r75 AS INT) AS r_score,
           1 + CAST(freq > f25 AS INT) + CAST(freq > f50 AS INT)
             + CAST(freq > f75 AS INT) AS f_score,
           1 + CAST(monetary > m25 AS INT) + CAST(monetary > m50 AS INT)
             + CAST(monetary > m75 AS INT) AS m_score
    FROM per_cust CROSS JOIN qs
)
SELECT r_score, f_score,
       count(*) AS n_customers,
       round(avg(CAST(m_score AS DOUBLE)), 6) AS avg_m_score
FROM scored
GROUP BY r_score, f_score
ORDER BY r_score, f_score
"""

_PROFILE_NUM = ("event_id", "user_id", "value")
_PROFILE_STR = ("event_type", "props")
ORACLES_R7["q134_profile"] = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS DOUBLE) AS min_num,
           CAST(max({c}) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str,
           CAST(NULL AS VARCHAR) AS max_str
    FROM events"""
    for c in _PROFILE_NUM
) + "\nUNION ALL\n" + "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(NULL AS DOUBLE) AS min_num,
           CAST(NULL AS DOUBLE) AS max_num,
           min({c}) AS min_str,
           max({c}) AS max_str
    FROM events"""
    for c in _PROFILE_STR
) + '\nORDER BY "column"'

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

ORACLES_R7["q135_repeated_spans"] = """
WITH base AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
sized AS (
    SELECT doc_id, lang, len(t) AS n_tok, t FROM base
),
grams AS (
    SELECT doc_id, CAST(r.i AS INT) AS s,
           array_to_string(
               list_slice(t, CAST(r.i AS INT), CAST(r.i AS INT) + 7), ' '
           ) AS g
    FROM sized, UNNEST(range(1, n_tok - 6)) AS r(i)
    WHERE n_tok >= 8
),
dup AS (
    SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1
),
hits AS (
    SELECT gr.doc_id, gr.s, gr.s + 7 AS e
    FROM grams gr JOIN dup USING (g)
),
marked AS (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
    FROM hits
),
islands AS (
    SELECT doc_id, s, e,
           sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
    FROM marked
),
spans AS (
    SELECT doc_id, isl, min(s) AS ms, max(e) AS me
    FROM islands GROUP BY doc_id, isl
),
cov AS (
    SELECT doc_id, sum(me - ms + 1) AS covered FROM spans GROUP BY doc_id
),
per_doc AS (
    SELECT z.lang, z.n_tok, coalesce(c.covered, 0) AS covered
    FROM sized z LEFT JOIN cov c USING (doc_id)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(covered) AS BIGINT) AS covered_tokens,
       round(avg(CASE WHEN n_tok > 0
                      THEN covered / CAST(n_tok AS DOUBLE)
                      ELSE 0.0 END), 6) AS avg_cover_frac,
       CAST(sum(CASE WHEN n_tok > 0
                     AND covered / CAST(n_tok AS DOUBLE) > 0.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy_dup
FROM per_doc
GROUP BY lang
ORDER BY lang
"""

ORACLES_R7["q136_temperature_mix"] = """
WITH per AS (
    SELECT source,
           CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS DOUBLE)
               AS toks
    FROM documents
    GROUP BY source
),
tot AS (
    SELECT sum(toks) AS tot, sum(sqrt(toks)) AS tot_a FROM per
)
SELECT source,
       CAST(toks AS BIGINT) AS n_tokens,
       round(toks / tot, 6) AS p_natural,
       round(sqrt(toks) / tot_a, 6) AS q_temp,
       CAST(round(sqrt(toks) / tot_a * 1000000.0) AS BIGINT)
           AS budget_tokens,
       round((sqrt(toks) / tot_a) / (toks / tot), 6) AS oversample
FROM per CROSS JOIN tot
ORDER BY source
"""

ORACLES_R7["q137_gopher_rules"] = """
WITH toks AS (
    SELECT lang,
           list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
               AS t
    FROM documents
),
feats AS (
    SELECT lang,
           len(t) AS n,
           coalesce(list_sum(list_transform(t, x -> length(x))), 0)
               AS sumlen,
           len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
               AS n_alpha,
           len(list_filter(t, x -> list_contains(
               ['the','a','an','and','or','of','to','in','is','it'],
               lower(x)))) AS n_stop,
           len(list_filter(t, x -> contains(x, '#')
               OR contains(x, '...'))) AS n_sym
    FROM toks
),
flags AS (
    SELECT lang,
           n BETWEEN 5 AND 5000 AS r_wordcount,
           CASE WHEN n = 0 THEN false
                ELSE (sumlen / CAST(n AS DOUBLE)) BETWEEN 2.0 AND 12.0
           END AS r_meanlen,
           CASE WHEN n = 0 THEN false
                ELSE n_alpha / CAST(n AS DOUBLE) >= 0.6
           END AS r_alpha,
           n_stop >= 2 AS r_stopword,
           CASE WHEN n = 0 THEN true
                ELSE n_sym / CAST(n AS DOUBLE) <= 0.1
           END AS r_symbol
    FROM feats
),
kept AS (
    SELECT lang, r_wordcount, r_meanlen, r_alpha, r_stopword, r_symbol,
           (r_wordcount AND r_meanlen AND r_alpha AND r_stopword
            AND r_symbol) AS keep
    FROM flags
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN NOT r_wordcount THEN 1 ELSE 0 END) AS BIGINT)
           AS f_wordcount,
       CAST(sum(CASE WHEN NOT r_meanlen THEN 1 ELSE 0 END) AS BIGINT)
           AS f_meanlen,
       CAST(sum(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END) AS BIGINT)
           AS f_alpha,
       CAST(sum(CASE WHEN NOT r_stopword THEN 1 ELSE 0 END) AS BIGINT)
           AS f_stopword,
       CAST(sum(CASE WHEN NOT r_symbol THEN 1 ELSE 0 END) AS BIGINT)
           AS f_symbol,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(avg(CASE WHEN keep THEN 1.0 ELSE 0.0 END), 6) AS keep_rate
FROM kept
GROUP BY lang
ORDER BY lang
"""

ORACLES_R7["q138_regression_aggs"] = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
       round(covar_samp(l_extendedprice, l_quantity), 4)
           AS covar_price_qty,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES_R7["q139_exact_percentiles"] = """
SELECT event_type,
       count(*) AS n_events,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(quantile_cont(value, 0.9), 6) AS p90
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLES_R7["q140_psi_drift"] = """
WITH stats AS (
    SELECT min(value) AS mn, max(value) AS mx FROM events
),
binned AS (
    SELECT event_type,
           event_id % 2 AS split,
           CASE WHEN mx = mn THEN 0
                ELSE least(CAST(floor((value - mn) / ((mx - mn) / 10.0))
                           AS BIGINT), 9)
           END AS bin
    FROM events CROSS JOIN stats
),
counts AS (
    SELECT event_type, bin,
           sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS c0,
           sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS c1
    FROM binned
    GROUP BY event_type, bin
),
tot AS (
    SELECT event_type, sum(c0) AS n0, sum(c1) AS n1
    FROM counts GROUP BY event_type
),
terms AS (
    SELECT c.event_type, t.n0, t.n1,
           ((c.c0 + 1.0) / (t.n0 + 10.0) - (c.c1 + 1.0) / (t.n1 + 10.0))
               * ln(((c.c0 + 1.0) / (t.n0 + 10.0))
                    / ((c.c1 + 1.0) / (t.n1 + 10.0))) AS term
    FROM counts c JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(max(n0) AS BIGINT) AS n_baseline,
       CAST(max(n1) AS BIGINT) AS n_current,
       round(sum(term), 6) AS psi
FROM terms
GROUP BY event_type
ORDER BY event_type
"""
