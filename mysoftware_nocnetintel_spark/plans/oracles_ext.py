"""DuckDB oracles for the relational / timeseries / text query surfaces.

Same conventions as :mod:`.oracles`. Notes on engine deltas:
- DuckDB ``dayofweek`` is 0=Sunday; Spark's is 1=Sunday → oracle shifts +1.
- DuckDB window/integer sums return HUGEINT → CAST to BIGINT.
- DuckDB has native ASOF JOIN; our engine implements the same semantics via
  the union-grid window formulation (operators/timeseries.py).
"""

ORACLES_EXT: dict[str, str] = {
    "q11_left_join_agg": """
        WITH per_cust AS (
            SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey, c_mktsegment
        )
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(sum(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive,
               round(avg(n_orders), 6) AS avg_orders
        FROM per_cust
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q12_semi_join": """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q13_anti_join": """
        SELECT c_mktsegment, count(*) AS n_inactive
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q14_rollup": """
        SELECT coalesce(r_name, 'ALL') AS region_name,
               coalesce(n_name, 'ALL') AS nation_name,
               count(*) AS n_customers,
               round(sum(c_acctbal), 6) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region_name, nation_name
    """,
    "q15_cube": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 6) AS total_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus
    """,
    "q16_full_outer": """
        WITH p AS (
            SELECT user_id, round(sum(value), 6) AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        e AS (
            SELECT user_id, round(sum(value), 6) AS error_value
            FROM events WHERE event_type = 'error' GROUP BY user_id
        )
        SELECT coalesce(p.user_id, e.user_id) AS user_id,
               purchase_value, error_value
        FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
    """,
    "q17_union_all": """
        SELECT 'purchase' AS kind, user_id, round(sum(value), 6) AS total
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
        UNION ALL
        SELECT 'error' AS kind, user_id, round(sum(value), 6) AS total
        FROM events WHERE event_type = 'error' GROUP BY user_id
    """,
    "q18_except": """
        SELECT user_id FROM events WHERE event_type = 'view'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "q19_exists_subquery": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_discount > 0.05
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q20_topk_global": """
        SELECT event_id, user_id, event_type, value
        FROM events
        ORDER BY value DESC, event_id
        LIMIT 20
    """,
    "q21_daily_counts": """
        SELECT date_trunc('day', ts) AS day,
               count(*) AS n,
               round(sum(value), 6) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "q22_hourly_profile": """
        SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
               count(*) AS n,
               round(avg(value), 6) AS avg_value
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "q23_dow_profile": """
        SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS day_of_week,
               count(*) AS n
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "q24_string_funcs": """
        SELECT c_custkey,
               CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
               upper(substring(c_name, 1, 8)) AS name_prefix,
               CAST(length(c_name) AS BIGINT) AS name_len,
               c_mktsegment || ':' || c_name AS tagged
        FROM customer
    """,
    "q25_pivot": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events
        GROUP BY user_id
    """,
    "q26_quantiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.9), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q27_zscore_outliers": """
        WITH stats AS (
            SELECT event_type, avg(value) AS m, stddev_samp(value) AS s
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, count(*) AS n_outliers
        FROM events e JOIN stats USING (event_type)
        WHERE abs(e.value - stats.m) > 2 * stats.s
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    "q28_asof_join": """
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.ts AS ts_click, c.value AS value_click
        FROM (SELECT event_id, user_id, ts, value
              FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts, value
                        FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "q29_range_join": """
        SELECT e1.user_id AS user_id, count(*) AS n_pairs
        FROM events e1
        JOIN events e2
          ON e2.user_id = e1.user_id
         AND e1.event_type = 'error'
         AND e2.event_type = 'purchase'
         AND e2.ts > e1.ts
         AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
        GROUP BY e1.user_id
        ORDER BY user_id
    """,
    "q30_interpolate": """
        WITH masked AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
            FROM events
        ),
        filled AS (
            SELECT event_id, user_id, ts, v,
                   last_value(v IGNORE NULLS) OVER wp AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
                       OVER wp AS pt,
                   first_value(v IGNORE NULLS) OVER wn AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
                       OVER wn AS nt
            FROM masked
            WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wn AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_id, user_id, ts,
               round(CASE
                   WHEN v IS NOT NULL THEN v
                   WHEN pv IS NULL THEN nv
                   WHEN nv IS NULL THEN pv
                   ELSE pv + (nv - pv) *
                        (date_diff('microsecond', pt, ts) * 1.0
                         / date_diff('microsecond', pt, nt))
               END, 6) AS value_interp
        FROM filled
    """,
    "q31_token_stats": """
        WITH t AS (
            SELECT lang, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents
        )
        SELECT lang,
               CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
               CAST(sum(len(list_distinct(toks))) AS BIGINT) AS sum_distinct_tokens,
               round(avg(len(toks)), 6) AS avg_tokens
        FROM t
        GROUP BY lang
        ORDER BY lang
    """,
    "q32_term_df": """
        WITH t AS (
            SELECT unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS term
            FROM documents
        )
        SELECT term, count(*) AS df
        FROM t
        GROUP BY term
        ORDER BY df DESC, term
        LIMIT 20
    """,
    "q33_quality_scores": """
        WITH t AS (
            SELECT lang, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents
        ),
        scored AS (
            SELECT lang,
                   round((
                       least(len(toks) / 64.0, 1.0)
                       + len(list_distinct(toks)) * 1.0 / len(toks)
                       + (1.0 - least(2.0 * (len(list_filter(toks,
                             tk -> list_contains(
                                 ['the','a','an','and','or','of','to','in','is','it'],
                                 lower(tk)))) * 1.0 / len(toks)), 1.0))
                   ) / 3.0, 6) AS q
            FROM t
        )
        SELECT lang,
               round(avg(q), 6) AS avg_quality,
               count(*) AS n_docs
        FROM scored
        GROUP BY lang
        ORDER BY lang
    """,
    "q35_embedding_neardup": """
        WITH pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_sum(list_transform(list_zip(a.embedding, b.embedding),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(a.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(b.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, round(cos, 6) AS cosine_sim
        FROM pairs
        ORDER BY cos DESC, id_a, id_b
        LIMIT 20
    """,
    "q83_chunking": """
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        starts AS (
            SELECT doc_id, lang, t,
                   unnest(generate_series(1, len(t), 48)) AS s
            FROM toks
            WHERE len(t) > 0
        ),
        chunks AS (
            SELECT doc_id, lang,
                   (s - 1) // 48 + 1 AS chunk_id,
                   array_to_string(list_slice(t, s, s + 63), ' ') AS chunk_text,
                   least(64, len(t) - s + 1) AS n_tokens
            FROM starts
        )
        SELECT lang,
               count(*) AS n_chunks,
               CAST(count(DISTINCT md5(chunk_text)) AS BIGINT)
                   AS n_distinct_chunks,
               round(avg(n_tokens), 6) AS avg_chunk_tokens,
               CAST(max(chunk_id) AS BIGINT) AS max_chunks_per_doc
        FROM chunks
        GROUP BY lang
        ORDER BY lang
    """,
    "q80_scrub_sample": """
        WITH scrubbed AS (
            SELECT doc_id, lang,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
                       '\\b\\d{7,}\\b', '<NUM>', 'g') AS text
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, lang, text,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                               doc_id) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM scrubbed
        )
        SELECT lang,
               count(*) AS n_sampled,
               CAST(max(n) AS BIGINT) AS n_total,
               round(avg(length(text)), 6) AS avg_scrubbed_len
        FROM ranked
        WHERE rn <= floor(n * 0.3)
        GROUP BY lang
        ORDER BY lang
    """,
    "q79_repetition_signals": """
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ),
        idx AS (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
            FROM toks
        ),
        bg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS g FROM idx),
        cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
        per AS (
            SELECT doc_id, max(c) AS top, sum(c) AS total
            FROM cnt GROUP BY doc_id
        ),
        lines AS (
            SELECT doc_id,
                   list_filter(string_split(text, chr(10)),
                               x -> trim(x) <> '') AS ls
            FROM documents
        ),
        joined AS (
            SELECT d.lang,
                   coalesce(p.top * 1.0 / p.total, 0.0) AS frac,
                   CASE WHEN len(l.ls) > 0
                        THEN (len(l.ls) - len(list_distinct(l.ls))) * 1.0
                             / len(l.ls)
                        ELSE 0.0 END AS dlr
            FROM documents d
            LEFT JOIN per p USING (doc_id)
            JOIN lines l USING (doc_id)
        )
        SELECT lang,
               count(*) AS n_docs,
               round(avg(frac), 6) AS avg_top_bigram_frac,
               round(max(frac), 6) AS max_top_bigram_frac,
               round(avg(dlr), 6) AS avg_dup_line_ratio
        FROM joined
        GROUP BY lang
        ORDER BY lang
    """,
    "q41_ngram_jaccard": """
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(t) - 2, 0) + 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
            FROM toks
        ),
        ex AS (
            SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh
        ),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common,
                   any_value(a.n) AS na, any_value(b.n) AS nb
            FROM ex a JOIN ex b ON a.shingle = b.shingle
                               AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(common * 1.0 / (na + nb - common), 6) AS jaccard
        FROM pairs
        WHERE round(common * 1.0 / (na + nb - common), 6) >= 0.5
        ORDER BY id_a, id_b
    """,
    "q36_knn_batch": """
        WITH q AS (
            SELECT vec_id AS qid, embedding AS qv
            FROM embeddings WHERE vec_id < 5
        ),
        scored AS (
            SELECT q.qid, e.vec_id,
                   list_sum(list_transform(list_zip(e.embedding, q.qv),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(q.qv,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
            FROM embeddings e, q
            WHERE e.vec_id <> q.qid
        ),
        ranked AS (
            SELECT qid, vec_id, cos,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cos DESC, vec_id) AS rn
            FROM scored
        )
        SELECT qid, vec_id, round(cos, 6) AS cosine_sim,
               CAST(rn AS BIGINT) AS rn
        FROM ranked
        WHERE rn <= 3
    """,
    "q39_fingerprint_dedup": """
        WITH fp AS (
            SELECT lang,
                   md5(array_to_string(list_sort(list_distinct(
                       string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS f
            FROM documents
        )
        SELECT lang,
               count(*) AS n_docs,
               count(DISTINCT f) AS n_unique_fp
        FROM fp
        GROUP BY lang
        ORDER BY lang
    """,
    "q34_running_total": """
        SELECT event_id, user_id, ts,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ), 6) AS running_total
        FROM events
    """,
    "q43_grouping_sets": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 6) AS total_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
    """,
    "q44_map_ops": """
        SELECT user_id,
               count(DISTINCT event_type) AS n_types,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        FROM events
        GROUP BY user_id
    """,
    "q45_tumbling_window": """
        SELECT date_trunc('hour', ts) AS window_start,
               count(*) AS n,
               round(sum(value), 6) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "q46_sliding_window": """
        WITH expanded AS (
            SELECT date_trunc('hour', ts) AS ws FROM events
            UNION ALL
            SELECT date_trunc('hour', ts - INTERVAL 30 MINUTE)
                   + INTERVAL 30 MINUTE AS ws
            FROM events
        )
        SELECT ws AS window_start, count(*) AS n
        FROM expanded
        GROUP BY 1
        ORDER BY 1
    """,
    "q47_session_window": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   -- >= : Spark's native session_window end is [start, last+gap)
                   -- EXCLUSIVE, so a gap of exactly 30min starts a new session
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS sid
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               count(*) AS n_events,
               round(sum(value), 6) AS total_value
        FROM sess
        GROUP BY user_id, sid
    """,
}
