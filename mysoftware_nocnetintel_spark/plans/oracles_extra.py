"""DuckDB oracles for queries_extra. Notes:
- Spark ``datediff`` counts calendar days (end - start) = DuckDB
  date_diff('day', start, end) on date-truncated values; shipdate/orderdate
  are midnight timestamps so both count whole days.
- DuckDB RANGE INTERVAL frames == Spark rangeBetween on epoch seconds
  (both inclusive bounds).
- percent_rank/ntile need a total order → unique tiebreak everywhere.
"""

ORACLES_EXTRA: dict[str, str] = {
    "q88_entropy": """
        WITH per_type AS (
            SELECT user_id, event_type, count(*) AS c
            FROM events GROUP BY user_id, event_type
        ),
        withp AS (
            SELECT user_id,
                   c * 1.0 / sum(c) OVER (PARTITION BY user_id) AS p
            FROM per_type
        )
        SELECT user_id,
               round(sum(-p * ln(p)), 6) AS entropy,
               count(*) AS n_types
        FROM withp
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q89_mad_outliers": """
        WITH med AS (
            SELECT event_type, median(value) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, abs(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, median(adev) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type, count(*) AS n_outliers
        FROM dev d JOIN mad USING (event_type)
        WHERE d.adev > 3 * mad.mad
        GROUP BY d.event_type
        ORDER BY d.event_type
    """,
    "q86_correlated_subquery": """
        SELECT p_brand,
               count(*) AS n_small_orders,
               round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey
        )
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    "q87_window_distinct": """
        SELECT event_id, user_id,
               CAST(len(list_distinct(list(event_type) OVER w)) AS BIGINT)
                   AS trailing_type_diversity
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    "q84_maintenance_suppression": """
        WITH bounds AS (
            SELECT date_trunc('week', min(ts)) AS t0, max(ts) AS t1 FROM events
        ),
        weeks AS (
            SELECT unnest(generate_series(t0, t1, INTERVAL 7 DAY)) AS ws
            FROM bounds
        ),
        win AS (
            SELECT ws + INTERVAL 146 HOUR AS w_start,
                   ws + INTERVAL 148 HOUR AS w_end
            FROM weeks
        ),
        alerts AS (SELECT * FROM events WHERE event_type = 'error'),
        marked AS (
            SELECT a.ts,
                   EXISTS (SELECT 1 FROM win w
                           WHERE a.ts >= w.w_start AND a.ts < w.w_end)
                       AS suppressed
            FROM alerts a
        )
        SELECT date_trunc('day', ts) AS day,
               count(*) AS n_alerts,
               CAST(sum(CASE WHEN suppressed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_suppressed
        FROM marked
        GROUP BY 1
        ORDER BY 1
    """,
    "q85_flap_suppression": """
        WITH errs AS (
            SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'
        ),
        flagged AS (
            SELECT ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 15 MINUTE
                        THEN 1 ELSE 0 END AS delivered
            FROM errs
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT date_trunc('day', ts) AS day,
               count(*) AS n_raw,
               CAST(sum(delivered) AS BIGINT) AS n_delivered,
               round(avg(delivered), 6) AS delivery_rate
        FROM flagged
        GROUP BY 1
        ORDER BY 1
    """,
    "q82_burst_detection": """
        WITH pb AS (
            SELECT user_id,
                   date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
                       // 600000000 AS bk,
                   count(*) AS cnt
            FROM events
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT user_id, bk, cnt,
                   avg(cnt) OVER w AS base_avg,
                   stddev_samp(cnt) OVER w AS base_sd,
                   count(*) OVER w AS n_base
            FROM pb
            WINDOW w AS (PARTITION BY user_id ORDER BY bk
                         ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id,
               count(*) AS n_buckets,
               CAST(sum(CASE WHEN n_base >= 6 AND base_sd IS NOT NULL
                                  AND base_sd > 0
                                  AND cnt > base_avg + 3 * base_sd
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
               round(max(CASE WHEN base_sd > 0
                              THEN (cnt - base_avg) / base_sd END), 6) AS max_z
        FROM scored
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q81_root_cause_lift": """
        WITH win AS (
            SELECT user_id, ts, event_type,
                   count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_click,
                   count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER w AS n_purchase,
                   count(CASE WHEN event_type = 'signup' THEN 1 END) OVER w AS n_signup,
                   count(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS n_view
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                               AND INTERVAL 1 MICROSECOND PRECEDING)
        ),
        errs AS (SELECT * FROM win WHERE event_type = 'error'),
        tot AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type),
        alln AS (SELECT count(*) AS n_all FROM events),
        per AS (
            SELECT 'click' AS kind,
                   avg(CASE WHEN n_click > 0 THEN 1.0 ELSE 0.0 END) AS p FROM errs
            UNION ALL
            SELECT 'purchase',
                   avg(CASE WHEN n_purchase > 0 THEN 1.0 ELSE 0.0 END) FROM errs
            UNION ALL
            SELECT 'signup',
                   avg(CASE WHEN n_signup > 0 THEN 1.0 ELSE 0.0 END) FROM errs
            UNION ALL
            SELECT 'view',
                   avg(CASE WHEN n_view > 0 THEN 1.0 ELSE 0.0 END) FROM errs
        )
        SELECT kind,
               round(p, 6) AS p_precedes,
               round(p / (t.n * 1.0 / a.n_all), 6) AS lift
        FROM per
        JOIN tot t ON t.event_type = per.kind
        CROSS JOIN alln a
        ORDER BY kind
    """,
    "q77_funnel": """
        WITH flagged AS (
            SELECT ts, event_type,
                   max(CASE WHEN event_type = 'view' THEN ts END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS lv
            FROM events
        ),
        p AS (
            SELECT date_trunc('day', ts) AS day,
                   CASE WHEN lv IS NOT NULL AND ts - lv <= INTERVAL 1 HOUR
                        THEN 1 ELSE 0 END AS converted
            FROM flagged WHERE event_type = 'purchase'
        )
        SELECT day,
               count(*) AS n_purchases,
               CAST(sum(converted) AS BIGINT) AS n_converted,
               round(avg(converted), 6) AS conversion_rate
        FROM p
        GROUP BY day
        ORDER BY day
    """,
    "q75_sequence_assembly": """
        WITH ranked AS (
            SELECT user_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        )
        SELECT user_id,
               count(*) AS seq_len,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               round(sum(rn * value), 4) AS ord_checksum
        FROM ranked
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q54_scalar_subquery": """
        SELECT p_type, count(*) AS n_premium,
               round(avg(p_retailprice), 6) AS avg_premium_price
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        GROUP BY p_type
        ORDER BY p_type
    """,
    "q55_in_subquery": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q56_lead_window": """
        SELECT event_id, user_id, ts,
               CAST(date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               ) // 1000000 AS BIGINT) AS gap_seconds
        FROM events
    """,
    "q57_first_last_value": """
        SELECT event_id, user_id, value,
               first_value(value) OVER w AS first_value,
               last_value(value) OVER w AS last_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "q58_ntile_percent_rank": """
        SELECT event_id, value,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank
        FROM events
        WINDOW w AS (ORDER BY value, event_id)
    """,
    "q59_time_range_frame": """
        SELECT event_id, user_id, ts,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ), 6) AS trailing_1h_avg
        FROM events
    """,
    "q60_union_distinct": """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        UNION
        SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "q61_except_all": """
        SELECT user_id FROM events WHERE event_type = 'view'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "q62_like_filter": """
        SELECT c_mktsegment, count(*) AS n
        FROM customer
        WHERE c_name LIKE '%001%'
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q63_date_arithmetic": """
        SELECT o_orderpriority,
               round(avg(date_diff('day', o_orderdate, l_shipdate)), 6)
                   AS avg_latency_days,
               CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
                   AS max_latency_days,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q64_resample_asof": """
        WITH bounds AS (
            SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts
            FROM bounds
        )
        SELECT g.user_id, g.ts, e.ts AS obs_ts, e.value AS last_value
        FROM grid g
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events) e
          ON g.user_id = e.user_id AND g.ts >= e.ts
    """,
    "q66_salted_agg": """
        SELECT event_type,
               round(sum(value), 6) AS sum_value,
               count(value) AS count_value,
               min(value) AS min_value,
               max(value) AS max_value,
               round(sum(value) / count(value), 6) AS avg_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q67_tfidf": """
        WITH terms AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\\s+')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM terms GROUP BY doc_id, term
        ),
        dfreq AS (
            SELECT term, count(*) AS df
            FROM (SELECT DISTINCT doc_id, term FROM terms)
            GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   tf.tf * ln(n.n_docs * 1.0 / dfreq.df) AS tfidf_raw
            FROM tf JOIN dfreq USING (term), n
        ),
        ranked AS (
            SELECT doc_id, term, tfidf_raw,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf_raw DESC, term) AS rn
            FROM scored
            WHERE doc_id < 10
        )
        SELECT doc_id, term, round(tfidf_raw, 6) AS tfidf,
               CAST(rn AS BIGINT) AS rn
        FROM ranked
        WHERE rn <= 3
    """,
    "q72_variant_json": """
        SELECT event_type,
               count(*) AS n,
               round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q68_variance_corr": """
        SELECT event_type,
               round(var_samp(value), 6) AS var_samp_v,
               round(var_pop(value), 6) AS var_pop_v,
               round(stddev_pop(value), 6) AS stddev_pop_v,
               round(corr(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS corr_vk,
               round(covar_samp(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS covar_vk
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q69_array_ops": """
        WITH per_vec AS (
            SELECT label,
                   sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm,
                   list_sum(list_transform(
                       list_slice(list_reverse_sort(list_transform(embedding,
                           x -> CAST(x AS DOUBLE))), 1, 3),
                       x -> x)) AS top3_sum,
                   len(embedding) AS dim
            FROM embeddings
        )
        SELECT label,
               count(*) AS n_vectors,
               round(avg(nrm), 6) AS avg_norm,
               round(avg(top3_sum), 6) AS avg_top3_sum,
               CAST(max(dim) AS BIGINT) AS dim
        FROM per_vec
        GROUP BY label
        ORDER BY label
    """,
    "q70_null_handling": """
        WITH masked AS (
            SELECT event_type,
                   CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
            FROM events
        )
        SELECT event_type,
               count(*) AS n_total,
               CAST(count(v) AS BIGINT) AS n_kept,
               round(sum(coalesce(v, 0.0)), 6) AS sum_filled
        FROM masked
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q65_conditional_agg": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    # Connected components via recursive CTE over the SAME star-edge set the
    # Spark label propagation consumes; component = min reachable doc_id.
    "q91_dedup_clusters": """
        WITH RECURSIVE keyed AS (
            SELECT doc_id,
                   md5(text) AS h_exact,
                   md5(array_to_string(list_sort(list_distinct(
                       string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS h_fp
            FROM documents
        ),
        star AS (
            SELECT min(doc_id) OVER (PARTITION BY h_exact) AS src, doc_id AS dst
            FROM keyed
            UNION ALL
            SELECT min(doc_id) OVER (PARTITION BY h_fp) AS src, doc_id AS dst
            FROM keyed
        ),
        edges AS (
            SELECT src, dst FROM star WHERE src <> dst
            UNION
            SELECT dst, src FROM star WHERE src <> dst
        ),
        cc(node, lbl) AS (
            SELECT doc_id, doc_id FROM keyed
            UNION
            SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.node
        ),
        comp AS (
            SELECT node AS doc_id, min(lbl) AS component FROM cc GROUP BY node
        )
        SELECT c.doc_id, c.component,
               count(*) OVER (PARTITION BY c.component) AS cluster_size
        FROM comp c
        ORDER BY c.doc_id
    """,
    "q93_dedup_keep_one": """
        WITH RECURSIVE keyed AS (
            SELECT doc_id, lang,
                   md5(text) AS h_exact,
                   md5(array_to_string(list_sort(list_distinct(
                       string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS h_fp
            FROM documents
        ),
        star AS (
            SELECT min(doc_id) OVER (PARTITION BY h_exact) AS src, doc_id AS dst
            FROM keyed
            UNION ALL
            SELECT min(doc_id) OVER (PARTITION BY h_fp) AS src, doc_id AS dst
            FROM keyed
        ),
        edges AS (
            SELECT src, dst FROM star WHERE src <> dst
            UNION
            SELECT dst, src FROM star WHERE src <> dst
        ),
        cc(node, lbl) AS (
            SELECT doc_id, doc_id FROM keyed
            UNION
            SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.node
        ),
        comp AS (
            SELECT node AS doc_id, min(lbl) AS component FROM cc GROUP BY node
        )
        SELECT k.lang,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN k.doc_id = c.component THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN k.doc_id <> c.component THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        FROM keyed k JOIN comp c ON k.doc_id = c.doc_id
        GROUP BY k.lang
        ORDER BY k.lang
    """,
    "q94_token_budget": """
        WITH t AS (
            SELECT lang,
                   len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> x <> '')) AS n_ws,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]+',
                       0)) AS n_sw
            FROM documents
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
               CAST(sum(n_sw) AS BIGINT) AS subword_tokens,
               round(avg(n_sw * 1.0 / nullif(n_ws, 0)), 6) AS avg_expansion
        FROM t
        GROUP BY lang
        ORDER BY lang
    """,
    "q97_corpus_split": """
        WITH b AS (
            SELECT lang, n_chars,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 'cd' THEN 'train'
                    WHEN bucket < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        FROM b
        GROUP BY 1, 2
        ORDER BY split, lang
    """,
    "q98_corpus_mixture": """
        WITH k AS (
            SELECT source, n_chars,
                   CAST(substr(source, 4) AS INTEGER) % 8 + 4 AS rate16,
                   CASE WHEN instr('0123456789abcdef',
                           substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 1)) - 1
                        < CAST(substr(source, 4) AS INTEGER) % 8 + 4
                        THEN 1 ELSE 0 END AS keep
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(keep) AS BIGINT) AS n_kept,
               round(CAST(min(rate16) AS DOUBLE) / 16.0, 6) AS target_rate,
               CAST(sum(keep * n_chars) AS BIGINT) AS kept_chars
        FROM k
        GROUP BY source
        ORDER BY source
    """,
    "q95_unpivot": """
        WITH w AS (
            SELECT l_returnflag,
                   round(sum(l_quantity), 6) AS m_qty,
                   round(sum(l_extendedprice), 6) AS m_price,
                   round(sum(l_discount), 6) AS m_disc
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'm_qty' AS metric, m_qty AS metric_value FROM w
        UNION ALL
        SELECT l_returnflag, 'm_price', m_price FROM w
        UNION ALL
        SELECT l_returnflag, 'm_disc', m_disc FROM w
        ORDER BY l_returnflag, metric
    """,
    "q96_regr_native": """
        SELECT user_id,
               count(*) AS n,
               round(regr_slope(value, date_diff('second',
                   TIMESTAMP '1970-01-01 00:00:00', ts)), 9) AS slope,
               round(regr_intercept(value, date_diff('second',
                   TIMESTAMP '1970-01-01 00:00:00', ts)), 6) AS intercept,
               round(corr(value, date_diff('second',
                   TIMESTAMP '1970-01-01 00:00:00', ts)), 6) AS corr_vt
        FROM events
        GROUP BY user_id
        HAVING count(*) >= 2
        ORDER BY user_id
    """,
}
