"""ANSI-SQL oracles (DuckDB-runnable) matching :mod:`.queries` by name.

Keys absent here (e.g. ``q7_approx_distinct``) are intentionally rows-only:
the operation is approximate or otherwise not SQL-expressible, and the driver
records the weaker check.

Every alias matches the Spark query byte-for-byte; integer-valued computed
columns are cast to BIGINT (DuckDB window sums default to HUGEINT).
"""

ORACLES: dict[str, str] = {
    "q0_flagship_risk": """
        WITH ranked AS (
            SELECT user_id, event_type, value, ts, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ),
        agg AS (
            SELECT user_id,
                   count(*) AS n_events,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                   max(ts) AS last_seen,
                   round(avg(value), 6) AS avg_value,
                   round(avg(CASE WHEN rn <= 10 THEN
                       CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END
                   END), 6) AS recent_error_rate
            FROM ranked
            GROUP BY user_id
        )
        SELECT user_id, n_events, n_errors, last_seen, avg_value,
               recent_error_rate,
               round(1.0 / (1.0 + exp(-(4.0 * recent_error_rate
                                        + n_errors * 1.0 / n_events
                                        - 0.5))), 6) AS risk_score
        FROM agg
        ORDER BY risk_score DESC, user_id
        LIMIT 20
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)                                        AS sum_qty,
               sum(l_extendedprice)                                   AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
               avg(l_quantity)                                        AS avg_qty,
               avg(l_extendedprice)                                   AS avg_price,
               avg(l_discount)                                        AS avg_disc,
               count(*)                                               AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q2_join_topn": """
        SELECT n_name,
               sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        LIMIT 10
    """,
    "q3_window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS BIGINT) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    "q4_rolling_avg": """
        SELECT event_id, user_id, ts, value,
               round(avg(value) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
               ), 6) AS rolling_avg
        FROM events
    """,
    "q5_sessionize": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               round(sum(value), 6) AS total_value
        FROM sess
        GROUP BY user_id, session_id
    """,
    "q6_json_extract": """
        SELECT event_type,
               count(*) AS n,
               round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q7_distinct": """
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q8_dedup_docs": """
        SELECT lang,
               count(*) AS n_docs,
               count(DISTINCT md5(text)) AS n_unique,
               count(*) - count(DISTINCT md5(text)) AS n_dups
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    "q9_knn": """
        WITH q AS (
            SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
        ),
        scored AS (
            SELECT e.vec_id,
                   list_sum(list_transform(list_zip(e.embedding, q.qv),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
                   sqrt(list_sum(list_transform(e.embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
                   sqrt(list_sum(list_transform(q.qv,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
            FROM embeddings e, q
            WHERE e.vec_id <> 0
        )
        SELECT vec_id, round(dot / (na * nb), 6) AS cosine_sim
        FROM scored
        ORDER BY dot / (na * nb) DESC, vec_id
        LIMIT 10
    """,
    "q10_setops": """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    """,
}
