"""DuckDB oracles for round-4 queries (queries_r4). Notes:
- q100: DuckDB generate_series over timestamps is inclusive on both ends,
  matching Spark's F.sequence.
- q101: the argmax ranks the ROUNDED |cusum| in both engines so float
  noise in the running sum cannot flip the winner.
- q103: the Bloom filter only pre-prunes; false positives are removed by
  the exact semi join, so the oracle is the plain semi join + agg.
- q104: merging per-day histogram counts is associative, so the oracle
  computes the identical global histogram directly from raw rows.
"""

ORACLES_R4: dict[str, str] = {
    "q100_gapfill": """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   count(*) AS n_events,
                   round(sum(value), 6) AS total_value
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
        ),
        spine AS (
            SELECT user_id,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM bounds
        )
        SELECT s.user_id, s.h AS hour_start,
               coalesce(n_events, 0) AS n_events,
               coalesce(total_value, 0.0) AS total_value
        FROM spine s LEFT JOIN hourly USING (user_id, h)
        ORDER BY user_id, hour_start
    """,
    "q101_cusum": """
        WITH dev AS (
            SELECT user_id, ts, event_id,
                   value - avg(value) OVER (PARTITION BY user_id) AS d,
                   count(*) OVER (PARTITION BY user_id) AS n_events
            FROM events
        ),
        cs AS (
            SELECT user_id, ts, event_id, n_events,
                   round(abs(sum(d) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )), 6) AS abs_cusum
            FROM dev
        ),
        rk AS (
            SELECT user_id, ts, abs_cusum, n_events,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY abs_cusum DESC, ts, event_id
                   ) AS r
            FROM cs
        )
        SELECT user_id, ts AS change_ts, abs_cusum AS max_abs_cusum, n_events
        FROM rk WHERE r = 1
        ORDER BY user_id
    """,
    "q102_snapshot_diff": """
        WITH a AS (
            SELECT user_id, event_type, count(*) AS n,
                   round(sum(value), 6) AS total
            FROM events WHERE ts < TIMESTAMP '2024-01-21'
            GROUP BY 1, 2
        ),
        b AS (
            SELECT user_id, event_type, count(*) AS n,
                   round(sum(value), 6) AS total
            FROM events WHERE ts >= TIMESTAMP '2024-01-11'
            GROUP BY 1, 2
        )
        SELECT coalesce(a.user_id, b.user_id) AS user_id,
               coalesce(a.event_type, b.event_type) AS event_type,
               CASE WHEN a.n IS NULL THEN 'insert'
                    WHEN b.n IS NULL THEN 'delete'
                    WHEN a.n = b.n AND a.total = b.total THEN 'unchanged'
                    ELSE 'update' END AS op,
               a.n AS old_n, b.n AS new_n,
               a.total AS old_total, b.total AS new_total
        FROM a FULL OUTER JOIN b
          ON a.user_id = b.user_id AND a.event_type = b.event_type
        ORDER BY user_id, event_type
    """,
    "q103_bloom_prune": """
        SELECT l_returnflag,
               count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_totalprice > 470000
        )
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q104_histogram_quantiles": """
        WITH binned AS (
            SELECT least(CAST(floor(value / 10.0) AS BIGINT), 49) AS bin,
                   count(*) AS c
            FROM events GROUP BY 1
        ),
        cum AS (
            SELECT bin,
                   sum(c) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   sum(c) OVER () AS total
            FROM binned
        )
        -- CAST ... AS DOUBLE: DuckDB parses 0.5/10.0 literals as DECIMAL and
        -- round() then yields DECIMAL (e.g. 35.00), which the driver's
        -- type-sensitive value-hash distinguishes from Spark's double 35.0
        -- even though the values are equal (round-3 mismatch root cause).
        -- CAST max(total) AS BIGINT: DuckDB sum(BIGINT) widens to HUGEINT,
        -- which arrives as float64 in pandas/Arrow — another silent type
        -- divergence from Spark's long.
        SELECT CAST(max(total) AS BIGINT) AS n_total,
               CAST(round((min(CASE WHEN cum >= 0.5 * total THEN bin END) + 0.5)
                     * 10.0, 6) AS DOUBLE) AS p50_est,
               CAST(round((min(CASE WHEN cum >= 0.9 * total THEN bin END) + 0.5)
                     * 10.0, 6) AS DOUBLE) AS p90_est,
               CAST(round((min(CASE WHEN cum >= 0.99 * total THEN bin END) + 0.5)
                     * 10.0, 6) AS DOUBLE) AS p99_est
        FROM cum
    """,
    "q105_seasonal_outliers": """
        WITH z AS (
            SELECT event_type, extract(hour FROM ts) AS hh,
                   (value - avg(value) OVER w) / stddev_samp(value) OVER w AS z
            FROM events
            WINDOW w AS (PARTITION BY event_type, extract(hour FROM ts))
        )
        SELECT event_type, CAST(hh AS INT) AS hh, count(*) AS n,
               CAST(sum(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM z
        GROUP BY event_type, hh
        ORDER BY event_type, hh
    """,
    "q106_transition_matrix": """
        WITH pairs AS (
            SELECT event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS dst
            FROM events
        ),
        counts AS (
            SELECT src, dst, count(*) AS n_transitions
            FROM pairs WHERE dst IS NOT NULL
            GROUP BY src, dst
        )
        SELECT src, dst, n_transitions,
               round(n_transitions * 1.0 /
                     sum(n_transitions) OVER (PARTITION BY src), 6) AS p
        FROM counts
        ORDER BY src, dst
    """,
}
