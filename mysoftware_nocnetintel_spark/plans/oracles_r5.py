"""DuckDB oracles for round-5 queries (queries_r5). Notes:
- Tokenizer: `string_split_regex(lower(text), '[^a-z0-9]+')` with empties
  filtered — same token stream as Spark's `split(lower(text), ...)`; the
  character class behaves identically under RE2 and Java regex.
- n-grams: DuckDB `range(1, k)` is exclusive on the stop and empty when
  k <= 1, matching the Spark side's guarded `sequence(1, len-(n-1))`;
  list slices `toks[i:i+n-1]` are 1-based inclusive (n elements).
- q107: md5 hex of the doc_id string is byte-identical in both engines,
  so the split boundaries ('cd'/'e6') select the same documents.
- q109: the PMI expression keeps the same operand order as the Spark side
  so the rounded doubles hash-match.
"""

ORACLES_R5: dict[str, str] = {
    "q107_decontamination": """
        WITH d AS (
            SELECT doc_id, lang,
                   substring(md5(doc_id::VARCHAR), 1, 2) AS b,
                   list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''
                   ) AS toks
            FROM documents
        ),
        grams AS (
            SELECT doc_id, lang, b,
                   unnest(list_transform(
                       range(1, len(toks) - 6),
                       i -> array_to_string(toks[i:i+7], ' ')
                   )) AS g
            FROM d
        ),
        test_grams AS (
            SELECT DISTINCT g FROM grams WHERE b >= 'e6'
        ),
        train_grams AS (
            SELECT DISTINCT doc_id, lang, g FROM grams WHERE b < 'cd'
        ),
        hits AS (
            SELECT t.doc_id, t.lang, count(*) AS n_shared
            FROM train_grams t JOIN test_grams s USING (g)
            GROUP BY 1, 2
        ),
        per_lang AS (
            SELECT lang, count(*) AS n_train_docs FROM d
            WHERE b < 'cd' GROUP BY 1
        ),
        contaminated AS (
            SELECT lang, count(*) AS n_contaminated,
                   max(n_shared) AS max_shared_ngrams,
                   sum(n_shared) AS total_shared_ngrams
            FROM hits GROUP BY 1
        )
        SELECT p.lang, p.n_train_docs,
               coalesce(c.n_contaminated, 0)::BIGINT AS n_contaminated,
               round(coalesce(c.n_contaminated, 0)::DOUBLE / p.n_train_docs,
                     6) AS contamination_rate,
               coalesce(c.max_shared_ngrams, 0)::BIGINT AS max_shared_ngrams,
               coalesce(c.total_shared_ngrams, 0)::BIGINT
                   AS total_shared_ngrams
        FROM per_lang p LEFT JOIN contaminated c USING (lang)
        ORDER BY lang
    """,
    "q108_sequence_packing": """
        WITH per AS (
            SELECT source, doc_id,
                   len(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''
                   )) AS n_tok
            FROM documents
        ),
        laid AS (
            SELECT source, n_tok,
                   sum(n_tok) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM per
        ),
        binned AS (
            SELECT source, n_tok,
                   ((cum - n_tok) // 2048) AS bin,
                   ((cum - 1) // 2048) AS end_bin
            FROM laid
        )
        SELECT source,
               count(*) AS n_docs,
               sum(n_tok)::BIGINT AS total_tokens,
               (max(end_bin) + 1)::BIGINT AS n_bins,
               sum((end_bin > bin)::BIGINT)::BIGINT AS n_straddling,
               round(sum(n_tok)::DOUBLE / ((max(end_bin) + 1) * 2048.0),
                     6) AS fill_ratio
        FROM binned GROUP BY source ORDER BY source
    """,
    "q109_pmi_bigrams": """
        WITH d AS (
            SELECT list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''
                   ) AS toks
            FROM documents
        ),
        uni AS (
            SELECT unnest(toks) AS w FROM d
        ),
        cu AS (
            SELECT w, count(*) AS c_w FROM uni GROUP BY 1
        ),
        big AS (
            SELECT unnest(list_transform(
                       range(1, len(toks)),
                       i -> array_to_string(toks[i:i+1], ' ')
                   )) AS g
            FROM d
        ),
        cb AS (
            SELECT g, count(*) AS c_ab FROM big GROUP BY 1
            HAVING count(*) >= 5
        ),
        tot AS (
            SELECT sum(c_w) AS t FROM cu
        ),
        ntot AS (
            SELECT sum(greatest(len(toks) - 1, 0)) AS n FROM d
        )
        SELECT cb.g AS bigram, cb.c_ab, ca.c_w AS c_a, cbb.c_w AS c_b,
               round(ln((cb.c_ab::DOUBLE * tot.t * tot.t)
                        / (ntot.n::DOUBLE * ca.c_w * cbb.c_w)), 6) AS pmi
        FROM cb
        JOIN cu ca ON ca.w = split_part(cb.g, ' ', 1)
        JOIN cu cbb ON cbb.w = split_part(cb.g, ' ', 2)
        CROSS JOIN tot CROSS JOIN ntot
        ORDER BY pmi DESC, bigram
        LIMIT 20
    """,
}


ORACLES_R5["q111_weighted_sample"] = """
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               round(
                   ln((('0x' || substring(md5(doc_id::VARCHAR || ':es'),
                                          1, 6))::BIGINT + 0.5)
                      / 16777216.0) / n_chars,
                   12) AS sample_key
        FROM documents
    )
    SELECT doc_id, source, n_chars, sample_key
    FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 50
"""

ORACLES_R5["q112_chi2_independence"] = """
    WITH obs AS (
        SELECT event_type AS et, extract(hour FROM ts) AS hr,
               count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    row_t AS (SELECT et, sum(o) AS rt FROM obs GROUP BY 1),
    col_t AS (SELECT hr, sum(o) AS ct FROM obs GROUP BY 1),
    n_t AS (SELECT sum(o) AS n FROM obs),
    grid AS (SELECT et, hr FROM row_t CROSS JOIN col_t),
    full_g AS (
        SELECT g.et, g.hr, coalesce(obs.o, 0) AS o
        FROM grid g LEFT JOIN obs USING (et, hr)
    ),
    cell AS (
        SELECT o, rt::DOUBLE * ct / n AS e
        FROM full_g
        JOIN row_t USING (et) JOIN col_t USING (hr) CROSS JOIN n_t
    )
    SELECT
        (SELECT round(sum((o - e) * (o - e) / e), 6) FROM cell) AS chi2,
        ((SELECT count(*) - 1 FROM row_t)
         * (SELECT count(*) - 1 FROM col_t))::BIGINT AS dof,
        (SELECT n FROM n_t)::BIGINT AS n_obs
"""


ORACLES_R5["q116_retention"] = """
    WITH first_seen AS (
        SELECT user_id, min(ts)::DATE AS cohort_day
        FROM events GROUP BY 1
    ),
    act AS (
        SELECT DISTINCT user_id, ts::DATE AS day FROM events
    ),
    joined AS (
        SELECT a.user_id, f.cohort_day,
               datediff('day', f.cohort_day, a.day) AS day_n
        FROM act a JOIN first_seen f USING (user_id)
    ),
    sizes AS (
        SELECT cohort_day, count(DISTINCT user_id) AS cohort_size
        FROM first_seen GROUP BY 1
    ),
    ret AS (
        SELECT cohort_day, day_n, count(DISTINCT user_id) AS n_active
        FROM joined WHERE day_n BETWEEN 0 AND 7
        GROUP BY 1, 2
    )
    SELECT r.cohort_day::TIMESTAMP AS cohort_day, r.day_n, r.n_active,
           s.cohort_size,
           round(r.n_active::DOUBLE / s.cohort_size, 6) AS retention
    FROM ret r JOIN sizes s USING (cohort_day)
    ORDER BY cohort_day, day_n
"""

ORACLES_R5["q117_bigram_surprisal"] = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id AS doc,
               unnest(list_transform(range(1, len(t)),
                      i -> t[i])) AS a,
               unnest(list_transform(range(1, len(t)),
                      i -> t[i+1])) AS b
        FROM toks
    ),
    big AS (SELECT a, b, count(*) AS c_ab FROM grams GROUP BY 1, 2),
    uni AS (SELECT a, count(*) AS c_a FROM grams GROUP BY 1),
    vocab AS (
        SELECT count(DISTINCT w) AS v FROM (
            SELECT a AS w FROM grams UNION ALL SELECT b AS w FROM grams
        )
    ),
    scored AS (
        SELECT g.doc,
               -ln((big.c_ab + 1)::DOUBLE / (uni.c_a + vocab.v))
                   AS surprisal
        FROM grams g
        JOIN big USING (a, b) JOIN uni USING (a) CROSS JOIN vocab
    )
    SELECT doc AS doc_id, count(*) AS n_bigrams,
           round(avg(surprisal), 6) AS avg_surprisal
    FROM scored GROUP BY doc
    ORDER BY avg_surprisal DESC, doc_id
    LIMIT 20
"""

ORACLES_R5["q119_source_overlap"] = """
    WITH vocab AS (
        SELECT DISTINCT source,
               unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n FROM vocab GROUP BY 1),
    common AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS common
        FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT c.src_a, c.src_b, c.common,
           round(c.common::DOUBLE / (sa.n + sb.n - c.common), 6)
               AS vocab_jaccard
    FROM common c
    JOIN sizes sa ON sa.source = c.src_a
    JOIN sizes sb ON sb.source = c.src_b
    ORDER BY src_a, src_b
"""

ORACLES_R5["q120_ngram_novelty"] = """
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT source,
               unnest(list_transform(
                   range(1, greatest(len(t) - 4, 0) + 1),
                   i -> array_to_string(t[i:i+4], ' ')
               )) AS s
        FROM toks
    ),
    first_seen AS (
        SELECT s, min(source) AS first_source FROM grams GROUP BY 1
    )
    SELECT g.source,
           count(*) AS n_grams,
           sum((g.source = f.first_source)::BIGINT)::BIGINT AS n_new,
           round(sum((g.source = f.first_source)::BIGINT)::DOUBLE
                 / count(*), 6) AS novelty_rate
    FROM grams g JOIN first_seen f USING (s)
    GROUP BY g.source ORDER BY g.source
"""

ORACLES_R5["q121_ewma"] = """
    WITH per AS (
        SELECT user_id, count(*) AS n_events,
               list(value ORDER BY ts, event_id) AS l
        FROM events GROUP BY 1
    )
    SELECT user_id, n_events,
           round(reduce(l, (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma,
           round(l[-1], 6) AS last_value
    FROM per ORDER BY user_id
"""

ORACLES_R5["q113_countmin"] = """
    WITH tok AS (
        SELECT unnest(list_filter(
            string_split_regex(trim(text), '\\s+'), x -> x <> ''
        )) AS w
        FROM documents
    ),
    ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
    cells AS (
        SELECT w, d,
               ('0x' || substring(md5(w || ':cms' || d::VARCHAR), 1, 6))
                   ::BIGINT % 1024 AS cell
        FROM tok CROSS JOIN ds
    ),
    sketch AS (
        SELECT d, cell, count(*) AS c FROM cells GROUP BY 1, 2
    ),
    top AS (
        SELECT w, count(*) AS exact_n FROM tok GROUP BY 1
        ORDER BY exact_n DESC, w LIMIT 20
    ),
    probes AS (
        SELECT t.w, t.exact_n, ds.d,
               ('0x' || substring(md5(t.w || ':cms' || ds.d::VARCHAR), 1, 6))
                   ::BIGINT % 1024 AS cell
        FROM top t CROSS JOIN ds
    ),
    est AS (
        SELECT p.w, p.exact_n, min(s.c) AS est_n
        FROM probes p JOIN sketch s USING (d, cell)
        GROUP BY 1, 2
    )
    SELECT w AS token, exact_n, est_n::BIGINT AS est_n,
           (est_n - exact_n)::BIGINT AS overestimate
    FROM est ORDER BY exact_n DESC, token
"""

ORACLES_R5["q114_attribution"] = """
    WITH t AS (
        SELECT event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    conv AS (
        SELECT coalesce(prev, 'none') AS touch FROM t
        WHERE event_type = 'purchase'
    ),
    agg AS (SELECT touch, count(*) AS n FROM conv GROUP BY 1),
    tot AS (SELECT sum(n) AS tot FROM agg)
    SELECT touch, n AS n_conversions,
           round(n::DOUBLE / tot, 6) AS share
    FROM agg CROSS JOIN tot
    ORDER BY n DESC, touch
"""

ORACLES_R5["q115_containment"] = """
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
    ),
    scored AS (
        SELECT id_a, id_b,
               round(common * 1.0 / na, 6) AS cont_a_in_b,
               round(common * 1.0 / nb, 6) AS cont_b_in_a
        FROM pairs
    )
    SELECT id_a, id_b, cont_a_in_b, cont_b_in_a FROM scored
    WHERE cont_a_in_b >= 0.8 OR cont_b_in_a >= 0.8
    ORDER BY id_a, id_b
"""


def _pagerank_sql(num_iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank (plain chained CTEs — portable
    ANSI SQL, no recursive-aggregate restrictions). Mirrors
    operators/graph.pagerank exactly: 1/N init, (1-d)/N + d*contrib
    update, dangling mass dropped."""
    steps = []
    prev = "pr0"
    for i in range(1, num_iters + 1):
        steps.append(f"""
        pr{i} AS (
            SELECT n.node,
                   (1.0 - {damping}) / (SELECT n FROM nn)
                   + {damping} * coalesce(c.c, 0.0) AS r
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, sum(p.r * e.w) AS c
                FROM {prev} p JOIN edges e ON e.src = p.node
                GROUP BY e.dst
            ) c USING (node)
        )""")
        prev = f"pr{i}"
    return f"""
        WITH counts AS (
            SELECT src, dst, count(*) AS n FROM (
                SELECT event_type AS src,
                       lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS dst
                FROM events
            ) WHERE dst IS NOT NULL GROUP BY src, dst
        ),
        edges AS (
            SELECT src, dst,
                   n * 1.0 / sum(n) OVER (PARTITION BY src) AS w
            FROM counts
        ),
        nodes AS (
            SELECT src AS node FROM edges
            UNION SELECT dst AS node FROM edges
        ),
        nn AS (SELECT count(*) AS n FROM nodes),
        pr0 AS (
            SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes
        ),{",".join(steps)}
        SELECT node, round(r, 6) AS pagerank FROM {prev}
        ORDER BY pagerank DESC, node
    """


ORACLES_R5["q110_pagerank"] = _pagerank_sql()
