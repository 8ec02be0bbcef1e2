"""engine.sql surface: the SQL string API must produce the same
results as the DataFrame builders (SURVEY §2c: both lower to the same
Catalyst plans) over the registered testdata views.

Three tiers (VERDICT r5 task #4 — the full relational subset):

1. ORACLE_ROUNDTRIP — queries whose catalog DuckDB oracle is ANSI
   enough to run UNCHANGED through engine.sql with identical results:
   the strongest parity statement (one SQL string, two engines, plus
   the DataFrame builder, all agreeing).
2. SPARK_DIALECT_EQUIVALENTS — hand-written Spark-SQL for the queries
   whose oracle uses DuckDB-only surface (list_* lambdas, strftime,
   ASOF JOIN, struct_pack, json_*, regexp flags, generate_series...).
3. Plan-signature equality — for every pair, the SQL text and the
   builder must compile to the same physical OPERATOR MULTISET (join
   algorithms, exchanges by kind, windows, aggregates, sorts...);
   exact plan-string equality is impossible (builders alias columns
   and AQE may flip broadcast build sides), but an operator-level
   mismatch is exactly the "SQL text silently plans worse" regression
   this surface guards against. Documented exemptions list the pairs
   whose formulations legitimately differ (scalar-subquery vs join,
   session_window builtin vs window-function emulation...).
"""


import pytest

from hybrid_cdc_demo_spark.engine import Engine
from hybrid_cdc_demo_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"

SQL_EQUIVALENTS = {
    "q03_agg_tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS c,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
                 AS sum_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                     / COUNT(*), 2) AS avg_price
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q06_join_broadcast": """
        SELECT n_name, COUNT(*) AS c
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q13_window_rank": """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey,
                 RANK() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC) AS r
          FROM orders)
        WHERE r <= 3 ORDER BY o_custkey, r, o_orderkey
    """,
    "q16_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "q18_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS c
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3
    """,
    "q45_pivot": """
        SELECT user_id,
               COALESCE(click, 0) AS click, COALESCE(error, 0) AS error,
               COALESCE(purchase, 0) AS purchase, COALESCE(signup, 0) AS signup,
               COALESCE(view, 0) AS view
        FROM (SELECT user_id, event_type FROM events)
        PIVOT (COUNT(*) FOR event_type IN
               ('click' AS click, 'error' AS error, 'purchase' AS purchase,
                'signup' AS signup, 'view' AS view))
        ORDER BY user_id
    """,
    "q46_cube": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
                 AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q52_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS c,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
                 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls,
                 l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q53_unpivot": """
        SELECT l_orderkey, l_linenumber, substring(metric, 3) AS metric, val
        FROM (SELECT l_orderkey, l_linenumber, l_discount, l_quantity, l_tax
              FROM lineitem WHERE l_orderkey < 1000)
        UNPIVOT (val FOR metric IN (l_discount, l_quantity, l_tax))
        ORDER BY l_orderkey, l_linenumber, metric
    """,
}


#: Catalog queries whose DuckDB ORACLE_SQL runs UNCHANGED on Spark SQL
#: with identical rows and column names (discovered + pinned; a name
#: leaving this list is a dialect regression in either the oracle or
#: the engine surface).
ORACLE_ROUNDTRIP = sorted(
    """
    q01_scan_project q02_filter q03_agg_tpch_q1 q04_distinct_count
    q06_join_broadcast q07_join_multiway q08_join_left_outer
    q09_join_semi q10_join_anti q11_join_range q12_cdc_latest_wins
    q13_window_rank q14_window_frame_sum q15_window_lag q16_topk
    q17_set_except q17_set_intersect q17_set_union q18_rollup
    q19_string_fns q20_date_fns q21_math_decimal q25_dedup_exact_count
    q26_text_token_stats q28_tpch_q5 q29_tpch_q10 q30_tpch_q4
    q31_tpch_q15 q32_tpch_q22 q34_tpch_q3 q35_tpch_q6 q36_tpch_q14
    q37_tpch_q17 q38_tpch_q18 q39_tpch_q19 q40_tpch_q9_shape
    q41_tpch_q16_shape q42_tpch_q7 q43_tpch_q8 q44_tpch_q13 q45_pivot
    q46_cube q47_tpch_q12_shape q48_tpch_q21_shape q49_tpch_q2_shape
    q50_tpch_q11_shape q51_tpch_q20_shape q52_grouping_sets
    q53_unpivot q54_window_distribution q55_window_navigation
    q61_set_ops_all q63_conditional_breadth q66_null_safe_equality
    q70_ranking_trio q72_not_in_null_trap q73_except_all
    s10_stream_enrichment s11_incremental_agg s12_snapshot_asof
    s13_union_streams s1_tumbling_window s3_session_window
    s4_watermarked_hourly s5_stateful_dedup s7_interval_join
    s8_running_totals s9_interval_join_outer
    """.split()
)

#: Spark-SQL equivalents for the queries whose oracle is DuckDB-dialect.
SPARK_DIALECT_EQUIVALENTS = {
    "q22_masking_sha256": """
    SELECT user_id, sha2(CAST(user_id AS STRING), 256) AS uid_sha
    FROM (SELECT DISTINCT user_id FROM events) ORDER BY user_id
 """,
    "q23_json_extract": """
    SELECT event_id, get_json_object(props, '$.k') AS k
    FROM events ORDER BY event_id
 """,
    "q24_array_sum": """
    SELECT vec_id,
           ROUND(aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x), 2) AS esum
    FROM embeddings ORDER BY vec_id
 """,
    "q27_cosine_topk": """
    WITH q AS (
      SELECT transform(embedding, x -> CAST(x AS DOUBLE)) AS qv FROM embeddings
      WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    scored AS (
      SELECT e.vec_id,
             aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), q.qv, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)
             / (sqrt(aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), transform(embedding, x -> CAST(x AS DOUBLE)), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)) * sqrt(aggregate(zip_with(q.qv, q.qv, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))) AS raw_score
      FROM embeddings e CROSS JOIN q
    )
    SELECT vec_id, ROUND(raw_score, 4) AS score
    FROM scored ORDER BY raw_score DESC, vec_id LIMIT 10
 """,
    "q33_asof_join": """
    SELECT a.event_id,
           max(CASE WHEN b.ts IS NOT NULL THEN struct(b.ts, b.value) END).value
             AS last_update_value
    FROM (SELECT user_id, event_id, ts FROM events) a
    LEFT JOIN (SELECT user_id, ts, value FROM events
               WHERE event_type = 'UPDATE') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    GROUP BY a.event_id
    ORDER BY a.event_id
 """,
    "q56_string_fns_breadth": """
    SELECT p_partkey,
           translate(p_brand, '#', '-') AS brand_t,
           lpad(CAST(p_size AS STRING), 4, '0') AS size_padded,
           rpad(p_brand, 12, '.') AS brand_padded,
           reverse(p_name) AS name_rev,
           repeat(p_brand, 2) AS brand_twice,
           CAST(instr(p_type, 'a') AS INT) AS first_a,
           split_part(p_type, ' ', 1) AS type_head,
           CAST(ascii(p_name) AS INT) AS name_first_code,
           left(p_name, 5) AS name_l5,
           right(p_name, 5) AS name_r5,
           COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other
    FROM part ORDER BY p_partkey
 """,
    "q57_datetime_fns_breadth": """
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(datediff(CAST(o_orderdate AS DATE), DATE '2023-01-01') AS INT)
             AS days_since,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(o_orderdate + INTERVAL '3' MONTH AS DATE) AS plus_3m
    FROM orders ORDER BY o_orderkey
 """,
    "q58_array_fns_breadth": """
    WITH v AS (
      SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
    )
    SELECT vec_id,
           CAST(size(e) AS INT) AS n_dims,
           array_max(e) AS v_max,
           array_min(e) AS v_min,
           aggregate(zip_with(slice(e, 1, 3), array(1.0D, 1.0D, 1.0D), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS sum_first3,
           CAST(size(filter(e, x -> x > 0)) AS INT) AS n_pos,
           sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)) AS l2
    FROM v ORDER BY vec_id
 """,
    "q59_regex_breadth": """
    SELECT doc_id,
           regexp_extract(text, '([0-9]+)', 1) AS first_number,
           CAST(size(regexp_extract_all(text, '[aeiou]+', 0)) AS INT)
             AS n_vowel_runs,
           regexp_replace(lower(text), '[aeiou]', '') AS devoweled_head
    FROM (SELECT doc_id, substring(text, 1, 80) AS text FROM documents)
    ORDER BY doc_id
 """,
    "q60_lateral_posexplode": """
    SELECT e.vec_id,
           CAST(t.pos AS INT) AS pos,
           CAST(t.val AS DOUBLE) AS val
    FROM embeddings e
    LATERAL VIEW posexplode(slice(e.embedding, 1, 4)) t AS pos, val
    ORDER BY vec_id, pos
 """,
    "q62_ordered_string_agg": """
    SELECT l_returnflag,
           array_join(array_sort(collect_set(l_linestatus)), '|') AS statuses,
           CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
           bool_and(l_discount <= 0.1) AS all_small_discount,
           bool_or(l_tax > 0.07) AS any_high_tax
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
 """,
    "q64_bitwise_breadth": """
    SELECT l_returnflag,
           CAST(bit_and(l_orderkey) AS BIGINT) AS key_and,
           CAST(bit_or(l_orderkey) AS BIGINT) AS key_or,
           CAST(bit_xor(l_orderkey) AS BIGINT) AS key_xor,
           CAST(42 ^ 7 AS BIGINT) AS const_xor
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
 """,
    "q65_math_fns_breadth": """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(sign(l_tax - 0.04) AS DOUBLE) AS tax_side,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(floor(l_extendedprice / 1000.0) AS DOUBLE) AS price_k_floor,
           CAST(ceil(l_quantity / 10.0) AS DOUBLE) AS qty_decile_ceil,
           CAST(CAST(l_extendedprice / 100.0 AS BIGINT) AS DOUBLE)
             AS price_c_trunc
    FROM lineitem WHERE l_orderkey < 400
    ORDER BY l_orderkey, l_linenumber
 """,
    "q67_map_fns": """
    SELECT event_id,
           CAST(size(json_object_keys(props)) AS INT) AS n_keys,
           CAST(get_json_object(props, '$.k') AS INT) AS k_value,
           CAST(get_json_object(props, '$.k') AS INT) * 2 AS k_doubled
    FROM events WHERE event_id < 2000 ORDER BY event_id
 """,
    "q68_array_predicates": """
    WITH v AS (
      SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
      WHERE vec_id < 500
    )
    SELECT vec_id,
           CAST(exists(e, x -> x > 0.9) AS INT) AS has_big,
           CAST(NOT exists(e, x -> x <= -2.0) AS INT) AS all_gt_neg2,
           array_sort(e)[0] AS smallest,
           CAST(array_position(e, array_max(e)) AS INT) AS argmax_pos
    FROM v ORDER BY vec_id
 """,
    "q69_struct_surface": """
    WITH s AS (
      SELECT o_orderkey,
             named_struct('cust', o_custkey, 'status', o_orderstatus,
                          'price', o_totalprice) AS o
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey,
           o.cust AS cust,
           o.status AS status,
           CAST(o.price >= 100000 AS INT) AS is_large
    FROM s ORDER BY o_orderkey
 """,
    "q71_datetime_format": """
    SELECT o_orderkey,
           date_format(o_orderdate, 'yyyy-MM') AS ym,
           date_format(o_orderdate, 'EEEE') AS weekday_name,
           date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS iso_ts
    FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey
 """,
    "s2_sliding_window": """
    SELECT window.start AS window_start, window.end AS window_end,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events
    GROUP BY window(ts, '1 hour', '15 minutes')
    ORDER BY window_start
 """,
}

#: ns_ catalog oracles whose DuckDB SQL runs UNCHANGED through
#: engine.sql with identical results (VERDICT r6 task #5 — the ns_
#: extension of ORACLE_ROUNDTRIP; several became portable this round
#: by writing CAST(... AS STRING) instead of VARCHAR in the oracle and
#: by the engine's DuckDB-compat scalar aliases sha256 /
#: string_split_regex / string_split / starts_with, each a pure RENAME
#: of a Spark builtin registered as a SQL UDF).
NS_ORACLE_ROUNDTRIP = sorted(
    """
    ns_band_join ns_blocklist_filter ns_corpus_shuffle ns_dataset_mixture
    ns_dedup_exact ns_dq_violations ns_funnel_conversion ns_fuzzy_join
    ns_group_normalize ns_markov_transitions ns_multimodal_headers
    ns_pareto_revenue ns_prefix_dedup ns_prequential_anomaly
    ns_reconcile_drift ns_regression_stats ns_sample_stratified
    ns_scd2_history ns_session_assignment ns_split_train_val
    ns_table_profile ns_value_histogram ns_zorder_curve
    """.split()
)

#: Spark-SQL texts for ns_ oracles whose DuckDB dialect diverges only
#: mechanically (unnest -> LATERAL VIEW explode, datediff('day',a,b) ->
#: datediff(b,a), quantile_cont -> percentile, generate_series ->
#: sequence, '0x…'::BIGINT -> conv(…,16,10), list_reduce sorted fold ->
#: aggregate(array_sort(collect_list(…)))). Same rows as the builder,
#: string-compared like every other pair.
NS_SPARK_DIALECT_EQUIVALENTS = {
    "ns_vocab_topk": """
    WITH toks AS (
      SELECT token FROM documents
      LATERAL VIEW explode(split(regexp_replace(lower(trim(text)),
        '\\\\s+', ' '), ' ')) t AS token
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks WHERE token <> ''
    GROUP BY token ORDER BY n DESC, token LIMIT 100
    """,
    "ns_length_quantiles": """
    SELECT lang,
           percentile(n_chars, 0.25) AS p25,
           percentile(n_chars, 0.5)  AS p50,
           percentile(n_chars, 0.9)  AS p90
    FROM documents GROUP BY lang ORDER BY lang
    """,
    "ns_zipf_slope": """
    WITH occ AS (
      SELECT tok FROM documents
      LATERAL VIEW explode(split(regexp_replace(lower(trim(text)),
        '\\\\s+', ' '), ' ')) t AS tok
    ), freq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM occ GROUP BY tok
      ORDER BY n_occ DESC, tok LIMIT 100
    ), ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY n_occ DESC, tok)
                     AS DOUBLE)) AS x,
             ln(CAST(n_occ AS DOUBLE)) AS y
      FROM freq
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM ranked
    )
    SELECT n AS n_terms,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 4) AS slope,
           ROUND((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                         / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
                 / CAST(n AS DOUBLE), 4) AS intercept
    FROM s
    """,
    "ns_heavy_hitters": """
    WITH occ AS (
      SELECT tok FROM documents
      LATERAL VIEW explode(split(regexp_replace(lower(trim(text)),
        '\\\\s+', ' '), ' ')) t AS tok
    ), freq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ FROM occ GROUP BY tok
    )
    SELECT tok, n_occ FROM freq
    WHERE n_occ * 65 > (SELECT COUNT(*) FROM occ)
    ORDER BY n_occ DESC, tok
    """,
    "ns_rolling_7day": """
    WITH d AS (
      SELECT user_id, event_id,
             datediff(CAST(ts AS DATE), DATE '2023-01-01') AS day,
             value
      FROM events
    )
    SELECT user_id, event_id, day,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_7d
    FROM d
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    "ns_daily_gapfill": """
    WITH d AS (
      SELECT CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')
                  AS BIGINT) AS day
      FROM events
    ), c AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY day
    ), b AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
    ), spine AS (
      SELECT day FROM b LATERAL VIEW explode(sequence(lo, hi)) t AS day
    ), filled AS (
      SELECT s.day,
             COALESCE(c.n, 0) AS n_events,
             CAST(c.n IS NULL AS INT) AS is_gap
      FROM spine s LEFT JOIN c USING (day)
    )
    SELECT day, n_events, is_gap,
           CAST(SUM(n_events) OVER w AS DOUBLE)
             / CAST(COUNT(*) OVER w AS DOUBLE) AS avg_7d
    FROM filled
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY day
    """,
    "ns_rfm_segments": """
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE event_type = 'purchase'
    ), mx AS (
      SELECT MAX(CAST(ts AS DATE)) AS mxd FROM events
    ), u AS (
      SELECT user_id,
             CAST(datediff((SELECT mxd FROM mx), MAX(d)) AS BIGINT)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(v) AS mon_dec
      FROM p GROUP BY user_id
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM u
    ), r AS (
      SELECT user_id,
             row_number() OVER (ORDER BY recency_days, user_id) AS pr,
             row_number() OVER (ORDER BY frequency DESC, user_id) AS pf,
             row_number() OVER (ORDER BY mon_dec DESC, user_id) AS pm
      FROM u
    ), sc AS (
      SELECT u.user_id, u.recency_days, u.frequency,
             CAST(u.mon_dec AS DOUBLE) AS monetary,
             CAST(1 + FLOOR(CAST(4.0 AS DOUBLE) * CAST(r.pr - 1 AS DOUBLE)
                            / CAST(n.n_users AS DOUBLE)) AS INT) AS r_q,
             CAST(1 + FLOOR(CAST(4.0 AS DOUBLE) * CAST(r.pf - 1 AS DOUBLE)
                            / CAST(n.n_users AS DOUBLE)) AS INT) AS f_q,
             CAST(1 + FLOOR(CAST(4.0 AS DOUBLE) * CAST(r.pm - 1 AS DOUBLE)
                            / CAST(n.n_users AS DOUBLE)) AS INT) AS m_q
      FROM u JOIN r USING (user_id) CROSS JOIN n
    )
    SELECT user_id, recency_days, frequency, monetary, r_q, f_q, m_q,
           CAST(r_q AS STRING) || CAST(f_q AS STRING)
             || CAST(m_q AS STRING) AS segment
    FROM sc ORDER BY user_id
    """,
    "ns_cohort_retention": """
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS d FROM events
    ), f AS (
      SELECT user_id, MIN(d) AS d0 FROM d GROUP BY user_id
    ), coh AS (
      SELECT user_id, d0,
             CAST(FLOOR(CAST(datediff(d0, DATE '2024-01-01') AS DOUBLE)
                        / 7.0) AS BIGINT) AS cohort_week
      FROM f
    ), sizes AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM coh GROUP BY cohort_week
    ), act AS (
      SELECT DISTINCT d.user_id, c.cohort_week,
             CAST(FLOOR(CAST(datediff(d.d, c.d0) AS DOUBLE)
                        / 7.0) AS BIGINT) AS week_offset
      FROM d JOIN coh c USING (user_id)
    ), agg AS (
      SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
      FROM act GROUP BY cohort_week, week_offset
    )
    SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
           CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
             AS retention
    FROM agg a JOIN sizes s USING (cohort_week)
    ORDER BY a.cohort_week, a.week_offset
    """,
    "ns_daily_anomaly": """
    WITH d AS (
      SELECT event_type AS etype,
             CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')
                  AS BIGINT) AS day
      FROM events
    ), c AS (
      SELECT etype, day, CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY etype, day
    ), s AS (
      SELECT etype, CAST(COUNT(*) AS BIGINT) AS days,
             CAST(SUM(n) AS BIGINT) AS sx,
             CAST(SUM(n * n) AS BIGINT) AS sxx
      FROM c GROUP BY etype
    )
    SELECT c.etype, c.day, c.n,
           CASE WHEN s.days >= 2
                 AND (CAST(s.sxx AS DOUBLE)
                        - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)
                          / CAST(s.days AS DOUBLE))
                     / (CAST(s.days AS DOUBLE) - 1.0) > 0.0
                THEN (CAST(c.n AS DOUBLE)
                       - CAST(s.sx AS DOUBLE) / CAST(s.days AS DOUBLE))
                     / sqrt((CAST(s.sxx AS DOUBLE)
                               - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)
                                 / CAST(s.days AS DOUBLE))
                            / (CAST(s.days AS DOUBLE) - 1.0)) END AS z,
           CAST(abs(CASE WHEN s.days >= 2
                          AND (CAST(s.sxx AS DOUBLE)
                                 - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)
                                   / CAST(s.days AS DOUBLE))
                              / (CAST(s.days AS DOUBLE) - 1.0) > 0.0
                         THEN (CAST(c.n AS DOUBLE)
                                - CAST(s.sx AS DOUBLE) / CAST(s.days AS DOUBLE))
                              / sqrt((CAST(s.sxx AS DOUBLE)
                                        - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)
                                          / CAST(s.days AS DOUBLE))
                                     / (CAST(s.days AS DOUBLE) - 1.0)) END) > 2.0
                AS INT) AS is_anomaly
    FROM c JOIN s USING (etype)
    ORDER BY c.etype, c.day
    """,
    "ns_ttl_expiry": """
    WITH env AS (
      SELECT event_id,
             timestampdiff(MICROSECOND,
                           TIMESTAMP '2024-01-01 00:00:00', ts)
               AS timestamp_micros,
             CASE WHEN event_id % 3 = 1 THEN 86400
                  WHEN event_id % 3 = 2 THEN 604800 END AS ttl_seconds
      FROM events
    )
    SELECT event_id, timestamp_micros, ttl_seconds
    FROM env
    WHERE ttl_seconds IS NULL
       OR timestamp_micros + CAST(ttl_seconds AS BIGINT) * 1000000
          > 1641600000000
    ORDER BY event_id
    """,
    "ns_weighted_sample": """
    WITH pri AS (
      SELECT doc_id, n_chars,
             CAST(CAST(conv(substr(sha2(CAST(doc_id AS STRING), 256), 1, 15),
                            16, 10) AS BIGINT)
               AS DOUBLE) / CAST(n_chars AS DOUBLE) AS p
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ), top AS (
      SELECT doc_id, n_chars, p FROM pri ORDER BY p, doc_id LIMIT 200
    )
    SELECT CAST(row_number() OVER (ORDER BY p, doc_id) AS INT) AS rank,
           doc_id, n_chars
    FROM top ORDER BY rank
    """,
    "ns_temperature_sampling": """
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), t AS (
      SELECT SUM(n_docs) AS n_total FROM c
    ), b0 AS (
      SELECT c.source, c.n_docs,
             CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share
      FROM c CROSS JOIN t
    ), b AS (
      SELECT source, n_docs, share, sqrt(share) AS s FROM b0
    ), d AS (
      SELECT aggregate(array_sort(collect_list(named_struct('k', source,
                                                            'v', s))),
                       CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v) AS denom
      FROM b
    )
    SELECT b.source, b.n_docs, b.share, b.s / d.denom AS weight
    FROM b CROSS JOIN d ORDER BY source
    """,
    "ns_lm_coherence": """
    WITH toks AS (
      SELECT doc_id, split(lower(trim(text)), '\\\\s+') AS w FROM documents
    ), pairs AS (
      SELECT doc_id, p.x AS x, p.y AS y
      FROM toks
      LATERAL VIEW explode(zip_with(w,
        slice(w, 2, greatest(size(w) - 1, 0)),
        (a, b) -> named_struct('x', a, 'y', b))) t AS p
    ), fullc AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY x, y
    ), uni AS (
      SELECT x, CAST(SUM(c) AS BIGINT) AS c_x FROM fullc GROUP BY x
    ), wq AS (
      SELECT f.x, f.y, (f.c * CAST(1048576 AS BIGINT)) DIV u.c_x AS w_q20
      FROM fullc f JOIN uni u USING (x) WHERE f.y IS NOT NULL
    ), agg AS (
      SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
             CAST(SUM(q.w_q20) AS BIGINT) AS s
      FROM pairs d JOIN wq q USING (x, y)
      GROUP BY d.doc_id
    )
    SELECT t.doc_id,
           COALESCE(a.n_transitions, CAST(0 AS BIGINT)) AS n_transitions,
           CAST(a.s AS DOUBLE)
             / CAST(a.n_transitions * 1048576 AS DOUBLE) AS coherence
    FROM toks t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """,
}

#: ns_ oracles with NO engine.sql text, each with the dialect feature
#: that blocks it. Reason classes: the DuckDB `CAST(x AS DOUBLE[])`
#: array-type cast and `[…]` list literals/slices have no Spark SQL
#: spelling; `list(x ORDER BY …)` / `list_reduce` is the strict
#: sorted-fold determinism idiom the oracles NEED DuckDB-side (the
#: Spark builder's aggregate(array_sort(collect_list…)) IS its
#: equivalent, plan-pinned in test_plans); list lambdas
#: (list_transform/list_filter/list_contains) cannot alias to Spark's
#: HOFs via SQL UDFs (no lambda parameters); regexp_replace's 'g'
#: FLAG argument collides with Spark's position argument; `//` integer
#: division parses only as DIV; DuckDB len() is polymorphic over
#: strings and lists; unnest/generate_series are table functions
#: (LATERAL VIEW rewrites are provided for 5 representative queries in
#: NS_SPARK_DIALECT_EQUIVALENTS — the remainder share that exact
#: surface).
NS_SQL_SURFACE_EXEMPT = {
    "ns_asof_tolerance": "DuckDB ASOF JOIN keyword (builder = the asof window operator, same as q33)",
    "ns_attribution": "list(x ORDER BY …) sorted-fold determinism idiom",
    "ns_bm25_topk": "list(x ORDER BY …) sorted-fold determinism idiom",
    "ns_bpe_merges": "QUALIFY + list lambdas",
    "ns_bpe_encode": "generated unrolled-CTE chain: AS MATERIALIZED + list_reduce lambdas",
    "ns_bpe_vocab": "generated unrolled-CTE chain: AS MATERIALIZED + list_reduce lambdas",
    "ns_pagerank_tokens": "generated power-iteration CTE chain: AS MATERIALIZED (DuckDB inlining guard)",
    "ns_mmr_diverse": "generated greedy-pick CTE chain: AS MATERIALIZED + list_transform lambdas",
    "ns_lr_training": "generated unrolled-GD CTE chain: AS MATERIALIZED (DuckDB inlining guard)",
    "ns_contamination": "list_transform lambda (no SQL-UDF lambda params)",
    "ns_corpus_curation": "regexp_replace 'g' flag collides with Spark's position arg",
    "ns_corpus_mix": "list_contains(['…'] literal) — no Spark SQL list-literal spelling",
    "ns_corpus_pipeline": "regexp_replace 'g' flag collides with Spark's position arg",
    "ns_dataset_card": "regexp_replace 'g' flag collides with Spark's position arg",
    "ns_dedup_canonical": "regexp_replace 'g' flag collides with Spark's position arg",
    "ns_dedup_clusters": "list_transform lambda",
    "ns_dedup_containment": "list_transform lambda",
    "ns_dedup_editdistance": "regexp_replace 'g' flag collides with Spark's position arg",
    "ns_dedup_ngram_jaccard": "list_transform lambda",
    "ns_dedup_quality_weighted": "list_filter/list_contains lambdas + regexp 'g' flag (classifier-score ranking)",
    "ns_dedup_substring": "generate_series table function over per-row gram positions",
    "ns_dedup_two_stage": "list_transform lambda",
    "ns_doc_chunking": "unnest over computed per-row lists (LATERAL VIEW family, representatives provided)",
    "ns_embedding_neardup": "generated two-stage SRP-bucket chain: list_dot_product + '…'::DOUBLE literal casts",
    "ns_embedding_neardup_exact": "CAST(x AS DOUBLE[]) array-type cast + list_dot_product strict fold",
    "ns_embedding_quantize": "CAST(x AS DOUBLE[]) array-type cast",
    "ns_event_paths": "list(x ORDER BY …) sorted-fold determinism idiom",
    "ns_forecast_backtest": "dialect-equivalent exists modulo FP association only: AVG(double) folds in physical row order, and the SQL join order differs from the builder's, so mape diverges in the last ULP",
    "ns_graph_triangles": "DuckDB '//' integer division",
    "ns_hard_negatives": "CAST(x AS DOUBLE[]) array-type cast",
    "ns_hybrid_rrf": "list(x ORDER BY …) sorted-fold determinism idiom in both fusion legs",
    "ns_kmeans_assign": "CAST(x AS DOUBLE[]) + QUALIFY argmin over list literals",
    "ns_ngram_novelty": "unnest + list lambdas",
    "ns_pack_sequences": "DuckDB polymorphic len() over strings and lists",
    "ns_pca_gram": "CAST(x AS DOUBLE[]) array-type cast",
    "ns_pii_scrub": "regexp_replace 'g' flag collides with Spark's position arg",
    "ns_pmi_collocations": "QUALIFY",
    "ns_pq_adc_topk": "CAST(x AS DOUBLE[])[1:16] array cast + slice syntax (generated SQL)",
    "ns_pq_encode": "CAST(x AS DOUBLE[])[1:16] array cast + slice syntax (generated SQL)",
    "ns_quality_classifier": "list_filter/list_contains lambdas + list literal",
    "ns_random_projection": "generated JL-projection: list_reduce/list_transform (x,j) index lambdas + '…'::DOUBLE literal casts",
    "ns_repetition": "list_transform lambda",
    "ns_semantic_dedup": "CAST(x AS DOUBLE[]) + QUALIFY",
    "ns_simsearch_batch": "CAST(x AS DOUBLE[]) array-type cast",
    "ns_simsearch_binary": "CAST(x AS DOUBLE[]) + list_transform lambda packing + generate_series",
    "ns_simsearch_ivf_fullprobe": "CAST(x AS DOUBLE[]) array-type cast",
    "ns_source_mix": "DuckDB polymorphic len() over strings and lists",
    "ns_text_entropy": "list(x ORDER BY …) sorted-fold determinism idiom",
    "ns_text_fingerprint": "'0x…'::BIGINT hex-literal cast inside the rolling-hash fold",
    "ns_text_quality": "list_filter/list_contains lambdas + list literal",
    "ns_text_stats": "list_filter/list_contains lambdas + list literal",
    "ns_tfidf_topterms": "unnest + list(x ORDER BY …) sorted fold",
    "ns_tokens_bpeish": "DuckDB polymorphic len() over strings and lists",
    "ns_training_manifest": "list_contains list literal + sorted fold",
    "ns_transcript_assembly": "list(x ORDER BY …) ordered aggregate",
    "ns_udtf_bigrams": "unnest(generate_series) positional bigrams (builder leg is the Python UDTF demo)",
    "ns_unigram_likelihood": "unnest + list(x ORDER BY …) sorted fold",
    "ns_vocabulary": "unnest over computed per-row lists (representatives provided)",
    "ns_winsorize": "DuckDB '//' integer division",
}

#: Driver-prefix queries with NO SQL-text equivalent, with the reason.
SQL_SURFACE_EXEMPT = {
    "q05_approx_distinct": "approx_count_distinct seed differs per engine; tolerance-checked elsewhere",
    "s6_cdc_pipeline_batch": "the CDC pipeline operator (parse→validate→mask→merge), not a relational query",
}

#: Pairs whose SQL text and builder compile to legitimately DIFFERENT
#: physical formulations (same results, hash-checked above).
PLAN_SIG_EXEMPT = {
    "q27_cosine_topk": "builder broadcasts the 1-row query vector; SQL's scalar subquery plans as two single-partition aggregates",
    "q28_tpch_q5": "builder pre-filters customer+supplier with an inferred ASIA semi-join before the fact joins (r10 §3.2 — a transitive reduction no planner derives from the SQL text); rows hash-checked equal",
    "q31_tpch_q15": "builder reuses the revenue frame; SQL's MAX scalar subquery adds one broadcast join",
    "q32_tpch_q22": "builder's AVG is a broadcast-nested-loop scalar input; SQL plans it as a subquery aggregate",
    "q33_asof_join": "builder is the asof window operator; SQL emulates via join + max(struct) argmax (SortAggregate)",
    "q37_tpch_q17": "scalar avg subquery vs builder's explicit broadcast join",
    "q42_tpch_q7": "join-order formulation: at sf0.01 the builder's order plans one sort-merge leg where the SQL order keeps all joins broadcast",
    "q45_pivot": "builder pins the two-phase pivot aggregate; SQL's PIVOT folds to one",
    "q46_cube": "builder aggregates to the finest grouping BEFORE the CUBE Expand (r10 §2.3 — Expand multiplies pre-aggregated rows, not the fact table); SQL plans Expand directly over the scan; rows hash-checked equal",
    "q52_grouping_sets": "builder aggregates to the finest grouping BEFORE the GROUPING SETS Expand (r10 §2.3, same as q46); rows hash-checked equal",
    "q49_tpch_q2_shape": "correlated min-cost subquery decorrelates differently than the builder's explicit join",
    "q50_tpch_q11_shape": "HAVING scalar subquery vs builder's broadcast threshold join",
    "q53_unpivot": "builder uses the Expand-based unpivot operator; SQL's UNPIVOT plans as a union",
    "q62_ordered_string_agg": "collect_set+array_sort (1 exchange) vs SQL DISTINCT aggregate (2)",
    "s3_session_window": "builder uses the session_window builtin; SQL emulates with gap windows",
    "s7_interval_join": "oracle states the plain key+range-predicate join; builder is the skew-immune (key, time-bucket) equi-join rewrite (keyed_interval_join, r8 — SKEW_r08's worst amplifier)",
    "s9_interval_join_outer": "oracle is a direct LEFT OUTER interval join; builder composes the bucketized inner keyed_interval_join with an anti-join for the null-extended rows",
}

#: ns_ pairs whose SQL text and builder legitimately compile to
#: different physical formulations (rows hash-checked equal above).
#: A recurring class: the oracle SQL states the NAIVE formulation on
#: purpose (range predicate, scalar-subquery recount, single-partition
#: row_number) — the builder being a different, scale-safe plan is the
#: very thing test_plans pins.
NS_PLAN_SIG_EXEMPT = {
    "ns_band_join": "oracle states the raw |a-b|<=eps predicate (nested-loop at this SF); builder is the banded equi-join rewrite",
    "ns_blocklist_filter": "builder pre-aggregates the blocklist before the anti-join; SQL semi-joins the raw list",
    "ns_corpus_shuffle": "SQL row_number() OVER (ORDER BY) is a single-partition window; builder ranks distributively via rangepartitioning",
    "ns_cohort_retention": "builder lazily localCheckpoints the user-sized cohort frame so the events scan + per-user MIN run once (r11); pure SQL re-plans that subtree per consumer — the barrier has no SQL spelling",
    "ns_dq_violations": "SQL counts each rule as a scalar-subquery aggregate; builder explodes rule structs in one pass",
    "ns_funnel_conversion": "SQL computes each funnel stage as its own subquery join; builder is one conditional aggregation pass",
    "ns_fuzzy_join": "oracle states the direct edit-distance predicate (nested-loop); builder prunes through candidate buckets",
    "ns_group_normalize": "SQL uses windowed group stats; builder computes them as an aggregate + broadcast join",
    "ns_heavy_hitters": "SQL recounts the corpus in a scalar subquery (two full explodes); builder is Misra-Gries + bounded exact recount",
    "ns_lm_coherence": "builder lazily localCheckpoints the vocabulary-sized model so its corpus explode runs ONCE; pure SQL re-plans that subtree per consumer — the barrier has no SQL spelling",
    "ns_pareto_revenue": "SQL single-partition ranking window; builder's exact-DECIMAL prefix sums rank distributively",
    "ns_prefix_dedup": "SQL lead() OVER (ORDER BY) is a single-partition window; builder sorts range-partitioned",
    "ns_rfm_segments": "SQL quartiles via single-partition windows + scalar subqueries; builder broadcasts the user count",
    "ns_table_profile": "SQL unions per-column aggregates (SortAggregate percentiles); builder profiles all columns in one Expand pass",
    "ns_temperature_sampling": "SQL cross-joins scalar share/denominator subqueries; builder folds them through windows",
    "ns_zorder_curve": "SQL computes min/max bounds as scalar subqueries; builder broadcasts a bounds row",
}


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(SF, spark)


@pytest.mark.parametrize("name", sorted(SQL_EQUIVALENTS))
def test_sql_matches_dataframe_builder(engine, spark, name):
    via_sql = engine.sql(SQL_EQUIVALENTS[name])
    via_df = QUERIES[name](spark, SF)
    sql_rows = [tuple(r) for r in via_sql.collect()]
    df_rows = [tuple(r) for r in via_df.collect()]
    assert len(sql_rows) == len(df_rows) > 0
    # q18's builder orders only by the grouping cols; compare as sets
    assert sorted(map(str, sql_rows)) == sorted(map(str, df_rows))


def test_engine_table_access(engine):
    assert engine.table("nation").count() == 25
    assert {t for t in ("lineitem", "orders")} <= {
        t.name for t in engine.spark.catalog.listTables()
    }


def _rows(df):
    return sorted(str(tuple(r)) for r in df.collect())


@pytest.mark.parametrize("name", ORACLE_ROUNDTRIP)
def test_oracle_sql_runs_unchanged_on_spark(engine, spark, name):
    """The DuckDB oracle string IS valid Spark SQL and matches the
    builder — one query text, two engines, one answer."""
    from hybrid_cdc_demo_spark.plans import ORACLE_SQL

    via_sql = engine.sql(ORACLE_SQL[name])
    via_df = QUERIES[name](spark, SF)
    assert list(via_sql.columns) == list(via_df.columns)
    assert _rows(via_sql) == _rows(via_df)


@pytest.mark.parametrize("name", sorted(SPARK_DIALECT_EQUIVALENTS))
def test_spark_dialect_equivalent_matches_builder(engine, spark, name):
    via_sql = engine.sql(SPARK_DIALECT_EQUIVALENTS[name])
    via_df = QUERIES[name](spark, SF)
    assert list(via_sql.columns) == list(via_df.columns)
    assert _rows(via_sql) == _rows(via_df)


def test_driver_prefix_sql_surface_is_closed():
    """Every q*/s* catalog query is either oracle-roundtrip, hand-
    equivalent, or explicitly exempted — no silent surface gaps."""
    import re

    from hybrid_cdc_demo_spark.plans import QUERIES as ALL_Q

    driver_prefix = {n for n in ALL_Q if re.match(r"^(q|s)\d", n)}
    covered = (
        set(ORACLE_ROUNDTRIP)
        | set(SPARK_DIALECT_EQUIVALENTS)
        | set(SQL_SURFACE_EXEMPT)
    )
    assert driver_prefix <= covered, sorted(driver_prefix - covered)


@pytest.mark.parametrize("name", NS_ORACLE_ROUNDTRIP)
def test_ns_oracle_sql_runs_unchanged_on_spark(engine, spark, name):
    """The ns_ oracle string IS valid Spark SQL (possibly via the
    engine's rename-only compat aliases) and matches the builder."""
    from hybrid_cdc_demo_spark.plans import ORACLE_SQL

    via_sql = engine.sql(ORACLE_SQL[name])
    via_df = QUERIES[name](spark, SF)
    assert list(via_sql.columns) == list(via_df.columns)
    assert _rows(via_sql) == _rows(via_df)


@pytest.mark.parametrize("name", sorted(NS_SPARK_DIALECT_EQUIVALENTS))
def test_ns_spark_dialect_equivalent_matches_builder(engine, spark, name):
    via_sql = engine.sql(NS_SPARK_DIALECT_EQUIVALENTS[name])
    via_df = QUERIES[name](spark, SF)
    assert list(via_sql.columns) == list(via_df.columns)
    assert _rows(via_sql) == _rows(via_df)


def test_ns_oracle_sql_surface_is_closed():
    """Every ns_ catalog oracle is either roundtrip, hand-equivalent,
    or exempted with a stated dialect reason (VERDICT r6 task #5)."""
    import re

    from hybrid_cdc_demo_spark.plans import ORACLE_SQL

    ns_oracles = {n for n in ORACLE_SQL if not re.match(r"^(q|s)\d", n)}
    covered = (
        set(NS_ORACLE_ROUNDTRIP)
        | set(NS_SPARK_DIALECT_EQUIVALENTS)
        | set(NS_SQL_SURFACE_EXEMPT)
    )
    assert ns_oracles <= covered, sorted(ns_oracles - covered)
    stale = covered - ns_oracles
    assert not stale, f"ns surface entries without an oracle: {sorted(stale)}"
    overlap = (
        set(NS_ORACLE_ROUNDTRIP) & set(NS_SPARK_DIALECT_EQUIVALENTS)
    ) | (set(NS_ORACLE_ROUNDTRIP) & set(NS_SQL_SURFACE_EXEMPT)) | (
        set(NS_SPARK_DIALECT_EQUIVALENTS) & set(NS_SQL_SURFACE_EXEMPT)
    )
    assert not overlap, sorted(overlap)


_SIG_OPS = None


def _plan_signature(df):
    """Operator multiset of the executed plan: join algorithms,
    exchanges by kind, windows, aggregates, sorts, generates."""
    import re
    from collections import Counter

    global _SIG_OPS
    if _SIG_OPS is None:
        _SIG_OPS = re.compile(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
            r"|BroadcastNestedLoopJoin|CartesianProduct|BroadcastExchange"
            r"|Exchange hashpartitioning|Exchange rangepartitioning"
            r"|Exchange SinglePartition|WindowGroupLimit|Window|Sort"
            r"|TakeOrderedAndProject|Generate|Expand|HashAggregate"
            r"|ObjectHashAggregate|SortAggregate)\b"
        )
    plan = df._jdf.queryExecution().executedPlan().toString()
    return Counter(_SIG_OPS.findall(plan))


@pytest.mark.parametrize(
    "name",
    sorted(
        (
            set(ORACLE_ROUNDTRIP)
            | set(SPARK_DIALECT_EQUIVALENTS)
            | set(NS_ORACLE_ROUNDTRIP)
            | set(NS_SPARK_DIALECT_EQUIVALENTS)
        )
        - set(PLAN_SIG_EXEMPT)
        - set(NS_PLAN_SIG_EXEMPT)
    ),
)
def test_sql_and_builder_plan_same_operators(engine, spark, name):
    """The SQL text and the DataFrame builder must compile to the same
    physical operator multiset — covers the join/window/set-op classes
    (q06-q11, q13-q15, q17, q61, q73), the ns_ surface, and everything
    else non-exempt."""
    from hybrid_cdc_demo_spark.plans import ORACLE_SQL

    text = (
        SPARK_DIALECT_EQUIVALENTS.get(name)
        or NS_SPARK_DIALECT_EQUIVALENTS.get(name)
        or ORACLE_SQL[name]
    )
    assert _plan_signature(engine.sql(text)) == _plan_signature(
        QUERIES[name](spark, SF)
    )


def test_ns_plan_sig_exempt_entries_really_differ(engine, spark):
    """Exemptions must stay honest: every NS_PLAN_SIG_EXEMPT pair must
    actually produce a DIFFERENT operator multiset (a pair converging
    should graduate into the pinned set, not rot in the exemption
    list), and every exempt name must be a covered pair."""
    from hybrid_cdc_demo_spark.plans import ORACLE_SQL

    covered = set(NS_ORACLE_ROUNDTRIP) | set(NS_SPARK_DIALECT_EQUIVALENTS)
    assert set(NS_PLAN_SIG_EXEMPT) <= covered, sorted(
        set(NS_PLAN_SIG_EXEMPT) - covered
    )
    converged = []
    for name in sorted(NS_PLAN_SIG_EXEMPT):
        text = NS_SPARK_DIALECT_EQUIVALENTS.get(name) or ORACLE_SQL[name]
        if _plan_signature(engine.sql(text)) == _plan_signature(
            QUERIES[name](spark, SF)
        ):
            converged.append(name)
    assert not converged, f"now plan-identical, unexempt: {converged}"
