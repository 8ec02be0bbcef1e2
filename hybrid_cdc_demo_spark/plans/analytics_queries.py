"""Product-analytics north-star queries over the event stream —
ordered funnel conversion and weekly cohort retention, both
HASH-VERIFIED against DuckDB.

Determinism: stage/cohort membership is decided by exact µs-NTZ
timestamp comparisons and exact long counts; every rate is a single
int/int IEEE division. Week binning is floor(day-offset / 7) integer
arithmetic — never date_trunc('week') (ISO week-start semantics
differ across engines/locales).
"""

from __future__ import annotations

from hybrid_cdc_demo_spark.operators.analytics import (
    cohort_retention,
    funnel_conversion,
)
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table

FUNNEL_STAGES = ["view", "click", "purchase"]


@query(
    "ns_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), c AS (
      SELECT CAST(1 AS INT) AS stage_idx, 'view' AS stage,
             CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
      UNION ALL
      SELECT CAST(2 AS INT), 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
      UNION ALL
      SELECT CAST(3 AS INT), 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    )
    SELECT stage_idx, stage, n_users,
           CASE WHEN lag(n_users) OVER w > 0
                THEN CAST(n_users AS DOUBLE)
                     / CAST(lag(n_users) OVER w AS DOUBLE) END
             AS conv_from_prev,
           CASE WHEN first_value(n_users) OVER w > 0
                THEN CAST(n_users AS DOUBLE)
                     / CAST(first_value(n_users) OVER w AS DOUBLE) END
             AS conv_from_first
    FROM c
    WINDOW w AS (ORDER BY stage_idx)
    ORDER BY stage_idx
    """,
)
def ns_funnel_conversion(spark, sf_dir):
    """Ordered first-touch funnel view -> click -> purchase,
    HASH-VERIFIED: each stage is a partial-aggregated MIN(ts) per user
    gated on being STRICTLY AFTER the user's previous-stage time — one
    keyed aggregation + one user-keyed equi-join per stage, all on the
    same user_id key, nothing wider than |users| ever shuffles. The
    rate window runs over |stages| rows only."""
    events = load_table(spark, sf_dir, "events")
    return funnel_conversion(events, FUNNEL_STAGES).orderBy("stage_idx")


@query(
    "ns_cohort_retention",
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS d FROM events
    ), f AS (
      SELECT user_id, MIN(d) AS d0 FROM d GROUP BY user_id
    ), coh AS (
      SELECT user_id, d0,
             CAST(FLOOR(CAST(datediff('day', DATE '2024-01-01', d0) AS DOUBLE)
                        / 7.0) AS BIGINT) AS cohort_week
      FROM f
    ), sizes AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM coh GROUP BY cohort_week
    ), act AS (
      SELECT DISTINCT d.user_id, c.cohort_week,
             CAST(FLOOR(CAST(datediff('day', c.d0, d.d) AS DOUBLE)
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
)
def ns_cohort_retention(spark, sf_dir):
    """Weekly cohort retention triangle, HASH-VERIFIED: the event
    stream collapses to DISTINCT (user, cohort, week-offset) activity
    (partial-aggregated), cohort assignment is a user-keyed equi-join
    of each user's first-seen week, and the output is |cohorts| x
    |offsets| cells independent of event volume; cohort sizes ride in
    as a broadcast. Week indexes are floor(day-offset/7) integer
    arithmetic on DATEs, immune to engine week-start semantics."""
    events = load_table(spark, sf_dir, "events")
    return cohort_retention(events).orderBy("cohort_week", "week_offset")


@query(
    "ns_rfm_segments",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE event_type = 'purchase'
    ), mx AS (
      SELECT MAX(CAST(ts AS DATE)) AS mxd FROM events
    ), u AS (
      SELECT user_id,
             CAST(datediff('day', MAX(d), (SELECT mxd FROM mx)) AS BIGINT)
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
)
def ns_rfm_segments(spark, sf_dir):
    """RFM quartile segmentation of purchasing users, HASH-VERIFIED:
    recency/frequency/monetary per user (monetary in exact DECIMAL),
    quartiles from ONE global_rank pass over a slim 3-rows-per-user
    metric union (per-metric rank = pos - metric*n) — the distributed
    total-order primitive (range exchange + partition offsets + Arrow
    enumeration), standing in for the oracle's one-task row_number
    windows. Quartile = 1 + floor(4*(rank-1)/n), n broadcast."""
    from hybrid_cdc_demo_spark.operators.analytics import rfm_segments

    events = load_table(spark, sf_dir, "events")
    return rfm_segments(events).orderBy("user_id")


@query(
    "ns_event_paths",
    oracle="""
    WITH paths AS (
      SELECT user_id,
             array_to_string(
               list(event_type ORDER BY ts, event_id)[1:3], '>') AS path
      FROM events GROUP BY user_id
    ), c AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM paths GROUP BY path
    )
    SELECT CAST(row_number() OVER w AS INT) AS rank, path, n_users
    FROM c
    WINDOW w AS (ORDER BY n_users DESC, path)
    QUALIFY row_number() OVER w <= 20
    ORDER BY rank
    """,
)
def ns_event_paths(spark, sf_dir):
    """Top-20 first-three-event paths across users, HASH-VERIFIED —
    the clickstream path-analysis query. The per-user rank window
    prunes to 3 rows per user map-side (WindowGroupLimit) before any
    aggregation; the path string builds with a bounded sorted fold;
    top-k is TakeOrderedAndProject. (ts, event_id) gives a total
    order, so paths are deterministic."""
    from hybrid_cdc_demo_spark.operators.analytics import top_event_paths

    events = load_table(spark, sf_dir, "events")
    return top_event_paths(events, steps=3, topk=20).orderBy("rank")


@query(
    "ns_daily_anomaly",
    oracle="""
    WITH d AS (
      SELECT event_type AS etype,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
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
)
def ns_daily_anomaly(spark, sf_dir):
    """Per-type daily-volume z-scores with |z|>2 anomaly flags,
    HASH-VERIFIED: events collapse to (type, day) counts (output
    cardinality |types| x |days| regardless of volume); per-type
    mean/sample-variance come from exact BIGINT sums of counts and
    squared counts, broadcast back into the z projection. Every
    float op is a correctly-rounded double over identical trees."""
    from hybrid_cdc_demo_spark.operators.analytics import daily_anomalies

    events = load_table(spark, sf_dir, "events")
    return daily_anomalies(events).orderBy("etype", "day")


@query(
    "ns_markov_transitions",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_etype
      FROM events
    ), c AS (
      SELECT from_etype, event_type AS to_etype,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM o WHERE from_etype IS NOT NULL
      GROUP BY from_etype, event_type
    ), t AS (
      SELECT from_etype, CAST(SUM(n) AS BIGINT) AS row_n
      FROM c GROUP BY from_etype
    )
    SELECT c.from_etype, c.to_etype, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.row_n AS DOUBLE) AS p
    FROM c JOIN t USING (from_etype)
    ORDER BY c.from_etype, c.to_etype
    """,
)
def ns_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix between event types,
    HASH-VERIFIED: one user-keyed lag window emits consecutive-pair
    transitions (per-user state = a single row), counts collapse to
    |types|² cells regardless of event volume, row totals broadcast
    back for the probability division — the next-action behavioral
    model."""
    from hybrid_cdc_demo_spark.operators.analytics import (
        event_transition_matrix,
    )

    events = load_table(spark, sf_dir, "events")
    return event_transition_matrix(events).orderBy("from_etype", "to_etype")


@query(
    "ns_daily_gapfill",
    oracle="""
    WITH d AS (
      SELECT CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day
      FROM events
    ), c AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY day
    ), b AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
    ), spine AS (
      SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b
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
)
def ns_daily_gapfill(spark, sf_dir):
    """Calendar-dense daily counts with zero-filled gaps and a
    trailing 7-row average, HASH-VERIFIED: events collapse to per-day
    counts, the day spine generates from a broadcast 1-row min/max
    frame (sequence+explode — never a driver loop), and the ROWS
    window is a true calendar window BECAUSE the spine is dense. The
    unpartitioned window runs over the calendar-bounded spine
    (thousands of rows for years), never the event stream."""
    from hybrid_cdc_demo_spark.operators.analytics import daily_gapfill

    events = load_table(spark, sf_dir, "events")
    return daily_gapfill(events).orderBy("day")


@query(
    "ns_prequential_anomaly",
    oracle="""
    WITH v AS (
      SELECT event_type AS etype, event_id, ts,
             CAST(value AS DECIMAL(18,6)) AS x
      FROM events
    ), s AS (
      SELECT etype, event_id, CAST(x AS DOUBLE) AS x,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS DOUBLE) AS sx,
             CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx
      FROM v
      WINDOW w AS (PARTITION BY etype ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), z AS (
      SELECT etype, event_id, x,
             CASE WHEN n >= 2
                    AND (sxx - sx * sx / CAST(n AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1.0) > 0.0
                  THEN (x - sx / CAST(n AS DOUBLE))
                       / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1.0))
                  ELSE NULL END AS z
      FROM s
    )
    SELECT etype, event_id, x, z,
           CASE WHEN z IS NULL THEN NULL
                ELSE CAST(abs(z) > 2.0 AS INT) END AS is_anomaly
    FROM z ORDER BY etype, event_id
    """,
)
def ns_prequential_anomaly(spark, sf_dir):
    """Prequential (prior-only) anomaly scores, HASH-VERIFIED: every
    event's value z-scored against the running moments of all EARLIER
    events of its type — the batch contract of the streaming detector
    (streaming/anomaly.py scores each micro-batch against state before
    folding it in; replaying ordered batches equals this query). The
    expanding window accumulates count/sum/sumsq in exact DECIMAL
    (order-free bits), casts once to double, and the z tree is
    identical in both engines. One shuffle on the event-type key;
    per-row state is the expanding frame's 3 accumulators."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    x_dec = F.col("value").cast("decimal(18,6)")
    v = ev.select(
        F.col("event_type").alias("etype"),
        "event_id",
        "ts",
        x_dec.alias("_x"),
    )
    w = (
        Window.partitionBy("etype")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = v.select(
        "etype",
        "event_id",
        F.col("_x").cast("double").alias("x"),
        F.count(F.lit(1)).over(w).cast("long").alias("_n"),
        F.sum("_x").over(w).cast("double").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).over(w).cast("double").alias("_sxx"),
    )
    nd = F.col("_n").cast("double")
    var = (F.col("_sxx") - F.col("_sx") * F.col("_sx") / nd) / (nd - F.lit(1.0))
    z = F.when(
        (F.col("_n") >= 2) & (var > 0.0),
        (F.col("x") - F.col("_sx") / nd) / F.sqrt(var),
    ).otherwise(F.lit(None).cast("double"))
    out = s.select("etype", "event_id", "x", z.alias("z"))
    return out.select(
        "etype",
        "event_id",
        "x",
        "z",
        F.when(
            F.col("z").isNull(), F.lit(None).cast("int")
        ).otherwise((F.abs("z") > 2.0).cast("int")).alias("is_anomaly"),
    ).orderBy("etype", "event_id")


@query(
    "ns_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_eid, ts AS pts, value AS val
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, ts AS tts, event_id AS teid, event_type AS ttype
      FROM events WHERE event_type IN ('view', 'click')
    ), j AS (
      SELECT p.purchase_eid, p.user_id, p.val, t.tts, t.teid, t.ttype
      FROM p LEFT JOIN t ON p.user_id = t.user_id
        AND t.tts <= p.pts AND t.tts > p.pts - INTERVAL 1 DAY
    ), a AS (
      SELECT purchase_eid,
             MIN(user_id) AS user_id,
             CAST(MIN(val) AS DOUBLE) AS value,
             CAST(COUNT(CASE WHEN ttype = 'view' THEN 1 END) AS BIGINT)
               AS n_view,
             CAST(COUNT(CASE WHEN ttype = 'click' THEN 1 END) AS BIGINT)
               AS n_click,
             CAST(COUNT(teid) AS BIGINT) AS n_touches,
             (list(ttype ORDER BY tts DESC, teid DESC)
                FILTER (WHERE teid IS NOT NULL))[1] AS last_touch
      FROM j GROUP BY purchase_eid
    )
    SELECT purchase_eid, user_id, value, n_view, n_click, n_touches,
           CASE WHEN n_touches > 0
                THEN value * CAST(n_view AS DOUBLE)
                     / CAST(n_touches AS DOUBLE)
                ELSE 0.0 END AS credit_view,
           CASE WHEN n_touches > 0
                THEN value * CAST(n_click AS DOUBLE)
                     / CAST(n_touches AS DOUBLE)
                ELSE 0.0 END AS credit_click,
           last_touch
    FROM a ORDER BY purchase_eid
    """,
)
def ns_attribution(spark, sf_dir):
    """Linear + last-touch marketing attribution per purchase,
    HASH-VERIFIED: a user-keyed equi-join with a 1-day range residual
    finds each purchase's preceding touches (output bounded by
    per-user touch density, never cartesian); one partial-aggregated
    pass per purchase yields touch counts, the lexicographic-max
    (ts, id, type) last-touch winner, and linear credits as single
    double expressions — no float is ever summed, so the detail table
    is bitwise-deterministic and roll-ups stay the consumer's choice."""
    from hybrid_cdc_demo_spark.operators.analytics import purchase_attribution

    events = load_table(spark, sf_dir, "events")
    return purchase_attribution(events, window_days=1).orderBy("purchase_eid")


@query(
    "ns_pareto_revenue",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE event_type = 'purchase'
    ), u AS (
      SELECT user_id, SUM(v) AS mon FROM p GROUP BY user_id
    ), t AS (
      SELECT SUM(mon) AS total FROM u
    ), r AS (
      SELECT user_id, mon,
             CAST(row_number() OVER win AS BIGINT) AS rank,
             SUM(mon) OVER (ORDER BY mon DESC, user_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM u WINDOW win AS (ORDER BY mon DESC, user_id)
    )
    SELECT r.rank, r.user_id, CAST(r.mon AS DOUBLE) AS monetary,
           CAST(r.cum AS DOUBLE) AS cum_revenue,
           CAST(r.cum AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share
    FROM r CROSS JOIN t ORDER BY r.rank
    """,
)
def ns_pareto_revenue(spark, sf_dir):
    """Revenue concentration curve (the Pareto 80/20 cut),
    HASH-VERIFIED: users ranked by exact-DECIMAL purchase revenue with
    their running revenue share — rank AND prefix sum come from ONE
    global_rank_cumsum pass (range exchange + ≤P-row control frame +
    Arrow sweep), the scale-safe form of the oracle's unpartitioned
    SUM OVER window (one task in Spark). Cumulative sums fold in
    python Decimal over exact partition subtotals, so every cum_share
    double is bitwise-reproducible."""
    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.operators.partitioning import (
        global_rank_cumsum,
    )

    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("value").cast("decimal(18,6)").alias("_v"))
        .groupBy("user_id")
        .agg(F.sum("_v").alias("_mon"))
    )
    # the grand total rides out of the rank pass's own control frame
    # (exact Decimal fold of the partition subtotals — bit-identical
    # to the oracle's order-free SUM), so the events scan + user
    # aggregation run ONCE instead of twice (r10, guide §1.2)
    ranked = global_rank_cumsum(
        u,
        [F.col("_mon").desc(), F.col("user_id")],
        "_mon",
        rank_col="rank",
        cum_col="_cum",
        total_col="_total",
    )
    return (
        ranked
        .select(
            "rank",
            "user_id",
            F.col("_mon").cast("double").alias("monetary"),
            F.col("_cum").cast("double").alias("cum_revenue"),
            (
                F.col("_cum").cast("double") / F.col("_total").cast("double")
            ).alias("cum_share"),
        )
        .orderBy("rank")
    )


@query(
    "ns_winsorize",
    oracle="""
    WITH n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
    ), r AS (
      SELECT event_id, value,
             row_number() OVER (ORDER BY value, event_id) AS rk
      FROM events
    ), b AS (
      SELECT
        MAX(CASE WHEN rk = GREATEST((n.n * 1 + 99) // 100, 1)
                 THEN value END) AS lo,
        MAX(CASE WHEN rk = GREATEST((n.n * 99 + 99) // 100, 1)
                 THEN value END) AS hi
      FROM r CROSS JOIN n
    )
    SELECT e.event_id, e.value, b.lo AS lo_bound, b.hi AS hi_bound,
           CASE WHEN e.value < b.lo THEN b.lo
                WHEN e.value > b.hi THEN b.hi
                ELSE e.value END AS clipped,
           CAST(e.value < b.lo OR e.value > b.hi AS INT) AS is_clipped
    FROM events e CROSS JOIN b
    ORDER BY e.event_id
    """,
)
def ns_winsorize(spark, sf_dir):
    """Exact p1/p99 winsorization of event values, HASH-VERIFIED: the
    tail boundaries come from TakeOrderedAndProject heaps (the rank-r
    boundary is the lexicographic max of the r smallest rows — r ≪ n
    for tail quantiles, so NO global sort or full ranking shuffle ever
    runs, unlike the oracle's row_number formulation); clipping is a
    map-side CASE over the two broadcast boundary rows. Percentile
    ranks use integer ceiling arithmetic — float ceil(0.01*n) rounds
    differently across engines. Pairs with ns_quantile_sketch: exact
    tails here, approximate mid-distribution there."""
    from hybrid_cdc_demo_spark.operators.quality import winsorize

    events = load_table(spark, sf_dir, "events")
    return winsorize(events, "value", "event_id").orderBy("event_id")


@query(
    "ns_forecast_backtest",
    oracle="""
    WITH c AS (
      SELECT event_type AS etype,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), j AS (
      SELECT a.etype, a.n, b.n AS fc
      FROM c a JOIN c b ON a.etype = b.etype AND b.day = a.day - 7
    )
    SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_eval,
           AVG(CAST(abs(n - fc) AS DOUBLE)) AS mae,
           AVG(CAST(abs(n - fc) AS DOUBLE) / CAST(n AS DOUBLE)) AS mape
    FROM j GROUP BY etype ORDER BY etype
    """,
)
def ns_forecast_backtest(spark, sf_dir):
    """Seasonal-naive (lag-7-days) forecast backtest per event type,
    HASH-VERIFIED: MAE and MAPE of predicting each day's count with
    the count a week earlier — the baseline every capacity forecast
    must beat. The forecast is a self-equi-join on (type, day+7),
    never a row-offset window (lag-7-ROWS diverges from lag-7-DAYS
    whenever a day has zero events of a type); events collapse to
    |types| x |days| cells before any join. MAPE's n > 0 is guaranteed
    (cells exist only where COUNT(*) >= 1), so the division needs no
    ANSI guard."""
    from hybrid_cdc_demo_spark.operators.analytics import (
        seasonal_naive_backtest,
    )

    events = load_table(spark, sf_dir, "events")
    return seasonal_naive_backtest(events, season_days=7).orderBy("etype")
