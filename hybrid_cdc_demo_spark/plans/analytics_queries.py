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
           CAST(n_users AS DOUBLE)
             / CAST(lag(n_users) OVER w AS DOUBLE) AS conv_from_prev,
           CAST(n_users AS DOUBLE)
             / CAST(first_value(n_users) OVER w AS DOUBLE) AS conv_from_first
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
