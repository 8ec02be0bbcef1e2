"""Product-analytics operators over the event stream: ordered funnel
conversion and cohort retention — the two canonical "sequence of user
behavior" aggregations every event warehouse runs (the reference's
events pipeline feeds exactly this kind of consumer; reference
spec.md's analytics sinks exist to serve these shapes).

Scale design (100 TB posture):

* the funnel is one keyed aggregation per stage, every one of them on
  the SAME key (user_id) — partial-aggregated min() per user, then a
  key-partitioned equi-join against the previous stage's per-user
  timestamps; no window over the raw event stream and nothing wider
  than |users| ever shuffles. The per-stage count rows (one row per
  stage) are the only driver-visible data.
* cohort retention reduces the event stream to DISTINCT (user, week)
  activity first (partial-aggregated), joins each user's first-seen
  week — again the user_id key — and counts per (cohort, offset)
  cell; output is |cohorts| x |offsets| rows, independent of event
  volume.

Determinism (oracle hash-match): timestamps compare exactly (µs NTZ),
stage/cohort counts are exact longs, and every rate is one int/int
IEEE division — bitwise-equal across engines. Week indexes are pure
day-offset integer arithmetic (floor(days/7)), never engine week
semantics (ISO-week/locale traps).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def funnel_stage_users(
    events: DataFrame,
    stages: Sequence[str],
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> list[DataFrame]:
    """Per-stage (user, first-qualifying-timestamp) frames for an
    ORDERED funnel: a user qualifies for stage i+1 only with an event
    STRICTLY AFTER their stage-i qualifying time (the classic
    first-touch funnel, not a bag-of-events intersection)."""
    if not stages:
        raise ValueError("stages must be non-empty")
    frames: list[DataFrame] = []
    prev: DataFrame | None = None
    for st in stages:
        f = events.filter(F.col(type_col) == st)
        if prev is not None:
            f = f.join(
                prev.select(user_col, F.col("t").alias("_prev_t")), user_col
            ).filter(F.col(ts_col) > F.col("_prev_t"))
        cur = f.groupBy(user_col).agg(F.min(ts_col).alias("t"))
        frames.append(cur)
        prev = cur
    return frames


def funnel_conversion(
    events: DataFrame,
    stages: Sequence[str],
    **kwargs,
) -> DataFrame:
    """One row per funnel stage: (stage_idx, stage, n_users,
    conv_from_prev, conv_from_first). The rate window runs over
    |stages| rows only — never the event stream."""
    frames = funnel_stage_users(events, stages, **kwargs)
    counts = None
    for i, (st, fr) in enumerate(zip(stages, frames)):
        row = fr.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i + 1).cast("int").alias("stage_idx"),
            F.lit(st).alias("stage"),
            "n_users",
        )
        counts = row if counts is None else counts.unionAll(row)
    w = Window.orderBy("stage_idx")
    n = F.col("n_users").cast("double")
    return counts.select(
        "stage_idx",
        "stage",
        "n_users",
        (n / F.lag("n_users").over(w).cast("double")).alias("conv_from_prev"),
        (n / F.first("n_users").over(w).cast("double")).alias("conv_from_first"),
    )


def cohort_retention(
    events: DataFrame,
    *,
    anchor: str = "2024-01-01",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by the week of
    their FIRST event (weeks = floor(days since ``anchor`` / 7)), one
    row per (cohort_week, week_offset) with the distinct active users
    and the retention rate against the cohort size.

    Week indexes are day-offset integer arithmetic on DATEs so both
    engines bin identically (date_trunc('week') would drag in ISO
    week-start semantics)."""
    d = events.select(
        F.col(user_col), F.to_date(ts_col).alias("_d")
    )
    first = d.groupBy(user_col).agg(F.min("_d").alias("_d0"))
    week0 = F.floor(
        F.datediff(F.col("_d0"), F.lit(anchor).cast("date")).cast("double") / 7.0
    ).cast("long")
    cohorts = first.select(user_col, "_d0", week0.alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    offset = F.floor(
        F.datediff(F.col("_d"), F.col("_d0")).cast("double") / 7.0
    ).cast("long")
    active = (
        d.join(cohorts, user_col)
        .select(user_col, "cohort_week", offset.alias("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    return active.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double") / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )
