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
    reuse: bool = True,
) -> list[DataFrame]:
    """Per-stage (user, first-qualifying-timestamp) frames for an
    ORDERED funnel: a user qualifies for stage i+1 only with an event
    STRICTLY AFTER their stage-i qualifying time (the classic
    first-touch funnel, not a bag-of-events intersection).

    ``reuse=False`` skips the stage-frame checkpoints below (plan
    tests assert the partial-aggregation property on the raw
    lineage; production callers keep the default)."""
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
        if not reuse:
            frames.append(cur)
            prev = cur
            continue
        # Each stage frame has TWO consumers (the next stage's
        # strictly-after join and the caller's count), and stage i's
        # plan nests every earlier stage — without reuse the events
        # scan + stage aggregations re-run once per consumer (the
        # funnel plan read 12 parquet scans for 3 stages, r11). The
        # frames are user-keyed aggregates (bounded by |users|, never
        # event volume), so a lazy localCheckpoint materializes each
        # once; the first consumer's aggregation rides the
        # materialization (the r10 BPE/MMR lazy-checkpoint pattern).
        cur = cur.localCheckpoint(eager=False)
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
    prev, head = F.lag("n_users").over(w), F.first("n_users").over(w)
    # guards: an empty stage makes the NEXT rate undefined (NULL), and
    # Spark 4's ANSI mode raises DIVIDE_BY_ZERO even for doubles — the
    # When predicate short-circuits so the division never evaluates
    return counts.select(
        "stage_idx",
        "stage",
        "n_users",
        F.when(prev > 0, n / prev.cast("double")).alias("conv_from_prev"),
        F.when(head > 0, n / head.cast("double")).alias("conv_from_first"),
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
    cohorts = first.select(
        user_col, "_d0", week0.alias("cohort_week")
    # two consumers (the sizes aggregation and the activity join) each
    # nested the events scan + the per-user MIN aggregation — the
    # user-sized cohort frame materializes once instead (r11, the
    # funnel/triangles pattern; events now scans twice, not three
    # times: once under this checkpoint, once for the activity side)
    ).localCheckpoint(eager=False)
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


def rfm_segments(
    events: DataFrame,
    *,
    purchase_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation of
    purchasing users — the classic customer-value cut.

    Scale shape: events reduce to one row per purchasing user (keyed
    partial aggregation, localCheckpoint'ed once); the three quartile
    ranks come from ONE :func:`global_rank` pass — the distributed
    total-order primitive (range-exchange + partition offsets), never
    Spark's one-task unpartitioned ntile window — over a slim
    3-rows-per-user union keyed (metric, sort_key, user). Because
    every user contributes exactly one row per metric, the per-metric
    rank is ``global_pos - metric_idx * n`` — no second pass. (Round 4
    ran three CHAINED global_rank passes here: ~9 scheduled jobs over
    the user frame; the union form is one exchange + one control-frame
    collect, ~2× fewer jobs and one barrier instead of three.)
    Quartile = 1 + floor(4 * (rank-1) / n) with n a driver literal
    (checkpointed user frame, one cached count — r10) — exact
    integer semantics, identical in the oracle's row_number form.

    Determinism: recency is day arithmetic on the NTZ date, monetary
    accumulates in DECIMAL(18,6) (exact, order-free) and casts to
    double once for output; descending metrics sort by their exact
    DECIMAL negation (never a double cast — two monetary totals a ULP
    apart must not tie); ranks carry a user_id tiebreak.
    """
    from hybrid_cdc_demo_spark.operators.partitioning import global_rank

    # ONE events pass (r10, guide §1.2): the anchor date (max event
    # date over ALL events, purchases or not) used to cost its own
    # corpus scan + crossJoin. Instead the single user-keyed
    # aggregation carries a per-user any-event max date alongside the
    # purchase-conditional metrics; the anchor is then the max of the
    # per-user maxes — one job over the already-checkpointed user
    # frame, folded in as a driver literal. Purchase metrics are
    # when()-conditional aggregates over the same rows: COUNT of
    # non-null = count of purchases, DECIMAL SUM skips the NULLs
    # exactly, so every number matches the old filtered-first form
    # (oracle hash re-proven).
    d = F.to_date(ts_col)
    is_p = F.col(type_col) == purchase_type
    u0 = (
        events.groupBy(user_col)
        .agg(
            F.max(d).alias("_umax"),
            F.max(F.when(is_p, d)).alias("_last"),
            F.count(F.when(is_p, F.lit(1))).cast("long").alias("frequency"),
            F.sum(
                F.when(is_p, F.col(value_col).cast("decimal(18,6)"))
            ).alias("_mon"),
        )
        .localCheckpoint(eager=True)  # every later leg reads this
    )
    mxd = u0.agg(F.max("_umax").alias("_mxd")).collect()[0]["_mxd"]
    u = u0.filter(F.col("frequency") > 0).select(
        user_col,
        F.datediff(F.lit(mxd).cast("date"), F.col("_last")).cast("long").alias(
            "recency_days"
        ),
        "frequency",
        "_mon",
    )
    _KEY = "decimal(28,6)"
    legs = [
        F.col("recency_days").cast(_KEY),  # ascending
        (-F.col("frequency")).cast(_KEY),  # descending via negation
        (-F.col("_mon")).cast(_KEY),  # exact decimal negation
    ]
    stacked = None
    for i, key in enumerate(legs):
        leg = u.select(
            F.lit(i).alias("_m"), key.alias("_k"), F.col(user_col)
        )
        stacked = leg if stacked is None else stacked.unionAll(leg)
    pos = global_rank(
        stacked, [F.col("_m"), F.col("_k"), F.col(user_col)], "_pos"
    )
    # n is a driver literal: the user frame is checkpointed, so the
    # count is one cached-read job and the two broadcast builds the
    # old 1-row crossJoins paid disappear from the plan (r10)
    n_users = u.count()
    _n = F.lit(n_users).cast("long")
    # per-metric rank from the single total order: each metric owns a
    # contiguous n-row band, so rank = pos - m*n; pivot back to one
    # row per user (user-keyed shuffle, same key as everything above).
    ranks = (
        pos.select(
            user_col,
            "_m",
            (F.col("_pos") - F.col("_m") * _n).alias("_r"),
        )
        .groupBy(user_col)
        .agg(
            F.max(F.when(F.col("_m") == 0, F.col("_r"))).alias("_pr"),
            F.max(F.when(F.col("_m") == 1, F.col("_r"))).alias("_pf"),
            F.max(F.when(F.col("_m") == 2, F.col("_r"))).alias("_pm"),
        )
    )
    ranked = u.join(ranks, user_col)

    def q(pos: str) -> F.Column:
        return (
            F.lit(1)
            + F.floor(
                F.lit(4.0)
                * (F.col(pos) - 1).cast("double")
                / _n.cast("double")
            )
        ).cast("int")

    return ranked.select(
        user_col,
        "recency_days",
        "frequency",
        F.col("_mon").cast("double").alias("monetary"),
        q("_pr").alias("r_q"),
        q("_pf").alias("f_q"),
        q("_pm").alias("m_q"),
        F.concat(
            q("_pr").cast("string"), q("_pf").cast("string"), q("_pm").cast("string")
        ).alias("segment"),
    )


def top_event_paths(
    events: DataFrame,
    *,
    steps: int = 3,
    topk: int = 20,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common first-``steps`` event-type paths across users (the
    clickstream path-analysis shape): each user's first events in time
    order join into a '>'-separated path string, counted across users,
    top-k reported.

    Scale shape: the per-user window prunes to ``steps`` rows per user
    BEFORE any aggregation (WindowGroupLimit pre-reduces map-side);
    the path build is a bounded sorted fold per user; the final top-k
    is TakeOrderedAndProject. Ties order by (ts, event_id) — a total
    order, so paths are deterministic."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    firstn = (
        events.select(
            user_col,
            F.col(type_col),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") <= steps)
    )
    paths = firstn.groupBy(user_col).agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("_rn").alias("r"), F.col(type_col).alias("t"))
                    )
                ),
                lambda s: s.getField("t"),
            ),
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_users")
    )
    top = counts.orderBy(F.desc("n_users"), F.col("path")).limit(topk)
    wr = Window.orderBy(F.desc("n_users"), F.col("path"))
    return top.select(
        F.row_number().over(wr).cast("int").alias("rank"), "path", "n_users"
    )


def daily_anomalies(
    events: DataFrame,
    *,
    z_threshold: float = 2.0,
    anchor: str = "2024-01-01",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-event-type daily-volume z-scores with anomaly flags — the
    monitoring query behind every "traffic looks weird today" alert.

    Scale shape: events collapse to (type, day) counts first (keyed
    partial aggregation — output is |types| x |days| regardless of
    volume); per-type mean/variance come from exact BIGINT sums of
    counts and squared counts (one more tiny aggregation), broadcast
    back into the z projection.

    Determinism: all sums are exact longs; mean, sample variance
    ((Σx² - (Σx)²/n) / (n-1)), sqrt and the z division are
    correctly-rounded doubles over identical expression trees."""
    d = events.select(
        F.col(type_col).alias("etype"),
        F.datediff(F.to_date(ts_col), F.lit(anchor).cast("date"))
        .cast("long")
        .alias("day"),
    )
    counts = d.groupBy("etype", "day").agg(
        F.count("*").cast("long").alias("n")
    )
    stats = counts.groupBy("etype").agg(
        F.count("*").cast("long").alias("_days"),
        F.sum("n").cast("long").alias("_sx"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("_sxx"),
    )
    nd = F.col("_days").cast("double")
    mean = F.col("_sx").cast("double") / nd
    var = (
        F.col("_sxx").cast("double")
        - F.col("_sx").cast("double") * F.col("_sx").cast("double") / nd
    ) / (nd - F.lit(1.0))
    # the days>=2 conjunct short-circuits, so neither the (n-1) sample
    # divisor nor sqrt(0) ever divides under ANSI; constant-volume or
    # single-day types report NULL z (no baseline to deviate from)
    z = F.when(
        (F.col("_days") >= 2) & (var > 0.0),
        (F.col("n").cast("double") - mean) / F.sqrt(var),
    )
    return counts.join(F.broadcast(stats), "etype").select(
        "etype",
        "day",
        "n",
        z.alias("z"),
        (F.abs(z) > F.lit(z_threshold)).cast("int").alias("is_anomaly"),
    )


def event_transition_matrix(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix between event types: for
    every consecutive pair in each user's (ts, event_id)-ordered
    stream, count (from, to) and report the row-normalized transition
    probability — the behavioral model behind next-action prediction
    and session simulation.

    Scale shape: ONE user-keyed window (lag) emits the transition
    pairs — per-user state is a single row, the shuffle is the same
    user_id key everything else uses; counts collapse to |types|²
    cells regardless of volume, and row sums ride back in as a
    broadcast. p = n/row_n is one int/int division (hash-exact)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.lag(type_col).over(w).alias("from_etype"),
            F.col(type_col).alias("to_etype"),
        )
        .filter(F.col("from_etype").isNotNull())
    )
    counts = pairs.groupBy("from_etype", "to_etype").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = counts.groupBy("from_etype").agg(
        F.sum("n").cast("long").alias("_row_n")
    )
    return counts.join(F.broadcast(totals), "from_etype").select(
        "from_etype",
        "to_etype",
        "n",
        (F.col("n").cast("double") / F.col("_row_n").cast("double")).alias("p"),
    )


def daily_gapfill(
    events: DataFrame,
    *,
    anchor: str = "2024-01-01",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Calendar-dense daily event counts: a generated day spine from
    the corpus min to max day, zero-filled where no events landed,
    with a trailing ``window_days`` ROWS average that is only correct
    BECAUSE the spine is dense (a RANGE frame over sparse days sees
    gaps; a ROWS frame over the dense spine is a true calendar
    window) — the densification step every time-series chart needs.

    Scale shape: events collapse to per-day counts first (keyed
    partial aggregation, |days| rows out); the spine generates from a
    broadcast 1-row min/max frame — sequence+explode, never a driver
    loop. The trailing window is unpartitioned but runs over the
    CALENDAR-bounded spine (thousands of rows for years of data), not
    the event stream — document-scale never touches it."""
    d = events.select(
        F.datediff(F.to_date(ts_col), F.lit(anchor).cast("date"))
        .cast("long")
        .alias("day")
    )
    counts = d.groupBy("day").agg(F.count("*").cast("long").alias("n"))
    bounds = d.agg(F.min("day").alias("_lo"), F.max("day").alias("_hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("day")
    )
    filled = (
        spine.join(counts, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_events"),
            F.col("n").isNull().cast("int").alias("is_gap"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-(window_days - 1), Window.currentRow)
    return filled.select(
        "day",
        "n_events",
        "is_gap",
        (
            F.sum("n_events").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias(f"avg_{window_days}d"),
    )


def purchase_attribution(
    events: DataFrame,
    *,
    window_days: int = 1,
    touch_types: Sequence[str] = ("view", "click"),
    purchase_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Marketing attribution per purchase: linear credit split across
    the user's touches (views/clicks) in the ``window_days`` before
    the purchase, plus the last-touch winner — the two standard
    attribution models, emitted as one detail row per purchase so no
    order-dependent double sum ever happens (roll-ups are the
    consumer's choice of exact-decimal aggregation).

    Scale shape: the touch lookup is a user-keyed equi-join with a
    range residual (t_ts in (p_ts - window, p_ts]) — output bounded by
    per-user touch density x purchases, never a cartesian; the
    per-purchase aggregation is partial-aggregated on the purchase
    id. Last touch = lexicographic MAX of (ts, event_id, type) — a
    total order, so ties are impossible.

    Determinism: counts are exact longs; each credit is one
    double-multiply-divide over identical trees; no float ever sums.
    """
    p = events.filter(F.col(type_col) == purchase_type).select(
        F.col(user_col),
        F.col(id_col).alias("purchase_eid"),
        F.col(ts_col).alias("_pts"),
        F.col(value_col).alias("_val"),
    )
    t = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col),
        F.col(ts_col).alias("_tts"),
        F.col(id_col).alias("_teid"),
        F.col(type_col).alias("_ttype"),
    )
    j = p.join(
        t,
        [
            p[user_col] == t[user_col],
            F.col("_tts") <= F.col("_pts"),
            F.col("_tts") > F.col("_pts") - F.expr(f"INTERVAL {window_days} DAY"),
        ],
        "left",
    )
    agg = j.groupBy("purchase_eid").agg(
        # user/value are group constants; MIN is order-free in every
        # engine (first() is arrival-order-dependent)
        F.min(p[user_col]).alias("user_id"),
        F.min("_val").cast("double").alias("value"),
        *[
            F.count(F.when(F.col("_ttype") == tt, 1)).cast("long").alias(f"n_{tt}")
            for tt in touch_types
        ],
        F.count("_teid").cast("long").alias("n_touches"),
        F.max(
            F.struct(
                F.col("_tts").alias("ts"),
                F.col("_teid").alias("eid"),
                F.col("_ttype").alias("t"),
            )
        ).getField("t").alias("last_touch"),
    )
    nt = F.col("n_touches").cast("double")
    credit_cols = [
        F.when(
            F.col("n_touches") > 0,
            F.col("value") * F.col(f"n_{tt}").cast("double") / nt,
        )
        .otherwise(F.lit(0.0))
        .alias(f"credit_{tt}")
        for tt in touch_types
    ]
    return agg.select(
        "purchase_eid",
        "user_id",
        "value",
        *[f"n_{tt}" for tt in touch_types],
        "n_touches",
        *credit_cols,
        "last_touch",
    )


def transcript_assembly(
    events: DataFrame,
    *,
    max_turns: int = 8,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user ordered transcript assembly with a turn cap — the
    stage that turns an event/message log into bounded training
    dialogues (one capped, time-ordered sequence per user).

    Scale shape: the rank window prunes to ``max_turns`` rows per user
    MAP-SIDE (WindowGroupLimit — crucially the output deliberately
    carries no whole-history aggregate like a total event count, which
    would force every row through the window); the transcript is a
    bounded sorted fold per user; one user-keyed shuffle end to end.
    (ts, event_id) is a total order, so transcripts are deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    firstn = events.select(
        user_col,
        F.col(type_col),
        F.row_number().over(w).alias("_rn"),
    ).filter(F.col("_rn") <= max_turns)
    return firstn.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("_rn").alias("r"),
                            F.col(type_col).alias("t"),
                        )
                    )
                ),
                lambda s: s.getField("t"),
            ),
        ).alias("transcript"),
    )


def seasonal_naive_backtest(
    events: DataFrame,
    *,
    season_days: int = 7,
    anchor: str = "2024-01-01",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each (type, day)'s
    event count with the count ``season_days`` earlier and report MAE
    and MAPE per type — the baseline every capacity-planning forecast
    must beat, evaluated the way production backtests run (walk
    forward over history; here the lag-7 naive needs no fitting).

    Scale shape: events collapse to |types| x |days| daily counts
    (partial-aggregated); the forecast is a self-equi-join on
    (type, day + season) — never a row-offset window, whose lag-k-ROWS
    silently diverges from lag-k-DAYS when a (type, day) cell is empty
    — and the errors reduce to one row per type. Day indexes are
    anchor-offset integer arithmetic, engine-neutral.
    """
    d = events.select(
        F.col(type_col).alias("etype"),
        F.datediff(F.to_date(ts_col), F.lit(anchor).cast("date"))
        .cast("long")
        .alias("day"),
    )
    c = d.groupBy("etype", "day").agg(F.count(F.lit(1)).cast("long").alias("n"))
    fc = c.select(
        "etype",
        (F.col("day") + season_days).alias("day"),
        F.col("n").alias("fc"),
    )
    err = F.abs(F.col("n") - F.col("fc")).cast("double")
    return (
        c.join(fc, ["etype", "day"])
        .groupBy("etype")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.avg(err).alias("mae"),
            F.avg(err / F.col("n").cast("double")).alias("mape"),
        )
    )
