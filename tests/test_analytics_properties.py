"""Property-based invariants for the analytics tier (hypothesis
generates adversarial event layouts; Spark must agree with the
mathematical contract on every draw)."""

import datetime

from hypothesis import given, settings, strategies as st

event_batches = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=20),  # day
        st.integers(min_value=1, max_value=5),  # user
        st.sampled_from(["view", "click", "purchase"]),
        st.floats(min_value=0.5, max_value=99.5, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, d, i % 24), u, t, round(v, 2))
            for i, (d, u, t, v) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )


@settings(max_examples=5, deadline=None)
@given(event_batches)
def test_funnel_counts_never_increase(spark, rows):
    from hybrid_cdc_demo_spark.operators.analytics import funnel_conversion

    out = funnel_conversion(_df(spark, rows), ["view", "click", "purchase"])
    ns = [r["n_users"] for r in out.orderBy("stage_idx").collect()]
    assert ns == sorted(ns, reverse=True)
    n_users = len({u for _, u, _, _ in rows})
    assert ns[0] <= n_users


@settings(max_examples=5, deadline=None)
@given(event_batches)
def test_gapfill_spine_is_dense_and_sums_preserve(spark, rows):
    from hybrid_cdc_demo_spark.operators.analytics import daily_gapfill

    got = daily_gapfill(_df(spark, rows)).orderBy("day").collect()
    days = [r["day"] for r in got]
    assert days == list(range(days[0], days[-1] + 1))  # no holes
    assert sum(r["n_events"] for r in got) == len(rows)  # counts conserved
    assert all((r["n_events"] == 0) == (r["is_gap"] == 1) for r in got)


@settings(max_examples=5, deadline=None)
@given(event_batches)
def test_transition_rows_normalize_and_conserve(spark, rows):
    from collections import defaultdict

    from hybrid_cdc_demo_spark.operators.analytics import (
        event_transition_matrix,
    )

    got = event_transition_matrix(_df(spark, rows)).collect()
    by_user = defaultdict(int)
    for _, u, _, _ in rows:
        by_user[u] += 1
    expected_transitions = sum(n - 1 for n in by_user.values())
    assert sum(r["n"] for r in got) == expected_transitions
    sums = defaultdict(float)
    for r in got:
        sums[r["from_etype"]] += r["p"]
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


@settings(max_examples=5, deadline=None)
@given(event_batches)
def test_winsorize_is_idempotent_and_bounded(spark, rows):
    from hybrid_cdc_demo_spark.operators.quality import winsorize

    df = _df(spark, rows)
    got = winsorize(df, "value", "event_id").collect()
    lo, hi = got[0]["lo_bound"], got[0]["hi_bound"]
    assert all(lo <= r["clipped"] <= hi for r in got)
    # clipping again with the same boundaries changes nothing
    assert all(
        r["clipped"] == min(max(r["clipped"], lo), hi) for r in got
    )
    # boundary values come FROM the data
    vals = {r["value"] for r in got}
    assert lo in vals and hi in vals


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.decimals(
                min_value="0.01", max_value="999.99", places=2
            ),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=9),
)
def test_prefix_sum_equals_serial_fold(spark, rows, parts):
    import decimal

    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.operators.partitioning import (
        global_rank_cumsum,
    )

    df = spark.createDataFrame(
        [(i, str(v)) for i, v in rows], ["i", "v_str"]
    ).select("i", F.col("v_str").cast("decimal(18,6)").alias("v"))
    out = global_rank_cumsum(df, ["v", "i"], "v", partitions=parts).collect()
    run = decimal.Decimal(0)
    expect = {}
    for pos, (i, v) in enumerate(
        sorted(rows, key=lambda t: (t[1], t[0])), start=1
    ):
        run += v
        expect[i] = (pos, run)
    got = {r["i"]: (r["pos"], decimal.Decimal(r["cum"])) for r in out}
    assert got == expect
