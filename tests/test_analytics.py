"""Funnel / cohort-retention operator semantics on hand-built event
fixtures (oracle parity runs in the parametrized sweep)."""

import datetime

import pytest

from hybrid_cdc_demo_spark.operators.analytics import (
    cohort_retention,
    funnel_conversion,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, d, h), u, t, 0.0)
            for i, (d, h, u, t) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )


class TestFunnel:
    def test_strict_ordering_enforced(self, spark):
        rows = [
            # user 1: view -> click -> purchase (full funnel)
            (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
            # user 2: click BEFORE view -> must stop at view
            (2, 1, 2, "click"), (2, 2, 2, "view"),
            # user 3: view -> purchase (skips click) -> stops at view
            (3, 1, 3, "view"), (3, 2, 3, "purchase"),
            # user 4: view -> click, no purchase
            (4, 1, 4, "view"), (4, 2, 4, "click"),
            # user 5: purchase only -> not even stage 1
            (5, 1, 5, "purchase"),
        ]
        got = {
            r["stage"]: r
            for r in funnel_conversion(
                _events(spark, rows), ["view", "click", "purchase"]
            ).collect()
        }
        assert got["view"]["n_users"] == 4
        assert got["click"]["n_users"] == 2  # users 1 and 4
        assert got["purchase"]["n_users"] == 1  # user 1 only
        assert got["view"]["conv_from_prev"] is None
        assert got["click"]["conv_from_prev"] == pytest.approx(0.5)
        assert got["purchase"]["conv_from_first"] == pytest.approx(0.25)

    def test_same_timestamp_does_not_advance(self, spark):
        # click at the SAME instant as the view is not strictly after
        rows = [(1, 1, 1, "view"), (1, 1, 1, "click")]
        got = {
            r["stage"]: r["n_users"]
            for r in funnel_conversion(
                _events(spark, rows), ["view", "click"]
            ).collect()
        }
        assert got == {"view": 1, "click": 0}


class TestCohortRetention:
    def test_triangle_counts(self, spark):
        rows = [
            # user 1 first seen week 0 (Jan 1), active weeks 0 and 1
            (1, 1, 1, "view"), (2, 1, 1, "view"), (9, 1, 1, "click"),
            # user 2 first seen week 0, active week 0 only
            (3, 1, 2, "view"),
            # user 3 first seen week 1 (Jan 8), active weeks 1(=offset 0), 2
            (8, 1, 3, "view"), (16, 1, 3, "purchase"),
        ]
        got = {
            (r["cohort_week"], r["week_offset"]): (
                r["n_active"],
                r["cohort_size"],
                r["retention"],
            )
            for r in cohort_retention(_events(spark, rows)).collect()
        }
        assert got[(0, 0)] == (2, 2, 1.0)
        assert got[(0, 1)] == (1, 2, 0.5)
        assert got[(1, 0)] == (1, 1, 1.0)
        assert got[(1, 1)] == (1, 1, 1.0)
        assert set(got) == {(0, 0), (0, 1), (1, 0), (1, 1)}

    def test_offset_zero_is_full_cohort(self, spark):
        rows = [(d, 1, u, "view") for u in (1, 2, 3) for d in (2, 5, 9)]
        got = cohort_retention(_events(spark, rows)).collect()
        zero = [r for r in got if r["week_offset"] == 0]
        assert all(r["retention"] == 1.0 for r in zero)


class TestRFM:
    def test_quartiles_and_segments(self, spark):
        # 4 purchasing users with strictly ordered R, F, M profiles:
        # user u purchases u times on day u, 10*u value each
        data = []
        eid = 0
        for u in (1, 2, 3, 4):
            for _ in range(u):
                data.append(
                    (eid, datetime.datetime(2024, 1, u), u, "purchase", 10.0 * u)
                )
                eid += 1
        data.append((eid, datetime.datetime(2024, 1, 8), 9, "view", 0.0))
        ev = spark.createDataFrame(
            data, ["event_id", "ts", "user_id", "event_type", "value"]
        )
        from hybrid_cdc_demo_spark.operators.analytics import rfm_segments

        got = {r["user_id"]: r for r in rfm_segments(ev).collect()}
        assert set(got) == {1, 2, 3, 4}
        # recency: later purchase day = lower recency = better r_q
        assert got[4]["recency_days"] < got[1]["recency_days"]
        assert got[4]["r_q"] == 1 and got[1]["r_q"] == 4
        # frequency: user 4 has most purchases
        assert got[4]["frequency"] == 4 and got[4]["f_q"] == 1
        assert got[1]["f_q"] == 4
        assert got[4]["segment"] == "111"
        assert got[1]["segment"] == "444"

    def test_each_quartile_gets_n_over_4_users(self, spark):
        rows = [(d, 1, u, "purchase") for u in range(1, 9) for d in (u,)]
        from hybrid_cdc_demo_spark.operators.analytics import rfm_segments

        got = rfm_segments(_events(spark, rows)).collect()
        from collections import Counter

        rq = Counter(r["r_q"] for r in got)
        assert rq == {1: 2, 2: 2, 3: 2, 4: 2}


class TestEventPaths:
    def test_paths_and_ordering(self, spark):
        rows = [
            (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
            (1, 4, 1, "error"),  # 4th event ignored (steps=3)
            (2, 1, 2, "view"), (2, 2, 2, "click"), (2, 3, 2, "purchase"),
            (3, 1, 3, "view"), (3, 2, 3, "error"),
        ]
        from hybrid_cdc_demo_spark.operators.analytics import top_event_paths

        got = top_event_paths(_events(spark, rows), steps=3, topk=5).collect()
        assert (got[0]["path"], got[0]["n_users"]) == ("view>click>purchase", 2)
        assert (got[1]["path"], got[1]["n_users"]) == ("view>error", 1)
        assert [r["rank"] for r in got] == [1, 2]


class TestDailyAnomaly:
    def test_spike_is_flagged(self, spark):
        rows = []
        # 10 steady days of 5 views, one day with 50
        for d in range(1, 11):
            for _ in range(5 if d != 6 else 50):
                rows.append((d, 1, 1, "view"))
        from hybrid_cdc_demo_spark.operators.analytics import daily_anomalies

        got = {r["day"]: r for r in daily_anomalies(_events(spark, rows)).collect()}
        spike_day = got[max(got, key=lambda d: got[d]["n"])]
        assert spike_day["n"] == 50 and spike_day["is_anomaly"] == 1
        normal = [r for r in got.values() if r["n"] == 5]
        assert all(r["is_anomaly"] == 0 for r in normal)
        assert spike_day["z"] > 2.0 and all(r["z"] < 0 for r in normal)


class TestTransitions:
    def test_probabilities_row_normalize(self, spark):
        rows = [
            (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "view"),
            (1, 4, 1, "click"), (1, 5, 1, "purchase"),
            (2, 1, 2, "view"), (2, 2, 2, "view"),
        ]
        from hybrid_cdc_demo_spark.operators.analytics import (
            event_transition_matrix,
        )

        got = {
            (r["from_etype"], r["to_etype"]): (r["n"], r["p"])
            for r in event_transition_matrix(_events(spark, rows)).collect()
        }
        # view -> click twice, view -> view once
        assert got[("view", "click")] == (2, pytest.approx(2 / 3))
        assert got[("view", "view")] == (1, pytest.approx(1 / 3))
        assert got[("click", "view")][0] == 1
        assert got[("click", "purchase")][0] == 1
        # no cross-user transition (user 1 last event -> user 2 first)
        assert ("purchase", "view") not in got

    def test_row_sums_to_one(self, spark):
        rows = [(d, h, u, t) for u in (1, 2) for d, h, t in
                [(1, 1, "view"), (1, 2, "click"), (2, 1, "error"), (2, 2, "view")]]
        from collections import defaultdict

        from hybrid_cdc_demo_spark.operators.analytics import (
            event_transition_matrix,
        )

        sums = defaultdict(float)
        for r in event_transition_matrix(_events(spark, rows)).collect():
            sums[r["from_etype"]] += r["p"]
        assert all(abs(s - 1.0) < 1e-12 for s in sums.values())


class TestGapfill:
    def test_gaps_zero_filled_and_flagged(self, spark):
        rows = [(1, 1, 1, "view"), (1, 2, 1, "view"), (4, 1, 1, "view")]
        from hybrid_cdc_demo_spark.operators.analytics import daily_gapfill

        got = {r["day"]: r for r in daily_gapfill(_events(spark, rows)).collect()}
        days = sorted(got)
        assert days == [days[0], days[0] + 1, days[0] + 2, days[0] + 3]
        assert got[days[0]]["n_events"] == 2 and got[days[0]]["is_gap"] == 0
        assert got[days[1]]["n_events"] == 0 and got[days[1]]["is_gap"] == 1
        assert got[days[2]]["n_events"] == 0
        assert got[days[3]]["n_events"] == 1
        # trailing average over the DENSE spine: day 3's 4-row window
        assert got[days[3]]["avg_7d"] == pytest.approx(3 / 4)


class TestAttribution:
    def test_linear_and_last_touch(self, spark):
        rows = [
            # user 1: 2 views + 1 click in the day before purchase
            (1, 1, 1, "view"), (1, 2, 1, "view"), (1, 3, 1, "click"),
            (1, 4, 1, "purchase"),
            # user 2: touch OUTSIDE the 1-day window, then purchase
            (1, 1, 2, "view"), (3, 2, 2, "purchase"),
            # user 3: purchase with no touches at all
            (2, 1, 3, "purchase"),
        ]
        ev = spark.createDataFrame(
            [
                (i, datetime.datetime(2024, 1, d, h), u, t, 8.0)
                for i, (d, h, u, t) in enumerate(rows)
            ],
            ["event_id", "ts", "user_id", "event_type", "value"],
        )
        from hybrid_cdc_demo_spark.operators.analytics import (
            purchase_attribution,
        )

        got = {
            r["user_id"]: r
            for r in purchase_attribution(ev, window_days=1).collect()
        }
        u1 = got[1]
        assert (u1["n_view"], u1["n_click"], u1["n_touches"]) == (2, 1, 3)
        assert u1["credit_view"] == pytest.approx(8.0 * 2 / 3)
        assert u1["credit_click"] == pytest.approx(8.0 / 3)
        assert u1["last_touch"] == "click"
        u2 = got[2]  # the view 2 days earlier is out of window
        assert u2["n_touches"] == 0 and u2["last_touch"] is None
        assert u2["credit_view"] == 0.0
        u3 = got[3]
        assert u3["n_touches"] == 0

    def test_last_touch_tiebreak_on_event_id(self, spark):
        # two touches at the SAME timestamp: higher event_id wins
        ev = spark.createDataFrame(
            [
                (1, datetime.datetime(2024, 1, 1, 1), 1, "view", 0.0),
                (2, datetime.datetime(2024, 1, 1, 1), 1, "click", 0.0),
                (3, datetime.datetime(2024, 1, 1, 2), 1, "purchase", 4.0),
            ],
            ["event_id", "ts", "user_id", "event_type", "value"],
        )
        from hybrid_cdc_demo_spark.operators.analytics import (
            purchase_attribution,
        )

        (row,) = purchase_attribution(ev, window_days=1).collect()
        assert row["last_touch"] == "click"


class TestForecastBacktest:
    def test_perfect_weekly_period_has_zero_error(self, spark):
        import datetime

        from hybrid_cdc_demo_spark.operators.analytics import (
            seasonal_naive_backtest,
        )

        rows = []
        eid = 0
        # day d gets (d % 7) + 1 events -> exact weekly period
        for d in range(1, 22):
            for _ in range((d % 7) + 1):
                rows.append((eid, datetime.datetime(2024, 1, d), 1, "view", 0.0))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value"]
        )
        got = seasonal_naive_backtest(ev).collect()
        assert len(got) == 1
        r = got[0]
        assert r["n_eval"] == 14  # days 8..21 have a lag-7 partner
        assert r["mae"] == 0.0 and r["mape"] == 0.0

    def test_known_error_and_missing_day_semantics(self, spark):
        import datetime

        from hybrid_cdc_demo_spark.operators.analytics import (
            seasonal_naive_backtest,
        )

        rows = []
        eid = 0
        # day 1: 2 events; day 8: 3 events; day 9 skipped entirely;
        # day 15: 1 event (its lag-7 partner day 8 has 3)
        for d, cnt in [(1, 2), (8, 3), (15, 1)]:
            for _ in range(cnt):
                rows.append((eid, datetime.datetime(2024, 1, d), 1, "view", 0.0))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value"]
        )
        r = seasonal_naive_backtest(ev).collect()[0]
        # day 8 vs day 1: |3-2|=1; day 15 vs day 8: |1-3|=2 — a row-lag
        # implementation would wrongly pair day 15 with day 1 here
        assert r["n_eval"] == 2
        assert r["mae"] == 1.5
        assert r["mape"] == (1.0 / 3.0 + 2.0 / 1.0) / 2.0
