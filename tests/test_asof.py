"""As-of join: backward/forward matches, ties, no-match nulls, and
single-shuffle plan."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.asof import asof_join


def _frames(spark):
    trades = spark.createDataFrame(
        [
            ("A", 10, "t1"),
            ("A", 25, "t2"),
            ("A", 5, "t0"),
            ("B", 7, "t3"),
            ("B", 3, "t4"),  # before any quote for B except q at 3
        ],
        ["sym", "t_ts", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", 8, 100.0),
            ("A", 10, 101.0),  # tie with trade at 10 → matches
            ("A", 20, 102.0),
            ("B", 5, 50.0),
        ],
        ["sym", "q_ts", "price"],
    )
    return trades, quotes


def test_backward_asof_semantics(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, "sym", "t_ts", "q_ts", ["price"])
    got = {r["trade_id"]: r["price"] for r in out.collect()}
    assert got == {
        "t0": None,     # no quote at or before ts=5 for A
        "t1": 101.0,    # tie: quote at exactly 10 matches
        "t2": 102.0,    # latest quote ≤ 25 is the one at 20
        "t3": 50.0,     # B's quote at 5 ≤ 7
        "t4": None,     # ts=3 precedes B's only quote
    }
    assert out.count() == trades.count()  # left join: every trade kept


def test_forward_asof_semantics(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, "sym", "t_ts", "q_ts", ["price"], direction="forward"
    )
    got = {r["trade_id"]: r["price"] for r in out.collect()}
    assert got == {
        "t0": 100.0,   # earliest quote ≥ 5 is at 8
        "t1": 101.0,   # tie matches
        "t2": None,    # nothing at or after 25
        "t3": None,    # nothing at or after 7 for B
        "t4": 50.0,
    }


def test_asof_join_is_single_shuffle(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, "sym", "t_ts", "q_ts", ["price"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one Exchange: the window's hash partitioning on the key
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # no join operator at all — union trick


def test_asof_matches_duckdb_asof(spark):
    """Differential check vs DuckDB's native ASOF LEFT JOIN on the
    events table (latest prior UPDATE value per user)."""
    import duckdb

    from hybrid_cdc_demo_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events")
    left = ev.select("user_id", "event_id", "ts")
    right = ev.filter(F.col("event_type") == "UPDATE").select(
        "user_id", F.col("ts").alias("u_ts"), F.col("value").alias("u_value")
    )
    mine = asof_join(left, right, "user_id", "ts", "u_ts", ["u_value"])
    got = {
        r["event_id"]: (None if r["u_value"] is None else round(r["u_value"], 6))
        for r in mine.collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle_rows = con.execute(
        """
        SELECT a.event_id, b.value AS u_value
        FROM (SELECT user_id, event_id, ts FROM events) a
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'UPDATE') b
          ON a.user_id = b.user_id AND a.ts >= b.ts
        """
    ).fetchall()
    want = {
        eid: (None if v is None else round(v, 6)) for eid, v in oracle_rows
    }
    assert got == want
