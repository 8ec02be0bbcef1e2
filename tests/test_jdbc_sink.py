"""JDBC sink: SQL generation (O17/O21/O22/O25) + the transactional
write path, exercised for real against sqlite (whose ON CONFLICT
grammar matches Postgres)."""

import json
import sqlite3

import pytest

from hybrid_cdc_demo_spark.schema.evolution import TableSchema, UnsupportedTypeError
from hybrid_cdc_demo_spark.sources.cdc import ENVELOPE_SCHEMA
from hybrid_cdc_demo_spark.streaming.jdbc import (
    OFFSET_TABLE_DDL,
    JdbcUpsertSink,
    create_table_ddl,
    delete_sql,
    offset_upsert_sql,
    upsert_sql,
)

def _make_factory(db_path):
    """Connection factory as a closure — cloudpickle ships it by VALUE
    to executors (test modules aren't importable on workers)."""

    def factory():
        conn = sqlite3.connect(db_path, timeout=30)
        conn.execute("PRAGMA busy_timeout = 30000")
        return conn

    return factory


def users_schema():
    return TableSchema(
        "ecommerce",
        "users",
        {
            "user_id": "uuid",
            "email": "text",
            "age": "int",
            "balance": "decimal",
            "created_at": "timestamp",
            "tags": "set<text>",
        },
        ["user_id"],
    )


def test_ddl_generation_postgres_and_clickhouse():
    pg = create_table_ddl(users_schema(), "postgres")
    assert "user_id uuid" in pg
    assert "age integer" in pg
    assert "balance numeric" in pg
    assert "created_at timestamptz" in pg
    assert "tags jsonb" in pg  # complex type serializes at the edge
    assert "PRIMARY KEY (user_id)" in pg

    ch = create_table_ddl(users_schema(), "clickhouse")
    assert "age Int32" in ch and "balance Decimal(18,2)" in ch
    assert "ReplacingMergeTree" in ch and "ORDER BY (user_id)" in ch

    with pytest.raises(UnsupportedTypeError):  # → DLQ route (O17)
        create_table_ddl(
            TableSchema("k", "t", {"a": "frozen<list<int>>"}, []), "postgres"
        )


def test_sql_shapes():
    up = upsert_sql("users", ["user_id", "email", "age"], ["user_id"])
    assert "ON CONFLICT (user_id) DO UPDATE SET" in up
    assert "email = excluded.email" in up and "user_id = excluded" not in up
    assert delete_sql("users", ["user_id"]) == "DELETE FROM users WHERE user_id = ?"
    off = offset_upsert_sql()
    assert "cdc_offsets" in off and "batch_id = excluded.batch_id" in off


def _envelope_df(spark, rows):
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA).selectExpr(
        "event_type",
        "timestamp_micros",
        "get_json_object(columns, '$.user_id') AS user_id",
        "get_json_object(columns, '$.email') AS email",
        "coalesce(element_at(partition_key, 'user_id'), "
        "get_json_object(columns, '$.user_id')) AS user_id_key",
    ).selectExpr(
        "event_type",
        "timestamp_micros",
        "coalesce(user_id, user_id_key) AS user_id",
        "email",
    )


def _rows():
    def env(i, etype, uid, email=None, ts=0):
        return {
            "event_id": f"e{i}",
            "event_type": etype,
            "table_name": "users",
            "keyspace": "ecommerce",
            "partition_key": {"user_id": uid},
            "clustering_key": {},
            "columns": json.dumps({"user_id": uid, "email": email})
            if etype != "DELETE"
            else "{}",
            "timestamp_micros": ts,
            "ttl_seconds": None,
            "captured_at": None,
        }

    return [
        env(0, "INSERT", "u1", "a@x.io", 100),
        env(1, "UPDATE", "u1", "b@x.io", 200),
        env(2, "INSERT", "u2", "c@x.io", 300),
        env(3, "DELETE", "u2", ts=400),
    ]


@pytest.mark.parametrize("scope", ["partition", "driver"])
def test_write_batch_upsert_delete_exactly_once(spark, tmp_path, scope):
    _factory = _make_factory(str(tmp_path / f"wh-{scope}.db"))
    conn = _factory()
    conn.execute("CREATE TABLE users (user_id text PRIMARY KEY, email text)")
    conn.execute(OFFSET_TABLE_DDL)
    conn.commit()
    conn.close()

    sink = JdbcUpsertSink(
        _factory, "users", ["user_id", "email"], ["user_id"], txn_scope=scope
    )
    df = _envelope_df(spark, _rows()).coalesce(1)
    n = sink.write_batch(df, batch_id=1)
    assert n > 0

    conn = _factory()
    rows = dict(conn.execute("SELECT user_id, email FROM users").fetchall())
    # u1 upserted to the later email; u2 inserted then deleted
    assert rows == {"u1": "b@x.io"}
    off = conn.execute(
        "SELECT batch_id, last_event_timestamp_micros FROM cdc_offsets"
    ).fetchone()
    assert off[0] == 1 and off[1] == 400

    # replay of the same batch_id is a no-op (exactly-once guard)
    assert sink.write_batch(df, batch_id=1) == 0
    # data unchanged
    rows2 = dict(conn.execute("SELECT user_id, email FROM users").fetchall())
    assert rows2 == rows
    conn.close()


def test_partition_scope_is_idempotent_on_replay_before_offset(spark, tmp_path):
    """Crash window: data committed, offset not yet — replaying the
    batch must converge to the same state (upserts idempotent)."""
    _factory = _make_factory(str(tmp_path / "wh-crash.db"))
    conn = _factory()
    conn.execute("CREATE TABLE users (user_id text PRIMARY KEY, email text)")
    conn.execute(OFFSET_TABLE_DDL)
    conn.commit()
    conn.close()

    sink = JdbcUpsertSink(_factory, "users", ["user_id", "email"], ["user_id"])
    df = _envelope_df(spark, _rows()).coalesce(1)
    # simulate the crash: apply data but skip the offset commit
    orig = sink._commit_offset
    sink._commit_offset = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
    with pytest.raises(RuntimeError):
        sink.write_batch(df, batch_id=1)
    sink._commit_offset = orig
    # replay: full batch applies again (no offset row yet) → same state
    assert sink.write_batch(df, batch_id=1) > 0
    conn = _factory()
    assert dict(conn.execute("SELECT user_id, email FROM users").fetchall()) == {
        "u1": "b@x.io"
    }
    conn.close()


def test_dialect_golden_sql():
    """Per-engine golden statements (VERDICT r3 #5): Postgres keeps the
    reference ON CONFLICT grammar with format placeholders
    (postgres.py:124-132); ClickHouse gets plain INSERT (no upsert —
    ReplacingMergeTree dedups, clickhouse.py:121-136), mutation-style
    DELETE, and a non-transactional offset INSERT (clickhouse.py:147+).
    sqlite stays qmark and is the engine the suite executes against."""
    cols, keys = ["user_id", "email", "age"], ["user_id"]

    pg = upsert_sql("users", cols, keys, "postgres")
    assert pg == (
        "INSERT INTO users (user_id, email, age) VALUES (%s, %s, %s) "
        "ON CONFLICT (user_id) DO UPDATE SET "
        "email = excluded.email, age = excluded.age"
    )
    assert delete_sql("users", keys, "postgres") == (
        "DELETE FROM users WHERE user_id = %s"
    )
    assert upsert_sql("users", cols, keys, "timescaledb").startswith(
        "INSERT INTO users"
    ) and "ON CONFLICT" in upsert_sql("users", cols, keys, "timescaledb")

    # clickhouse-driver's DB-API cursor is PYFORMAT with dict params —
    # positional %s raises 'Parameters are expected in dict form'
    ch = upsert_sql("users", cols, keys, "clickhouse")
    assert ch == (
        "INSERT INTO users (user_id, email, age) "
        "VALUES (%(user_id)s, %(email)s, %(age)s)"
    )
    assert "ON CONFLICT" not in ch
    assert delete_sql("users", keys, "clickhouse") == (
        "ALTER TABLE users DELETE WHERE user_id = %(user_id)s"
    )
    ch_off = offset_upsert_sql(dialect="clickhouse")
    assert ch_off.startswith("INSERT INTO cdc_offsets")
    assert "ON CONFLICT" not in ch_off and "%(batch_id)s" in ch_off
    # and the param shaper pairs dict rows with those placeholders
    from hybrid_cdc_demo_spark.streaming.jdbc import bind_params

    assert bind_params("clickhouse", ["a", "b"], (1, 2)) == {"a": 1, "b": 2}
    assert bind_params("postgres", ["a", "b"], (1, 2)) == (1, 2)

    sq = upsert_sql("users", cols, keys, "sqlite")
    assert "VALUES (?, ?, ?)" in sq and "ON CONFLICT (user_id)" in sq
    # unchanged default → round-3 golden text still holds
    assert sq == upsert_sql("users", cols, keys)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        upsert_sql("users", cols, keys, "oracle23ai")


def test_postgres_dialect_statements_execute_via_paramstyle_shim(tmp_path):
    """The %s-placeholder Postgres statements are executable SQL: run
    them through sqlite behind a qmark shim (grammar is shared; only
    the paramstyle differs) — an engine check, not just string
    equality."""
    import sqlite3

    conn = sqlite3.connect(str(tmp_path / "pgshim.db"))
    conn.execute("CREATE TABLE users (user_id text PRIMARY KEY, email text)")
    up = upsert_sql("users", ["user_id", "email"], ["user_id"], "postgres")
    dl = delete_sql("users", ["user_id"], "postgres")
    conn.execute(up.replace("%s", "?"), ("u1", "a@x.io"))
    conn.execute(up.replace("%s", "?"), ("u1", "b@x.io"))
    assert conn.execute("SELECT email FROM users").fetchall() == [("b@x.io",)]
    conn.execute(dl.replace("%s", "?"), ("u1",))
    assert conn.execute("SELECT count(*) FROM users").fetchone()[0] == 0
    conn.close()
