"""Round-2 hardening regressions.

Each test pins one fix:

* JDBC apply order: latest-per-key collapse before upsert/delete so a
  DELETE→re-INSERT batch converges to the re-INSERT (reference
  latest-wins replay guarantee, src/sinks/postgres.py:93-132).
* Offset clock monotonicity at the SQL layer (src/cdc/offset.py:76-83).
* O6 keyspace/table scoping (src/cdc/reader.py:186-188).
* Ledger manifest compaction — bounded file count, exact records
  (src/cdc/offset.py cleanup_old_offsets semantics).
* Tombstones survive compaction (no resurrection by stale events).
* Empty append log reads as empty, readers tolerate compaction races.
* skew_salted_join rejects right/full outer (replicated-row bug).
* Incompatible-schema batches persist the invalid split to the DLQ
  before the checkpoint advances.
"""

import json
import sqlite3

import pytest
import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.schema.evolution import SchemaRegistry, TableSchema
from hybrid_cdc_demo_spark.sources.cdc import ENVELOPE_SCHEMA
from hybrid_cdc_demo_spark.streaming.jdbc import (
    OFFSET_TABLE_DDL,
    JdbcUpsertSink,
)
from hybrid_cdc_demo_spark.streaming.pipeline import CDCPipeline, PipelineConfig
from hybrid_cdc_demo_spark.streaming.sinks import AppendSink, BatchLedger, UpsertSink


def _make_factory(db_path):
    def factory():
        conn = sqlite3.connect(db_path, timeout=30)
        conn.execute("PRAGMA busy_timeout = 30000")
        return conn

    return factory


def _jdbc_fixture(tmp_path, name):
    factory = _make_factory(str(tmp_path / f"{name}.db"))
    conn = factory()
    conn.execute("CREATE TABLE users (user_id text PRIMARY KEY, email text)")
    conn.execute(OFFSET_TABLE_DDL)
    conn.commit()
    conn.close()
    return factory


def _env_rows(rows):
    """rows: list of (event_id, event_type, uid, email, ts)."""
    out = []
    for eid, etype, uid, email, ts in rows:
        out.append(
            {
                "event_id": eid,
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
        )
    return out


def _jdbc_df(spark, rows):
    return (
        spark.createDataFrame(_env_rows(rows), ENVELOPE_SCHEMA)
        .selectExpr(
            "event_id",
            "event_type",
            "timestamp_micros",
            "element_at(partition_key, 'user_id') AS user_id",
            "get_json_object(columns, '$.email') AS email",
        )
    )


@pytest.mark.parametrize("scope", ["partition", "driver"])
def test_jdbc_delete_then_reinsert_same_key(spark, tmp_path, scope):
    """ADVICE(high): within one batch, DELETE(ts=100) then
    re-INSERT(ts=200) for the same key must leave the key PRESENT —
    pre-fix, upserts ran before deletes and the key vanished."""
    factory = _jdbc_fixture(tmp_path, f"reinsert-{scope}")
    sink = JdbcUpsertSink(
        factory, "users", ["user_id", "email"], ["user_id"], txn_scope=scope
    )
    df = _jdbc_df(
        spark,
        [
            ("e0", "INSERT", "u1", "old@x.io", 50),
            ("e1", "DELETE", "u1", None, 100),
            ("e2", "INSERT", "u1", "new@x.io", 200),
            # and the mirror case: re-insert then delete → absent
            ("e3", "INSERT", "u2", "gone@x.io", 100),
            ("e4", "DELETE", "u2", None, 200),
        ],
    )
    sink.write_batch(df, batch_id=1)
    conn = factory()
    rows = dict(conn.execute("SELECT user_id, email FROM users").fetchall())
    conn.close()
    assert rows == {"u1": "new@x.io"}


@pytest.mark.parametrize("scope", ["partition", "driver"])
def test_jdbc_equal_ts_event_id_tiebreak(spark, tmp_path, scope):
    """Equal timestamps resolve by event_id (reorder safety) — the
    outcome must not depend on row/partition order."""
    factory = _jdbc_fixture(tmp_path, f"tie-{scope}")
    sink = JdbcUpsertSink(
        factory, "users", ["user_id", "email"], ["user_id"], txn_scope=scope
    )
    df = _jdbc_df(
        spark,
        [
            ("e9", "UPDATE", "u1", "winner@x.io", 100),
            ("e1", "UPDATE", "u1", "loser@x.io", 100),
        ],
    ).repartition(4)
    sink.write_batch(df, batch_id=1)
    conn = factory()
    rows = dict(conn.execute("SELECT user_id, email FROM users").fetchall())
    conn.close()
    assert rows == {"u1": "winner@x.io"}


def test_jdbc_offset_timestamp_never_regresses(spark, tmp_path):
    """A later batch carrying older events must not move
    last_event_timestamp_micros backwards (offset.py:76-83)."""
    factory = _jdbc_fixture(tmp_path, "monotone")
    sink = JdbcUpsertSink(factory, "users", ["user_id", "email"], ["user_id"])
    sink.write_batch(
        _jdbc_df(spark, [("e0", "INSERT", "u1", "a@x.io", 400)]), batch_id=1
    )
    # batch 2: an older file surfaced by maxFilesPerTrigger reordering
    sink.write_batch(
        _jdbc_df(spark, [("e1", "INSERT", "u2", "b@x.io", 100)]), batch_id=2
    )
    conn = factory()
    bid, ts = conn.execute(
        "SELECT batch_id, last_event_timestamp_micros FROM cdc_offsets"
    ).fetchone()
    conn.close()
    assert bid == 2
    assert ts == 400  # clock held, not regressed to 100


def test_pipeline_skips_foreign_table_events(spark, tmp_path):
    """O6: a shared commitlog dir carries other tables' events — they
    are counted and skipped, never replicated and never DLQ'd."""
    reg = SchemaRegistry()
    reg.register(TableSchema("ecommerce", "users", {"user_id": "uuid"}, ["user_id"]))
    p = CDCPipeline(
        spark,
        PipelineConfig(
            source_dir=str(tmp_path / "unused"), target_dir=str(tmp_path / "wh")
        ),
        reg,
    )
    rows = _env_rows(
        [
            ("e0", "INSERT", "u1", "a@x.io", 100),
            ("e1", "INSERT", "u2", "b@x.io", 200),
        ]
    )
    foreign = _env_rows([("f0", "INSERT", "o1", None, 300)])
    foreign[0]["table_name"] = "orders"
    other_ks = _env_rows([("f1", "INSERT", "u9", None, 300)])
    other_ks[0]["keyspace"] = "analytics"
    batch = spark.createDataFrame(rows + foreign + other_ks, ENVELOPE_SCHEMA)

    stats = p.process_batch(batch, batch_id=0)
    assert stats["valid"] == 2
    assert stats["foreign_skipped"] == 2
    assert stats["invalid"] == 0
    # replicated state holds exactly the two in-scope keys
    assert p.sinks["postgres"].read().count() == 2
    assert p.sinks["clickhouse"].read().count() == 2


def test_ledger_running_max_and_bounded_files(tmp_path):
    led = BatchLedger(str(tmp_path / "ledger"), compact_every=5)
    seen = []
    for bid in range(17):
        # timestamps wobble downward every third batch
        ts = 1000 + bid * 10 - (25 if bid % 3 == 2 else 0)
        led.commit(bid, {"rows": 1, "last_event_timestamp_micros": ts})
        seen.append(ts)
    batches = led.committed_batches()
    assert [b["batch_id"] for b in batches] == list(range(17))
    recorded = [int(b["last_event_timestamp_micros"]) for b in batches]
    # monotone running max, matching max-so-far of the raw series
    running = []
    for ts in seen:
        running.append(ts if not running else max(ts, running[-1]))
    assert recorded == running
    # file count bounded by compact_every + manifest, not 17
    files = list((tmp_path / "ledger").glob("*.json"))
    assert len(files) <= 6
    # restart: a fresh instance sees the same state
    led2 = BatchLedger(str(tmp_path / "ledger"), compact_every=5)
    assert led2.is_committed(16) and not led2.is_committed(17)
    assert led2.max_timestamp_micros == running[-1]
    assert len(led2.committed_batches()) == 17


def test_upsert_compaction_keeps_tombstones(spark, tmp_path):
    """ADVICE(medium): a stale out-of-order INSERT arriving after
    compaction must not resurrect a deleted key."""

    def env(eid, etype, uid, ts):
        return {
            "key_hash": uid,
            "event_id": eid,
            "event_type": etype,
            "timestamp_micros": ts,
        }

    sink = UpsertSink(spark, str(tmp_path / "pg"), ["key_hash"], compact_every=99)
    df = lambda *rows: spark.createDataFrame(  # noqa: E731
        list(rows),
        "key_hash string, event_id string, event_type string, timestamp_micros long",
    )
    sink.write_batch(df(env("e0", "INSERT", "k1", 200)), 0)
    sink.write_batch(df(env("e1", "DELETE", "k1", 300)), 1)
    sink.compact()
    # the tombstone must still be in the base snapshot
    base = sink.table.read()
    assert base.filter(
        (F.col("key_hash") == "k1") & (F.col("event_type") == "DELETE")
    ).count() == 1
    # stale resurrect attempt: older than the delete
    sink.write_batch(df(env("e2", "INSERT", "k1", 250)), 2)
    assert sink.read().filter(F.col("key_hash") == "k1").count() == 0
    # tombstone GC after the grace period (event-time clock)
    sink.tombstone_grace_micros = 10
    sink.write_batch(df(env("e3", "INSERT", "k2", 5000)), 3)
    sink.compact()
    assert sink.table.read().filter(F.col("event_type") == "DELETE").count() == 0


def test_append_sink_empty_log_reads_empty(spark, tmp_path):
    sink = AppendSink(spark, str(tmp_path / "ch"), ["key_hash"])
    assert sink.read_raw().count() == 0
    assert sink.read().count() == 0


def test_skew_salted_join_rejects_outer(spark):
    from hybrid_cdc_demo_spark.operators.partitioning import skew_salted_join

    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="skew_salted_join"):
            skew_salted_join(a, b, "k", how=how)
    # left is allowed and row-identical to the plain left join
    got = skew_salted_join(a, b, "k", how="left").count()
    assert got == a.join(b, "k", "left").count() == 10


def test_incompatible_schema_persists_invalid_split(spark, tmp_path):
    """ADVICE(medium): the early return on an incompatible schema
    change must still persist the invalid split to the DLQ — the
    checkpoint advances when foreachBatch returns."""
    from hybrid_cdc_demo_spark.streaming.dlq import read_dlq

    reg = SchemaRegistry()
    reg.register(
        TableSchema(
            "ecommerce", "users", {"user_id": "uuid", "age": "bigint"}, ["user_id"]
        )
    )
    p = CDCPipeline(
        spark,
        PipelineConfig(
            source_dir=str(tmp_path / "unused"), target_dir=str(tmp_path / "wh")
        ),
        reg,
    )
    good = _env_rows([("e0", "INSERT", "u1", None, 100)])
    # age as a JSON string → bigint→text narrowing = incompatible
    good[0]["columns"] = json.dumps({"user_id": "u1", "age": "thirty"})
    bad = _env_rows([("e1", "INSERT", "u2", None, 0)])  # timestamp <= 0
    batch = spark.createDataFrame(good + bad, ENVELOPE_SCHEMA)

    stats = p.process_batch(batch, batch_id=0)
    assert stats["schema"] == "incompatible"
    assert stats["invalid"] == 1
    dlq = read_dlq(spark, p.config.dlq_path)
    by_dest = {
        r["destination"]: r["count"]
        for r in dlq.groupBy("destination").count().collect()
    }
    assert by_dest.get("schema") == 1  # the diverted valid split
    assert by_dest.get("validation") == 1  # the persisted invalid split
