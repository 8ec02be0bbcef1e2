"""Chaos-style failure isolation (reference
tests/chaos/test_slow_destination.py:15-81 and
test_database_restart.py scenarios): one failing destination never
blocks the others, failed events land in that destination's DLQ, and
a recovered destination catches up on the next run."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.schema.evolution import SchemaRegistry, TableSchema
from hybrid_cdc_demo_spark.sources.cdc import generate_change_events
from hybrid_cdc_demo_spark.streaming.pipeline import CDCPipeline, PipelineConfig
from hybrid_cdc_demo_spark.streaming.retry import RetryPolicy


def _pipeline(spark, tmp_path):
    reg = SchemaRegistry()
    reg.register(
        TableSchema(
            "ecommerce",
            "users",
            {"user_id": "uuid", "email": "text", "phone": "text",
             "first_name": "text", "last_name": "text", "age": "int",
             "city": "text", "created_at": "timestamp"},
            ["user_id"],
        )
    )
    cfg = PipelineConfig(
        source_dir=str(tmp_path / "commitlog"),
        target_dir=str(tmp_path / "warehouse"),
        # fast-fail retry so the test doesn't sleep through backoff
        retry=RetryPolicy(max_attempts=2, base_delay_seconds=0.01),
    )
    return CDCPipeline(spark, cfg, reg)


class _Down(Exception):
    pass


def test_one_failing_sink_is_isolated(spark, tmp_path):
    generate_change_events(
        str(tmp_path / "commitlog"), n_events=300, n_files=2, seed=21
    )
    p = _pipeline(spark, tmp_path)

    def broken(batch, batch_id):
        raise _Down("connection refused")  # classified retryable

    p.sinks["clickhouse"].write_batch = broken
    p.run_available()

    # healthy sinks committed every batch
    assert len(p.sinks["postgres"].ledger.committed_batches()) == 2
    assert len(p.sinks["timescaledb"].ledger.committed_batches()) == 2
    assert p.sinks["postgres"].read().count() > 0
    # broken sink committed nothing, errors counted
    assert p.sinks["clickhouse"].ledger.committed_batches() == []
    assert p.sink_errors["clickhouse"] == 2
    # its events are in the DLQ under that destination
    dlq = spark.read.json(p.config.dlq_path)
    ch_dlq = dlq.filter(F.col("destination") == "clickhouse")
    assert ch_dlq.count() > 0
    # retryable errors exhaust the policy first (O29), then route
    assert ch_dlq.filter(F.col("error_type") == "RetryExhausted").count() > 0


def test_recovered_sink_catches_up_after_restart(spark, tmp_path):
    """Restart-after-outage (test_database_restart.py scenario): the
    checkpoint prevents healthy-sink reprocessing, and new data after
    recovery reaches the recovered sink."""
    generate_change_events(
        str(tmp_path / "commitlog"), n_events=200, n_files=1, seed=22
    )
    p = _pipeline(spark, tmp_path)
    orig = p.sinks["clickhouse"].write_batch
    p.sinks["clickhouse"].write_batch = lambda b, i: (_ for _ in ()).throw(
        _Down("connection refused")
    )
    p.run_available()
    pg_batches = len(p.sinks["postgres"].ledger.committed_batches())
    assert p.sinks["clickhouse"].ledger.committed_batches() == []

    # destination recovers; a new wave arrives
    generate_change_events(
        str(tmp_path / "commitlog"), n_events=100, n_files=1, seed=23,
        base_micros=1_900_000_000_000_000, file_prefix="wave2",
    )
    p2 = _pipeline(spark, tmp_path)
    p2.run_available()
    # healthy sink only processed the NEW batch (checkpoint held)
    assert len(p2.sinks["postgres"].ledger.committed_batches()) == pg_batches + 1
    # recovered sink received the new wave
    assert len(p2.sinks["clickhouse"].ledger.committed_batches()) == 1
    assert p2.sinks["clickhouse"].read_raw().count() > 0


def test_alter_type_mid_stream_widening_vs_narrowing(spark, tmp_path):
    """Reference test_alter_type.py scenario (VERDICT r3 #10), e2e on a
    LIVE continuously-triggered stream: an int→bigint widening ALTER
    lands mid-stream and replication continues with NO restart and NO
    DLQ (the reference needed a supervised restart; here the payload
    stays JSON, so only the registry version moves and the cached plan
    expressions rebind) — while a narrowing ALTER (numeric column
    arriving as text) diverts that batch to the DLQ and leaves the
    registry and sinks untouched."""
    import json as _json
    import time as _time

    from hybrid_cdc_demo_spark.schema.evolution import TableSchema, typed_view

    src = tmp_path / "commitlog"
    src.mkdir()

    def envelope(i, uid, columns, ts):
        return {
            "event_id": f"e{i}",
            "event_type": "INSERT",
            "table_name": "users",
            "keyspace": "ecommerce",
            "partition_key": {"user_id": uid},
            "clustering_key": {},
            "columns": _json.dumps(columns),
            "timestamp_micros": ts,
            "ttl_seconds": None,
            "captured_at": "2024-01-01T00:00:00Z",
        }

    def drop_wave(name, rows):
        seg = src / f"{name}.json"
        tmp = src / f".{name}.tmp"
        with tmp.open("w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        tmp.rename(seg)  # atomic appearance for the file source

    def committed():
        return len(p.sinks["postgres"].ledger.committed_batches())

    def wait(cond, timeout=45):
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            if cond():
                return True
            _time.sleep(0.3)
        return False

    drop_wave("wave1", [envelope(0, "u1", {"user_id": "u1", "age": 30}, 1_000)])
    p = _pipeline(spark, tmp_path)
    p.config.processing_interval = "200 milliseconds"
    q = p.start()
    try:
        assert wait(lambda: committed() >= 1)
        run_id = q.runId

        # the widening ALTER arrives (source DDL feed): int → bigint is
        # in the compatible set, registry moves, expressions rebind —
        # the streaming query itself is NOT restarted
        cur = p.registry.latest("ecommerce", "users")
        widened = TableSchema(
            "ecommerce", "users",
            {**cur.columns, "age": "bigint"},
            list(cur.partition_keys), list(cur.clustering_keys),
        )
        assert cur.is_compatible_with(widened)
        p.registry.register(widened)
        p.refresh_plan_expressions()

        drop_wave(
            "wave2",
            [envelope(1, "u2", {"user_id": "u2", "age": 3_000_000_000}, 2_000)],
        )
        assert wait(lambda: committed() >= 2)

        # no restart, no DLQ for the widening case
        assert q.isActive and q.runId == run_id
        assert not (tmp_path / "warehouse" / "dlq").exists() or (
            spark.read.json(p.config.dlq_path).count() == 0
        )
        # the wide value replicated and types cleanly under v2
        pg = p.sinks["postgres"].read().filter(F.col("columns").contains("u2"))
        tv = typed_view(pg, p.registry.latest("ecommerce", "users"))
        row = tv.select("age", "type_mismatches").collect()[0]
        assert row["age"] == 3_000_000_000 and row["type_mismatches"] == []

        # narrowing ALTER: age arrives as text → incompatible → the
        # batch diverts to the DLQ; registry and sinks untouched
        v_before = p.registry.latest("ecommerce", "users").version
        drop_wave(
            "wave3", [envelope(2, "u3", {"user_id": "u3", "age": "thirty"}, 3_000)]
        )
        def dlq_has_incompatible():
            if not (tmp_path / "warehouse" / "dlq").exists():
                return False
            try:
                return (
                    spark.read.json(p.config.dlq_path)
                    .filter(F.col("error_type") == "schema_incompatible")
                    .count()
                    > 0
                )
            except Exception:  # noqa: BLE001 — polling race: the DLQ
                # writer creates the directory before its data files
                # commit; read.json on the skeleton raises
                # UNABLE_TO_INFER_SCHEMA — not-ready, not a failure
                return False

        assert wait(dlq_has_incompatible)
        assert p.registry.latest("ecommerce", "users").version == v_before
        assert (
            p.sinks["postgres"].read().filter(F.col("columns").contains("u3")).count()
            == 0
        )
        assert any(e["action"] == "incompatible" for e in p.evolution.audit)
    finally:
        p.stop(q)
