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
