"""Metrics registry, health aggregation, HTTP endpoints."""

import json
import urllib.request

from hybrid_cdc_demo_spark.observability.metrics import (
    HealthState,
    MetricsRegistry,
    probe_sink,
    serve_observability,
)


def test_registry_counters_and_labels():
    reg = MetricsRegistry()
    reg.inc("cdc_events_processed_total", 10, destination="postgres", table="users")
    reg.inc("cdc_events_processed_total", 5, destination="postgres", table="users")
    reg.set_gauge("cdc_replication_lag_seconds", 0.25, destination="postgres")
    snap = reg.snapshot()
    key = 'cdc_events_processed_total{destination="postgres",table="users"}'
    assert snap["counters"][key] == 15
    assert snap["gauges"]['cdc_replication_lag_seconds{destination="postgres"}'] == 0.25
    assert key in reg.render_prometheus()


def test_health_aggregation():
    h = HealthState()
    assert h.status()["status"] == "healthy"  # vacuous
    probe_sink(h, "postgres", lambda: None)
    probe_sink(h, "clickhouse", lambda: (_ for _ in ()).throw(RuntimeError("down")))
    s = h.status()
    assert s["status"] == "unhealthy"
    assert s["checks"]["postgres"]["healthy"]
    assert not s["checks"]["clickhouse"]["healthy"]


def test_http_endpoints():
    reg = MetricsRegistry()
    reg.inc("cdc_errors_total", 2, destination="postgres")
    h = HealthState()
    probe_sink(h, "postgres", lambda: None)
    server = serve_observability(reg, h, port=0)
    try:
        port = server.server_address[1]
        metrics = urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics").read().decode()
        assert "cdc_errors_total" in metrics
        health = json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/health").read()
        )
        assert health["status"] == "healthy"
    finally:
        server.shutdown()


def test_pipeline_emits_error_retry_backlog_metrics(spark, tmp_path):
    """O34 wiring (reference spec.md:68 metrics list): a failing sink
    must feed cdc_errors_total / cdc_retry_attempts_total /
    cdc_backlog_depth with the reference's names+labels, rendered by
    render_prometheus() alongside the processed counter — previously
    the retry/DLQ path only logged."""
    import pyspark.sql.functions as F  # noqa: F401

    from hybrid_cdc_demo_spark.schema.evolution import SchemaRegistry, TableSchema
    from hybrid_cdc_demo_spark.sources.cdc import generate_change_events
    from hybrid_cdc_demo_spark.streaming.pipeline import CDCPipeline, PipelineConfig
    from hybrid_cdc_demo_spark.streaming.retry import RetryPolicy

    reg = SchemaRegistry()
    reg.register(
        TableSchema(
            "ecommerce", "users",
            {"user_id": "uuid", "email": "text", "phone": "text",
             "first_name": "text", "last_name": "text", "age": "int",
             "city": "text", "created_at": "timestamp"},
            ["user_id"],
        )
    )
    generate_change_events(str(tmp_path / "commitlog"), n_events=200, n_files=1, seed=41)
    cfg = PipelineConfig(
        source_dir=str(tmp_path / "commitlog"),
        target_dir=str(tmp_path / "warehouse"),
        retry=RetryPolicy(max_attempts=3, base_delay_seconds=0.01),
    )
    p = CDCPipeline(spark, cfg, reg)

    def broken(batch, batch_id):
        raise RuntimeError("connection refused")  # retryable class

    p.sinks["clickhouse"].write_batch = broken
    p.run_available()

    snap = p.metrics.snapshot()
    c, g = snap["counters"], snap["gauges"]
    err_key = 'cdc_errors_total{destination="clickhouse",error_type="RetryExhausted"}'
    assert c[err_key] == 1
    # max_attempts=3 → 2 re-attempts ticked
    assert c['cdc_retry_attempts_total{destination="clickhouse"}'] == 2
    # failed destination keeps its buffered events as backlog; healthy
    # destinations drain to zero
    assert g['cdc_backlog_depth{destination="clickhouse"}'] > 0
    assert g['cdc_backlog_depth{destination="postgres"}'] == 0
    assert c['cdc_events_processed_total{destination="postgres",table="users"}'] > 0

    rendered = p.metrics.render_prometheus()
    for name in ("cdc_errors_total", "cdc_retry_attempts_total",
                 "cdc_backlog_depth", "cdc_events_processed_total"):
        assert name in rendered
