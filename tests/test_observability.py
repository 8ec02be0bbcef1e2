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
