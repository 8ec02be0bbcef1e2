"""Structured logging (O36): JSON shape, masking audit never leaks
values, schema audit events, batch events from the pipeline."""

import json
import logging

import pytest

from hybrid_cdc_demo_spark.observability.logging import (
    JsonFormatter,
    configure_logging,
    get_logger,
    log_batch,
    log_masked_field,
    log_schema_change,
    span,
)


@pytest.fixture()
def captured():
    logger = configure_logging(logging.DEBUG)
    records: list[str] = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(JsonFormatter().format(record))

    h = Capture()
    logger.addHandler(h)
    yield records
    logger.removeHandler(h)


def test_json_shape_and_fields(captured):
    log_batch({"batch_id": 3, "valid": 100, "postgres": 100})
    evt = json.loads(captured[-1])
    assert evt["event"] == "batch_processed"
    assert evt["batch_id"] == 3 and evt["valid"] == 100
    assert {"ts", "level", "logger"} <= set(evt)


def test_masking_audit_never_contains_value(captured):
    secret = "alice@example.com"
    log_masked_field("email", "pii_hash", "users")
    evt = json.loads(captured[-1])
    assert evt["event"] == "field_masked"
    assert evt["field"] == "email" and evt["strategy"] == "pii_hash"
    assert secret not in captured[-1]


def test_schema_audit(captured):
    log_schema_change("ecommerce", "users", "evolved", ["ADD surprise"], 2)
    evt = json.loads(captured[-1])
    assert evt["action"] == "evolved" and evt["version"] == 2


def test_span_logs_duration_and_errors(captured):
    with span("merge", destination="postgres"):
        pass
    evt = json.loads(captured[-1])
    assert evt["span"] == "merge" and evt["duration_ms"] >= 0
    assert evt["error"] is None
    with pytest.raises(ValueError):
        with span("boom"):
            raise ValueError("x")
    evt = json.loads(captured[-1])
    assert evt["error"] == "ValueError"


def test_pipeline_emits_batch_and_audit_events(spark, tmp_path, captured):
    from hybrid_cdc_demo_spark.schema.evolution import SchemaRegistry, TableSchema
    from hybrid_cdc_demo_spark.sources.cdc import generate_change_events
    from hybrid_cdc_demo_spark.streaming.pipeline import CDCPipeline, PipelineConfig

    generate_change_events(str(tmp_path / "log"), n_events=150, n_files=1, seed=3)
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
    p = CDCPipeline(
        spark,
        PipelineConfig(source_dir=str(tmp_path / "log"), target_dir=str(tmp_path / "wh")),
        reg,
    )
    p.run_available()
    events = [json.loads(r) for r in captured]
    kinds = {e["event"] for e in events}
    assert "batch_processed" in kinds
    assert "field_masked" in kinds  # email/phone audited at plan build
    batch_evts = [e for e in events if e["event"] == "batch_processed"]
    assert all("postgres" in e for e in batch_evts)
