"""OTel-compatible tracing (reference src/observability/tracing.py:
17-127): span names/attribute keys, nesting, error status, and the
logging.span bridge — asserted through the in-memory exporter exactly
like the OTel SDK's own test harness."""

import pytest

from hybrid_cdc_demo_spark.observability import tracing
from hybrid_cdc_demo_spark.observability.logging import span as log_span
from hybrid_cdc_demo_spark.observability.tracing import (
    InMemorySpanExporter,
    init_tracing,
    trace_batch_write,
    trace_replication_event,
)


@pytest.fixture()
def mem():
    exporter = InMemorySpanExporter()
    init_tracing("cdc-pipeline", exporters=[exporter])
    yield exporter
    tracing._TRACER = None  # leave tracing un-initialized for other tests


def test_reference_span_names_and_attributes(mem):
    with trace_replication_event("e1", "users", "postgres"):
        pass
    with trace_batch_write(128, "clickhouse"):
        pass
    by_name = {s.name: s for s in mem.spans}
    assert set(by_name) == {"replicate_event", "batch_write"}
    assert by_name["replicate_event"].attributes == {
        "event.id": "e1",
        "table.name": "users",
        "destination": "postgres",
    }
    assert by_name["batch_write"].attributes == {
        "batch.size": 128,
        "destination": "clickhouse",
    }
    assert all(s.status == "OK" and s.duration_ms >= 0 for s in mem.spans)


def test_span_tree_nesting(mem):
    tracer = tracing.get_tracer()
    with tracer.span("process_batch", batch_id=3):
        with trace_batch_write(10, "postgres"):
            pass
        with trace_batch_write(10, "timescaledb"):
            pass
    # children exported first (they finish first), parent last
    assert [s.name for s in mem.spans] == [
        "batch_write",
        "batch_write",
        "process_batch",
    ]
    assert [s.parent for s in mem.spans] == [
        "process_batch",
        "process_batch",
        None,
    ]


def test_error_status_recorded(mem):
    with pytest.raises(ValueError):
        with tracing.get_tracer().span("failing"):
            raise ValueError("boom")
    assert mem.spans[-1].status == "ERROR:ValueError"


def test_logging_span_bridges_into_tracer(mem):
    with log_span("merge_segments", sink="postgres"):
        pass
    assert [s.name for s in mem.spans] == ["merge_segments"]
    assert mem.spans[0].attributes == {"sink": "postgres"}


def test_logging_span_without_tracing_is_silent():
    assert tracing.current_tracer() is None
    with log_span("no_tracer"):
        pass  # must not raise


def test_get_tracer_requires_init():
    assert tracing._TRACER is None
    with pytest.raises(RuntimeError):
        tracing.get_tracer()


def test_init_tracing_use_otel_degrades_without_sdk():
    """use_otel=True must never hard-require the SDK: without
    opentelemetry installed the tracer is the in-process shim and
    spans still flow to the configured exporters."""
    from hybrid_cdc_demo_spark.observability.tracing import (
        InMemorySpanExporter,
        Tracer,
        init_tracing,
    )

    mem = InMemorySpanExporter()
    tracer = init_tracing(exporters=[mem], use_otel=True)
    assert isinstance(tracer, Tracer)  # API stable either way
    with tracer.span("bridge_probe", k="v"):
        pass
    assert [s.name for s in mem.spans] == ["bridge_probe"]


def test_otel_bridge_reemits_spans_through_sdk():
    """Skipif-gated bridge coverage (the protobuf pattern): when the
    real SDK IS importable, finished SpanRecords come out of the OTel
    exporter with name/attributes/status/timestamps intact."""
    import pytest

    pytest.importorskip("opentelemetry.sdk.trace")
    from opentelemetry.sdk.trace.export.in_memory_span_exporter import (
        InMemorySpanExporter as OtelMemoryExporter,
    )

    from hybrid_cdc_demo_spark.observability.tracing import (
        OtelBridgeExporter,
        Tracer,
    )

    sink = OtelMemoryExporter()
    tracer = Tracer("svc", [OtelBridgeExporter("svc", otel_exporter=sink)])
    with tracer.span("outer", table="users"):
        with tracer.span("inner"):
            pass
    names = [s.name for s in sink.get_finished_spans()]
    assert names == ["inner", "outer"]  # finish order
    outer = next(s for s in sink.get_finished_spans() if s.name == "outer")
    assert outer.attributes["table"] == "users"
    assert outer.end_time >= outer.start_time > 0
    inner = next(s for s in sink.get_finished_spans() if s.name == "inner")
    assert inner.attributes["parent.name"] == "outer"
