"""OpenTelemetry-compatible tracing (SURVEY O36 polish; reference
src/observability/tracing.py:17-127 — init_tracing / get_tracer /
trace_replication_event / trace_batch_write over the OTel SDK).

The OTel SDK is not installed in this container, so the default
implementation is a small protocol-compatible tracer: spans carry
name / attributes / parent / duration / status, nest through a
contextvar stack (correct across threads — each foreachBatch worker
thread sees its own stack), and flush to pluggable exporters.
``InMemorySpanExporter`` is the test exporter (the OTel SDK has the
same class for the same purpose); when the real ``opentelemetry``
package IS importable, ``init_tracing(use_otel=True)`` routes the same
span API through it unchanged.

Span names and attribute keys mirror the reference exactly
(tracing.py:93-99 ``replicate_event`` {event.id, table.name,
destination}; tracing.py:119-126 ``batch_write`` {batch.size,
destination}) so dashboards built against the reference's traces read
ours unmodified.
"""

from __future__ import annotations

import contextvars
import logging
import time
from dataclasses import dataclass, field
from typing import Any

_SPAN_STACK: contextvars.ContextVar[tuple] = contextvars.ContextVar(
    "hybrid_cdc_span_stack", default=()
)


@dataclass
class SpanRecord:
    name: str
    attributes: dict[str, Any] = field(default_factory=dict)
    parent: str | None = None
    start_ns: int = 0
    end_ns: int = 0
    status: str = "OK"

    @property
    def duration_ms(self) -> float:
        return (self.end_ns - self.start_ns) / 1e6


class InMemorySpanExporter:
    """Collects finished spans for assertions — the OTel SDK test
    exporter's contract."""

    def __init__(self):
        self.spans: list[SpanRecord] = []

    def export(self, span: SpanRecord) -> None:
        self.spans.append(span)

    def clear(self) -> None:
        self.spans.clear()


class LoggingSpanExporter:
    """Emits each finished span as a structured log event (the
    ConsoleSpanExporter analogue, tracing.py:44-46)."""

    def export(self, span: SpanRecord) -> None:
        from hybrid_cdc_demo_spark.observability.logging import _emit

        _emit(
            "span",
            span=span.name,
            parent=span.parent,
            duration_ms=round(span.duration_ms, 2),
            status=span.status,
            **span.attributes,
        )


class OtelBridgeExporter:
    """Bridges finished :class:`SpanRecord`s into the real
    OpenTelemetry SDK (reference tracing.py:17-54 uses the SDK
    directly): every span our Tracer finishes is re-emitted as an OTel
    span with the same name, attributes, status, and wall-clock
    start/end, through whatever OTel ``SpanExporter`` the deployment
    configures (OTLP, console, ...). Import-gated — constructing it
    without the ``opentelemetry-sdk`` package raises ImportError, and
    :func:`init_tracing` degrades to the in-process shim."""

    def __init__(
        self,
        service_name: str = "cdc-pipeline",
        otel_exporter=None,
        batch: bool = False,
    ):
        from opentelemetry.sdk.resources import SERVICE_NAME, Resource
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import (
            BatchSpanProcessor,
            ConsoleSpanExporter,
            SimpleSpanProcessor,
        )
        from opentelemetry.trace import Status, StatusCode

        self._Status, self._StatusCode = Status, StatusCode
        provider = TracerProvider(
            resource=Resource(attributes={SERVICE_NAME: service_name})
        )
        # batch=True queues spans off the caller's thread (production
        # OTLP); simple is synchronous — right for console/in-memory
        # where tests read spans back immediately
        proc = BatchSpanProcessor if batch else SimpleSpanProcessor
        provider.add_span_processor(
            proc(otel_exporter or ConsoleSpanExporter())
        )
        self._provider = provider
        self._tracer = provider.get_tracer("hybrid_cdc_demo_spark")
        # SpanRecord timestamps are perf_counter_ns (monotonic); OTel
        # wants epoch ns — fix one offset at construction
        self._epoch_offset = time.time_ns() - time.perf_counter_ns()

    def export(self, span: SpanRecord) -> None:
        otel_span = self._tracer.start_span(
            span.name,
            start_time=span.start_ns + self._epoch_offset,
            attributes={
                **{k: v for k, v in span.attributes.items() if v is not None},
                **({"parent.name": span.parent} if span.parent else {}),
            },
        )
        if span.status != "OK":
            otel_span.set_status(
                self._Status(self._StatusCode.ERROR, span.status)
            )
        otel_span.end(end_time=span.end_ns + self._epoch_offset)


class _Span:
    def __init__(self, tracer: "Tracer", record: SpanRecord):
        self._tracer = tracer
        self.record = record
        self._token = None
        self._finished = False

    def set_attribute(self, key: str, value: Any) -> "_Span":
        self.record.attributes[key] = value
        return self

    def __enter__(self) -> "_Span":
        # idempotent: `with tracer.start_span(...)` must not push the
        # nesting stack twice
        if self._token is None:
            if self.record.start_ns == 0:
                self.record.start_ns = time.perf_counter_ns()
            self._token = _SPAN_STACK.set(
                _SPAN_STACK.get() + (self.record.name,)
            )
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if self._token is not None:
            _SPAN_STACK.reset(self._token)
            self._token = None
        if not self._finished:
            self._finished = True
            self.record.end_ns = time.perf_counter_ns()
            if exc_type is not None:
                self.record.status = f"ERROR:{exc_type.__name__}"
            self._tracer._finish(self.record)
        return False

    # OTel Span protocol compatibility for non-context-manager use
    def end(self) -> None:
        self.__exit__(None, None, None)


class Tracer:
    """Minimal OTel-shaped tracer: ``start_span`` returns a context
    manager; nesting derives the parent from the contextvar stack."""

    def __init__(self, service_name: str, exporters: list | None = None):
        self.service_name = service_name
        self.exporters = exporters if exporters is not None else []

    def start_span(self, name: str, attributes: dict | None = None) -> _Span:
        """Create a started span (parent = whatever is currently on the
        nesting stack). Entering it as a context manager additionally
        makes it the parent of spans opened inside the block."""
        stack = _SPAN_STACK.get()
        record = SpanRecord(
            name=name,
            attributes=dict(attributes or {}),
            parent=stack[-1] if stack else None,
            start_ns=time.perf_counter_ns(),
        )
        return _Span(self, record)

    def span(self, name: str, **attributes: Any) -> _Span:
        """Context-manager form: ``with tracer.span("x", k=v): ...``"""
        record = SpanRecord(name=name, attributes=attributes)
        stack = _SPAN_STACK.get()
        record.parent = stack[-1] if stack else None
        return _Span(self, record)

    def _finish(self, record: SpanRecord) -> None:
        for exp in self.exporters:
            exp.export(record)


_TRACER: Tracer | None = None


def init_tracing(
    service_name: str = "cdc-pipeline",
    enable_console_export: bool = False,
    exporters: list | None = None,
    use_otel: bool = False,
    otel_exporter=None,
):
    """Initialize tracing (tracing.py:17-54 semantics). The tracer API
    is ALWAYS the in-process implementation (stable span/nesting
    semantics, zero hard dependency); ``use_otel=True`` additionally
    attaches :class:`OtelBridgeExporter` when the ``opentelemetry-sdk``
    package imports — and silently degrades to the shim alone when it
    doesn't (this container). Pass ``otel_exporter`` (an OTel
    ``SpanExporter`` — OTLP, Jaeger, ...) to choose the wire target;
    it is batched off the hot path. Without one, the bridge's console
    export attaches only under ``enable_console_export`` — never
    unconditionally (a production pipeline must not print every span
    to stdout just because the SDK is installed)."""
    global _TRACER
    exps = list(exporters or [])
    if use_otel:
        if otel_exporter is not None or enable_console_export:
            try:
                exps.append(
                    OtelBridgeExporter(
                        service_name,
                        otel_exporter=otel_exporter,
                        batch=otel_exporter is not None,
                    )
                )
            except ImportError:
                # SDK absent — shim-only, but observably so (ADVICE r4
                # #3: a silent degrade strands callers expecting wire
                # spans with no signal)
                logging.getLogger(__name__).warning(
                    "use_otel=True but opentelemetry-sdk is not "
                    "importable — tracing degrades to the in-process "
                    "shim (no OTel wire export)"
                )
        else:
            logging.getLogger(__name__).warning(
                "use_otel=True without otel_exporter or "
                "enable_console_export — no OTel bridge attached; pass "
                "an exporter (OTLP/Jaeger) or enable console export to "
                "emit spans beyond the in-process shim"
            )
    if enable_console_export:
        exps.append(LoggingSpanExporter())
    _TRACER = Tracer(service_name, exps)
    return _TRACER


def get_tracer() -> Tracer:
    if _TRACER is None:
        raise RuntimeError("Tracing not initialized. Call init_tracing() first.")
    return _TRACER


def current_tracer() -> Tracer | None:
    """Optional accessor: None when tracing was never initialized
    (tracing stays zero-cost unless opted in)."""
    return _TRACER


def trace_replication_event(event_id: str, table_name: str, destination: str):
    """Span for one replication event (tracing.py:73-100: name and
    attribute keys are the reference's)."""
    return get_tracer().start_span(
        "replicate_event",
        attributes={
            "event.id": event_id,
            "table.name": table_name,
            "destination": destination,
        },
    )


def trace_batch_write(batch_size: int, destination: str):
    """Span for one batch write (tracing.py:103-127)."""
    return get_tracer().start_span(
        "batch_write",
        attributes={"batch.size": batch_size, "destination": destination},
    )
