"""Observability — reference metric names (src/observability/metrics.py:10-43)
fed from Structured Streaming progress events instead of sink-internal
counters (SURVEY O32-O34).

prometheus_client is optional (import-gated); without it the registry
still aggregates values for tests/health endpoints.
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql.streaming import StreamingQueryListener

try:  # pragma: no cover - optional dependency
    from prometheus_client import Counter, Gauge, start_http_server  # noqa: F401

    HAVE_PROMETHEUS = True
except Exception:  # pragma: no cover
    HAVE_PROMETHEUS = False


class MetricsRegistry:
    """Counters/gauges keyed like the reference:
    cdc_events_processed_total{destination,table}, cdc_errors_total,
    cdc_retry_attempts_total, cdc_replication_lag_seconds,
    cdc_events_per_second, cdc_backlog_depth."""

    def __init__(self):
        self._lock = threading.Lock()
        self.counters: dict[str, float] = defaultdict(float)
        self.gauges: dict[str, float] = {}

    def inc(self, name: str, value: float = 1.0, **labels) -> None:
        with self._lock:
            self.counters[self._key(name, labels)] += value

    def set_gauge(self, name: str, value: float, **labels) -> None:
        with self._lock:
            self.gauges[self._key(name, labels)] = value

    @staticmethod
    def _key(name: str, labels: dict) -> str:
        if not labels:
            return name
        tag = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
        return f"{name}{{{tag}}}"

    def snapshot(self) -> dict:
        with self._lock:
            return {"counters": dict(self.counters), "gauges": dict(self.gauges)}

    def render_prometheus(self) -> str:
        snap = self.snapshot()
        lines = []
        for k, v in sorted(snap["counters"].items()):
            lines.append(f"{k} {v}")
        for k, v in sorted(snap["gauges"].items()):
            lines.append(f"{k} {v}")
        return "\n".join(lines) + "\n"


class ProgressMetricsListener(StreamingQueryListener):
    """StreamingQueryListener → reference metric names (O32/O33)."""

    def __init__(self, registry: MetricsRegistry, table: str = "users"):
        self.registry = registry
        self.table = table

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        self.registry.inc(
            "cdc_events_processed_total", p.numInputRows, table=self.table
        )
        if p.inputRowsPerSecond is not None:
            self.registry.set_gauge(
                "cdc_events_per_second", p.inputRowsPerSecond, table=self.table
            )
        self.registry.set_gauge(
            "cdc_replication_duration_seconds",
            (p.batchDuration or 0) / 1000.0,
            table=self.table,
        )

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass


class SourceBacklogListener(StreamingQueryListener):
    """O34 upgrade (VERDICT r4 #7): ``cdc_backlog_depth`` fed from
    SOURCE lag — bytes sitting in the commitlog directory beyond the
    last offset a completed batch committed — instead of the in-flight
    batch's row count. This is the reference's queued-not-yet-written
    notion (src/sinks/base.py backlog counters) expressed against the
    only state Structured Streaming exposes: each progress event's
    committed ``endOffset`` (a ``{file: frame-aligned byte}`` map for
    the commitlog source) compared against the directory's CURRENT
    bytes at notification time. A consume-everything source always
    reports ``endOffset == latestOffset`` inside its own progress, so
    the live stat walk — O(#segments) driver-side — is what makes lag
    under a slow sink actually observable: while a batch crawls,
    newly appended bytes show up here immediately.

    Non-byte sources (the envelope file source's ``logOffset``
    counter) are skipped — no byte semantics to compare. The gauge
    label set matches the per-destination backlog gauges
    (``destination="source"``), keeping one metric name with one
    label schema."""

    def __init__(
        self,
        registry: MetricsRegistry,
        source_dir: str,
        table: str = "users",
        pattern: str = "*.log",
    ):
        self.registry = registry
        self.source_dir = source_dir
        self.table = table
        self.pattern = pattern
        #: when set (the pipeline sets it after start()), only THIS
        #: query's progress feeds the gauge — listeners are
        #: session-global, so without the scope a second concurrent
        #: pipeline's offsets would be compared against the wrong
        #: directory
        self.run_id: str | None = None

    def _current_bytes(self) -> int:
        import glob as _glob
        import os

        total = 0
        for f in _glob.glob(os.path.join(self.source_dir, self.pattern)):
            try:
                total += os.path.getsize(f)
            except OSError:
                pass  # raced retention — vanished segment holds 0 bytes
        return total

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        if self.run_id is not None and str(
            getattr(event.progress, "runId", None)
        ) != str(self.run_id):
            return
        committed = 0
        parsed = False
        for s in event.progress.sources:
            try:
                d = json.loads(s.endOffset)
            except (TypeError, ValueError):
                continue
            # commitlog offsets are {absolute segment path: byte pos};
            # the v1 file source's {"logOffset": N} is a file INDEX —
            # no byte semantics, skip it
            if isinstance(d, dict) and d and all(
                isinstance(v, int) and os.path.isabs(k)
                for k, v in d.items()
            ):
                committed += sum(d.values())
                parsed = True
        if not parsed:
            return
        self.registry.set_gauge(
            "cdc_backlog_depth",
            max(0, self._current_bytes() - committed),
            destination="source",
            table=self.table,
        )

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass


class HealthState:
    """Aggregate health (src/observability/health.py:46-57): overall
    healthy iff every dependency probe is healthy."""

    def __init__(self):
        self._lock = threading.Lock()
        self.checks: dict[str, dict] = {}

    def update(self, name: str, healthy: bool, latency_ms: float, detail: str = ""):
        with self._lock:
            self.checks[name] = {
                "healthy": healthy,
                "latency_ms": round(latency_ms, 2),
                "detail": detail,
                "checked_at": time.time(),
            }

    def status(self) -> dict:
        with self._lock:
            healthy = all(c["healthy"] for c in self.checks.values()) if self.checks else True
            return {"status": "healthy" if healthy else "unhealthy", "checks": dict(self.checks)}


def probe_sink(state: HealthState, name: str, fn) -> None:
    """Probe ≙ the reference's SELECT 1 per destination (health.py:126+)."""
    start = time.time()
    try:
        fn()
        state.update(name, True, (time.time() - start) * 1000)
    except Exception as exc:  # noqa: BLE001
        state.update(name, False, (time.time() - start) * 1000, str(exc))


def serve_observability(
    registry: MetricsRegistry, health: HealthState, port: int = 0
) -> ThreadingHTTPServer:
    """One HTTP server for /metrics and /health (reference runs both;
    health.py:329-357, metrics.py:46-54). port=0 → ephemeral."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path == "/metrics":
                body = registry.render_prometheus().encode()
                ctype = "text/plain"
                code = 200
            elif self.path == "/health":
                status = health.status()
                body = json.dumps(status).encode()
                ctype = "application/json"
                code = 200 if status["status"] == "healthy" else 503
            else:
                body, ctype, code = b"not found", "text/plain", 404
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence request logging
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
