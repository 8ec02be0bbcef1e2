#!/usr/bin/env python
"""Variance-bound + bisect harness for the streaming replay SLO
(VERDICT r4 "What's wrong #1": driver-measured multi-sink throughput
moved 3224 -> 2912 ev/s between rounds with no hot-path code change).

Runs the exact bench protocol's multi-sink replay N times and reports
mean / stdev / min / max, then repeats with the round-4 additions
disabled (metrics registry no-op'd) to quantify their hot-path cost
directly. One JSON line per configuration.

Usage: python tools/streaming_variance.py [N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_streaming_replay  # noqa: E402
from hybrid_cdc_demo_spark.session import get_spark  # noqa: E402


class _NoopMetrics:
    """Shape-compatible no-op for CDCPipeline.metrics: quantifies the
    round-4 metric wiring's per-batch cost by removing it entirely."""

    def inc(self, *a, **k):
        pass

    def set_gauge(self, *a, **k):
        pass


def run_config(spark, label: str, runs: int, metrics_off: bool) -> dict:
    import hybrid_cdc_demo_spark.streaming.pipeline as P

    orig_init = P.CDCPipeline.__init__
    if metrics_off:
        def patched(self, spark, config, registry=None, metrics=None):
            orig_init(self, spark, config, registry, _NoopMetrics())

        P.CDCPipeline.__init__ = patched
    try:
        run_streaming_replay(spark, n_events=2000)  # warmup (bench protocol)
        rates, p99s = [], []
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()
            r = run_streaming_replay(spark, n_events=50000)
            rates.append(r["streaming_events_per_sec"])
            p99s.append(r["streaming_batch_p99_sec"])
        return {
            "config": label,
            "runs": runs,
            "events_per_sec": {
                "mean": round(statistics.mean(rates), 1),
                "stdev": round(statistics.stdev(rates), 1) if runs > 1 else 0.0,
                "min": min(rates),
                "max": max(rates),
                "all": rates,
            },
            "p99_sec": {
                "mean": round(statistics.mean(p99s), 3),
                "max": max(p99s),
                "all": p99s,
            },
        }
    finally:
        P.CDCPipeline.__init__ = orig_init


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="streaming-variance")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    for label, metrics_off in (("current", False), ("metrics_noop", True)):
        print(json.dumps(run_config(spark, label, runs, metrics_off)), flush=True)
    print(f"# wall {time.time() - t0:.0f}s", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
