"""Per-micro-batch cost profile of the CDC pipeline at SLO batch size.

VERDICT r9 #2 instrument: the p99 SLO is ONE worst batch, so this tool
decomposes what a batch spends — Spark job count per batch (from the
DAGScheduler's monotone job counter), wall time per pipeline phase, and
the per-sink write sub-steps (parquet write vs segment-stat read vs
ledger commit) — before and after a hot-path change. Output is one JSON
line; PERF.md records the before/after table.

Usage: python tools/batch_profile.py [n_events] [n_files]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from hybrid_cdc_demo_spark.session import get_spark

    spark = get_spark(app_name="cdc-batch-profile")
    spark.sparkContext.setLogLevel("ERROR")

    import hybrid_cdc_demo_spark.streaming.sinks as S
    from bench import run_streaming_replay, calibration_probe

    acc: dict[str, float] = defaultdict(float)
    calls: dict[str, int] = defaultdict(int)

    def timed(name, fn):
        def wrapper(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                acc[name] += time.perf_counter() - t0
                calls[name] += 1

        return wrapper

    # sink sub-steps
    S._segment_stats = timed("segment_stats", S._segment_stats)
    S.BatchLedger.commit = timed("ledger_commit", S.BatchLedger.commit)
    for cls in (S.UpsertSink, S.AppendSink):
        cls.write_batch = timed(
            f"write_batch_{cls.name}", cls.write_batch
        )

    # per-batch job counts via the DAGScheduler's monotone job id
    sc = spark.sparkContext
    next_job_id = lambda: int(sc._jsc.sc().dagScheduler().nextJobId())  # noqa: E731

    import hybrid_cdc_demo_spark.streaming.pipeline as P

    batch_jobs: list[int] = []
    batch_secs: list[float] = []
    orig_pb = P.CDCPipeline.process_batch

    batch_secs_order: list[float] = []

    def profiled_pb(self, batch, batch_id):
        j0 = next_job_id()
        t0 = time.perf_counter()
        out = orig_pb(self, batch, batch_id)
        dt = time.perf_counter() - t0
        batch_secs.append(dt)
        batch_secs_order.append(dt)
        batch_jobs.append(next_job_id() - j0)
        return out

    P.CDCPipeline.process_batch = profiled_pb

    # warmup (codegen/JIT), then the timed replay
    run_streaming_replay(spark, n_events=2000)
    batch_jobs.clear()
    batch_secs.clear()
    batch_secs_order.clear()
    for k in list(acc):
        acc[k] = 0.0
        calls[k] = 0
    cal_pre = calibration_probe(spark, reps=1)
    r = run_streaming_replay(spark, n_events=n_events, n_files=n_files)
    cal_post = calibration_probe(spark, reps=1)

    batches = len(batch_secs)
    out = {
        "n_events": n_events,
        "n_files": n_files,
        "batches": batches,
        "jobs_per_batch_median": statistics.median(batch_jobs) if batch_jobs else 0,
        "jobs_per_batch_max": max(batch_jobs) if batch_jobs else 0,
        "batch_sec_median": round(statistics.median(batch_secs), 4),
        "batch_sec_p99": round(sorted(batch_secs)[int(batches * 0.99) - 1], 4)
        if batches
        else 0,
        "batch_sec_worst": round(max(batch_secs), 4) if batch_secs else 0,
        "worst_over_median": round(
            max(batch_secs) / statistics.median(batch_secs), 3
        )
        if batch_secs
        else 0,
        "phase_sec_per_batch": {
            k: round(v / max(batches, 1), 4) for k, v in sorted(acc.items())
        },
        "phase_calls_per_batch": {
            k: round(v / max(batches, 1), 2) for k, v in sorted(calls.items())
        },
        "calibration_pre_sec": round(cal_pre, 3),
        "calibration_post_sec": round(cal_post, 3),
        "batch_secs_in_order": [round(s, 3) for s in batch_secs_order],
        "worst_batch_index": (
            batch_secs_order.index(max(batch_secs_order))
            if batch_secs_order
            else -1
        ),
        "replay": r,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
