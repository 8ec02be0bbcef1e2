#!/usr/bin/env python
"""SC-007 scaling probe (BASELINE.md: 'linear with partitions up to
16', spec.md:174 — declared in the reference, never measured): replay
the same 10k-event corpus through the full 3-sink pipeline at
parallelism 1, 4, and 16 (fresh SparkSession per level, sequential)
and report events/s per level. Results recorded in PERF.md.

    python tools/scaling_probe.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(cores: int) -> float:
    from pyspark.sql import SparkSession

    import bench

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-probe-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(2, cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        bench.run_streaming_replay(spark, n_events=2000, n_files=4)  # warm
        r = bench.run_streaming_replay(spark, n_events=10000, n_files=10)
        return r["streaming_events_per_sec"]
    finally:
        spark.stop()


def main() -> None:
    out = {}
    for cores in (1, 4, 16):
        out[f"parallelism_{cores}_events_per_sec"] = measure(cores)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
