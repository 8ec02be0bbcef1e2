#!/usr/bin/env python
"""Batch scaling-curve artifact: time EVERY catalog query at
sf0.001 / sf0.01 / sf0.1 (100x data range) in one session with the
bench protocol (plan warmup at the smallest SF, noop-sink
materialization, cache cleared between queries) and record the
per-query growth ratios — the empirical check behind the 100 TB
claims: a query whose runtime grows faster than data between 0.01 and
0.1 has a super-linear stage (all-pairs blowup, driver funnel,
unbounded state) that plan pins alone can miss.

Interpreting ratios on local[32]: at these sizes most queries are
dominated by fixed scheduling/launch cost, so r_10x = t(0.1)/t(0.01)
far BELOW 10 is expected; r_10x well above 10 is the red flag. The
artifact separates growth (ratio) from cost (absolute seconds).

Usage:
    python tools/scaling_sweep.py [out.json]
Env:
    SCALING_CPUS     (default 32)
    SCALING_SFS      comma-separated sf dirs (default the three driver
                     testdata dirs; point at tools/expand_testdata.py
                     derivatives to stretch the range past sf0.1)
    SCALING_QUERIES  comma-separated query subset (default: all)
    SCALING_RATIO_BASE  sf label the growth ratios divide by
                     (default "0.01"; the r_10x key then reads
                     r_<step> per larger step)
    SCALING_REPS     times each query this many times per SF and
                     records the MIN (default 1 — the round-5
                     protocol; the round-6 heavy tier uses 2 because
                     a single cold shot folds first-AQE-planning and
                     GC pressure into the growth ratio: the r6 sweep
                     read ns_dedup_minhash at 10.4 s @sf0.3 cold vs
                     2.6 s warm)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    cpus = int(os.environ.get("SCALING_CPUS", "32"))
    sfs = [
        p for p in os.environ.get("SCALING_SFS", ",".join(SFS)).split(",") if p
    ]

    from pyspark.sql import SparkSession

    import bench
    from hybrid_cdc_demo_spark.plans import QUERIES

    subset = os.environ.get("SCALING_QUERIES")
    if subset:
        names = [n for n in subset.split(",") if n]
        missing = sorted(set(names) - set(QUERIES))
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        QUERIES = {n: QUERIES[n] for n in names}

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scaling-sweep")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    bench.warmup_plans(spark)
    spark.catalog.clearCache()

    times: dict[str, dict[str, float]] = {n: {} for n in sorted(QUERIES)}
    for sf_dir in sfs:
        sf = sf_dir.rsplit("sf", 1)[1]
        # per-SF warmup, exactly like bench.py at its target SF: the
        # one-time persisted index builds (IVF / SQ8 / IVF-PQ) are
        # production index jobs, never attributed to the probe query
        bench.warmup(spark, sf_dir)
        spark.catalog.clearCache()
        reps = int(os.environ.get("SCALING_REPS", "1"))
        for name in sorted(QUERIES):
            samples = []
            for _ in range(reps):
                start = time.perf_counter()
                try:
                    bench.materialize(QUERIES[name](spark, sf_dir))
                    samples.append(round(time.perf_counter() - start, 3))
                except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                    samples.append(-1.0)
                    print(f"# error {name}@{sf}: {exc}", file=sys.stderr)
                    break
                spark.catalog.clearCache()
            times[name][sf] = min(samples) if all(s >= 0 for s in samples) else -1.0
            spark.catalog.clearCache()

    base = os.environ.get("SCALING_RATIO_BASE", "0.01")
    results: dict[str, dict] = {}
    flagged = []
    for name, t in times.items():
        row: dict = dict(t)
        for sf_label, sec in t.items():
            if sf_label == base or sec <= 0 or t.get(base, -1) <= 0:
                continue
            data_ratio = float(sf_label) / float(base)
            if data_ratio <= 1:
                continue
            r = round(sec / t[base], 2)
            row[f"r_{data_ratio:g}x"] = r
            # data grew data_ratio x; runtime growing faster is the
            # super-linear red flag (all-pairs blowup, driver funnel)
            if r > data_ratio:
                row["superlinear"] = True
                if name not in flagged:
                    flagged.append(name)
        results[name] = row

    doc = {
        "_summary": {
            "cpus": cpus,
            "queries": len(results),
            "ratio_base": base,
            "superlinear": sorted(flagged),
            "sfs": [p.rsplit("sf", 1)[1] for p in sfs],
        },
        **results,
    }
    try:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"# artifact write failed: {exc}", file=sys.stderr)
    print(json.dumps(doc["_summary"]))
    spark.stop()


if __name__ == "__main__":
    main()
