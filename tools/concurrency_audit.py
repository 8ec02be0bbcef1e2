#!/usr/bin/env python
"""Concurrent-execution determinism audit (round 8): run the whole
query catalog through ONE SparkSession from 8 driver threads under the
FAIR scheduler and prove every result is identical to its serial run.

Why this matters at scale: a shared analytics engine is multi-tenant —
many queries in flight on one session/cluster at once (the reference's
asyncio pipeline interleaves work the same way). Concurrency is where
session-global state bites: temp-view name collisions, runtime-conf
mutation (load_table sets the parquet nanos conf), driver-side caches
keyed without the query, shuffle-fetch merge order perturbing
non-associative float folds. The catalog's design claims (integer /
fixed-point / decimal aggregation domains, order-independent folds)
make results merge-order-stable — this audit is what checks the claim
instead of assuming it.

Protocol:
- One plain SparkSession on local[16] with spark.scheduler.mode=FAIR.
- Serial pass: every query from __spark_entry__.queries() runs alone;
  results normalized (columns sorted by name, rows sorted by all
  columns — the verification driver's protocol).
- Concurrent pass: 8 threads drain a shared queue of all queries in a
  shuffled-by-name order, each thread pinned to its own FAIR pool via
  the spark.scheduler.pool local property, so stages from different
  queries genuinely interleave on the 16 cores.
- Compare: exact for non-floats, 1e-9 for floats (same as the driver).

Writes CONCURRENCY_r{N}.json with per-query match + timing and the
serial-vs-concurrent wall-clock ratio. Usage:

    python tools/concurrency_audit.py [out.json]
Env:
    CONC_SF_DIR   parquet dir (default /root/testdata/sf0.01)
    CONC_THREADS  worker threads (default 8)
    CONC_QUERIES  comma-separated subset (default: all) — used by
                  tests/test_concurrency_audit.py for a fast slice
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.full_sweep import norm, values_match  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CONCURRENCY_r08.json"
    sf_dir = os.environ.get("CONC_SF_DIR", "/root/testdata/sf0.01")
    n_threads = int(os.environ.get("CONC_THREADS", "8"))

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("concurrency-audit")
        .config("spark.scheduler.mode", "FAIR")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry.queries()
    only = os.environ.get("CONC_QUERIES")
    if only:
        wanted = {q.strip() for q in only.split(",") if q.strip()}
        missing = wanted - set(queries)
        if missing:
            raise SystemExit(f"unknown CONC_QUERIES: {sorted(missing)}")
        queries = {q: queries[q] for q in wanted}
    names = sorted(queries)

    # --- serial pass -----------------------------------------------------
    serial: dict[str, object] = {}
    serial_err: dict[str, str] = {}
    t0 = time.perf_counter()
    for name in names:
        try:
            serial[name] = norm(queries[name](spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            serial_err[name] = f"{type(e).__name__}: {e}"[:300]
    serial_wall = round(time.perf_counter() - t0, 2)
    print(f"serial pass: {serial_wall}s, {len(serial_err)} errors", flush=True)

    # --- concurrent pass --------------------------------------------------
    # interleave families: alphabetical order would cluster similar
    # queries on the same thread; an md5-keyed order (stable across
    # processes, unlike salted str hash) spreads the heavy ns_*
    # queries across pools
    import hashlib

    order = sorted(names, key=lambda n: hashlib.md5(n.encode()).hexdigest())
    results: dict[str, dict] = {}

    def run_one(arg):
        slot, name = arg
        # per-thread FAIR pool: local properties are thread-local, so
        # each worker's jobs land in its own pool and the scheduler
        # round-robins stages across pools
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"pool{slot % n_threads}"
        )
        t = time.perf_counter()
        try:
            pdf = norm(queries[name](spark, sf_dir).toPandas())
            sec = round(time.perf_counter() - t, 3)
            if name in serial_err:
                return name, {"match": False, "error": "serial run errored"}
            base = serial[name]
            match = (
                len(base) == len(pdf)
                and list(base.columns) == list(pdf.columns)
                and values_match(pdf, base)
            )
            return name, {"match": bool(match), "sec": sec, "rows": len(pdf)}
        except Exception as e:  # noqa: BLE001
            return name, {
                "match": False,
                "error": f"{type(e).__name__}: {e}"[:300],
                "sec": round(time.perf_counter() - t, 3),
            }

    t1 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        for name, row in pool.map(run_one, enumerate(order)):
            results[name] = row
            if not row.get("match"):
                print(f"MISMATCH {name}: {row}", file=sys.stderr, flush=True)
    conc_wall = round(time.perf_counter() - t1, 2)

    mismatches = [n for n in names if not results.get(n, {}).get("match")]
    doc = {
        "summary": {
            "queries": len(names),
            "mismatches": len(mismatches),
            "mismatch_names": mismatches,
            "serial_wall_sec": serial_wall,
            "concurrent_wall_sec": conc_wall,
            "concurrency_speedup": round(serial_wall / max(conc_wall, 1e-9), 2),
            "threads": n_threads,
            "scheduler": "FAIR (one pool per worker thread)",
            "sf_dir": sf_dir,
            "serial_errors": serial_err,
        },
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(
        f"{len(names)} queries: {len(mismatches)} mismatches; "
        f"serial {serial_wall}s vs concurrent {conc_wall}s "
        f"({doc['summary']['concurrency_speedup']}x) -> {out_path}"
    )
    spark.stop()
    sys.exit(1 if mismatches or serial_err else 0)


if __name__ == "__main__":
    main()
