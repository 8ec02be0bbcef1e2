#!/usr/bin/env python
"""Focused optimization bench (round 10): time a SUBSET of catalog
queries with the bench.py protocol (plan-warm at sf0.001, noop-sink
materialization, median of N in-session reps, calibration-bracketed)
and optionally dump each query's `explain("formatted")` plan to
plans/r10/<query>_<tag>.txt.

Usage:
    python tools/opt_bench.py --queries q07_join_multiway,ns_tfidf_topterms
    python tools/opt_bench.py --top 30            # slowest 30 per BENCH_FULL
    python tools/opt_bench.py --all
Options:
    --reps N       timed reps per query (default 5)
    --sf DIR       data dir (default $SPARK_GRAFT_SF_DIR or sf0.1)
    --tag NAME     also dump formatted plans as plans/r10/<q>_<NAME>.txt
    --out FILE     write the timing JSON (default stdout only)

The guide (§1.4) wants the computation timed, not the sink: the noop
sink materializes every column of every row. Queries that build a
persisted index in their body (ns_simsearch_ivf*) get the same
untimed ensure_* warmup bench.py gives them.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARM_SF = "/root/testdata/sf0.001"


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--tag", default="")
    ap.add_argument("--plans-dir", default="plans/r10")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from hybrid_cdc_demo_spark.plans import QUERIES
    from hybrid_cdc_demo_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.all:
        names = sorted(QUERIES)
    elif args.top:
        with open(os.path.join(repo, "BENCH_FULL.json")) as fh:
            base = json.load(fh)["queries"]
        names = [
            k
            for k, _ in sorted(base.items(), key=lambda kv: -kv[1])[: args.top]
            if k in QUERIES
        ]
    else:
        names = [n for n in args.queries.split(",") if n]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="opt-bench-r10")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    # same untimed index builds bench.py performs before timing
    if any(n.startswith("ns_simsearch") or n.startswith("ns_pq") for n in names):
        from hybrid_cdc_demo_spark.plans.ml_queries import (
            ensure_ivfopq_index,
            ensure_ivfpq_index,
        )
        from hybrid_cdc_demo_spark.plans.northstar import (
            ensure_ivf_index,
            ensure_ivf_sq8_index,
        )

        ensure_ivf_index(spark, args.sf, num_cells=16, seed=42)
        ensure_ivf_sq8_index(spark, args.sf, num_cells=16, seed=42)
        ensure_ivfpq_index(spark, args.sf, num_cells=16, seed=42)
        ensure_ivfopq_index(spark, args.sf, num_cells=16, seed=42)
        ensure_ivf_index(spark, WARM_SF, num_cells=16, seed=42)
        ensure_ivf_sq8_index(spark, WARM_SF, num_cells=16, seed=42)
        ensure_ivfpq_index(spark, WARM_SF, num_cells=16, seed=42)
        ensure_ivfopq_index(spark, WARM_SF, num_cells=16, seed=42)

    # codegen/JIT warm at the smallest SF (bench.py warmup_plans policy)
    for name in names:
        try:
            materialize(QUERIES[name](spark, WARM_SF))
        except Exception as exc:  # noqa: BLE001
            print(f"# warm error {name}: {exc}", file=sys.stderr)
    spark.catalog.clearCache()

    cal_pre = bench.calibration_probe(spark)
    medians: dict[str, float] = {}
    reps_raw: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt-bench: {name}")
        samples: list[float] = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            try:
                materialize(QUERIES[name](spark, args.sf))
                samples.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                samples.append(-1.0)
                print(f"# bench error {name}: {exc}", file=sys.stderr)
                break
            spark.catalog.clearCache()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        reps_raw[name] = samples
        medians[name] = (
            -1.0 if any(s < 0 for s in samples) else statistics.median(samples)
        )
        if args.tag:
            pdir = os.path.join(repo, args.plans_dir)
            os.makedirs(pdir, exist_ok=True)
            try:
                plan = formatted_plan(QUERIES[name](spark, args.sf))
                with open(os.path.join(pdir, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(plan)
            except Exception as exc:  # noqa: BLE001
                print(f"# plan error {name}: {exc}", file=sys.stderr)
    cal_post = bench.calibration_probe(spark)

    result = {
        "sf_dir": args.sf,
        "reps": args.reps,
        "calibration_pre_sec": cal_pre,
        "calibration_post_sec": cal_post,
        "total_median_sec": round(sum(v for v in medians.values() if v > 0), 3),
        "medians": medians,
        "reps_raw": reps_raw,
    }
    print(json.dumps(result, sort_keys=True))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
