#!/usr/bin/env python
"""Memory/spill audit: the round-8 instrument for the MEMORY failure
class (the retry/skew/concurrency audits cover fault, distribution,
and scheduling; nothing yet measures what the shuffle machinery
actually moves and whether it stays in RAM).

For every heavy-tier query at an expanded SF (default the sf1 derived
corpus, 10x the bench SF) this runs the query to full materialization
(noop sink, cache cleared between queries) and reads the PER-STAGE
task metrics from Spark's status REST API (/api/v1 — the same numbers
the Spark UI shows):

* inputBytes / inputRecords       — what the scan actually read
* shuffleWriteBytes / ReadBytes   — what crossed the exchange
* memoryBytesSpilled / diskBytesSpilled — spill (the audit's pass bar
  is ZERO spill of EITHER kind for every query at 10x bench SF —
  memory-spill means the execution memory manager had to unspill
  pages, so both count as budget breaches and both exit 1)
* peakExecutionMemory             — max over the query's stages
* max task shuffleWriteBytes      — the LARGEST single shuffle-map
  task across EVERY stage that wrote shuffle data, i.e. the number
  that must fit in one executor's memory at any cluster size; stage
  aggregates alone hide skewed partitions, and checking only the
  aggregate-largest stage would hide a skewed task inside a smaller
  stage (r8 ADVICE).

Why bytes and not seconds: the scaling sweeps already time queries;
byte metrics are deterministic for a deterministic plan, so this
artifact doubles as a shuffle-volume regression pin — a plan change
that silently starts shuffling 10x more data moves these numbers even
when local wall-clock hides it, and shuffle volume is exactly the
quantity that becomes the bottleneck at 100 TB on a real cluster
(PERF.md projects per-task bytes from these figures).

Usage:
    python tools/spill_audit.py [out.json]
Env:
    SPILL_SF_DIR   parquet dir (default /root/repo/.scaling/sf1;
                   derive it with tools/expand_testdata.py --sfs 1)
    SPILL_CPUS     local cores (default 16)
    SPILL_MEM_GB   JVM heap in GiB (default = SPILL_CPUS, i.e. 1 GiB
                   per core — the conservative end of real executor
                   sizing; the audit's zero-spill claim is always
                   relative to this explicit per-core budget. The
                   first sf10 run used the pyspark default ~1 GiB
                   TOTAL across 16 threads — 64 MiB/task — and
                   produced a graceful spill plus one GC-death, both
                   artifacts of a budget no cluster would run)
    SPILL_QUERIES  comma-separated subset (default: the heavy tier)
    SPILL_UI_PORT  Spark UI port for the REST reads (default 4049)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the SCALING_r06/r07 heavy tier: every corpus-scaling query family
HEAVY = [
    "ns_bpe_encode", "ns_bpe_vocab", "ns_corpus_shuffle",
    "ns_dedup_bucket_coverage", "ns_dedup_clusters",
    "ns_dedup_containment", "ns_dedup_editdistance", "ns_dedup_minhash",
    "ns_dedup_quality_weighted", "ns_dedup_simhash", "ns_dedup_substring",
    "ns_dedup_two_stage", "ns_embedding_neardup", "ns_graph_triangles",
    "ns_heavy_hitters", "ns_kmeans_assign", "ns_lm_coherence",
    "ns_lr_training", "ns_mmr_diverse", "ns_pagerank_tokens",
    "ns_pca_gram", "ns_pca_project", "ns_pq_adc_topk", "ns_pq_encode",
    "ns_rfm_segments", "ns_semantic_dedup", "ns_simsearch_binary",
    "ns_simsearch_ivf", "ns_simsearch_ivfopq", "ns_simsearch_lsh",
    "ns_simsearch_refine", "ns_tfidf_topterms", "ns_training_manifest",
    "ns_unigram_likelihood",
]

STAGE_SUMS = [
    "inputBytes", "inputRecords", "outputBytes", "outputRecords",
    "shuffleReadBytes", "shuffleWriteBytes", "shuffleWriteRecords",
    "memoryBytesSpilled", "diskBytesSpilled", "numTasks",
]


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def _stages(api: str) -> dict[int, dict]:
    """Completed stages keyed by stageId (latest attempt wins)."""
    out: dict[int, dict] = {}
    for s in _get(f"{api}/stages?status=complete"):
        sid = s["stageId"]
        if sid not in out or s["attemptId"] > out[sid]["attemptId"]:
            out[sid] = s
    return out


def _max_task_shuffle_write(api: str, stage: dict) -> int:
    """Largest single-task shuffle write in one stage, via the
    per-stage task list."""
    sid, att = stage["stageId"], stage["attemptId"]
    try:
        detail = _get(
            f"{api}/stages/{sid}/{att}?details=true&taskStatus=SUCCESS"
        )
        tasks = (detail.get("tasks") or {}).values()
        return max(
            (
                (t.get("taskMetrics") or {})
                .get("shuffleWriteMetrics", {})
                .get("bytesWritten", 0)
                for t in tasks
            ),
            default=0,
        )
    except Exception:  # noqa: BLE001 — metric is best-effort extra depth
        return -1


def _max_task_shuffle_write_all(api: str, stages: list[dict]) -> int:
    """Per-task shuffle-write max across EVERY stage that wrote any
    shuffle data (r8 ADVICE: the aggregate-largest stage can hide a
    skewed single task inside a smaller stage — a skew signature, the
    exact thing the 100 TB per-task projections must not miss)."""
    best = 0
    for s in stages:
        if not s.get("shuffleWriteBytes", 0):
            continue
        m = _max_task_shuffle_write(api, s)
        if m < 0:
            return -1  # surface the partial read rather than a low number
        best = max(best, m)
    return best


def _settle(api: str, status_tracker) -> dict[int, dict]:
    """Wait for the status store to drain (r8 ADVICE: it is updated
    asynchronously from the listener bus, so a fixed sleep can miss a
    late stage-completion on a loaded box — silently undercounting
    spill). Poll until the tracker reports no active jobs/stages AND
    the completed-stage count is stable for two consecutive intervals,
    with a hard 30 s ceiling so a stuck store can't hang the audit."""
    deadline = time.monotonic() + 30.0
    stable = 0
    last = -1
    while time.monotonic() < deadline:
        active = len(status_tracker.getActiveJobsIds()) + len(
            status_tracker.getActiveStageIds()
        )
        stages = _stages(api)
        if active == 0 and len(stages) == last:
            stable += 1
            if stable >= 2:
                return stages
        else:
            stable = 0
        last = len(stages)
        time.sleep(0.25)
    return _stages(api)


def _result_fingerprint(df) -> dict:
    """Order-independent fingerprint of a query's full result, used to
    certify that a SPILLED execution produced the same answer as a
    non-spilled one (VERDICT r9 #4 — r9's starved sf10 run showed
    ns_dedup_minhash spilling 18.4 GB and completing, but nothing
    certified the spilled answer). Per row: xxhash64 over every column
    cast to string (float/double rounded to 6 dp first — partition
    order perturbs low bits of float AGGREGATES, and rounding the
    emitted values is the same tolerance policy the sweep oracle
    uses); combined across rows by count + bit-XOR + decimal sum, all
    insensitive to row order and overflow-safe under ANSI."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import ArrayType, DoubleType, FloatType

    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (DoubleType, FloatType)):
            c = F.round(c, 6)
        elif isinstance(f.dataType, ArrayType) and isinstance(
            f.dataType.elementType, (DoubleType, FloatType)
        ):
            c = F.transform(c, lambda x: F.round(x, 6))
        cols.append(c.cast("string"))
    row = (
        df.select(F.xxhash64(*cols).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(h)").alias("x"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        )
        .collect()[0]
    )
    return {
        "rows": int(row["n"]),
        "xor": int(row["x"]) if row["x"] is not None else None,
        "sum": str(row["s"]) if row["s"] is not None else None,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SPILL.json"
    sf_dir = os.environ.get("SPILL_SF_DIR", "/root/repo/.scaling/sf1")
    cpus = int(os.environ.get("SPILL_CPUS", "16"))
    mem_gb = int(os.environ.get("SPILL_MEM_GB", str(cpus)))
    port = int(os.environ.get("SPILL_UI_PORT", "4049"))
    # STARVED-BUDGET MODE (VERDICT r8 #6): under a deliberately
    # undersized memory budget the PASS criterion inverts — queries
    # must SPILL-AND-COMPLETE (graceful degradation) rather than stay
    # spill-free; errors (OOM/GC death) still fail. The artifact
    # records which regime it measured.
    expect_spill = os.environ.get("SPILL_EXPECT_SPILL", "") == "1"
    names = [
        n for n in os.environ.get("SPILL_QUERIES", ",".join(HEAVY)).split(",")
        if n
    ]

    from pyspark.sql import SparkSession

    from hybrid_cdc_demo_spark.plans import QUERIES

    unknown = sorted(set(names) - set(QUERIES))
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spill-audit")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(port))
        .config("spark.driver.memory", f"{mem_gb}g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    api_root = f"http://localhost:{spark.sparkContext.uiWebUrl.split(':')[-1]}/api/v1"
    app_id = _get(f"{api_root}/applications")[0]["id"]
    api = f"{api_root}/applications/{app_id}"

    # session-noise calibration in every timing artifact (VERDICT r9 #3)
    from bench import calibration_probe

    calibration_pre = calibration_probe(spark)
    results: dict[str, dict] = {}
    spilled: list[str] = []
    for name in names:
        spark.catalog.clearCache()
        before = set(_stages(api))
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            # full materialization AND an order-independent result
            # fingerprint in one action — so a spilled run's answer is
            # certifiable against a non-spilled run's (VERDICT r9 #4)
            fingerprint = _result_fingerprint(df)
        except Exception as exc:  # noqa: BLE001 — record, keep auditing
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
            continue
        sec = round(time.perf_counter() - t0, 2)
        stages = _settle(api, spark.sparkContext.statusTracker())
        new = [stages[sid] for sid in sorted(set(stages) - before)]
        agg = {k: sum(s.get(k, 0) for s in new) for k in STAGE_SUMS}
        rec = {
            "sec": sec,
            "result_fingerprint": fingerprint,
            "num_stages": len(new),
            **agg,
            "peak_execution_memory": max(
                (s.get("peakExecutionMemory", 0) for s in new), default=0
            ),
            "max_task_shuffle_write_bytes": _max_task_shuffle_write_all(
                api, new
            ),
        }
        if agg["inputRecords"]:
            rec["shuffle_write_bytes_per_input_row"] = round(
                agg["shuffleWriteBytes"] / agg["inputRecords"], 3
            )
        results[name] = rec
        if agg["diskBytesSpilled"] or agg["memoryBytesSpilled"]:
            spilled.append(name)
            print(f"SPILL {name}: {agg}", file=sys.stderr)

    ok = [r for r in results.values() if "error" not in r]
    doc = {
        "_summary": {
            "sf_dir": sf_dir,
            "cpus": cpus,
            "mem_gb": mem_gb,
            "calibration_sec": calibration_pre,
            "calibration_post_sec": calibration_probe(spark),
            "pass_criterion": (
                "spill-and-complete (starved budget)"
                if expect_spill
                else "zero spill of either kind"
            ),
            "shuffle_partitions": 32,
            "queries": len(names),
            "errors": sorted(
                n for n, r in results.items() if "error" in r
            ),
            "queries_with_spill": spilled,
            "total_disk_bytes_spilled": sum(
                r["diskBytesSpilled"] for r in ok
            ),
            "total_memory_bytes_spilled": sum(
                r["memoryBytesSpilled"] for r in ok
            ),
            "total_shuffle_write_bytes": sum(
                r["shuffleWriteBytes"] for r in ok
            ),
            "max_task_shuffle_write_bytes": max(
                (r["max_task_shuffle_write_bytes"] for r in ok), default=0
            ),
            "max_peak_execution_memory": max(
                (r["peak_execution_memory"] for r in ok), default=0
            ),
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
    if expect_spill:
        sys.exit(1 if doc["_summary"]["errors"] else 0)
    sys.exit(1 if (spilled or doc["_summary"]["errors"]) else 0)


if __name__ == "__main__":
    main()
