#!/usr/bin/env python
"""Task-retry determinism audit (round 8): prove every catalog query
returns IDENTICAL results when Spark task retries fire mid-query.

Why this matters at 100 TB: on a 1000-executor cluster task failures
are routine (preemption, spot reclaim, OOM-kill, disk faults) and
speculative execution re-runs stragglers by design. Spark's recovery
model assumes tasks are DETERMINISTIC — an operator whose output
depends on attempt history (unseeded randomness, driver-side state
mutated per attempt, partition-order-sensitive folds that change when
a lost shuffle output is recomputed) silently corrupts results under
retry. The fixed-SF oracle sweeps never exercise this: a local[32]
run with maxFailures=1 either succeeds attempt-0 everywhere or fails
the job outright.

Protocol:
- A dedicated SparkSession on ``local[8, 3]`` (the second arg is
  maxFailures: tasks may fail twice and still succeed on the third
  attempt) — the only local master mode in which retries exist.
- Baseline pass: every query from ``__spark_entry__.queries()`` runs
  untouched and its result is normalized (columns sorted by name,
  rows sorted by all columns — the verification driver's protocol).
- Chaos pass: the ``sources.tables`` post-load hook wraps EVERY table
  a query loads in a mapInPandas stage that raises on the FIRST
  attempt of partition 0 (and, for multi-partition scans, partition
  1), then passes batches through untouched on the retry. Each
  injection drops a marker file BEFORE raising, so the artifact
  records how many failures each query actually absorbed (a query
  whose plan prunes the poisoned partition absorbs zero — recorded
  honestly, not counted as evidence).
- Compare: exact equality for non-floats, 1e-9 for floats (retried
  floating-point partial aggregation re-folds in the same partition
  shape, so even float results should be bit-stable; the tolerance
  only absorbs the pandas roundtrip).

Writes RETRY_r{N}.json: per-query {match, injected_failures, sec},
plus a summary. Usage:

    python tools/retry_audit.py [out.json]
Env:
    RETRY_SF_DIR   parquet dir (default /root/testdata/sf0.01)
    RETRY_QUERIES  comma-separated subset to run (default: all) —
                   used by tests/test_retry_audit.py for a fast
                   representative slice inside the suite
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.full_sweep import norm, values_match  # noqa: E402


def make_chaos_hook(marker_dir: str):
    """Post-load hook: identity mapInPandas that fails the first
    attempt of up to two partitions per scan stage. The marker file is
    written BEFORE the raise so the count survives the failed task
    (accumulator updates from failed tasks are discarded — a file on
    the shared local filesystem is the honest counter in local mode).
    """

    def hook(df, name):
        def inject(batches):
            import os as _os

            from pyspark import TaskContext

            tc = TaskContext.get()
            if (
                tc is not None
                and tc.partitionId() in (0, 1)
                and tc.attemptNumber() == 0
            ):
                marker = _os.path.join(
                    marker_dir, f"s{tc.stageId()}_t{tc.taskAttemptId()}"
                )
                open(marker, "w").close()
                raise RuntimeError(
                    "retry-audit: injected first-attempt failure "
                    f"(table={name} partition={tc.partitionId()})"
                )
            for pdf in batches:
                yield pdf

        return df.mapInPandas(inject, df.schema)

    return hook


def make_chaos_conn_factory(db_path: str, mode: str):
    """sqlite connection factory whose FIRST-attempt partition-0
    connection sabotages the commit: mode='pre' fails INSTEAD of
    committing (transaction rolls back, retry applies from scratch),
    mode='post' commits THEN dies (the worst case — the retried task
    re-applies rows already committed, which only keyed-idempotent
    statements absorb). Closure is cloudpickle-shipped by value, like
    the production factories."""

    def factory():
        import sqlite3

        from pyspark import TaskContext

        conn = sqlite3.connect(db_path, timeout=30)
        tc = TaskContext.get()
        if not (
            tc is not None
            and tc.partitionId() == 0
            and tc.attemptNumber() == 0
        ):
            return conn

        class Sabotaged:
            def __init__(self, c):
                self._c = c

            def cursor(self):
                return self._c.cursor()

            def commit(self):
                if mode == "pre":
                    self._c.rollback()
                    raise RuntimeError("retry-audit: pre-commit failure")
                self._c.commit()
                raise RuntimeError("retry-audit: post-commit crash")

            def rollback(self):
                self._c.rollback()

            def close(self):
                self._c.close()

        return Sabotaged(conn)

    return factory


def run_sink_scenarios(spark) -> dict:
    """Exactly-once under TASK retry for the partition-scope JDBC
    upsert sink: the batch-replay ledger tests (test_jdbc_sink) cover
    driver-level crashes; this covers the executor-level ones. For
    both failure points the final table must equal the clean-run
    ground truth and the offset ledger must hold exactly one row for
    the batch."""
    import sqlite3
    import tempfile

    from pyspark.sql import Row

    from hybrid_cdc_demo_spark.streaming.jdbc import JdbcUpsertSink

    rows = [
        Row(
            event_type="INSERT" if i % 7 else "DELETE",
            timestamp_micros=1_700_000_000_000_000 + i,
            user_id=i % 40,
            email=f"u{i}@example.com",
        )
        for i in range(200)
    ]
    from hybrid_cdc_demo_spark.streaming.jdbc import OFFSET_TABLE_DDL

    def run(mode: str | None) -> tuple[list, list]:
        db = tempfile.mktemp(prefix=f"retry_sink_{mode}_", suffix=".db")
        conn = sqlite3.connect(db)
        conn.execute(
            "CREATE TABLE users (user_id INTEGER PRIMARY KEY, email TEXT)"
        )
        conn.executescript(OFFSET_TABLE_DDL)
        conn.commit()
        conn.close()
        if mode is None:

            def factory(path=db):
                import sqlite3 as _s

                return _s.connect(path, timeout=30)

        else:
            factory = make_chaos_conn_factory(db, mode)
        sink = JdbcUpsertSink(
            factory, "users", ["user_id", "email"], ["user_id"],
            txn_scope="partition",
        )
        batch = spark.createDataFrame(rows).repartition(2)
        sink.write_batch(batch, batch_id=7)
        conn = sqlite3.connect(db)
        try:
            data = conn.execute(
                "SELECT user_id, email FROM users ORDER BY user_id"
            ).fetchall()
            offsets = conn.execute(
                "SELECT batch_id, events_replicated_count FROM cdc_offsets"
            ).fetchall()
        finally:
            conn.close()
        return data, offsets

    truth, truth_off = run(None)
    out = {}
    for mode in ("pre", "post"):
        data, offsets = run(mode)
        out[f"sink_commit_{mode}_failure"] = {
            "match": data == truth and offsets == truth_off,
            "rows": len(data),
            "offset_rows": offsets,
        }
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "RETRY_r08.json"
    sf_dir = os.environ.get("RETRY_SF_DIR", "/root/testdata/sf0.01")

    import tempfile

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from hybrid_cdc_demo_spark.sources import tables as tables_mod

    # local[8, 3]: 8 threads, tasks tolerate 2 failures — the retry
    # machinery under test. Plain session otherwise (foreign-session
    # protocol, none of the repo's tuned confs).
    spark = (
        SparkSession.builder.master("local[8, 3]")
        .appName("retry-audit")
        .getOrCreate()
    )
    # FATAL: every injected failure logs a full executor stack trace
    # at ERROR; real failures still surface as query exceptions below
    spark.sparkContext.setLogLevel("FATAL")

    queries = entry.queries()
    only = os.environ.get("RETRY_QUERIES")
    if only:
        wanted = {q.strip() for q in only.split(",") if q.strip()}
        missing = wanted - set(queries)
        if missing:
            raise SystemExit(f"unknown RETRY_QUERIES: {sorted(missing)}")
        queries = {q: queries[q] for q in wanted}
    results: dict[str, dict] = {}
    marker_root = tempfile.mkdtemp(prefix="retry_audit_")

    for i, (qname, fn) in enumerate(sorted(queries.items())):
        t0 = time.time()
        row: dict = {}
        try:
            tables_mod.set_post_load_hook(None)
            base = norm(fn(spark, sf_dir).toPandas())

            qdir = os.path.join(marker_root, qname)
            os.makedirs(qdir, exist_ok=True)
            tables_mod.set_post_load_hook(make_chaos_hook(qdir))
            try:
                chaos = norm(fn(spark, sf_dir).toPandas())
            finally:
                tables_mod.set_post_load_hook(None)

            injected = len(os.listdir(qdir))
            match = (
                len(base) == len(chaos)
                and list(base.columns) == list(chaos.columns)
                and values_match(chaos, base)
            )
            row = {
                "match": bool(match),
                "injected_failures": injected,
                "rows": int(len(base)),
                "sec": round(time.time() - t0, 3),
            }
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            row = {
                "match": False,
                "error": f"{type(e).__name__}: {e}"[:400],
                "sec": round(time.time() - t0, 3),
            }
        results[qname] = row
        status = "ok" if row.get("match") else "FAIL"
        print(
            f"[{i + 1}/{len(queries)}] {qname}: {status} "
            f"(+{row.get('injected_failures', '?')} injected, "
            f"{row['sec']}s)",
            flush=True,
        )

    sink_scenarios = run_sink_scenarios(spark)
    for k, v in sink_scenarios.items():
        print(f"{k}: {'ok' if v['match'] else 'FAIL'}", flush=True)

    mismatches = [q for q, r in results.items() if not r.get("match")] + [
        k for k, v in sink_scenarios.items() if not v["match"]
    ]
    zero_injection = [
        q for q, r in results.items() if r.get("injected_failures") == 0
    ]
    doc = {
        "sink_scenarios": sink_scenarios,
        "summary": {
            "queries": len(results),
            "mismatches": len(mismatches),
            "mismatch_names": mismatches,
            "total_injected_failures": sum(
                r.get("injected_failures", 0) for r in results.values()
            ),
            "zero_injection_queries": zero_injection,
            "master": "local[8, 3]",
            "sf_dir": sf_dir,
        },
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(
        f"\n{len(results)} queries, {len(mismatches)} mismatches, "
        f"{doc['summary']['total_injected_failures']} injected task "
        f"failures absorbed -> {out_path}"
    )
    spark.stop()
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
