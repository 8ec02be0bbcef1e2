#!/usr/bin/env python
"""Streaming at 10x: replay the EXPANDED sf1 event corpus (1M events,
tools/expand_testdata.py) through the full S6 3-sink pipeline and
reconcile every sink against batch ground truth (VERDICT r6 task #6 —
the soak/SC-001 evidence used 10-50k events; this is the same
zero-loss/zero-dup assertion at 10-100x that volume).

Each events.parquet row becomes one CDC envelope (ecommerce.users
profile state keyed by user_id): 'signup' -> INSERT, 'error' ->
DELETE (tombstone policy so all three sink personalities converge),
everything else -> UPDATE; timestamps carry the event's own ns
timestamp truncated to micros. Ground truth is the same latest-wins
batch computation the SC-001 test uses; the ledgers must additionally
be gap-free (contiguous batch ids) per sink.

Usage:
    python tools/stream_scale_replay.py [out.json]
Env:
    STREAM_SCALE_SRC   events parquet (default /root/repo/.scaling/sf1/events.parquet)
    STREAM_SCALE_FILES segment count (default 100)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def derive_envelopes(events_parquet: str, out_dir: str, n_files: int) -> int:
    """events.parquet rows -> JSONL commitlog segments (1 envelope per
    event, deterministic, no randomness)."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    rows = duckdb.sql(
        f"""
        SELECT event_id, user_id, event_type,
               epoch_ns(ts) // 1000 AS ts_us, value
        FROM read_parquet('{events_parquet}') ORDER BY event_id
        """
    ).fetchall()
    per = (len(rows) + n_files - 1) // n_files
    for f in range(n_files):
        chunk = rows[f * per : (f + 1) * per]
        if not chunk:
            break
        with open(
            os.path.join(out_dir, f"commitlog-{f:05d}.jsonl"), "w"
        ) as fh:
            for event_id, user_id, etype, ts_us, value in chunk:
                if etype == "signup":
                    cdc_type = "INSERT"
                elif etype == "error":
                    cdc_type = "DELETE"
                else:
                    cdc_type = "UPDATE"
                cols = {}
                if cdc_type != "DELETE":
                    cols = {
                        "user_id": f"u{user_id}",
                        "last_event": etype,
                        "value": float(value) if value is not None else None,
                    }
                fh.write(
                    json.dumps(
                        {
                            "event_id": f"e{event_id:012d}",
                            "event_type": cdc_type,
                            "table_name": "users",
                            "keyspace": "ecommerce",
                            "partition_key": {"user_id": f"u{user_id}"},
                            "clustering_key": {},
                            "columns": json.dumps(cols),
                            "timestamp_micros": int(ts_us),
                            "ttl_seconds": None,
                            "captured_at": "2024-01-02T00:00:00.000Z",
                        }
                    )
                    + "\n"
                )
    return len(rows)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "STREAM_SCALE.json"
    src_parquet = os.environ.get(
        "STREAM_SCALE_SRC", "/root/repo/.scaling/sf1/events.parquet"
    )
    n_files = int(os.environ.get("STREAM_SCALE_FILES", "100"))

    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.schema.evolution import (
        SchemaRegistry,
        TableSchema,
    )
    from hybrid_cdc_demo_spark.session import get_spark
    from hybrid_cdc_demo_spark.sources.cdc import read_envelope_batch
    from hybrid_cdc_demo_spark.streaming.pipeline import (
        CDCPipeline,
        PipelineConfig,
    )

    spark = get_spark(app_name="stream-scale-replay")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="cdc-scale-")
    src = os.path.join(tmp, "commitlog")
    t0 = time.perf_counter()
    n_events = derive_envelopes(src_parquet, src, n_files)
    derive_sec = round(time.perf_counter() - t0, 1)

    reg = SchemaRegistry()
    reg.register(
        TableSchema(
            keyspace="ecommerce",
            table="users",
            columns={
                "user_id": "text",
                "last_event": "text",
                "value": "double",
            },
            partition_keys=["user_id"],
        )
    )
    cfg = PipelineConfig(
        source_dir=src,
        target_dir=os.path.join(tmp, "warehouse"),
        # 10 segments (~100k events) per micro-batch: steady-state
        # micro-batching, not one giant bulk drain
        max_files_per_trigger=10,
        delete_policy_append="tombstone",
    )
    pipeline = CDCPipeline(spark, cfg, reg)

    # session-noise calibration in every timing artifact (VERDICT r9
    # #3) + per-batch latency distribution (VERDICT r9 #5): throughput
    # and zero-loss alone leave the p99 SLO unobserved exactly where
    # the reference's peak-ingest scenario implies hot partitions.
    from bench import calibration_probe

    calibration_pre = calibration_probe(spark)
    batch_secs: list[float] = []
    orig_pb = pipeline.process_batch

    def timed_pb(df, bid):
        t1 = time.perf_counter()
        out = orig_pb(df, bid)
        batch_secs.append(time.perf_counter() - t1)
        return out

    pipeline.process_batch = timed_pb
    t0 = time.perf_counter()
    pipeline.run_available()
    wall = round(time.perf_counter() - t0, 1)
    calibration_post = calibration_probe(spark)
    batch_secs.sort()

    # ground truth: batch latest-wins over the same envelopes (the
    # SC-001 computation), DELETEs removing keys
    from pyspark.sql import Window

    env = read_envelope_batch(spark, src).dropDuplicates(["event_id"])
    env = env.filter(
        F.col("event_type").isin("INSERT", "UPDATE", "DELETE")
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy(F.col("partition_key")["user_id"]).orderBy(
        F.desc("timestamp_micros"), F.desc("event_id")
    )
    latest = env.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    expected_keys = {
        r["kh"]
        for r in latest.filter(F.col("event_type") != "DELETE")
        .select(F.sha2(F.to_json("partition_key"), 256).alias("kh"))
        .collect()
    }

    sinks_report = {}
    ok = True
    for name, sink in pipeline.sinks.items():
        keys = [
            r["key_hash"] for r in sink.read().select("key_hash").collect()
        ]
        batches = sorted(
            int(e["batch_id"]) for e in sink.ledger.committed_batches()
        )
        gap_free = batches == list(range(batches[0], batches[-1] + 1)) if batches else False
        report = {
            "keys": len(keys),
            "expected_keys": len(expected_keys),
            "loss_or_phantom": sorted(set(keys) ^ expected_keys)[:5],
            "duplicates": len(keys) - len(set(keys)),
            "committed_batches": len(batches),
            "ledger_gap_free": gap_free,
            "zero_loss_zero_dup": set(keys) == expected_keys
            and len(keys) == len(set(keys))
            and gap_free,
        }
        ok = ok and report["zero_loss_zero_dup"]
        sinks_report[name] = report

    doc = {
        "_summary": {
            "source": src_parquet,
            "n_events": n_events,
            "n_segment_files": n_files,
            "derive_sec": derive_sec,
            "replay_wall_sec": wall,
            "events_per_sec": round(n_events / wall, 1),
            "n_sinks": len(pipeline.sinks),
            "all_sinks_zero_loss_zero_dup": ok,
            "n_batches": len(batch_secs),
            "batch_p50_sec": round(batch_secs[len(batch_secs) // 2], 3)
            if batch_secs
            else None,
            "batch_p99_sec": round(
                batch_secs[max(0, int(len(batch_secs) * 0.99) - 1)], 3
            )
            if batch_secs
            else None,
            "batch_worst_sec": round(batch_secs[-1], 3) if batch_secs else None,
            "calibration_sec": calibration_pre,
            "calibration_post_sec": calibration_post,
        },
        "sinks": sinks_report,
    }
    try:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"# artifact write failed: {exc}", file=sys.stderr)
    print(json.dumps(doc["_summary"]))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
