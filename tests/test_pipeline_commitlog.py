"""End-to-end: the CDC pipeline running directly off BINARY commitlog
segments (both the binaryFile+mapInPandas splitter and the registered
Python DataSource) — frames → envelope → validate/mask → 3 sinks,
with corrupt frames landing in the DLQ, matching the reference's
reader→parser→sink path (src/main.py) on its native format."""

import json
import struct

import pytest

from hybrid_cdc_demo_spark.schema.evolution import SchemaRegistry, TableSchema
from hybrid_cdc_demo_spark.sources.commitlog import write_commitlog_segment
from hybrid_cdc_demo_spark.streaming.pipeline import CDCPipeline, PipelineConfig


def _ev(i, etype="INSERT", ts=None, age=None):
    return {
        "event_id": f"e{i}",
        "event_type": etype,
        "table_name": "users",
        "keyspace": "ecommerce",
        "partition_key": {"user_id": f"u{i % 3}"},
        "clustering_key": {},
        "columns": json.dumps({"user_id": f"u{i % 3}", "age": age or (20 + i)})
        if etype != "DELETE"
        else "{}",
        "timestamp_micros": ts or (1_000_000 + i),
        "ttl_seconds": None,
        "captured_at": "2024-01-01T00:00:00Z",
    }


def _registry():
    reg = SchemaRegistry()
    reg.register(
        TableSchema(
            "ecommerce", "users", {"user_id": "text", "age": "int"}, ["user_id"]
        )
    )
    return reg


@pytest.mark.parametrize("fmt", ["commitlog", "commitlog-ds"])
def test_pipeline_end_to_end_on_binary_commitlog(spark, tmp_path, fmt):
    src = tmp_path / f"log_{fmt}"
    # u0: e0 INSERT then e3 UPDATE (later ts wins); u1: e1; u2: e2
    write_commitlog_segment(
        str(src / "CommitLog-1.log"), [_ev(0), _ev(1), _ev(2)]
    )
    write_commitlog_segment(
        str(src / "CommitLog-2.log"),
        [_ev(3, "UPDATE", ts=2_000_000, age=99)],
    )
    # corrupt frame appended to segment 2 → DLQ, never crashes
    bad = b"X" + b'{"event_id": "bad"}'
    with open(src / "CommitLog-2.log", "ab") as fh:
        fh.write(struct.pack(">I", len(bad)) + bad)

    cfg = PipelineConfig(
        source_dir=str(src),
        target_dir=str(tmp_path / f"wh_{fmt}"),
        source_format=fmt,
        max_files_per_trigger=None,
    )
    pipeline = CDCPipeline(spark, cfg, _registry())
    pipeline.run_available()

    state = pipeline.sinks["postgres"].read()
    got = {
        json.loads(r["columns"])["user_id"]: json.loads(r["columns"])["age"]
        for r in state.collect()
    }
    # u0's later UPDATE (age 99) must win; u1/u2 keep their inserts
    assert got == {"u0": 99, "u1": 21, "u2": 22}
    # binary-source lineage columns flow through to the sink
    assert {"commitlog_file", "byte_position"} <= set(state.columns)

    from hybrid_cdc_demo_spark.streaming.dlq import read_dlq

    assert read_dlq(spark, cfg.dlq_path).count() >= 1


def test_two_pipelines_partition_a_shared_commitlog(spark, tmp_path):
    """O6 both ways: two pipelines scoped to DIFFERENT tables tail the
    SAME commitlog dir; each replicates exactly its own table's events
    — together they partition the log with no overlap and no loss
    (the reference runs one reader process per (keyspace, table) over
    a shared commitlog, src/cdc/reader.py:186-188)."""
    src = tmp_path / "sharedlog"
    events = []
    for i in range(6):
        table = "users" if i % 2 == 0 else "orders"
        events.append(
            {
                "event_id": f"e{i}",
                "event_type": "INSERT",
                "table_name": table,
                "keyspace": "ecommerce",
                "partition_key": {"user_id": f"k{i}"},
                "clustering_key": {},
                "columns": json.dumps({"user_id": f"k{i}"}),
                "timestamp_micros": 1_000_000 + i,
                "ttl_seconds": None,
                "captured_at": "2024-01-01T00:00:00Z",
            }
        )
    src.mkdir(parents=True)
    with open(src / "seg-0.jsonl", "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")

    def make(table, wh):
        reg = SchemaRegistry()
        reg.register(
            TableSchema("ecommerce", table, {"user_id": "text"}, ["user_id"])
        )
        cfg = PipelineConfig(
            source_dir=str(src),
            target_dir=str(tmp_path / wh),
            table=table,
            max_files_per_trigger=None,
        )
        return CDCPipeline(spark, cfg, reg)

    p_users = make("users", "wh_users")
    p_orders = make("orders", "wh_orders")
    p_users.run_available()
    p_orders.run_available()

    users_keys = {
        json.loads(r["columns"])["user_id"]
        for r in p_users.sinks["postgres"].read().collect()
    }
    orders_keys = {
        json.loads(r["columns"])["user_id"]
        for r in p_orders.sinks["postgres"].read().collect()
    }
    assert users_keys == {"k0", "k2", "k4"}
    assert orders_keys == {"k1", "k3", "k5"}
    assert users_keys.isdisjoint(orders_keys)
