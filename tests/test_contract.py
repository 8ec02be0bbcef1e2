"""Envelope contract tests (SURVEY §5.3.4; reference
specs/001-secure-cdc-pipeline/contracts/event-schema.json:6-90 and
tests/contract/test_event_schema.py:174-208 scenarios).

The contract, restated (not copied) from the reference spec:
  * required: event_id, event_type, table_name, keyspace,
    partition_key (non-empty), timestamp_micros (> 0);
  * event_type ∈ {INSERT, UPDATE, DELETE};
  * conditional rule: DELETE events carry an EMPTY columns payload;
  * ttl_seconds nullable, non-negative when present;
  * offsets: (commitlog_file, position) with monotone
    last_event_timestamp_micros per key (offset-schema + offset.py:76-83).

We assert both that the fixture generator emits contract-conformant
envelopes and that the pipeline's validity split enforces each rule.
"""

import json

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.sources.cdc import (
    ENVELOPE_SCHEMA,
    generate_change_events,
    read_envelope_batch,
)


def _violations(df):
    """Contract violations per rule, as a dict of counts."""
    return {
        "missing_event_id": df.filter(F.col("event_id").isNull()).count(),
        "bad_event_type": df.filter(
            ~F.col("event_type").isin("INSERT", "UPDATE", "DELETE")
        ).count(),
        "empty_partition_key": df.filter(
            F.size(F.map_keys("partition_key")) == 0
        ).count(),
        "bad_timestamp": df.filter(
            F.col("timestamp_micros").isNull() | (F.col("timestamp_micros") <= 0)
        ).count(),
        "delete_with_payload": df.filter(
            (F.col("event_type") == "DELETE")
            & F.col("columns").isNotNull()
            & (F.get_json_object("columns", "$") != "{}")
        ).count(),
        "negative_ttl": df.filter(F.col("ttl_seconds") < 0).count(),
    }


def test_generator_emits_contract_conformant_envelopes(spark, tmp_path):
    generate_change_events(str(tmp_path / "log"), n_events=500, n_files=2, seed=7)
    env = read_envelope_batch(spark, str(tmp_path / "log"))
    # malformed JSONL lines parse to all-null rows; exclude them (they
    # are the DLQ branch, covered below) and check the well-formed rest
    wellformed = env.filter(F.col("event_id").isNotNull())
    assert wellformed.count() >= 500
    v = _violations(wellformed)
    assert v == {k: 0 for k in v}, v


def test_envelope_schema_field_inventory():
    """Envelope carries exactly the reference contract fields."""
    assert [f.name for f in ENVELOPE_SCHEMA.fields] == [
        "event_id",
        "event_type",
        "table_name",
        "keyspace",
        "partition_key",
        "clustering_key",
        "columns",
        "timestamp_micros",
        "ttl_seconds",
        "captured_at",
    ]
    nullable = {f.name: f.nullable for f in ENVELOPE_SCHEMA.fields}
    for required in ("event_id", "event_type", "table_name", "keyspace",
                     "partition_key", "timestamp_micros"):
        assert nullable[required] is False, required


def test_pipeline_rejects_each_contract_violation(spark, tmp_path):
    """One bad row per rule → every one lands in the invalid split."""
    from hybrid_cdc_demo_spark.schema.evolution import SchemaRegistry, TableSchema
    from hybrid_cdc_demo_spark.streaming.pipeline import CDCPipeline, PipelineConfig

    base = {
        "event_id": "ok",
        "event_type": "INSERT",
        "table_name": "users",
        "keyspace": "ecommerce",
        "partition_key": {"user_id": "u1"},
        "clustering_key": {},
        "columns": json.dumps({"user_id": "u1"}),
        "timestamp_micros": 10,
        "ttl_seconds": None,
        "captured_at": "2024-01-01T00:00:00Z",
    }
    bad_rows = [
        {**base, "event_id": None},
        {**base, "event_id": "b2", "event_type": "TRUNCATE"},
        {**base, "event_id": "b3", "partition_key": {}},
        {**base, "event_id": "b4", "timestamp_micros": 0},
        {**base, "event_id": "b5", "event_type": "DELETE"},  # payload kept
        {**base, "event_id": "b6", "partition_key": {"other": "x"}},  # pk missing
    ]
    src = tmp_path / "log"
    src.mkdir()
    with (src / "seg.json").open("w") as fh:
        fh.write(json.dumps(base) + "\n")
        for r in bad_rows:
            fh.write(json.dumps(r) + "\n")

    reg = SchemaRegistry()
    reg.register(
        TableSchema("ecommerce", "users", {"user_id": "uuid"}, ["user_id"])
    )
    p = CDCPipeline(
        spark,
        PipelineConfig(source_dir=str(src), target_dir=str(tmp_path / "wh")),
        reg,
    )
    batch = read_envelope_batch(spark, str(src))
    valid, invalid = p.split_valid(batch)
    assert {r["event_id"] for r in valid.collect()} == {"ok"}
    assert invalid.count() == len(bad_rows)


def test_offset_ledger_contract(spark, tmp_path):
    """Committed ledger rows carry destination, rows, and a monotone
    last_event_timestamp_micros (offset-schema semantics)."""
    from hybrid_cdc_demo_spark.schema.evolution import SchemaRegistry, TableSchema
    from hybrid_cdc_demo_spark.streaming.pipeline import CDCPipeline, PipelineConfig

    generate_change_events(str(tmp_path / "log"), n_events=300, n_files=3, seed=11)
    reg = SchemaRegistry()
    reg.register(
        TableSchema("ecommerce", "users", {"user_id": "uuid"}, ["user_id"])
    )
    p = CDCPipeline(
        spark,
        PipelineConfig(
            source_dir=str(tmp_path / "log"), target_dir=str(tmp_path / "wh")
        ),
        reg,
    )
    p.run_available()
    for sink in p.sinks.values():
        batches = sink.ledger.committed_batches()
        assert batches, sink.name
        ts = [b["last_event_timestamp_micros"] for b in batches]
        assert all(t is not None and int(t) > 0 for t in ts)
        assert [int(t) for t in ts] == sorted(int(t) for t in ts)  # monotone
        assert all(b["destination"] == sink.name for b in batches)
