"""Typed payload views (O10), schema-evolution supervisor
(SURVEY §7.3.2), registry persistence, TTL view — the glue between
the pure schema logic and the streaming pipeline."""

import json

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.schema.evolution import (
    SchemaEvolutionSupervisor,
    SchemaRegistry,
    TableSchema,
    load_registry,
    save_registry,
    typed_view,
)
from hybrid_cdc_demo_spark.sources.cdc import (
    ENVELOPE_SCHEMA,
    active_events,
)


def _env_df(spark, rows):
    payload = []
    for i, cols in enumerate(rows):
        payload.append(
            {
                "event_id": f"e{i}",
                "event_type": "INSERT",
                "table_name": "users",
                "keyspace": "ecommerce",
                "partition_key": {"user_id": f"u{i}"},
                "clustering_key": {},
                "columns": json.dumps(cols),
                "timestamp_micros": 1_000_000 + i,
                "ttl_seconds": None,
                "captured_at": None,
            }
        )
    return spark.createDataFrame(payload, ENVELOPE_SCHEMA)


def _users_schema():
    return TableSchema(
        "ecommerce",
        "users",
        {"user_id": "uuid", "age": "int", "created_at": "timestamp"},
        ["user_id"],
    )


def test_typed_view_casts_and_flags_mismatches(spark):
    df = _env_df(
        spark,
        [
            {"user_id": "u0", "age": 30, "created_at": "2024-01-01T00:00:00Z"},
            {"user_id": "u1", "age": "not-a-number"},
        ],
    )
    tv = typed_view(df, _users_schema())
    rows = {r["event_id"]: r for r in tv.collect()}
    assert rows["e0"]["age"] == 30
    assert rows["e0"]["created_at"] is not None
    assert rows["e0"]["type_mismatches"] == []
    # try_cast semantics: bad value → NULL + flagged, row survives
    assert rows["e1"]["age"] is None
    assert rows["e1"]["type_mismatches"] == ["age"]


def test_supervisor_discovers_unregistered_table(spark):
    reg = SchemaRegistry()
    sup = SchemaEvolutionSupervisor(reg)
    df = _env_df(spark, [{"user_id": "u0", "age": 30}])
    out = sup.observe_batch(df, "ecommerce", "users")
    assert out["action"] == "discovered"
    assert "age" in reg.latest("ecommerce", "users").columns


def test_supervisor_evolves_add_column(spark):
    reg = SchemaRegistry()
    reg.register(_users_schema())
    sup = SchemaEvolutionSupervisor(reg)
    df = _env_df(spark, [{"user_id": "u0", "age": 1, "loyalty_tier": "gold"}])
    out = sup.observe_batch(df, "ecommerce", "users")
    assert out["action"] == "evolved"
    latest = reg.latest("ecommerce", "users")
    assert latest.columns["loyalty_tier"] == "text"
    assert latest.version == 2
    # absent columns are NOT drops: created_at still registered
    assert "created_at" in latest.columns
    # second sight of the same payload → noop
    assert sup.observe_batch(df, "ecommerce", "users")["action"] == "noop"


def test_supervisor_flags_incompatible_alter(spark):
    reg = SchemaRegistry()
    reg.register(
        TableSchema("ecommerce", "users", {"user_id": "uuid", "age": "bigint"}, ["user_id"])
    )
    sup = SchemaEvolutionSupervisor(reg)
    # age arrives as a JSON string → bigint→text is a narrowing ALTER
    df = _env_df(spark, [{"user_id": "u0", "age": "thirty"}])
    out = sup.observe_batch(df, "ecommerce", "users")
    assert out["action"] == "incompatible"
    assert reg.latest("ecommerce", "users").version == 1  # unchanged


def test_pipeline_evolves_on_drift_end_to_end(spark, tmp_path):
    """surprise_col in the fixture corpus → pipeline evolves the
    registry mid-run without a restart (payload stays JSON)."""
    from hybrid_cdc_demo_spark.sources.cdc import generate_change_events
    from hybrid_cdc_demo_spark.streaming.pipeline import CDCPipeline, PipelineConfig

    generate_change_events(
        str(tmp_path / "log"), n_events=400, n_files=2, seed=5,
        unknown_column_rate=0.2,
    )
    reg = SchemaRegistry()
    reg.register(
        TableSchema(
            "ecommerce",
            "users",
            {"user_id": "uuid", "email": "text", "phone": "text",
             "first_name": "text", "last_name": "text", "age": "int",
             "city": "text", "created_at": "timestamp"},
            ["user_id"],
        )
    )
    p = CDCPipeline(
        spark,
        PipelineConfig(source_dir=str(tmp_path / "log"), target_dir=str(tmp_path / "wh")),
        reg,
    )
    p.run_available()
    latest = reg.latest("ecommerce", "users")
    assert "surprise_col" in latest.columns
    assert latest.version == 2
    assert any(e["action"] == "evolved" for e in p.evolution.audit)
    # sinks still received the batches (drift was compatible)
    assert p.sinks["postgres"].read().count() > 0


def test_registry_roundtrip(tmp_path):
    reg = SchemaRegistry()
    reg.register(_users_schema())
    reg.register(
        TableSchema(
            "ecommerce",
            "users",
            {"user_id": "uuid", "age": "int", "created_at": "timestamp", "city": "text"},
            ["user_id"],
        )
    )
    path = str(tmp_path / "registry.jsonl")
    save_registry(reg, path)
    loaded = load_registry(path)
    latest = loaded.latest("ecommerce", "users")
    assert latest.version == 2 and "city" in latest.columns
    assert latest.get_hash() == reg.latest("ecommerce", "users").get_hash()


def test_ttl_view(spark):
    df = _env_df(spark, [{"user_id": "u0"}, {"user_id": "u1"}])
    df = df.withColumn(
        "ttl_seconds",
        F.when(F.col("event_id") == "e0", F.lit(1)).otherwise(F.lit(None)),
    )
    # now = ts + 2s: e0 (1s ttl) expired, e1 (no ttl) lives forever
    now = 1_000_000 + 2_000_000
    alive = {r["event_id"] for r in active_events(df, now).collect()}
    assert alive == {"e1"}
