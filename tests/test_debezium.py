"""Debezium envelope adapter: op mapping, delete key recovery from
`before`, wrapped/unwrapped payloads, and end-to-end compatibility
with the CDC pipeline."""

import json

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.sources.debezium import (
    debezium_to_envelope,
    read_debezium_batch,
)


def _msg(op, after=None, before=None, ts_ms=1_700_000_000_000, seq="s1",
         wrapped=True):
    payload = {
        "op": op,
        "before": before,
        "after": after,
        "ts_ms": ts_ms,
        "source": {"db": "ecommerce", "table": "users", "sequence": seq},
    }
    return json.dumps({"payload": payload} if wrapped else payload)


def _write(tmp_path, msgs, name="feed.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(msgs) + "\n")
    return str(tmp_path)


def test_op_mapping_and_fields(spark, tmp_path):
    msgs = [
        _msg("c", after={"user_id": "u1", "age": 30}, seq="a"),
        _msg("r", after={"user_id": "u2", "age": 40}, seq="b"),  # snapshot
        _msg("u", after={"user_id": "u1", "age": 31},
             before={"user_id": "u1", "age": 30}, seq="c"),
        _msg("d", before={"user_id": "u2", "age": 40}, seq="d"),
    ]
    env = read_debezium_batch(spark, _write(tmp_path, msgs), ["user_id"])
    rows = {r["event_id"]: r for r in env.collect()}
    assert rows["a"]["event_type"] == "INSERT"
    assert rows["b"]["event_type"] == "INSERT"  # snapshot read = upsert
    assert rows["c"]["event_type"] == "UPDATE"
    assert rows["d"]["event_type"] == "DELETE"
    assert rows["a"]["keyspace"] == "ecommerce"
    assert rows["a"]["table_name"] == "users"
    assert json.loads(rows["c"]["columns"])["age"] == 31
    # DELETE: empty payload per contract, key recovered from `before`
    assert rows["d"]["columns"] == "{}"
    assert rows["d"]["partition_key"]["user_id"] == "u2"
    # ms → µs
    assert rows["a"]["timestamp_micros"] == 1_700_000_000_000_000


def test_unwrapped_payload_accepted(spark, tmp_path):
    """schemas.enable=false emits the payload without the wrapper."""
    msgs = [_msg("c", after={"user_id": "u9"}, wrapped=False, seq="z")]
    env = read_debezium_batch(spark, _write(tmp_path, msgs), ["user_id"])
    r = env.collect()[0]
    assert r["event_type"] == "INSERT" and r["partition_key"]["user_id"] == "u9"


def test_pipeline_runs_on_debezium_feed(spark, tmp_path):
    """The SAME pipeline stages consume the adapted stream: validate,
    mask, latest-wins merge, DELETE removal."""
    from hybrid_cdc_demo_spark.schema.evolution import SchemaRegistry, TableSchema
    from hybrid_cdc_demo_spark.streaming.pipeline import CDCPipeline, PipelineConfig

    msgs = [
        _msg("c", after={"user_id": "u1", "email": "a@x.io"}, ts_ms=1_000, seq="1"),
        _msg("u", after={"user_id": "u1", "email": "b@x.io"},
             before={"user_id": "u1"}, ts_ms=2_000, seq="2"),
        _msg("c", after={"user_id": "u2", "email": "c@x.io"}, ts_ms=3_000, seq="3"),
        _msg("d", before={"user_id": "u2"}, ts_ms=4_000, seq="4"),
    ]
    src = _write(tmp_path, msgs)
    reg = SchemaRegistry()
    reg.register(
        TableSchema("ecommerce", "users", {"user_id": "uuid", "email": "text"}, ["user_id"])
    )
    cfg = PipelineConfig(source_dir=src, target_dir=str(tmp_path / "wh"))
    p = CDCPipeline(spark, cfg, reg)
    batch = read_debezium_batch(spark, src, ["user_id"])
    stats = p.process_batch(batch, batch_id=0)
    assert stats["valid"] == 4 and stats["postgres"] >= 1
    pg = p.sinks["postgres"].read()
    rows = pg.collect()
    # u2 deleted; u1 shows the LATEST email, masked
    assert len(rows) == 1
    masked = json.loads(rows[0]["columns_masked"])
    from hybrid_cdc_demo_spark.functions.masking import mask_pii_value

    assert masked["email_masked"] == mask_pii_value("b@x.io")
