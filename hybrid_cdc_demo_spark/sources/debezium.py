"""Debezium CDC envelope adapter.

The reference consumes Cassandra commitlogs directly; the standard
way the same change feed arrives in a Spark shop is a Debezium
connector emitting its documented JSON envelope
(https://debezium.io/documentation — ``before``/``after`` row images,
``op`` ∈ {c,r,u,d}, ``source`` metadata, ``ts_ms``). This adapter
maps that public format onto our ChangeEvent envelope so the SAME
CDCPipeline (validate → mask → latest-wins merge → exactly-once
sinks) runs unchanged against either source.

Mapping:
  op c (create), r (snapshot read) → INSERT
  op u (update)                    → UPDATE
  op d (delete)                    → DELETE (columns = '{}' per the
                                     envelope contract; key taken from
                                     ``before`` since ``after`` is null)
  ts_ms → timestamp_micros (ms → µs)
  source.table / source.db (or keyspace) → table_name / keyspace
  after/before JSON object → columns (kept as a JSON string — same
    dynamic-payload decision as the native envelope, SURVEY §1.1)
  partition_key → configured key columns extracted from the row image

Everything is builtin expressions over a JSON file/Kafka value column
— one projection, no UDFs, streaming- and batch-compatible.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def debezium_to_envelope(
    raw: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Debezium JSON strings → ChangeEvent envelope rows (pure
    projection; works on any DataFrame with a JSON string column,
    e.g. a file stream or Kafka ``value``)."""
    v = F.col(value_col)
    payload = F.coalesce(
        F.get_json_object(v, "$.payload"), v  # unwrapped (schemas.enable=false)
    )
    op = F.get_json_object(payload, "$.op")
    after = F.get_json_object(payload, "$.after")
    before = F.get_json_object(payload, "$.before")
    image = F.coalesce(after, before)  # DELETE carries only `before`
    event_type = (
        F.when(op.isin("c", "r"), "INSERT")
        .when(op == "u", "UPDATE")
        .when(op == "d", "DELETE")
        .otherwise(None)
    )
    pk = F.map_from_arrays(
        F.array(*[F.lit(k) for k in key_cols]),
        F.array(*[F.get_json_object(image, f"$.{k}") for k in key_cols]),
    )
    ts_ms = F.get_json_object(payload, "$.ts_ms").cast("long")
    return raw.select(
        F.coalesce(
            F.get_json_object(payload, "$.source.sequence"),
            F.sha2(v, 256),
        ).alias("event_id"),
        event_type.alias("event_type"),
        F.get_json_object(payload, "$.source.table").alias("table_name"),
        F.coalesce(
            F.get_json_object(payload, "$.source.keyspace"),
            F.get_json_object(payload, "$.source.db"),
        ).alias("keyspace"),
        pk.alias("partition_key"),
        F.create_map().cast("map<string,string>").alias("clustering_key"),
        F.when(event_type == "DELETE", F.lit("{}"))
        .otherwise(after)
        .alias("columns"),
        (ts_ms * 1000).alias("timestamp_micros"),
        F.lit(None).cast("int").alias("ttl_seconds"),
        F.timestamp_millis(ts_ms).alias("captured_at"),
    )


def read_debezium_stream(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of Debezium JSON lines → envelope stream
    (swap the reader for ``spark.readStream.format("kafka")`` +
    ``col("value").cast("string")`` on a real deployment — the
    projection is identical)."""
    reader = spark.readStream.schema("value string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.text(path).withColumnRenamed("value", "value")
    return debezium_to_envelope(raw, key_cols)


def read_debezium_batch(
    spark: SparkSession, path: str, key_cols: list[str]
) -> DataFrame:
    raw = spark.read.text(path)
    return debezium_to_envelope(raw, key_cols)
