"""End-to-end CDC streaming pipeline (reference src/main.py:212-268
re-expressed as Structured Streaming).

Per micro-batch (foreachBatch — the reference's batch loop O19):

1. split corrupt envelopes → DLQ (O7; parser.py error path),
2. validate partition-key presence against the registry (O8) and
   detect unknown payload columns (O9, schema discovery),
3. dedup duplicate deliveries by event_id (O28/S5),
4. mask PII/PHI payload fields in one projection (O11-O14),
5. fan out to the three sink personalities with per-sink error
   isolation + retry; failed sinks route events to the DLQ
   (O20/O29/O30),
6. each sink commits its batch ledger row (O25-O27), giving
   checkpoint + ledger + idempotent-merge exactly-once.

The pipeline state machine matches the spec's
Captured → Validated → Masked → Replicated → Committed
(specs/001-secure-cdc-pipeline/data-model.md:43-48).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from hybrid_cdc_demo_spark.functions.masking import MaskingRules, mask_phi, mask_pii
from hybrid_cdc_demo_spark.schema.evolution import SchemaRegistry
from hybrid_cdc_demo_spark.sources.cdc import read_envelope_stream
from hybrid_cdc_demo_spark.streaming.dlq import write_dlq
from hybrid_cdc_demo_spark.streaming.retry import RetryPolicy, with_retry
from hybrid_cdc_demo_spark.streaming.sinks import (
    AppendSink,
    HypertableSink,
    UpsertSink,
)


@dataclass
class PipelineConfig:
    source_dir: str
    target_dir: str
    keyspace: str = "ecommerce"
    table: str = "users"
    key_cols: tuple = ("key_hash",)
    masking: MaskingRules = field(default_factory=MaskingRules)
    retry: RetryPolicy = field(default_factory=RetryPolicy)
    delete_policy_append: str = "skip"
    max_files_per_trigger: int | None = 1

    @property
    def dlq_path(self) -> str:
        return os.path.join(self.target_dir, "dlq")

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.target_dir, "checkpoint")


class CDCPipeline:
    """Envelope stream → validated+masked rows → 3 sink personalities."""

    def __init__(
        self,
        spark: SparkSession,
        config: PipelineConfig,
        registry: SchemaRegistry | None = None,
    ):
        self.spark = spark
        self.config = config
        self.registry = registry or SchemaRegistry()
        c = config
        self.sinks = {
            "postgres": UpsertSink(
                spark, os.path.join(c.target_dir, "postgres"), list(c.key_cols)
            ),
            "clickhouse": AppendSink(
                spark,
                os.path.join(c.target_dir, "clickhouse"),
                list(c.key_cols),
                delete_policy=c.delete_policy_append,
            ),
            "timescaledb": HypertableSink(
                spark, os.path.join(c.target_dir, "timescaledb"), list(c.key_cols)
            ),
        }
        self.sink_errors: dict[str, int] = {}

    # -- transform stages (pure DataFrame → DataFrame, unit-testable) --

    def split_valid(self, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Stage 1+2: corrupt / contract-violating rows out (O7/O8).

        Envelope contract (event-schema.json:22-25, 41-45, 74-90):
        known event_type, non-empty partition_key, parseable columns
        JSON, DELETE ⇒ empty columns.
        """
        pk = self.registry.latest(self.config.keyspace, self.config.table)
        required_keys = pk.partition_keys if pk else []
        checks = (
            F.col("event_id").isNotNull()
            & F.col("event_type").isin("INSERT", "UPDATE", "DELETE")
            & (F.size(F.map_keys("partition_key")) > 0)
            & F.col("timestamp_micros").isNotNull()
            & (F.col("timestamp_micros") > 0)
            # payload must be a JSON object when present
            & (
                F.col("columns").isNull()
                | F.get_json_object("columns", "$").isNotNull()
            )
            # DELETE must carry an empty payload
            & (
                (F.col("event_type") != "DELETE")
                | F.col("columns").isNull()
                | (F.get_json_object("columns", "$") == "{}")
            )
        )
        for k in required_keys:
            checks = checks & F.element_at("partition_key", F.lit(k)).isNotNull()
        flagged = batch.withColumn("__valid", checks)
        valid = flagged.filter(F.col("__valid")).drop("__valid")
        invalid = flagged.filter(~F.coalesce(F.col("__valid"), F.lit(False))).drop(
            "__valid"
        )
        return valid, invalid

    def dedup(self, batch: DataFrame) -> DataFrame:
        """Stage 3 (O28): duplicate-delivery removal by event_id."""
        return batch.dropDuplicates(["event_id"])

    def mask(self, batch: DataFrame) -> DataFrame:
        """Stage 4 (O11-O14): mask classified payload fields inside the
        JSON columns string without fixing a payload schema — the
        masked values are computed as expressions over extracted
        fields and written back via to_json(struct(...)).

        Also derives key_hash: the masked replica key (partition-key
        values hashed, so the replica never stores raw keys)."""
        rules = self.config.masking
        masked_payload = F.to_json(
            F.map_filter(
                F.map_from_arrays(
                    F.array(
                        F.lit("email_masked"),
                        F.lit("phone_masked"),
                        F.lit("patient_id_masked"),
                    ),
                    F.array(
                        mask_pii(F.get_json_object("columns", "$.email")),
                        mask_pii(F.get_json_object("columns", "$.phone")),
                        mask_phi(
                            F.get_json_object("columns", "$.patient_id"),
                            rules.secret_key,
                        ),
                    ),
                ),
                lambda _, v: v.isNotNull(),
            )
        )
        return batch.withColumn(
            "key_hash",
            F.sha2(F.to_json(F.col("partition_key")), 256),
        ).withColumn("columns_masked", masked_payload)

    def unknown_columns(self, batch: DataFrame) -> DataFrame:
        """Stage 2b (O9): rows whose payload carries columns not in the
        registered schema — logged/evolved, never dropped
        (validator.py:94-106 'allow, possible schema change')."""
        schema = self.registry.latest(self.config.keyspace, self.config.table)
        if schema is None:
            return batch.limit(0)
        known = F.array(*[F.lit(c) for c in schema.columns])
        unknown = F.array_except(F.json_object_keys("columns"), known)
        return batch.filter(F.size(unknown) > 0).withColumn(
            "unknown_columns", unknown
        )

    # -- micro-batch processor ----------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> dict:
        batch = batch.persist()
        try:
            valid, invalid = self.split_valid(batch)
            valid = self.mask(self.dedup(valid)).persist()
            stats = {"batch_id": batch_id, "invalid": invalid.count()}
            if stats["invalid"]:
                write_dlq(
                    invalid,
                    self.config.dlq_path,
                    destination="validation",
                    error_type="contract_violation",
                )
            # multi-sink fan-out with per-sink isolation (O20: one
            # failing destination never blocks the others)
            for name, sink in self.sinks.items():
                try:
                    written = with_retry(
                        lambda s=sink: s.write_batch(valid, batch_id),
                        self.config.retry,
                    )
                    stats[name] = written
                except Exception as exc:  # noqa: BLE001
                    self.sink_errors[name] = self.sink_errors.get(name, 0) + 1
                    stats[name] = -1
                    write_dlq(
                        valid,
                        self.config.dlq_path,
                        destination=name,
                        error_type=type(exc).__name__,
                    )
            return stats
        finally:
            batch.unpersist()

    # -- entry points --------------------------------------------------

    def start(self) -> StreamingQuery:
        stream = read_envelope_stream(
            self.spark,
            self.config.source_dir,
            max_files_per_trigger=self.config.max_files_per_trigger,
        )
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", self.config.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )

    def run_available(self) -> None:
        """Process everything currently in the source dir, then stop
        (deterministic test/replay mode; graceful-shutdown semantics of
        main.py:252-275 — final batch always flushed)."""
        q = self.start()
        q.awaitTermination()
