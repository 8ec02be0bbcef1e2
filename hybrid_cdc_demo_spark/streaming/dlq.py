"""Dead-letter queue — reference src/dlq/writer.py:39-94 semantics.

Failed/invalid events are appended as JSON partitioned by
(destination, date); DLQ write failure never crashes the pipeline
(writer.py:92-94). Reading back is a plain spark.read.json.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_dlq(
    df: DataFrame,
    dlq_path: str,
    destination: str,
    error_type: str,
    error_message_col: str | None = None,
) -> None:
    """Append failed events to the DLQ, date/destination-partitioned."""
    enriched = (
        df.withColumn("destination", F.lit(destination))
        .withColumn("error_type", F.lit(error_type))
        .withColumn(
            "error_message",
            F.col(error_message_col) if error_message_col else F.lit(error_type),
        )
        .withColumn("failed_at", F.current_timestamp())
        .withColumn("dlq_date", F.to_date(F.current_timestamp()))
    )
    try:
        (
            enriched.write.mode("append")
            .partitionBy("destination", "dlq_date")
            .json(dlq_path)
        )
    except Exception:  # noqa: BLE001 — DLQ must never crash the pipeline
        pass


def read_dlq(spark: SparkSession, dlq_path: str) -> DataFrame:
    return spark.read.json(dlq_path)


def count_dlq_events(spark: SparkSession, dlq_path: str) -> DataFrame:
    """Per-destination DLQ depth (writer.py:96-129 analogue)."""
    return read_dlq(spark, dlq_path).groupBy("destination").count()
