"""Batch parquet table loaders for the driver testdata.

Tables (TESTDATA.md): TPC-H-ish star schema + an ``events`` stream
table + ``documents``/``embeddings`` for the training-data operators.

``events.parquet`` stores its ``ts`` column as parquet
TIMESTAMP(NANOS) which Spark's reader rejects outright; with
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a long in
nanoseconds, which we floor-divide to microseconds — bit-identical to
how DuckDB (the correctness oracle) truncates ns→µs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing the events ns-timestamp."""
    if name == "events":
        # Must be set before the read resolves the parquet footer.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (engine.sql surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
