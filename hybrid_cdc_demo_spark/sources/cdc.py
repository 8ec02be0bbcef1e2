"""ChangeEvent envelope: schema, synthetic fixture generator, sources.

Envelope mirrors the reference's event contract
(src/models/event.py:21-48; specs/.../contracts/event-schema.json:6-73):
fixed columns + dynamic payload kept as a JSON string so one streaming
schema serves every table (payload typing happens per-table via
from_json against the SchemaRegistry — Structured Streaming cannot
change the frame schema mid-query, SURVEY §7.3.2).

The generator writes the FIXTURES.md §B1 corpus: seeded, replayable as
a file-source stream (one JSONL file per "commitlog segment"), with
latest-wins collisions, duplicate event_ids, unknown columns, and
malformed-JSON rows to exercise every branch.
"""

from __future__ import annotations

import json
import random
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as ST

ENVELOPE_SCHEMA = ST.StructType(
    [
        ST.StructField("event_id", ST.StringType(), False),
        ST.StructField("event_type", ST.StringType(), False),  # INSERT/UPDATE/DELETE
        ST.StructField("table_name", ST.StringType(), False),
        ST.StructField("keyspace", ST.StringType(), False),
        ST.StructField("partition_key", ST.MapType(ST.StringType(), ST.StringType()), False),
        ST.StructField("clustering_key", ST.MapType(ST.StringType(), ST.StringType()), True),
        ST.StructField("columns", ST.StringType(), True),  # JSON object; {} iff DELETE
        ST.StructField("timestamp_micros", ST.LongType(), False),
        ST.StructField("ttl_seconds", ST.IntegerType(), True),
        ST.StructField("captured_at", ST.TimestampType(), True),
    ]
)

EVENT_TYPES = ("INSERT", "UPDATE", "DELETE")


def read_envelope_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source envelope stream (reference O1-O5: directory listing,
    ordering, processed-file tracking, resume — all handled by the
    source + checkpoint)."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def read_envelope_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(ENVELOPE_SCHEMA).json(path)


def generate_change_events(
    out_dir: str,
    n_events: int = 2000,
    n_files: int = 4,
    seed: int = 42,
    keyspace: str = "ecommerce",
    dup_event_id_rate: float = 0.01,
    unknown_column_rate: float = 0.02,
    malformed_rate: float = 0.01,
    base_micros: int = 1_700_000_000_000_000,
    file_prefix: str = "commitlog",
) -> list[str]:
    """Write the B1 fixture corpus as JSONL segments; returns paths.

    Deterministic for a given seed. ~70/25/5 INSERT/UPDATE/DELETE mix,
    ~10% of keys receive multiple events (latest-wins exercise).
    """
    rng = random.Random(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    user_pool = [str(uuid.UUID(int=rng.getrandbits(128))) for _ in range(max(n_events // 8, 4))]
    cities = ["hanoi", "berlin", "lyon", "austin", "osaka"]
    rows: list[dict] = []
    ts = base_micros
    for i in range(n_events):
        ts += rng.randint(1, 1000) * 1000
        user_id = rng.choice(user_pool)
        r = rng.random()
        etype = "INSERT" if r < 0.70 else ("UPDATE" if r < 0.95 else "DELETE")
        cols: dict = {}
        if etype != "DELETE":
            cols = {
                "user_id": user_id,
                "email": f"user{i}@example.com",
                "phone": f"+84-{rng.randint(100000, 999999)}",
                "first_name": f"fn{i % 97}",
                "last_name": f"ln{i % 89}",
                "age": rng.randint(18, 90),
                "city": rng.choice(cities),
                "created_at": "2024-01-01T00:00:00Z",
            }
            if rng.random() < unknown_column_rate:
                cols["surprise_col"] = "schema-drift"
        event = {
            "event_id": str(uuid.UUID(int=rng.getrandbits(128))),
            "event_type": etype,
            "table_name": "users",
            "keyspace": keyspace,
            "partition_key": {"user_id": user_id},
            "clustering_key": {},
            "columns": json.dumps(cols),
            "timestamp_micros": ts,
            "ttl_seconds": None,
            "captured_at": "2024-01-02T00:00:00.000Z",
        }
        rows.append(event)
        if rng.random() < dup_event_id_rate and rows:
            rows.append(dict(rows[-1]))  # exact duplicate delivery

    paths = []
    per_file = max(len(rows) // n_files, 1)
    for f in range(n_files):
        chunk = rows[f * per_file : None if f == n_files - 1 else (f + 1) * per_file]
        p = out / f"{file_prefix}-{f:04d}.json"
        with p.open("w") as fh:
            for j, row in enumerate(chunk):
                if rng.random() < malformed_rate:
                    fh.write('{"event_id": "broken", "event_type": INVALID}\n')
                fh.write(json.dumps(row) + "\n")
        paths.append(str(p))
    return paths


def active_events(df: DataFrame, now_micros: int) -> DataFrame:
    """TTL view (SURVEY §2b): the reference carries ``ttl_seconds`` but
    never enforces it (event.py:48, parser.py:99-102); we carry the
    column untouched and offer the optional expiry filter —
    ``timestamp_micros + ttl`` must still be in the future."""
    import pyspark.sql.functions as F

    return df.filter(
        F.col("ttl_seconds").isNull()
        | (
            F.col("timestamp_micros")
            + F.col("ttl_seconds").cast("long") * 1_000_000
            > F.lit(now_micros)
        )
    )
