"""Binary commitlog source: length-prefixed frame reader (SURVEY O2/O5).

Reference semantics reproduced (cites into /root/reference):

* frame format: 4-byte big-endian length prefix + payload
  (src/cdc/reader.py:132-201);
* a truncated trailing frame is tolerated, not an error — "file might
  still be written" (reader.py:167-175);
* payload begins with an op byte I/U/D mapping to
  INSERT/UPDATE/DELETE (src/cdc/parser.py:40-53);
* unparseable frames raise ParseError in the reference
  (parser.py:74-96); here they become rows with ``parse_error`` set,
  which the pipeline routes to the DLQ (O7) — a dropped exception
  can't be replayed, a DLQ row can;
* the rest of the payload is a JSON envelope (the reference's parser
  fabricates field values from a demo stub, parser.py:40-53, 77, 96 —
  we define the payload as the event-schema.json envelope instead of
  reproducing the stub's fabrication).

Spark-first design: ``binaryFile`` source (batch or stream) reads
whole segment files in parallel; frame splitting + op decoding is a
``mapInPandas`` over the file bytes (Arrow-batched; one Python call
per FILE, not per frame), yielding envelope rows plus
``(commitlog_file, byte_position)`` lineage columns — the reference's
offset coordinates (src/models/offset.py:20-48). At 100 TB the unit
of parallelism is the segment file, which is exactly how Cassandra
lays commitlogs out.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as ST

OP_TO_EVENT_TYPE = {b"I": "INSERT", b"U": "UPDATE", b"D": "DELETE"}

FRAME_SCHEMA = ST.StructType(
    [
        ST.StructField("commitlog_file", ST.StringType(), False),
        ST.StructField("byte_position", ST.LongType(), False),
        ST.StructField("event_type", ST.StringType(), True),
        ST.StructField("payload_json", ST.StringType(), True),
        ST.StructField("parse_error", ST.StringType(), True),
    ]
)


def _split_frames(content: bytes, path: str) -> Iterator[dict]:
    """Yield one record per length-prefixed frame.

    ``byte_position`` is the offset of the frame's length prefix —
    resuming from it re-reads exactly this frame first, matching the
    reference's seek semantics (reader.py:81-98).
    """
    pos = 0
    size = len(content)
    while pos + 4 <= size:
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        if pos + 4 + length > size:
            # truncated tail: writer may still be appending — stop
            # without error (reader.py:167-175)
            return
        payload = content[pos + 4 : pos + 4 + length]
        rec = {
            "commitlog_file": path,
            "byte_position": pos,
            "event_type": None,
            "payload_json": None,
            "parse_error": None,
        }
        if length == 0:
            rec["parse_error"] = "empty frame"
        else:
            op = payload[:1]
            etype = OP_TO_EVENT_TYPE.get(op)
            if etype is None:
                rec["parse_error"] = f"unknown op byte {op!r}"
            else:
                rec["event_type"] = etype
                rec["payload_json"] = payload[1:].decode("utf-8", errors="replace")
        yield rec
        pos += 4 + length


def frames_from_binary_files(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows (path, content) → frame rows via mapInPandas
    (one Arrow batch per file; no per-frame Python round trips)."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                out.extend(_split_frames(bytes(content), path))
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return binary_df.select("path", "content").mapInPandas(split, FRAME_SCHEMA)


def read_commitlog_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of a binary commitlog directory (O1 glob + O2 frames)."""
    binary = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.log"
    ).load(path)
    return frames_from_binary_files(binary)


def read_commitlog_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read: the file source handles listing order, processed
    tracking and resume (O1/O3/O4 are checkpoint semantics).
    ``max_files_per_trigger`` bounds each micro-batch to N segment
    files (the reference's batch_size knob expressed at the file
    granularity its segments give us)."""
    binary_schema = ST.StructType(
        [
            ST.StructField("path", ST.StringType(), False),
            ST.StructField("modificationTime", ST.TimestampType(), False),
            ST.StructField("length", ST.LongType(), False),
            ST.StructField("content", ST.BinaryType(), True),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("pathGlobFilter", "*.log")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    binary = reader.load(path)
    return frames_from_binary_files(binary)


def envelope_from_frames(frames: DataFrame) -> DataFrame:
    """Parsed frames → the standard envelope columns (O5): the payload
    JSON carries the event-schema.json fields; the op byte overrides
    event_type. Rows with parse_error stay as-is for DLQ routing."""
    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.sources.cdc import ENVELOPE_SCHEMA

    payload_fields = [f for f in ENVELOPE_SCHEMA.fields if f.name != "event_type"]
    payload_schema = ST.StructType(payload_fields)
    parsed = frames.withColumn(
        "_p", F.from_json("payload_json", payload_schema)
    )
    cols = [F.col(f"_p.{f.name}").alias(f.name) for f in payload_fields]
    return parsed.select(
        *cols,
        "event_type",
        "commitlog_file",
        "byte_position",
        "parse_error",
    )


def write_commitlog_segment(
    path: str, events: list[dict], truncate_tail_bytes: int = 0
) -> str:
    """Test/fixture writer: encode events as length-prefixed frames
    (op byte + JSON payload). ``truncate_tail_bytes`` chops the file
    end to simulate a segment still being written."""
    buf = bytearray()
    for e in events:
        etype = e.get("event_type", "INSERT")
        op = {"INSERT": b"I", "UPDATE": b"U", "DELETE": b"D"}.get(etype, b"?")
        body = dict(e)
        body.pop("event_type", None)
        payload = op + json.dumps(body).encode()
        buf += struct.pack(">I", len(payload)) + payload
    if truncate_tail_bytes:
        buf = buf[: len(buf) - truncate_tail_bytes]
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(bytes(buf))
    return str(p)
