"""Binary commitlog frame reader (SURVEY O2/O5): length-prefixed
frames, op-byte decode, truncated-tail tolerance, corrupt-frame
routing, streaming parity with batch."""

import json
import struct

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.sources.commitlog import (
    envelope_from_frames,
    read_commitlog_batch,
    read_commitlog_stream,
    write_commitlog_segment,
)


def _events(n, etype="INSERT"):
    return [
        {
            "event_id": f"e{i}",
            "event_type": etype if i % 3 else "DELETE",
            "table_name": "users",
            "keyspace": "ecommerce",
            "partition_key": {"user_id": f"u{i}"},
            "clustering_key": {},
            "columns": json.dumps({"user_id": f"u{i}", "age": 20 + i})
            if i % 3
            else "{}",
            "timestamp_micros": 1_000_000 + i,
            "ttl_seconds": None,
            "captured_at": "2024-01-01T00:00:00Z",
        }
        for i in range(n)
    ]


def test_roundtrip_and_op_bytes(spark, tmp_path):
    write_commitlog_segment(str(tmp_path / "seg-0.log"), _events(9))
    frames = read_commitlog_batch(spark, str(tmp_path))
    rows = frames.orderBy("byte_position").collect()
    assert len(rows) == 9
    assert rows[0]["event_type"] == "DELETE"  # i=0 → DELETE op byte
    assert rows[1]["event_type"] == "INSERT"
    assert all(r["parse_error"] is None for r in rows)

    env = envelope_from_frames(frames)
    got = {r["event_id"]: r for r in env.collect()}
    assert got["e4"]["event_type"] == "INSERT"
    assert got["e4"]["partition_key"]["user_id"] == "u4"
    assert got["e0"]["event_type"] == "DELETE"


def test_truncated_tail_tolerated(spark, tmp_path):
    """A partially-written final frame is skipped without error
    (reader.py:167-175 'file might still be written')."""
    write_commitlog_segment(
        str(tmp_path / "seg-0.log"), _events(5), truncate_tail_bytes=7
    )
    frames = read_commitlog_batch(spark, str(tmp_path))
    assert frames.count() == 4  # the 5th frame is incomplete


def test_unknown_op_byte_routed_not_raised(spark, tmp_path):
    """Corrupt frames become parse_error rows (DLQ-routable), never
    exceptions (the reference raises ParseError, parser.py:74)."""
    good = _events(2)
    p = tmp_path / "seg-0.log"
    write_commitlog_segment(str(p), good)
    payload = b"X" + b'{"event_id": "bad"}'
    with open(p, "ab") as fh:
        fh.write(struct.pack(">I", len(payload)) + payload)
    frames = read_commitlog_batch(spark, str(tmp_path))
    errs = frames.filter(F.col("parse_error").isNotNull()).collect()
    assert len(errs) == 1 and "unknown op byte" in errs[0]["parse_error"]
    assert frames.filter(F.col("parse_error").isNull()).count() == 2


def test_byte_position_is_frame_offset(spark, tmp_path):
    """byte_position matches the frame's length-prefix offset — the
    resume coordinate of the reference's offset store."""
    evs = _events(3)
    write_commitlog_segment(str(tmp_path / "seg-0.log"), evs)
    rows = (
        read_commitlog_batch(spark, str(tmp_path))
        .orderBy("byte_position")
        .collect()
    )
    expected_pos = 0
    for r, e in zip(rows, evs):
        assert r["byte_position"] == expected_pos
        op_payload = 1 + len(
            json.dumps({k: v for k, v in e.items() if k != "event_type"})
        )
        expected_pos += 4 + op_payload


def test_streaming_matches_batch(spark, tmp_path):
    src = tmp_path / "log"
    write_commitlog_segment(str(src / "seg-0.log"), _events(6))
    write_commitlog_segment(str(src / "seg-1.log"), _events(4))
    batch_n = read_commitlog_batch(spark, str(src)).count()

    q = (
        read_commitlog_stream(spark, str(src))
        .writeStream.format("memory")
        .queryName("commitlog_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_n = spark.sql("SELECT COUNT(*) c FROM commitlog_stream_test").collect()[
        0
    ]["c"]
    assert stream_n == batch_n == 10
