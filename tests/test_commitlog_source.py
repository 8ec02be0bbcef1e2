"""format("commitlog") Python DataSource: batch parity with the
binaryFile+mapInPandas path, per-file partition planning, and — the
capability binaryFile cannot offer — streaming resume MID-FILE on a
growing segment at the last complete frame boundary."""

import struct

from hybrid_cdc_demo_spark.sources.commitlog import (
    read_commitlog_batch,
    write_commitlog_segment,
)
from hybrid_cdc_demo_spark.sources.commitlog_source import (
    register_commitlog_source,
)


def _ev(i, etype="INSERT"):
    return {
        "event_type": etype,
        "event_id": f"e{i}",
        "keyspace": "ecommerce",
        "table_name": "users",
        "columns": {"user_id": str(i)},
    }


def test_batch_read_matches_mapinpandas_path(spark, tmp_path):
    seg_dir = tmp_path / "log"
    write_commitlog_segment(
        str(seg_dir / "CommitLog-1.log"), [_ev(1), _ev(2, "UPDATE")]
    )
    # second segment: one good frame then a truncated tail
    write_commitlog_segment(
        str(seg_dir / "CommitLog-2.log"),
        [_ev(3, "DELETE"), _ev(4)],
        truncate_tail_bytes=5,
    )
    register_commitlog_source(spark)
    via_ds = spark.read.format("commitlog").load(str(seg_dir))
    via_mip = read_commitlog_batch(spark, str(seg_dir))

    def rows_of(df):
        # binaryFile reports hadoop file: URIs, the DataSource plain
        # paths — normalize the scheme for comparison
        return sorted(
            (r["commitlog_file"].removeprefix("file:"), r["byte_position"],
             r["event_type"], r["payload_json"], r["parse_error"])
            for r in df.collect()
        )

    got, want = rows_of(via_ds), rows_of(via_mip)
    assert got == want
    assert len(got) == 3  # truncated frame 4 not emitted


def test_batch_plans_one_partition_per_segment(spark, tmp_path):
    seg_dir = tmp_path / "log"
    for i in range(3):
        write_commitlog_segment(str(seg_dir / f"CommitLog-{i}.log"), [_ev(i)])
    register_commitlog_source(spark)
    df = spark.read.format("commitlog").load(str(seg_dir))
    assert df.rdd.getNumPartitions() == 3


def test_bad_op_byte_becomes_parse_error_row(spark, tmp_path):
    seg_dir = tmp_path / "log"
    payload = b"X" + b'{"event_id": "weird"}'
    raw = struct.pack(">I", len(payload)) + payload
    seg_dir.mkdir(parents=True)
    (seg_dir / "CommitLog-1.log").write_bytes(raw)
    register_commitlog_source(spark)
    rows = spark.read.format("commitlog").load(str(seg_dir)).collect()
    assert len(rows) == 1
    assert rows[0]["parse_error"].startswith("unknown op byte")
    assert rows[0]["event_type"] is None


def test_stream_resumes_mid_file_on_growing_segment(spark, tmp_path):
    """The reference's tail-a-growing-commitlog semantics: after the
    first drain, MORE frames are appended to the SAME file (plus a
    truncated tail); the next drain from the same checkpoint emits
    only the delta's complete frames, and completing the tail later
    emits exactly the remaining frame."""
    seg_dir = tmp_path / "log"
    seg = str(seg_dir / "CommitLog-1.log")
    write_commitlog_segment(seg, [_ev(1), _ev(2)])
    register_commitlog_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    seen = set()

    def drain(name):
        # parquet sink: supports checkpoint RECOVERY (memory-append
        # does not), which is exactly what this test exercises
        df = spark.readStream.format("commitlog").load(str(seg_dir))
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(out).collect()
        fresh = [r for r in rows
                 if (r["commitlog_file"], r["byte_position"]) not in seen]
        seen.update((r["commitlog_file"], r["byte_position"]) for r in rows)
        return fresh

    first = drain("cl_t1")
    assert sorted(r["event_id"] for r in _parsed(first)) == ["e1", "e2"]

    # grow the SAME file: one complete frame + a truncated tail
    with open(seg, "ab") as fh:
        fh.write(_frame(_ev(3)))
        fh.write(_frame(_ev(4))[:-3])
    second = drain("cl_t2")
    assert sorted(r["event_id"] for r in _parsed(second)) == ["e3"]

    # complete the tail frame in place
    with open(seg, "ab") as fh:
        fh.write(_frame(_ev(4))[-3:])
    third = drain("cl_t3")
    assert sorted(r["event_id"] for r in _parsed(third)) == ["e4"]


def test_stream_picks_up_new_files_alongside_growth(spark, tmp_path):
    seg_dir = tmp_path / "log"
    write_commitlog_segment(str(seg_dir / "CommitLog-1.log"), [_ev(1)])
    register_commitlog_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    seen = set()

    def drain(name):
        # parquet sink: supports checkpoint RECOVERY (memory-append
        # does not), which is exactly what this test exercises
        df = spark.readStream.format("commitlog").load(str(seg_dir))
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(out).collect()
        fresh = [r for r in rows
                 if (r["commitlog_file"], r["byte_position"]) not in seen]
        seen.update((r["commitlog_file"], r["byte_position"]) for r in rows)
        return fresh

    drain("cl_n1")
    write_commitlog_segment(str(seg_dir / "CommitLog-2.log"), [_ev(2)])
    with open(str(seg_dir / "CommitLog-1.log"), "ab") as fh:
        fh.write(_frame(_ev(3)))
    rows = drain("cl_n2")
    assert sorted(r["event_id"] for r in _parsed(rows)) == ["e2", "e3"]


def _frame(ev: dict) -> bytes:
    import json

    op = {"INSERT": b"I", "UPDATE": b"U", "DELETE": b"D"}[ev["event_type"]]
    body = {k: v for k, v in ev.items() if k != "event_type"}
    payload = op + json.dumps(body).encode()
    return struct.pack(">I", len(payload)) + payload


def _parsed(rows):
    import json

    out = []
    for r in rows:
        if r["payload_json"]:
            out.append(json.loads(r["payload_json"]))
    return out


def test_stream_tolerates_segment_removed_after_planning(spark, tmp_path):
    """Retention may remove a fully-consumed segment between offset
    planning and partition read — the reader yields nothing for the
    vanished file instead of failing the batch."""
    from hybrid_cdc_demo_spark.sources.commitlog_source import (
        CommitlogPartition,
        CommitlogStreamReader,
    )

    seg_dir = tmp_path / "log"
    seg = str(seg_dir / "CommitLog-1.log")
    write_commitlog_segment(seg, [_ev(1)])
    reader = CommitlogStreamReader({"path": str(seg_dir)})
    end = reader.latestOffset()
    assert end[seg] > 0
    parts = reader.partitions({}, end)
    import shutil as _sh
    import os as _os

    _os.remove(seg)
    rows = [r for p in parts for r in reader.read(p)]
    assert rows == []  # vanished file -> empty, not an exception


# -- maxBytesPerTrigger admission control (round 5) -------------------


def _seg_bytes(path) -> int:
    import os

    return os.path.getsize(path)


def test_admission_control_splits_backlog_into_bounded_batches(
    spark, tmp_path
):
    """Under a continuous trigger, a burst beyond the first poll
    drains as several bounded micro-batches, every frame exactly once
    (the enforced form of the reference's declared
    max_in_flight_batches backpressure)."""
    import time

    seg_dir = tmp_path / "log"
    seg_dir.mkdir()
    register_commitlog_source(spark)
    batches = []
    stream = (
        spark.readStream.format("commitlog")
        .option("maxBytesPerTrigger", "4000")
        .load(str(seg_dir))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: batches.append(
                [r["payload_json"] for r in df.collect()]
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        # the backlog must land AFTER the first (uncapped) poll — wait
        # for the query to reach its steady trigger loop, not a fixed
        # sleep (cold start can exceed any guess)
        deadline = time.time() + 30
        while time.time() < deadline:
            msg = (q.status or {}).get("message", "")
            if "Waiting" in msg or q.lastProgress is not None:
                break
            time.sleep(0.2)
        time.sleep(0.5)  # one more trigger period for good measure
        for s in range(4):
            write_commitlog_segment(
                str(seg_dir / f"CommitLog-{s}.log"),
                [_ev(s * 25 + i) for i in range(25)],
            )
        deadline = time.time() + 40
        while time.time() < deadline and sum(map(len, batches)) < 100:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    flat = [p for b in batches for p in b]
    assert len(flat) == 100
    assert len(set(flat)) == 100  # no duplicates
    non_empty = [b for b in batches if b]
    assert len(non_empty) >= 2  # the burst was split, not swallowed
    assert max(map(len, non_empty)) < 100  # and every batch bounded


def test_admission_control_available_now_drains_fully(spark, tmp_path):
    """Trigger.AvailableNow latches ONE latestOffset as its terminal
    target, so the first poll of a run is served UNCAPPED — a capped
    answer would silently end the run with frames left on disk
    (partial drain = completeness bug; an oversized first batch is
    only a sizing one)."""
    seg_dir = tmp_path / "log"
    for s in range(3):
        write_commitlog_segment(
            str(seg_dir / f"CommitLog-{s}.log"),
            [_ev(s * 20 + i) for i in range(20)],
        )
    register_commitlog_source(spark)
    seen = []
    q = (
        spark.readStream.format("commitlog")
        .option("maxBytesPerTrigger", "50")
        .load(str(seg_dir))
        .writeStream.foreachBatch(
            lambda df, bid: seen.append(df.count())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(seen) == 60  # everything, despite the tiny cap


def test_admission_control_tiny_budget_still_progresses(tmp_path):
    """A budget smaller than one frame admits exactly one frame per
    poll (min_one) instead of stalling. (First poll of a run is
    uncapped by design — burn it on the empty directory.)"""
    from hybrid_cdc_demo_spark.sources.commitlog_source import (
        CommitlogStreamReader,
    )

    r = CommitlogStreamReader(
        {"path": str(tmp_path), "maxBytesPerTrigger": "1"}
    )
    assert r.latestOffset() == {}  # uncapped first poll, empty dir
    seg = tmp_path / "CommitLog-0.log"
    write_commitlog_segment(str(seg), [_ev(i) for i in range(3)])
    offs = [r.latestOffset()[str(seg)] for _ in range(4)]
    assert offs[0] > 0  # one frame admitted despite budget 1
    assert offs[0] < offs[1] < offs[2]  # monotone progress
    assert offs[2] == offs[3] == _seg_bytes(seg)  # fully drained


def test_admission_floor_prevents_replay_after_regression(tmp_path):
    """Defense-in-depth: if a capped poll ever regresses below an
    engine-provided start offset (a poll pattern we did not
    anticipate), the floor keeps already-delivered frames from
    re-entering a partition."""
    from hybrid_cdc_demo_spark.sources.commitlog_source import (
        CommitlogStreamReader,
    )

    seg = tmp_path / "CommitLog-0.log"
    write_commitlog_segment(str(seg), [_ev(i) for i in range(10)])
    full = _seg_bytes(seg)
    key = str(seg)

    # run 1: consume everything (uncapped), checkpoint = full
    r1 = CommitlogStreamReader({"path": str(tmp_path)})
    checkpoint = r1.latestOffset()
    assert checkpoint[key] == full

    # restart under cap, with the first-poll grace artificially spent
    # (simulating an engine that probed before planning)
    r2 = CommitlogStreamReader(
        {"path": str(tmp_path), "maxBytesPerTrigger": "64"}
    )
    r2._first_poll = False
    regressed = r2.latestOffset()
    assert regressed[key] < full  # the regression window
    # engine plans (start=checkpoint, end=regressed): nothing re-read
    parts = r2.partitions(checkpoint, regressed)
    assert all(p.hi <= p.lo or p.lo >= full for p in parts if p.path)
    # subsequent polls: served cursor snaps up to the floor, and
    # every later partition starts at or above the checkpoint
    later = r2.latestOffset()
    assert later[key] >= checkpoint[key]
    parts2 = r2.partitions(regressed, later)
    for p in parts2:
        if p.path:
            assert p.lo >= full
