"""AS OF (time travel) reads on the append-log sink: the dedup view
over a log PREFIX must equal what read() returned right after that
batch committed, and the scan must plan only the prefix's segment
files (file-level pruning, not a post-hoc filter)."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.streaming.sinks import AppendSink, latest_per_key

SCHEMA = (
    "user_id long, event_id string, event_type string, "
    "timestamp_micros long, columns string"
)

BATCHES = [
    # batch 0: two users insert
    [(1, "e0", "INSERT", 100, '{"v":"a"}'), (2, "e1", "INSERT", 110, '{"v":"b"}')],
    # batch 1: user 1 updated, user 3 appears
    [(1, "e2", "UPDATE", 200, '{"v":"a2"}'), (3, "e3", "INSERT", 210, '{"v":"c"}')],
    # batch 2: user 2 deleted, user 1 updated again
    [(2, "e4", "DELETE", 300, None), (1, "e5", "UPDATE", 310, '{"v":"a3"}')],
]


def _write_all(spark, path, policy="tombstone"):
    sink = AppendSink(spark, path, ["user_id"], delete_policy=policy)
    for bid, rows in enumerate(BATCHES):
        sink.write_batch(spark.createDataFrame(rows, SCHEMA), batch_id=bid)
    return sink


def test_read_asof_equals_prefix_state(spark, tmp_path):
    sink = _write_all(spark, str(tmp_path / "ch"))
    for upto in range(len(BATCHES)):
        expected_raw = spark.createDataFrame(
            [r for rows in BATCHES[: upto + 1] for r in rows], SCHEMA
        )
        expected = (
            latest_per_key(expected_raw, ["user_id"])
            .filter(F.col("event_type") != "DELETE")
            .select("user_id", "event_id")
        )
        got = sink.read_asof(upto).select("user_id", "event_id")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, expected.collect())
        ), f"as-of batch {upto}"


def test_read_asof_full_log_equals_read(spark, tmp_path):
    sink = _write_all(spark, str(tmp_path / "ch"))
    assert sorted(map(tuple, sink.read_asof(2).collect())) == sorted(
        map(tuple, sink.read().collect())
    )


def test_read_asof_prunes_segment_files(spark, tmp_path):
    """AS OF 0 must PLAN only seg-0's files — newer segments are
    excluded at file-list level, never scanned-then-filtered."""
    sink = _write_all(spark, str(tmp_path / "ch"))
    files = sink.read_raw_asof(0).inputFiles()
    assert files, "prefix read planned no files"
    assert all("seg-000000000000" in f for f in files), files


def test_read_asof_before_first_batch_is_empty_with_schema(spark, tmp_path):
    sink = _write_all(spark, str(tmp_path / "ch"))
    empty = sink.read_asof(-1)
    assert empty.count() == 0
    # full projected schema preserved (the _schema.json contract)
    assert "columns" in empty.columns


def test_read_asof_skip_policy_drops_deletes_from_log(spark, tmp_path):
    """Under the reference-parity skip policy DELETEs never enter the
    log, so user 2 survives every snapshot (documented divergence)."""
    sink = _write_all(spark, str(tmp_path / "ch"), policy="skip")
    users = {r["user_id"] for r in sink.read_asof(2).collect()}
    assert users == {1, 2, 3}


def test_changes_between_returns_exact_range(spark, tmp_path):
    """CDF: (after, upto] must return exactly those batches' raw rows,
    planned from only the range's segment files."""
    sink = _write_all(spark, str(tmp_path / "ch"))
    feed = sink.changes_between(0, 2)
    got = sorted(r["event_id"] for r in feed.collect())
    assert got == ["e2", "e3", "e4", "e5"]  # batches 1 and 2 only
    files = feed.inputFiles()
    assert files and all(
        "seg-000000000001" in f or "seg-000000000002" in f for f in files
    )
    # batch ids preserved for commit-order application
    assert {r["_batch_id"] for r in feed.collect()} == {1, 2}


def test_changes_between_empty_range(spark, tmp_path):
    sink = _write_all(spark, str(tmp_path / "ch"))
    empty = sink.changes_between(2, 2)
    assert empty.count() == 0
    assert "columns" in empty.columns  # schema contract preserved


def test_snapshot_plus_changes_equals_next_snapshot(spark, tmp_path):
    """The CDF invariant that makes incremental consumers correct:
    state(asof k) applied with changes (k, m] == state(asof m)."""
    sink = _write_all(spark, str(tmp_path / "ch"))
    base = sink.read_asof(0).drop("_batch_id")
    feed = sink.changes_between(0, 2).drop("_batch_id")
    replayed = (
        latest_per_key(base.unionByName(feed), ["user_id"])
        .filter(F.col("event_type") != "DELETE")
        .select("user_id", "event_id")
    )
    direct = sink.read_asof(2).select("user_id", "event_id")
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_append_log_tails_as_stream_incrementally(spark, tmp_path):
    """Multi-hop composition: the sink's log is a streaming SOURCE.
    A downstream consumer drains the existing batches, then a LATER
    write is picked up incrementally on the next trigger from the same
    checkpoint (no reprocessing of old segments)."""
    sink = _write_all(spark, str(tmp_path / "ch"))

    downstream = sink.as_stream().groupBy("user_id").count()
    ckpt = str(tmp_path / "ckpt_tail")

    def drain():
        q = (
            downstream.writeStream.format("memory")
            .queryName("tail_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = {r["user_id"]: r["count"] for r in spark.sql(
        "SELECT * FROM tail_test").collect()}
    assert first == {1: 3, 2: 2, 3: 1}  # all raw rows across 3 batches

    sink.write_batch(
        spark.createDataFrame(
            [(3, "e6", "UPDATE", 400, '{"v":"c2"}')], SCHEMA
        ),
        batch_id=3,
    )
    drain()
    second = {r["user_id"]: r["count"] for r in spark.sql(
        "SELECT * FROM tail_test").collect()}
    assert second == {1: 3, 2: 2, 3: 2}  # only the new segment ingested


def test_as_stream_requires_schema_sidecar(spark, tmp_path):
    from hybrid_cdc_demo_spark.streaming.sinks import AppendSink

    fresh = AppendSink(spark, str(tmp_path / "empty"), ["user_id"])
    try:
        fresh.as_stream()
        raise AssertionError("expected ValueError before first write")
    except ValueError:
        pass


def test_optimize_folds_segments_preserving_all_reads(spark, tmp_path):
    """OPTIMIZE consolidates per-batch dirs into one cseg while read(),
    read_asof (incl. a cutoff INSIDE the consolidated range, via the
    row-level _batch_id filter), and changes_between stay exact."""
    sink = _write_all(spark, str(tmp_path / "ch"))
    before_read = sorted(map(tuple, sink.read().collect()))
    before_asof1 = sorted(
        map(tuple, sink.read_asof(1).select("user_id", "event_id").collect())
    )
    before_cdf = sorted(
        r["event_id"] for r in sink.changes_between(0, 2).collect()
    )

    folded = sink.optimize(min_segments=2)
    assert folded == 3
    names = [p.name for p in (tmp_path / "ch" / "log").iterdir()]
    assert names == ["cseg-000000000000-000000000002"]

    assert sorted(map(tuple, sink.read().collect())) == before_read
    assert (
        sorted(
            map(
                tuple,
                sink.read_asof(1).select("user_id", "event_id").collect(),
            )
        )
        == before_asof1
    )
    assert (
        sorted(r["event_id"] for r in sink.changes_between(0, 2).collect())
        == before_cdf
    )


def test_optimize_shadowing_prevents_double_counting(spark, tmp_path):
    """Crash window between consolidation-rename and original-removal:
    both the cseg and its originals exist — readers must count each
    row ONCE (shadowing), and the next optimize sweeps the leftovers."""
    import shutil

    sink = _write_all(spark, str(tmp_path / "ch"))
    log = tmp_path / "ch" / "log"
    # simulate the crash window: build the consolidation but keep
    # the originals by restoring them afterwards
    backup = tmp_path / "backup"
    shutil.copytree(log, backup)
    sink.optimize(min_segments=2)
    for seg in backup.iterdir():
        shutil.copytree(seg, log / seg.name)
    assert len(list(log.iterdir())) == 4  # cseg + 3 shadowed originals

    raw = sink.read_raw()
    assert raw.count() == 6  # not 12 — shadowed dirs ignored
    # files planned come only from the consolidation
    assert all("cseg-" in f for f in raw.inputFiles())

    # the next optimize sweeps the shadowed leftovers
    sink.optimize(min_segments=1)
    assert [p.name for p in log.iterdir()] == [
        "cseg-000000000000-000000000002"
    ]
    assert sink.read_raw().count() == 6


def test_optimize_then_more_batches_reconsolidates_wider(spark, tmp_path):
    sink = _write_all(spark, str(tmp_path / "ch"))
    sink.optimize(min_segments=2)
    sink.write_batch(
        spark.createDataFrame([(9, "e9", "INSERT", 900, '{"v":"z"}')], SCHEMA),
        batch_id=3,
    )
    # cseg(0-2) + seg-3 -> cseg(0-3)
    assert sink.optimize(min_segments=2) == 2
    log = tmp_path / "ch" / "log"
    assert [p.name for p in log.iterdir()] == [
        "cseg-000000000000-000000000003"
    ]
    users = {r["user_id"] for r in sink.read().collect()}
    assert users == {1, 3, 9}  # u2 deleted; all batches present


def test_optimize_below_threshold_is_noop(spark, tmp_path):
    sink = _write_all(spark, str(tmp_path / "ch"))
    assert sink.optimize(min_segments=10) == 0
    assert len(list((tmp_path / "ch" / "log").iterdir())) == 3


def test_background_auto_optimize_bounds_file_count(spark, tmp_path):
    from hybrid_cdc_demo_spark.streaming.sinks import AppendSink

    sink = AppendSink(
        spark, str(tmp_path / "ch"), ["user_id"],
        delete_policy="tombstone", optimize_every=4,
    )
    for bid in range(10):
        sink.write_batch(
            spark.createDataFrame(
                [(bid % 3, f"e{bid}", "INSERT", 100 + bid, '{"v":"x"}')],
                SCHEMA,
            ),
            batch_id=bid,
        )
        sink.flush()  # deterministic: wait out each background fold
    log = tmp_path / "ch" / "log"
    assert len(list(log.iterdir())) < 10  # consolidation kicked in
    assert sink.read_raw().count() == 10  # nothing lost
    assert {r["user_id"] for r in sink.read().collect()} == {0, 1, 2}


def test_vacuum_drops_history_keeps_suffix(spark, tmp_path):
    sink = _write_all(spark, str(tmp_path / "ch"))
    removed = sink.vacuum(retain_after_batch=1)  # drop batches 0 and 1
    assert removed == 2
    # the suffix (batch 2) remains; history below the cutoff is gone
    assert {r["event_id"] for r in sink.read_raw().collect()} == {"e4", "e5"}
    assert sink.changes_between(1, 2).count() == 2
    # time travel below the cutoff now sees only the retained suffix
    assert sink.read_asof(1).count() == 0


def test_upsert_compaction_clusters_base_by_key(spark, tmp_path):
    """Sorted compaction: the rewritten base's parquet row groups must
    carry NON-OVERLAPPING key ranges (within each file), so point
    reads skip non-matching row groups via footer stats."""
    import pyarrow.parquet as pq

    from hybrid_cdc_demo_spark.streaming.sinks import UpsertSink

    sink = UpsertSink(spark, str(tmp_path / "pg"), ["user_id"], compact_every=999)
    rows = [
        (uid, f"e{uid}", "INSERT", 100 + uid, '{"v":"x"}')
        for uid in range(2000)
    ]
    import random

    random.Random(3).shuffle(rows)  # arrival order is NOT key order
    sink.write_batch(
        spark.createDataFrame(rows[:1000], SCHEMA), batch_id=0
    )
    sink.write_batch(
        spark.createDataFrame(rows[1000:], SCHEMA), batch_id=1
    )
    sink.compact()

    base_dir = tmp_path / "pg" / "data"
    files = sorted(p for p in base_dir.rglob("*.parquet"))
    assert files
    checked = 0
    for f in files:
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.names.index("user_id")
        ranges = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                ranges.append((st.min, st.max))
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, f"overlapping row-group key ranges in {f}"
            checked += 1
    # the clustered view still reads correctly
    assert sink.read().count() == 2000
