"""Round-4 hardening: regression pins for the ADVICE findings —
the optimize() sweep TOCTOU (data loss), optimize/vacuum
serialization, as_stream replay-after-consolidation, band_join's
default same-name column path, and commitlog latestOffset racing
retention."""

import shutil

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.streaming.sinks import AppendSink

SCHEMA = (
    "user_id long, event_id string, event_type string, "
    "timestamp_micros long, columns string"
)


def _batch(spark, bid, user=1):
    return spark.createDataFrame(
        [(user, f"e{bid}", "INSERT", 100 + bid, '{"v":"x"}')], SCHEMA
    )


def _write_n(spark, path, n, **kw):
    sink = AppendSink(spark, path, ["user_id"], delete_policy="tombstone", **kw)
    for bid in range(n):
        sink.write_batch(_batch(spark, bid, user=bid % 3), batch_id=bid)
    return sink


def test_sweep_never_deletes_fresh_segment(spark, tmp_path):
    """TOCTOU regression: a seg committed AFTER the sweep's live-entry
    snapshot was taken must survive the sweep — with the old
    snapshot-membership test it was rmtree'd as 'shadowed garbage'
    (silent loss of a committed batch)."""
    sink = _write_n(spark, str(tmp_path / "ch"), 3)
    stale_entries = sink._log_entries()  # snapshot BEFORE the new write
    sink.write_batch(_batch(spark, 3), batch_id=3)  # concurrent commit
    sink._sweep_shadowed(stale_entries, keep_originals=False)
    names = {p.name for p in (tmp_path / "ch" / "log").iterdir()}
    assert "seg-000000000003" in names  # fresh seg survived
    assert sink.read_raw().count() == 4  # nothing lost


def test_sweep_still_removes_provably_shadowed(spark, tmp_path):
    """The proof-based sweep still reclaims true crash leftovers: an
    original whose range a DIFFERENT live cseg fully covers."""
    sink = _write_n(spark, str(tmp_path / "ch"), 3)
    log = tmp_path / "ch" / "log"
    backup = tmp_path / "backup"
    shutil.copytree(log, backup)
    sink.optimize(min_segments=2)
    for seg in backup.iterdir():  # resurrect originals (crash window)
        shutil.copytree(seg, log / seg.name)
    sink._sweep_shadowed(sink._log_entries(), keep_originals=False)
    assert [p.name for p in log.iterdir()] == ["cseg-000000000000-000000000002"]


def test_keep_segments_mode_shadows_instead_of_deleting(spark, tmp_path):
    """keep_segments_for_streams=True: optimize folds into a cseg but
    leaves the per-batch segments on disk (shadowed — batch readers
    still count each row once); vacuum's retention horizon reclaims
    them later."""
    sink = _write_n(
        spark, str(tmp_path / "ch"), 4,
        optimize_every=None, keep_segments_for_streams=True,
    )
    assert sink.optimize(min_segments=2) == 4
    names = sorted(p.name for p in (tmp_path / "ch" / "log").iterdir())
    assert "cseg-000000000000-000000000003" in names
    assert sum(n.startswith("seg-") for n in names) == 4  # originals kept
    # shadowing: batch readers see each row exactly once
    assert sink.read_raw().count() == 4
    assert all("cseg-" in f for f in sink.read_raw().inputFiles())
    # retention horizon reclaims the shadowed originals (not live ⇒
    # removed-count stays 0 until the cseg itself ages out)
    assert sink.vacuum(retain_after_batch=3) == 1
    assert list((tmp_path / "ch" / "log").iterdir()) == []


def test_as_stream_segments_mode_skips_consolidations(spark, tmp_path):
    """A running as_stream consumer must NOT re-receive the whole
    consolidated history after optimize() (the O(n²) replay /
    double-count finding): in the default 'segments' history mode the
    cseg written by optimize is never delivered."""
    sink = _write_n(
        spark, str(tmp_path / "ch"), 3,
        optimize_every=None, keep_segments_for_streams=True,
    )
    counts = sink.as_stream().groupBy("user_id").count()
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            counts.writeStream.format("memory")
            .queryName("r4_tail")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = {r["user_id"]: r["count"] for r in spark.sql(
        "SELECT * FROM r4_tail").collect()}
    assert first == {0: 1, 1: 1, 2: 1}

    sink.optimize(min_segments=2)  # folds 0-2 into a cseg
    sink.write_batch(_batch(spark, 3, user=0), batch_id=3)
    drain()
    second = {r["user_id"]: r["count"] for r in spark.sql(
        "SELECT * FROM r4_tail").collect()}
    # only the NEW segment was ingested — no replay of batches 0-2
    assert second == {0: 2, 1: 1, 2: 1}


def test_as_stream_history_all_delivers_consolidations(spark, tmp_path):
    """history='all' keeps the old late-starter semantics: a consumer
    started after originals were reclaimed still sees full history via
    the cseg (at-least-once; dedupe downstream)."""
    sink = _write_n(spark, str(tmp_path / "ch"), 3, optimize_every=None)
    sink.optimize(min_segments=2)  # default mode deletes originals
    # a deleting sink DEFAULTS to 'all' — the loss-free mode: a late
    # starter still sees full history via the cseg after originals
    # were reclaimed (explicit history='segments' on such a sink is
    # the documented opt-in that can skip reclaimed segments)
    q = (
        sink.as_stream()
        .writeStream.format("memory")
        .queryName("r4_all")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_all"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.sql("SELECT * FROM r4_all").count() == 3
    # while explicit 'segments' mode sees nothing (originals gone)
    q2 = (
        sink.as_stream(history="segments")
        .writeStream.format("memory")
        .queryName("r4_segonly")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_seg"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.sql("SELECT * FROM r4_segonly").count() == 0


def test_as_stream_default_never_loses_on_deleting_sink(spark, tmp_path):
    """Review regression pin: with ALL defaults (deleting optimize,
    default as_stream), a consumer that lags an optimize must still
    receive every row — possibly twice (at-least-once via the cseg),
    NEVER zero. The round-4 interim default (segments-mode on a
    deleting sink) silently dropped batches the consumer hadn't read
    when optimize reclaimed them."""
    sink = _write_n(spark, str(tmp_path / "ch"), 3, optimize_every=None)
    stream = sink.as_stream()  # default resolution: deleting ⇒ 'all'
    sink.optimize(min_segments=2)  # originals deleted BEFORE first read
    q = (
        stream.writeStream.format("memory")
        .queryName("r4_noloss")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_noloss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["event_id"] for r in spark.sql("SELECT * FROM r4_noloss").collect()}
    assert got == {"e0", "e1", "e2"}  # nothing lost


def test_band_join_default_same_column_name(spark):
    """ADVICE low: the documented default (right_value_col=None →
    same column name both sides) must work, not raise an ambiguous-
    reference AnalysisException."""
    from hybrid_cdc_demo_spark.operators.rangejoin import band_join

    left = spark.createDataFrame([(1, 1.00), (2, 5.00)], "lid int, v double")
    right = spark.createDataFrame([(10, 1.04), (20, 9.00)], "rid int, v double")
    out = band_join(left, right, "v", 0.1)
    rows = {(r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()}
    assert rows == {(1, 10)}
    assert "__band" not in out.columns


def test_commitlog_latest_offset_tolerates_vanished_file(tmp_path, monkeypatch):
    """ADVICE low: a segment deleted by retention between the glob and
    the stat must not fail the streaming query's offset planning — the
    vanished file keeps its last known offset."""
    import os as _os

    from hybrid_cdc_demo_spark.sources import commitlog_source as cs

    seg = tmp_path / "seg-0.log"
    seg.write_bytes(b"")
    reader = cs.CommitlogStreamReader({"path": str(tmp_path)})

    real_getsize = _os.path.getsize

    def racy_getsize(p):
        if str(p) == str(seg):
            raise FileNotFoundError(p)
        return real_getsize(p)

    monkeypatch.setattr(cs.os.path, "getsize", racy_getsize)
    off = reader.latestOffset()  # must not raise
    assert off.get(str(seg), 0) == 0
