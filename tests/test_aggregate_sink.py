"""AggregateSink (AggregatingMergeTree personality): incremental
per-key aggregate maintenance must equal a one-shot batch groupBy over
the same rows, under replay, compaction, and restart."""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.sources.tables import load_table
from hybrid_cdc_demo_spark.streaming.sinks import AggregateSink

SPECS = {
    "n_events": ("event_id", "count"),
    "sum_value": ("value", "sum"),
    "min_value": ("value", "min"),
    "max_value": ("value", "max"),
}


def _expected(events):
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def _rows(df):
    return sorted(
        (r["user_id"], r["n_events"], round(r["sum_value"], 6),
         r["min_value"], r["max_value"])
        for r in df.collect()
    )


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )


def _batches(events, n=5):
    return [
        events.filter(F.pmod(F.col("event_id"), n) == i) for i in range(n)
    ]


def test_incremental_equals_batch_groupby(spark, events, tmp_path):
    sink = AggregateSink(spark, str(tmp_path), ["user_id"], SPECS,
                         compact_every=100)
    for i, b in enumerate(_batches(events)):
        sink.write_batch(b, i)
    assert _rows(sink.read()) == _rows(_expected(events))


def test_replayed_batch_is_noop(spark, events, tmp_path):
    sink = AggregateSink(spark, str(tmp_path), ["user_id"], SPECS,
                         compact_every=100)
    batches = _batches(events)
    for i, b in enumerate(batches):
        sink.write_batch(b, i)
    # foreachBatch crash-replay: same batchId arrives again
    assert sink.write_batch(batches[2], 2) == 0
    assert _rows(sink.read()) == _rows(_expected(events))


def test_compaction_preserves_state_and_trims_segments(spark, events, tmp_path):
    sink = AggregateSink(spark, str(tmp_path), ["user_id"], SPECS,
                         compact_every=3)
    for i, b in enumerate(_batches(events)):
        sink.write_batch(b, i)
    sink.flush()
    sink.compact()
    assert sink._segments() == []
    assert _rows(sink.read()) == _rows(_expected(events))


def test_restart_resumes_from_disk(spark, events, tmp_path):
    batches = _batches(events)
    sink = AggregateSink(spark, str(tmp_path), ["user_id"], SPECS,
                         compact_every=2)
    for i, b in enumerate(batches[:3]):
        sink.write_batch(b, i)
    sink.flush()
    # process restart: fresh instance over the same directory, and the
    # checkpoint replays an already-committed batch before new ones
    sink2 = AggregateSink(spark, str(tmp_path), ["user_id"], SPECS,
                          compact_every=2)
    assert sink2.write_batch(batches[2], 2) == 0
    for i, b in enumerate(batches[3:], start=3):
        sink2.write_batch(b, i)
    sink2.flush()
    assert _rows(sink2.read()) == _rows(_expected(events))


def test_avg_derives_from_sum_and_count(spark, events, tmp_path):
    sink = AggregateSink(spark, str(tmp_path), ["user_id"], SPECS,
                         compact_every=100)
    for i, b in enumerate(_batches(events)):
        sink.write_batch(b, i)
    got = sink.read().withColumn(
        "avg_value", F.col("sum_value") / F.col("n_events")
    )
    want = events.groupBy("user_id").agg(F.avg("value").alias("avg_value"))
    g = {r["user_id"]: r["avg_value"] for r in got.collect()}
    w = {r["user_id"]: r["avg_value"] for r in want.collect()}
    assert g.keys() == w.keys()
    assert all(abs(g[k] - w[k]) < 1e-9 for k in g)


def test_unsupported_kind_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        AggregateSink(spark, str(tmp_path), ["user_id"],
                      {"x": ("value", "stddev")})
