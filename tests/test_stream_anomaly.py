"""Streaming prequential anomaly detector (streaming/anomaly.py):
pure-scorer unit tests plus a checkpointed multi-batch e2e replay that
must equal the batch oracle semantics (ns_prequential_anomaly) on the
same rows."""

import json
import math
import os
import time

from hybrid_cdc_demo_spark.streaming.anomaly import (
    prequential_flags,
    stream_value_anomaly,
)


class TestPrequentialScorer:
    def test_warmup_then_spike(self):
        zs, n, sx, sxx = prequential_flags(
            [10.0, 10.0, 10.0, 11.0, 9.0, 50.0], 0, 0.0, 0.0, 2.0
        )
        assert zs[0] is None and zs[1] is None  # n < 2 warmup
        assert zs[2] is None  # prior values identical -> var 0
        assert zs[5] is not None and abs(zs[5]) > 2.0  # the spike
        assert n == 6 and sx == 100.0

    def test_matches_batch_formula(self):
        vals = [3.0, 7.0, 5.0, 9.0]
        zs, *_ = prequential_flags(vals, 0, 0.0, 0.0, 2.0)
        # third value: prior = [3, 7] -> mean 5, sample std sqrt(8)
        assert abs(zs[2] - (5.0 - 5.0) / math.sqrt(8.0)) < 1e-12
        prior = vals[:3]
        m = sum(prior) / 3
        var = sum((v - m) ** 2 for v in prior) / 2
        assert abs(zs[3] - (9.0 - m) / math.sqrt(var)) < 1e-12

    def test_state_resumes_mid_sequence(self):
        vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
        full, *_ = prequential_flags(vals, 0, 0.0, 0.0, 2.0)
        a, n, sx, sxx = prequential_flags(vals[:3], 0, 0.0, 0.0, 2.0)
        b, *_ = prequential_flags(vals[3:], n, sx, sxx, 2.0)
        got = a + b
        for f, g in zip(full, got):
            assert (f is None) == (g is None)
            if f is not None:
                assert abs(f - g) < 1e-12


def _write_jsonl(path, rows, mtime):
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def test_stream_equals_prequential_replay(spark, tmp_path):
    """Two ordered micro-batches through the stateful operator must
    equal a single prequential pass over the concatenated rows — the
    state carries (n, sx, sxx) across batches."""
    b1 = [
        {"event_id": 1, "event_type": "view", "value": 10.0,
         "ts": "2024-01-01T10:00:00Z"},
        {"event_id": 2, "event_type": "view", "value": 12.0,
         "ts": "2024-01-01T10:01:00Z"},
        {"event_id": 3, "event_type": "click", "value": 5.0,
         "ts": "2024-01-01T10:02:00Z"},
        {"event_id": 4, "event_type": "view", "value": 11.0,
         "ts": "2024-01-01T10:03:00Z"},
    ]
    b2 = [
        {"event_id": 5, "event_type": "view", "value": 50.0,
         "ts": "2024-01-01T11:00:00Z"},  # spike vs batch-1 state
        {"event_id": 6, "event_type": "click", "value": 6.0,
         "ts": "2024-01-01T11:01:00Z"},
        {"event_id": 7, "event_type": "view", "value": 11.5,
         "ts": "2024-01-01T11:02:00Z"},
    ]
    now = time.time()
    src = tmp_path / "ev"
    _write_jsonl(src / "b1.json", b1, now - 100)
    _write_jsonl(src / "b2.json", b2, now - 50)

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream_value_anomaly(stream)
        .writeStream.format("memory")
        .queryName("anomaly_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r
        for r in spark.sql("SELECT * FROM anomaly_test").collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}

    # prequential replay over the concatenated per-key sequences
    rows = sorted(b1 + b2, key=lambda r: (r["ts"], r["event_id"]))
    for key in ("view", "click"):
        vals = [r["value"] for r in rows if r["event_type"] == key]
        ids = [r["event_id"] for r in rows if r["event_type"] == key]
        zs, *_ = prequential_flags(vals, 0, 0.0, 0.0, 2.0)
        for eid, z in zip(ids, zs):
            g = got[eid]
            if z is None:
                assert g["z"] is None and g["is_anomaly"] is None
            else:
                assert abs(g["z"] - z) < 1e-9
                assert g["is_anomaly"] == int(abs(z) > 2.0)
    # the spike in batch 2 is only a spike BECAUSE batch-1 state carried
    assert got[5]["is_anomaly"] == 1
