"""Streaming incremental near-dup detection (streaming/dedup_stream.py):
each micro-batch is checked against all previously ingested documents
plus itself; signature store grows by exactly the batch; replays are
exactly-once."""

import os

from hybrid_cdc_demo_spark.streaming.dedup_stream import DedupStreamSink

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill and dreams of fish dinners "
    "under the bright summer moon near the old stone bridge"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _unrelated(i):
    return " ".join(f"w{i}_{j} token{(i * 31 + j) % 97}" for j in range(30))


def test_cross_batch_and_within_batch_pairs(spark, tmp_path):
    sink = DedupStreamSink(spark, str(tmp_path / "dd"), threshold=0.5)
    # batch 0: doc 0 and its exact dup doc 1, plus noise
    n0 = sink.write_batch(
        _docs(spark, [(0, BASE), (1, BASE), (4, _unrelated(4))]), 0
    )
    found0 = {(r["id_new"], r["id_old"]) for r in sink.pairs().collect()}
    assert (1, 0) in found0  # within-batch pair
    assert n0 >= 1
    # batch 1: doc 2 is a near-dup of doc 0 (ingested one batch ago)
    sink.write_batch(
        _docs(spark, [(2, BASE.replace("quick", "slow")), (5, _unrelated(5))]), 1
    )
    found1 = {(r["id_new"], r["id_old"]) for r in sink.pairs().collect()}
    assert (2, 0) in found1 and (2, 1) in found1  # cross-batch pairs
    assert (1, 0) in found1  # batch-0 result still present
    # unrelated docs never pair
    for a, b in found1:
        assert not (a >= 4 and b >= 4)
    # est_jaccard of the exact dup is 1.0 (identical signatures)
    est = {
        (r["id_new"], r["id_old"]): r["est_jaccard"]
        for r in sink.pairs().collect()
    }
    assert est[(1, 0)] == 1.0


def test_replay_is_exactly_once(spark, tmp_path):
    sink = DedupStreamSink(spark, str(tmp_path / "dd2"), threshold=0.5)
    b0 = _docs(spark, [(0, BASE), (1, BASE)])
    assert sink.write_batch(b0, 0) == 1
    # ledger short-circuit: same batch id again is a no-op
    assert sink.write_batch(b0, 0) == 0
    assert sink.pairs().count() == 1
    assert sink.signatures().count() == 2
    # a NEW sink on the same path (restart) sees the committed state
    sink2 = DedupStreamSink(spark, str(tmp_path / "dd2"), threshold=0.5)
    assert sink2.write_batch(b0, 0) == 0
    assert sink2.pairs().count() == 1


def test_cross_batch_pair_found_regardless_of_id_order(spark, tmp_path):
    """A new doc must pair with a similar HISTORICAL doc even when the
    historical id is larger (history matching is id-order-free; only
    within-batch pairs use the a<b convention)."""
    sink = DedupStreamSink(spark, str(tmp_path / "dd4"), threshold=0.5)
    sink.write_batch(_docs(spark, [(7, BASE)]), 0)
    sink.write_batch(_docs(spark, [(3, BASE.replace("quick", "slow"))]), 1)
    found = {(r["id_new"], r["id_old"]) for r in sink.pairs().collect()}
    assert (3, 7) in found


def test_streaming_end_to_end(spark, tmp_path):
    """Drive the sink from a real file stream: 3 parquet chunks →
    3 micro-batches; final pairs equal the single-shot batch answer."""
    rows = [(0, BASE), (1, BASE), (2, BASE.replace("quick", "slow"))] + [
        (i, _unrelated(i)) for i in range(4, 10)
    ]
    docs = _docs(spark, rows)
    src = str(tmp_path / "src")
    for i in range(3):
        chunk = _docs(spark, rows[i * 3 : (i + 1) * 3])
        chunk.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"chunk{i}")
        )
    sink = DedupStreamSink(spark, str(tmp_path / "dd3"), threshold=0.5)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/chunk*")
    )
    q = (
        stream.writeStream.foreachBatch(sink.write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    found = {(r["id_new"], r["id_old"]) for r in sink.pairs().collect()}
    assert (1, 0) in found and (2, 0) in found and (2, 1) in found
    for a, b in found:
        assert not (a >= 4 and b >= 4)
    assert sink.signatures().count() == len(rows)


def test_compaction_preserves_state_and_matching(spark, tmp_path):
    """compact() folds the per-batch partitions into _batch=-1 without
    losing pairs/signatures, and later batches still match against the
    compacted history."""
    sink = DedupStreamSink(spark, str(tmp_path / "dd5"), threshold=0.5)
    sink.write_batch(_docs(spark, [(0, BASE), (1, BASE)]), 0)
    sink.write_batch(_docs(spark, [(4, _unrelated(4))]), 1)
    before_pairs = {
        (r["id_new"], r["id_old"]) for r in sink.pairs().collect()
    }
    before_sigs = sink.signatures().count()
    sink.compact()
    assert {
        (r["id_new"], r["id_old"]) for r in sink.pairs().collect()
    } == before_pairs
    assert sink.signatures().count() == before_sigs
    # one base partition only
    import os as _os

    parts = [
        d
        for d in _os.listdir(str(tmp_path / "dd5" / "bands"))
        if d.startswith("_batch=")
    ]
    assert parts == ["_batch=-1"]
    # new batch still pairs against compacted history
    sink.write_batch(_docs(spark, [(2, BASE.replace("quick", "slow"))]), 2)
    found = {(r["id_new"], r["id_old"]) for r in sink.pairs().collect()}
    assert (2, 0) in found and (2, 1) in found
