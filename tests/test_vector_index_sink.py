"""Streaming IVF maintenance (streaming/vector_index.py): continuous
embedding ingestion into the persisted partition-pruned ANN index."""

import json
import os

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.similarity import brute_force_topk
from hybrid_cdc_demo_spark.sources.tables import load_table
from hybrid_cdc_demo_spark.streaming.vector_index import VectorIndexSink

SF = "/root/testdata/sf0.01"


def _query_df(spark, emb):
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    min_id = emb_d.agg(F.min("vec_id").alias("mid"))
    return emb_d.join(F.broadcast(min_id), emb_d.vec_id == F.col("mid")).select(
        F.col("emb").alias("qv")
    )


def _split_parquet(emb, path, parts=3):
    """Write the corpus as N single-file parquet chunks so the file
    stream delivers N micro-batches (maxFilesPerTrigger=1)."""
    n = emb.count()
    per = (n + parts - 1) // parts
    for i in range(parts):
        chunk = emb.filter(
            (F.col("vec_id") >= i * per) & (F.col("vec_id") < (i + 1) * per)
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, f"chunk{i}")
        )


def test_streaming_ingestion_matches_brute_force(spark, tmp_path):
    """Stream the corpus in 3 micro-batches through the sink; the
    full-probe top-k over the final index must equal brute force over
    the whole corpus, and every row must be indexed exactly once."""
    emb = load_table(spark, SF, "embeddings")
    src = str(tmp_path / "src")
    _split_parquet(emb, src)

    idx_path = str(tmp_path / "vecidx")
    sink = VectorIndexSink(spark, idx_path, num_cells=8, seed=42)

    stream = (
        spark.readStream.schema(emb.schema)
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

    qdf = _query_df(spark, emb)
    got = [r["vec_id"] for r in sink.topk(qdf, k=10, nprobe=8).collect()]
    exact = [r["vec_id"] for r in brute_force_topk(emb, qdf, k=10).collect()]
    assert got == exact

    with open(os.path.join(idx_path, "centroids.json")) as fh:
        meta = json.load(fh)
    assert meta["indexed_rows"] == emb.count()


def test_replayed_batch_is_exactly_once(spark, tmp_path):
    """Re-delivering a committed batch id must not duplicate rows
    (ledger short-circuit), and even a forced re-write of the same
    batch id only overwrites its own _batch partitions."""
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 200)
    idx_path = str(tmp_path / "vecidx2")
    sink = VectorIndexSink(spark, idx_path, num_cells=4, seed=42)
    n0 = sink.write_batch(emb, 0)
    assert n0 == 200
    # ledger replay: no-op
    assert sink.write_batch(emb, 0) == 0
    # crash-window replay: ledger lost, same batch id rewritten —
    # dynamic partition overwrite keeps the data exactly-once
    sink.ledger._committed.discard(0)
    sink.write_batch(emb, 0)
    from hybrid_cdc_demo_spark.operators.similarity import ivf_read

    indexed, _, _ = ivf_read(spark, idx_path)
    assert indexed.count() == 200
    assert indexed.select("vec_id").distinct().count() == 200
