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


def test_pq_streaming_ingestion_and_probe(spark, tmp_path):
    """Stream the corpus in 3 micro-batches through the PQ sink:
    codebooks freeze on batch 0, later batches encode against them,
    every row is indexed exactly once, and a full probe retrieves the
    query vector itself first (it is a corpus member)."""
    from hybrid_cdc_demo_spark.streaming.vector_index import PQVectorIndexSink

    emb = load_table(spark, SF, "embeddings")
    src = str(tmp_path / "src")
    _split_parquet(emb, src)

    idx_path = str(tmp_path / "pqidx")
    sink = PQVectorIndexSink(
        spark, idx_path, dim=64, num_cells=8, m=4, k_codes=8,
        train_partitions=8,
    )
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
    q.awaitTermination(180)

    n_corpus = emb.count()
    meta = json.load(open(os.path.join(idx_path, "index.json")))
    assert meta["indexed_rows"] == n_corpus
    enc = spark.read.parquet(os.path.join(idx_path, "data"))
    assert enc.count() == n_corpus
    assert enc.select("vec_id").distinct().count() == n_corpus
    # codes span >1 batch partition (the stream really delivered in parts)
    assert enc.select("_batch").distinct().count() >= 2

    qv = [
        float(x)
        for x in emb.orderBy("vec_id").first()["embedding"]
    ]
    rows = sink.topk(qv, topk=5, nprobe=8).collect()
    assert rows[0]["vec_id"] == emb.agg(F.min("vec_id")).first()[0]
    dists = [r["adc_d2"] for r in rows]
    assert dists == sorted(dists)


def test_pq_sink_replay_is_exactly_once(spark, tmp_path):
    from hybrid_cdc_demo_spark.streaming.vector_index import PQVectorIndexSink

    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 200)
    idx_path = str(tmp_path / "pqidx")
    sink = PQVectorIndexSink(
        spark, idx_path, dim=64, num_cells=4, m=2, k_codes=4,
        train_partitions=4,
    )
    assert sink.write_batch(emb, 0) == 200
    # ledger short-circuit: replaying the same batch id writes nothing
    assert sink.write_batch(emb, 0) == 0
    enc = spark.read.parquet(os.path.join(idx_path, "data"))
    assert enc.count() == 200
    meta = json.load(open(os.path.join(idx_path, "index.json")))
    assert meta["indexed_rows"] == 200
