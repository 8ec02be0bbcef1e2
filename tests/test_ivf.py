"""IVF ANN (KMeans coarse quantizer): recall vs brute force, graceful
degradation to exact search at nprobe == num_cells."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.similarity import (
    brute_force_topk,
    ivf_index,
    ivf_topk,
)
from hybrid_cdc_demo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _query_df(spark, emb):
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    min_id = emb_d.agg(F.min("vec_id").alias("mid"))
    return emb_d.join(F.broadcast(min_id), emb_d.vec_id == F.col("mid")).select(
        F.col("emb").alias("qv")
    )


def test_ivf_index_assigns_every_vector_once(spark):
    emb = load_table(spark, SF, "embeddings")
    indexed, centers = ivf_index(emb, num_cells=16)
    n = emb.count()
    assert indexed.count() == n
    assert indexed.select("vec_id").distinct().count() == n
    cells = indexed.select("_cell").distinct().count()
    assert 2 <= cells <= 16
    assert len(centers) == 16


def test_ivf_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    q = _query_df(spark, emb)
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_topk(emb, q, k=10, num_cells=16, nprobe=6).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"recall {recall}"


def test_ivf_full_probe_is_exact(spark):
    emb = load_table(spark, SF, "embeddings")
    q = _query_df(spark, emb)
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=5).collect()]
    full = [
        r["vec_id"]
        for r in ivf_topk(emb, q, k=5, num_cells=8, nprobe=8).collect()
    ]
    assert exact == full
