"""ANN operators: LSH top-k recall vs brute force; near-dup pairs."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators import similarity as S
from hybrid_cdc_demo_spark.sources.tables import load_table


def _query_df(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    min_id = emb_d.agg(F.min("vec_id").alias("mid"))
    return (
        emb_d.join(F.broadcast(min_id), emb_d.vec_id == F.col("mid"))
        .select(F.col("emb").alias("qv"))
    )


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = mat[np.argmin(ids)]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:10]
    expected = list(ids[order])

    out = S.brute_force_topk(emb, _query_df(spark, sf_dir), k=10).collect()
    assert [r["vec_id"] for r in out] == expected


def test_lsh_topk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_df(spark, sf_dir)
    exact = {r["vec_id"] for r in S.brute_force_topk(emb, q, k=10).collect()}
    approx = {r["vec_id"] for r in S.lsh_topk(emb, q, k=10, num_planes=8).collect()}
    # multiprobe SRP-LSH on random data: expect decent overlap, and the
    # query vector itself (cos=1.0) must always be found
    recall = len(exact & approx) / 10
    assert recall >= 0.3, f"recall {recall}"
    assert min(exact) in approx


def test_srp_bucket_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    b1 = {r["vec_id"]: r["bucket"] for r in S.srp_buckets(emb, num_planes=8).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in S.srp_buckets(emb, num_planes=8).collect()}
    assert b1 == b2


def test_embedding_neardup_finds_duplicated_vector(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 16)).astype(float)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    rows.append((999, [float(x) for x in vecs[0]]))  # exact copy of vec 0
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = S.embedding_neardup_pairs(df, threshold=0.99, num_planes=8)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 999) in found
