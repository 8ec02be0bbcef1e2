#!/usr/bin/env python
"""Interleaved single-session A/B for the round-11 optimization batch:
each target pairs the CURRENT query/operator ("new") against an inline
reconstruction of the pre-change shape ("old"), alternated old/new for
--rounds rounds with a calibration probe between rounds (PERF.md:
inter-session swings reach 3x, so only interleaved same-JVM
comparisons are valid). noop-sink materialization per guide §1.4.

Usage: python tools/ab_shapes_r11.py --targets funnel,triangles,fuzzy
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


# ---------------------------------------------------------------- old shapes

def old_funnel(spark, sf_dir):
    """ns_funnel_conversion without the stage-frame checkpoints: every
    stage count re-runs the full stage chain (12 events scans)."""
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.plans.analytics_queries import FUNNEL_STAGES
    from hybrid_cdc_demo_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    frames, prev = [], None
    for st in FUNNEL_STAGES:
        f = events.filter(F.col("event_type") == st)
        if prev is not None:
            f = f.join(
                prev.select("user_id", F.col("t").alias("_prev_t")), "user_id"
            ).filter(F.col("ts") > F.col("_prev_t"))
        cur = f.groupBy("user_id").agg(F.min("ts").alias("t"))
        frames.append(cur)
        prev = cur
    counts = None
    for i, (st, fr) in enumerate(zip(FUNNEL_STAGES, frames)):
        row = fr.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i + 1).cast("int").alias("stage_idx"),
            F.lit(st).alias("stage"),
            "n_users",
        )
        counts = row if counts is None else counts.unionAll(row)
    w = Window.orderBy("stage_idx")
    n = F.col("n_users").cast("double")
    prev_c, head = F.lag("n_users").over(w), F.first("n_users").over(w)
    return counts.select(
        "stage_idx",
        "stage",
        "n_users",
        F.when(prev_c > 0, n / prev_c.cast("double")).alias("conv_from_prev"),
        F.when(head > 0, n / head.cast("double")).alias("conv_from_first"),
    ).orderBy("stage_idx")


def old_triangles(spark, sf_dir):
    """ns_graph_triangles without the edges/deg/oriented checkpoints
    (the corpus tokenize+explode+distinct re-ran ~40x in one plan)."""
    from hybrid_cdc_demo_spark.operators.graph import token_edges
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    edges = token_edges(docs)
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("_db"))
    e = edges.join(da, "a").join(db, "b")
    fwd = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    o2 = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    wedges = oriented.join(o2, "v").select("u", "w")
    closing = oriented.select(F.col("u"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["u", "w"], "left_semi").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    wedge_total = deg.agg(
        F.sum((F.col("deg") * (F.col("deg") - 1) / 2).cast("long")).alias(
            "n_wedges"
        )
    )
    counts = edges.agg(F.count("*").cast("long").alias("n_edges"))
    nodes = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    cc = F.when(
        F.col("n_wedges") > 0,
        F.lit(3.0)
        * F.col("n_triangles").cast("double")
        / F.col("n_wedges").cast("double"),
    )
    return (
        nodes.crossJoin(counts)
        .crossJoin(tri)
        .crossJoin(wedge_total)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            cc.alias("global_clustering"),
        )
    )


def old_fuzzy(spark, sf_dir):
    """ns_fuzzy_join with the distinct-then-score shape: both text
    payloads ride the dedup exchange for every banded candidate."""
    from hybrid_cdc_demo_spark.operators.linkage import deletion_variants
    from hybrid_cdc_demo_spark.operators.partitioning import spread
    from hybrid_cdc_demo_spark.sources.tables import load_table

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 5000)
        .select("c_custkey", F.expr("substring(c_name, 10)").alias("c_suffix"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.expr("substring(s_name, 10)").alias("s_suffix")
    )
    lv = spread(cust).select(
        F.col("c_custkey").alias("_lid"),
        F.col("c_suffix").alias("_ltext"),
        F.explode(deletion_variants("c_suffix")).alias("_variant"),
    )
    rv = spread(supp).select(
        F.col("s_suppkey").alias("_rid"),
        F.col("s_suffix").alias("_rtext"),
        F.explode(deletion_variants("s_suffix")).alias("_variant"),
    )
    candidates = (
        lv.join(rv, "_variant").select("_lid", "_rid", "_ltext", "_rtext")
        .distinct()
    )
    return (
        candidates.select(
            F.col("_lid").alias("c_custkey"),
            F.col("_rid").alias("s_suppkey"),
            F.levenshtein("_ltext", "_rtext").alias("dist"),
        )
        .filter(F.col("dist") <= 1)
        .select(
            "c_custkey", "s_suppkey", F.col("dist").cast("int").alias("dist")
        )
        .orderBy("c_custkey", "s_suppkey")
    )


def old_pq_encode(spark, sf_dir):
    """ns_pq_encode with the nested-literal expression argmin."""
    from hybrid_cdc_demo_spark.operators.clustering import pq_encode, pq_train
    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    books = pq_train(
        train, dim=64, m=4, k=8, iters=2, exact_fold=True, seed_by="id",
        mode="driver",
    )
    return pq_encode(emb, books, dim=64, method="expr").orderBy("vec_id")


def old_pq_adc(spark, sf_dir):
    """ns_pq_adc_topk over the expression encode."""
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.operators.clustering import (
        adc_dist_expr,
        pq_encode,
        pq_train,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    books = pq_train(
        train, dim=64, m=4, k=8, iters=2, exact_fold=True, seed_by="id",
        mode="driver",
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    query_vec = [float(x) for x in qrow["embedding"]]
    enc = pq_encode(emb, books, dim=64, method="expr")
    dist = adc_dist_expr(books, query_vec, dim=64)
    top = (
        enc.select(F.col("vec_id"), dist.alias("adc_d2"))
        .orderBy("adc_d2", "vec_id")
        .limit(10)
    )
    w = Window.orderBy("adc_d2", "vec_id")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "vec_id", "adc_d2"
    )


def old_heavy_hitters(spark, sf_dir):
    """ns_heavy_hitters with the r10 shape: the full exploded token
    stream round-robin-shuffled (spread) and PERSISTED, then scanned
    twice (unweighted MG summaries + exact recount)."""
    from typing import Iterator

    from hybrid_cdc_demo_spark.operators.partitioning import spread
    from hybrid_cdc_demo_spark.sources.tables import load_table

    capacity, out_count = 64, "n_occ"

    def mg_rows(batches: Iterator):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item, w in pdf["_item"].value_counts().items():
                if item in counters:
                    counters[item] += int(w)
                elif len(counters) < capacity:
                    counters[item] = int(w)
                else:
                    m = min(min(counters.values()), int(w))
                    dead = []
                    for k in counters:
                        counters[k] -= m
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
                    if int(w) > m:
                        counters[item] = int(w) - m
        if counters:
            yield pd.DataFrame(
                {"_item": list(counters), "_w": list(counters.values())}
            )

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                " ",
            )
        ).alias("tok")
    )
    items = spread(occ).select(F.col("tok").alias("_item")).filter(
        F.col("_item").isNotNull()
    ).persist()
    try:
        summaries = items.mapInPandas(mg_rows, schema="_item string, _w long")
        candidates = summaries.groupBy("_item").agg(F.sum("_w").alias("_est"))
        flagged = items.join(
            F.broadcast(
                candidates.select("_item").withColumn("_c", F.lit(1))
            ),
            "_item",
            "left",
        )
        counts = (
            flagged.groupBy(
                F.when(F.col("_c") == 1, F.col("_item")).alias("_item")
            )
            .agg(F.count(F.lit(1)).cast("long").alias(out_count))
        )
        buckets = counts.collect()
        n = sum(r[out_count] for r in buckets)
        rows = [
            (r["_item"], r[out_count])
            for r in buckets
            if r["_item"] is not None and r[out_count] * (capacity + 1) > n
        ]
        return spark.createDataFrame(
            rows, f"tok string, {out_count} long"
        ).orderBy(F.desc(out_count), "tok")
    finally:
        items.unpersist()


def old_bucket_coverage(spark, sf_dir):
    """ns_dedup_bucket_coverage with the two-scan shape: each
    fingerprint family re-reads and re-tokenizes the corpus."""
    from hybrid_cdc_demo_spark.operators import dedup as D
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, "text", "doc_id", num_hashes=32)
    mh_sizes = (
        D.band_rows(sigs, 16)
        .groupBy("band", "band_hash")
        .agg(F.count("*").alias("n"))
    )
    mh = D.bucket_coverage(mh_sizes, 200).select(
        F.col("buckets_total").alias("minhash_buckets_total"),
        F.col("buckets_dropped").alias("minhash_buckets_dropped"),
        F.col("pairs_suppressed").alias("minhash_pairs_suppressed"),
    )
    fps = D.simhash(docs, "text", "doc_id")
    sh_sizes = (
        D.simhash_bands(fps)
        .groupBy("band", "band_val")
        .agg(F.count("*").alias("n"))
    )
    sh = D.bucket_coverage(sh_sizes, 200).select(
        F.col("buckets_total").alias("simhash_buckets_total"),
        F.col("buckets_dropped").alias("simhash_buckets_dropped"),
        F.col("pairs_suppressed").alias("simhash_pairs_suppressed"),
    )
    return mh.crossJoin(sh)


def old_bm25(spark, sf_dir):
    """ns_bm25_topk without the tf checkpoint (the tokenize+explode
    re-ran under both dfreq and the scoring projection)."""
    from collections.abc import Sequence  # noqa: F401

    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.functions.text import words_lower
    from hybrid_cdc_demo_spark.operators.retrieval import _sorted_fold_sum
    from hybrid_cdc_demo_spark.plans.retrieval_queries import BM25_TERMS
    from hybrid_cdc_demo_spark.sources.tables import load_table

    k1, b, k, id_col = 1.2, 0.75, 20, "doc_id"
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col(id_col), words_lower("text").alias("_w")
    ).withColumn("_dl", F.size("_w"))
    stats = toks.agg(
        F.count("*").alias("_n_docs"), F.sum("_dl").alias("_sum_dl")
    )
    tf = (
        toks.select(id_col, "_dl", F.explode("_w").alias("term"))
        .filter(F.col("term").isin(list(BM25_TERMS)))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("_tf"), F.max("_dl").alias("_dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n_docs").cast("double")
    idf = (
        F.col("_n_docs").cast("double")
        - F.col("_df").cast("double")
        + F.lit(0.5)
    ) / (F.col("_df").cast("double") + F.lit(0.5))
    tf_d = F.col("_tf").cast("double")
    sat = (tf_d * F.lit(k1 + 1.0)) / (
        tf_d
        + F.lit(k1 * (1.0 - b))
        + (F.lit(k1 * b) * (F.col("_dl").cast("double") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, "term", (idf * sat).alias("_s"))
    )
    doc = scored.groupBy(id_col).agg(
        _sorted_fold_sum(F.col("term"), F.col("_s")).alias("score")
    )
    top = doc.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), id_col, "score"
    )


def old_opq_query(spark, sf_dir):
    """ns_simsearch_opq with the r10 shape: a separate rotate_vecs
    Arrow stage feeding the nested-literal expression encode."""
    import numpy as np
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.operators.clustering import (
        adc_dist_expr,
        opq_train,
        pq_encode,
        rotate_vecs,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    W, books, _ = opq_train(
        train, dim=64, m=4, k=8, iters=3, seed_by="id", partitions=4,
        mode="driver",
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    query_vec = [float(x) for x in qrow["embedding"]]
    Wm = np.asarray(W, dtype=np.float64)
    q = list(np.asarray(query_vec, dtype=np.float64) @ Wm)
    rotated = rotate_vecs(emb, Wm, "vec_id", "embedding", out_col="_y")
    enc = pq_encode(rotated, books, 64, "vec_id", "_y", method="expr")
    dist = adc_dist_expr(books, q, 64)
    top = (
        enc.select(F.col("vec_id"), dist.alias("adc_d2"))
        .orderBy("adc_d2", "vec_id")
        .limit(10)
    )
    w = Window.orderBy("adc_d2", "vec_id")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "vec_id",
        F.round("adc_d2", 6).alias("adc_d2"),
    )


def old_cohort(spark, sf_dir):
    """ns_cohort_retention without the cohorts checkpoint (events
    scan + per-user MIN re-ran under both sizes and the join)."""
    from hybrid_cdc_demo_spark.sources.tables import load_table

    anchor = "2024-01-01"
    events = load_table(spark, sf_dir, "events")
    d = events.select(F.col("user_id"), F.to_date("ts").alias("_d"))
    first = d.groupBy("user_id").agg(F.min("_d").alias("_d0"))
    week0 = F.floor(
        F.datediff(F.col("_d0"), F.lit(anchor).cast("date")).cast("double")
        / 7.0
    ).cast("long")
    cohorts = first.select("user_id", "_d0", week0.alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    offset = F.floor(
        F.datediff(F.col("_d"), F.col("_d0")).cast("double") / 7.0
    ).cast("long")
    active = (
        d.join(cohorts, "user_id")
        .select("user_id", "cohort_week", offset.alias("week_offset"))
        .distinct()
    )
    agg = active.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("n_active")
    )
    return (
        agg.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            (
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def old_tfidf(spark, sf_dir):
    """ns_tfidf_topterms without the tf checkpoint (the r10 no-op
    tf>0 filter relied on AQE exchange reuse, which never fired: the
    executed plan ran the corpus scan+explode+partial-agg twice)."""
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.functions import text as T
    from hybrid_cdc_demo_spark.operators.partitioning import spread
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "doc_id", F.explode(F.split(T.normalized_text("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.where(F.col("tf") > 0).groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (
                (F.col("tf") * F.col("n_docs")).cast("double")
                / F.col("df").cast("double")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .orderBy("doc_id", "rk")
    )


def old_bpe_encode(spark, sf_dir):
    """ns_bpe_encode before the shared doc_word_counts checkpoint:
    train_bpe ran its own corpus explode (word_freq_table) and
    encode_token_counts exploded the corpus twice more (the
    vocab-distinct branch and the per-occurrence join side)."""
    from hybrid_cdc_demo_spark.functions.text import words_lower
    from hybrid_cdc_demo_spark.operators.bpe import encode_expr, train_bpe
    from hybrid_cdc_demo_spark.operators.partitioning import spread
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, num_merges=6, partitions=4)
    words = spread(docs).select(
        F.col("doc_id"), F.explode(words_lower("text")).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.select("word").distinct().select(
        "word", F.size(encode_expr("word", merges)).alias("_n_bpe")
    )
    return (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("_n_bpe").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def old_semantic_dedup(spark, sf_dir):
    """ns_semantic_dedup without the assigned-frame checkpoint: the
    pair self-join's a/b sides each re-ran the full n x k centroid
    assignment."""
    import hybrid_cdc_demo_spark.operators.clustering as C
    from hybrid_cdc_demo_spark.operators.clustering import (
        assign_with_ids,
        seed_centers,
    )
    from hybrid_cdc_demo_spark.operators.partitioning import spread
    from hybrid_cdc_demo_spark.operators.similarity import (
        cosine_with_norms,
        norm_col,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table, table_num_rows

    emb = load_table(spark, sf_dir, "embeddings")
    n = table_num_rows(sf_dir, "embeddings")
    k = max(8, n // 64)
    data = spread(emb).select(
        F.col("vec_id"), C._as_double_array("embedding").alias("_v")
    )
    centers = seed_centers(data, k, "vec_id", "_v", seed_by="id")
    ids = list(range(len(centers)))
    assigned = assign_with_ids(
        data, centers, ids, "vec_id", "_v", method="auto"
    ).select(
        F.col("vec_id"),
        F.col("_v"),
        F.col("_cluster").alias("cluster"),
        norm_col(F.col("_v")).alias("_nm"),
    )
    a = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("id_a"),
        F.col("_v").alias("_va"), F.col("_nm").alias("_na"),
    )
    b = assigned.select(
        F.col("cluster"), F.col("vec_id").alias("id_b"),
        F.col("_v").alias("_vb"), F.col("_nm").alias("_nb"),
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster", "id_a", "id_b",
            cosine_with_norms(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= 0.3)
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "id_a", "id_b", "cos",
        )
        .orderBy("id_a", "id_b")
    )


def old_unigram(spark, sf_dir):
    """ns_unigram_likelihood without the tf checkpoint (the r10 no-op
    tf>0 filter relied on AQE exchange reuse, which never fired)."""
    from hybrid_cdc_demo_spark.functions import text as T
    from hybrid_cdc_demo_spark.operators.partitioning import spread
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    occ = spread(docs).select(
        "doc_id",
        F.explode(F.split(T.normalized_text("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = occ.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.where(F.col("tf") > 0).groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df_cnt")
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tok"),
            (
                F.sum(F.col("tf") * F.col("df_cnt")).cast("double")
                / (F.sum("tf") * F.first("n_docs")).cast("double")
            ).alias("mean_df_rate"),
            (
                F.sum(
                    F.when(
                        F.col("df_cnt") * 10 >= F.col("n_docs"),
                        F.col("tf"),
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("tf").cast("double")
            ).alias("common_ratio"),
        )
        .orderBy("doc_id")
    )


def old_pmi(spark, sf_dir):
    """ns_pmi_collocations before the single-explode model: separate
    unigram explode (re-run by the cx and cy branches), bigram
    explode, and a fourth corpus scan for the totals."""
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.functions.text import words_lower
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(words_lower("text").alias("_w"))
    uni = (
        w.select(F.explode("_w").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c_tok"))
    )
    big = (
        w.select(
            F.explode(
                F.when(
                    F.size("_w") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_w") - 1),
                        lambda i: F.struct(
                            F.element_at("_w", i).alias("x"),
                            F.element_at("_w", i + 1).alias("y"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= 3)
    )
    totals = w.agg(
        F.sum(F.size("_w")).alias("_t"),
        F.sum(
            F.when(F.size("_w") >= 2, F.size("_w") - 1).otherwise(F.lit(0))
        ).alias("_b"),
    )
    cx = uni.select(F.col("tok").alias("x"), F.col("c_tok").alias("c_x"))
    cy = uni.select(F.col("tok").alias("y"), F.col("c_tok").alias("c_y"))
    lift = (F.col("c_xy").cast("double") / F.col("_b").cast("double")) / (
        (F.col("c_x").cast("double") / F.col("_t").cast("double"))
        * (F.col("c_y").cast("double") / F.col("_t").cast("double"))
    )
    scored = (
        big.join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(totals))
        .select(
            F.concat_ws(" ", "x", "y").alias("bigram"),
            "c_xy",
            lift.alias("lift"),
        )
    )
    top = scored.orderBy(F.desc("lift"), F.col("bigram")).limit(20)
    win = Window.orderBy(F.desc("lift"), F.col("bigram"))
    return top.select(
        F.row_number().over(win).cast("int").alias("rank"),
        "bigram",
        "c_xy",
        "lift",
    )


def old_s9(spark, sf_dir):
    """s9_interval_join_outer without the matched-pairs checkpoint:
    the anti-join's distinct re-ran the whole interval join."""
    from hybrid_cdc_demo_spark.operators.rangejoin import (
        keyed_interval_join,
        ntz_micros,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("u"),
        ntz_micros("ts").alias("a_us"),
    )
    b = ev.select(
        F.col("event_id").alias("right_id"),
        F.col("user_id").alias("u2"),
        ntz_micros("ts").alias("b_us"),
    )
    matched = (
        keyed_interval_join(
            a, b, on=[("u", "u2")], left_us="a_us", right_us="b_us",
            upper_us=300_000_000,
        )
        .filter(F.col("left_id") != F.col("right_id"))
        .select("left_id", "right_id")
    )
    unmatched = a.join(
        matched.select("left_id").distinct(), "left_id", "left_anti"
    ).select("left_id", F.lit(None).cast("long").alias("right_id"))
    return matched.unionByName(unmatched).orderBy(
        "left_id", F.col("right_id").asc_nulls_first()
    )


TARGETS = {
    "funnel": ("ns_funnel_conversion", old_funnel),
    "tfidf": ("ns_tfidf_topterms", old_tfidf),
    "bpe_encode": ("ns_bpe_encode", old_bpe_encode),
    "semantic": ("ns_semantic_dedup", old_semantic_dedup),
    "unigram": ("ns_unigram_likelihood", old_unigram),
    "pmi": ("ns_pmi_collocations", old_pmi),
    "s9": ("s9_interval_join_outer", old_s9),
    "cohort": ("ns_cohort_retention", old_cohort),
    "heavy": ("ns_heavy_hitters", old_heavy_hitters),
    "bucket": ("ns_dedup_bucket_coverage", old_bucket_coverage),
    "bm25": ("ns_bm25_topk", old_bm25),
    "opq": ("ns_simsearch_opq", old_opq_query),
    "triangles": ("ns_graph_triangles", old_triangles),
    "fuzzy": ("ns_fuzzy_join", old_fuzzy),
    "pq_encode": ("ns_pq_encode", old_pq_encode),
    "pq_adc": ("ns_pq_adc_topk", old_pq_adc),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", default=",".join(TARGETS))
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--sf", default=SF)
    args = ap.parse_args()
    names = [t for t in args.targets.split(",") if t]

    from hybrid_cdc_demo_spark.plans import QUERIES
    from hybrid_cdc_demo_spark.session import get_spark

    import bench

    spark = get_spark(app_name="ab-shapes-r11")
    spark.sparkContext.setLogLevel("ERROR")

    for t in names:
        qname, old_fn = TARGETS[t]
        new_fn = qname if callable(qname) else None
        for fn in (old_fn, new_fn or QUERIES[qname]):
            try:
                materialize(fn(spark, WARM))
            except Exception as exc:  # noqa: BLE001
                print(f"# warm error {t}: {exc}", file=sys.stderr)
    spark.catalog.clearCache()

    out = {"sf_dir": args.sf, "rounds": args.rounds, "targets": {}}
    for t in names:
        qname, old_fn = TARGETS[t]
        olds, news, cals = [], [], [bench.calibration_probe(spark)]
        for _ in range(args.rounds):
            spark.sparkContext.setJobDescription(f"ab {t}: old")
            t0 = time.perf_counter()
            materialize(old_fn(spark, args.sf))
            olds.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab {t}: new")
            t0 = time.perf_counter()
            materialize(
                (qname if callable(qname) else QUERIES[qname])(spark, args.sf)
            )
            news.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            cals.append(bench.calibration_probe(spark))
        spark.sparkContext.setJobDescription(None)
        out["targets"][t] = {
            "query": getattr(qname, "__name__", qname),
            "old": olds,
            "new": news,
            "old_median": statistics.median(olds),
            "new_median": statistics.median(news),
            "calibration_trace": cals,
            "new_wins_rounds": sum(1 for o, n in zip(olds, news) if n <= o),
        }
        print(json.dumps({t: out["targets"][t]}), flush=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
