#!/usr/bin/env python
"""Interleaved single-session A/B for the round-10 (second session)
optimization batch: each target pairs the CURRENT query/operator
("new") against an inline reconstruction of the pre-change shape
("old"), alternated old/new for --rounds rounds with a calibration
probe between rounds (PERF.md: inter-session swings reach 3x, so only
interleaved same-JVM comparisons are valid). noop-sink materialization
per guide §1.4.

Usage: python tools/ab_shapes_r10b.py --targets opq,span,pareto,lm,manifest
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

def old_opq(spark, sf_dir):
    """ns_simsearch_opq with mode='dist' training (the pre-r10 path)."""
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.operators.clustering import (
        opq_adc_topk,
        opq_train,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    W, books, _ = opq_train(
        train, dim=64, m=4, k=8, iters=3, seed_by="id", partitions=4,
        mode="dist",
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    query_vec = [float(x) for x in qrow["embedding"]]
    top = opq_adc_topk(emb, W, books, query_vec, dim=64, topk=10)
    w = Window.orderBy("adc_d2", "vec_id")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "vec_id",
        F.round("adc_d2", 6).alias("adc_d2"),
    )


def old_span(spark, sf_dir):
    """ns_dedup_substring with the zip_with gram-string key chain."""
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.functions.text import words_lower
    from hybrid_cdc_demo_spark.operators.dedup import shingle_windows
    from hybrid_cdc_demo_spark.sources.tables import load_table

    k, min_count, id_col = 8, 2, "doc_id"
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col(id_col), words_lower("text").alias("_w")
    ).withColumn("_n", F.size("_w"))
    wins = (
        toks.select(
            id_col,
            F.posexplode(shingle_windows(F.col("_w"), k)).alias("_p0", "_g"),
            F.col("_n"),
        )
        .filter(F.col("_p0") <= F.col("_n") - k)
        .select(
            id_col, (F.col("_p0") + 1).alias("pos"),
            F.xxhash64(F.col("_g")).alias("_key"),
        )
    )
    wc = Window.partitionBy("_key")
    flagged = (
        wins.withColumn("_c", F.count("*").over(wc))
        .filter(F.col("_c") >= min_count)
        .select(id_col, "pos")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + k).over(w)
    contrib = (
        F.col("pos") + k
        - F.greatest(F.col("pos"), F.coalesce(prev_end, F.col("pos")))
    )
    cov = (
        flagged.withColumn("_contrib", contrib)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("dup_windows"),
            F.sum("_contrib").cast("long").alias("covered_tokens"),
        )
    )
    n = F.col("_n").cast("long")
    covered = F.coalesce(F.col("covered_tokens"), F.lit(0).cast("long"))
    return (
        toks.select(id_col, "_n")
        .join(cov, id_col, "left")
        .select(
            id_col,
            n.alias("n_tokens"),
            F.greatest(F.col("_n") - (k - 1), F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce(F.col("dup_windows"), F.lit(0).cast("long")).alias("dup_windows"),
            covered.alias("covered_tokens"),
            (n - covered).alias("kept_tokens"),
            (covered.cast("double") / n.cast("double")).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def old_pareto(spark, sf_dir):
    """ns_pareto_revenue with the second total-aggregation pass."""
    from hybrid_cdc_demo_spark.operators.partitioning import (
        global_rank_cumsum,
    )
    from hybrid_cdc_demo_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("value").cast("decimal(18,6)").alias("_v"))
        .groupBy("user_id")
        .agg(F.sum("_v").alias("_mon"))
    )
    total = u.agg(F.sum("_mon").alias("_total"))
    ranked = global_rank_cumsum(
        u, [F.col("_mon").desc(), F.col("user_id")], "_mon",
        rank_col="rank", cum_col="_cum",
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "rank", "user_id",
            F.col("_mon").cast("double").alias("monetary"),
            F.col("_cum").cast("double").alias("cum_revenue"),
            (F.col("_cum").cast("double") / F.col("_total").cast("double")).alias("cum_share"),
        )
        .orderBy("rank")
    )


def old_lm(spark, sf_dir):
    """ns_lm_coherence with the two-explode + checkpointed-model shape."""
    from hybrid_cdc_demo_spark.functions.text import words_lower
    from hybrid_cdc_demo_spark.sources.tables import load_table

    id_col = "doc_id"
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(F.col(id_col), words_lower("text").alias("_w"))

    def pair_explode(frame):
        return frame.select(
            id_col,
            F.explode(
                F.zip_with(
                    "_w",
                    F.slice("_w", 2, F.greatest(F.size("_w") - 1, F.lit(0))),
                    lambda x, y: F.struct(x.alias("x"), y.alias("y")),
                )
            ).alias("p"),
        ).select(id_col, "p.x", "p.y")

    full = (
        pair_explode(w)
        .groupBy("x", "y")
        .agg(F.count("*").alias("_c"))
        .localCheckpoint(eager=False)
    )
    uni = full.groupBy("x").agg(F.sum("_c").alias("c_x"))
    wtab = (
        full.filter(F.col("y").isNotNull())
        .join(uni, "x")
        .select(
            "x", "y",
            F.expr("(_c * CAST(1048576 AS BIGINT)) div c_x").alias("w_q20"),
        )
    )
    agg = (
        pair_explode(w)
        .filter(F.col("y").isNotNull())
        .join(wtab, ["x", "y"])
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_transitions"),
            F.sum("w_q20").alias("_s"),
        )
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_transitions"), F.lit(0).cast("long")).alias("n_transitions"),
            (
                F.col("_s").cast("double")
                / (F.col("n_transitions") * F.lit(1048576)).cast("double")
            ).alias("coherence"),
        )
        .orderBy(id_col)
    )


def old_manifest(spark, sf_dir):
    """ns_training_manifest with the second scan + doc_id re-join."""
    import hybrid_cdc_demo_spark.functions.text as T
    from hybrid_cdc_demo_spark.operators.classifier import score_documents
    from hybrid_cdc_demo_spark.operators.curation import pack_sequences
    from hybrid_cdc_demo_spark.operators.dedup import prefix_duplicate_flags
    from hybrid_cdc_demo_spark.operators.partitioning import global_rank
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    keep_ids = (
        prefix_duplicate_flags(docs, partitions=8)
        .filter(F.col("is_prefix_dup") == 0)
        .select("doc_id")
    )
    surv = (
        score_documents(docs)
        .filter(F.col("keep"))
        .join(keep_ids, "doc_id")
        .select("doc_id", "source", T.token_count("text").alias("n_tok"))
    )
    ranked = global_rank(
        surv,
        [F.sha2(F.col("doc_id").cast("string"), 256), F.col("doc_id")],
        rank_col="pos",
        partitions=8,
    )
    packed = pack_sequences(
        ranked, "n_tok", "pos", budget=512, partition_col="source"
    )
    return packed.select("doc_id", "source", "pos", "bin_id").orderBy("doc_id")


def old_rfm(spark, sf_dir):
    """ns_rfm_segments with the separate anchor scan + broadcast n."""
    from hybrid_cdc_demo_spark.operators.partitioning import global_rank
    from hybrid_cdc_demo_spark.sources.tables import load_table

    user_col, ts_col, type_col, value_col = "user_id", "ts", "event_type", "value"
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col(type_col) == "purchase").select(
        F.col(user_col),
        F.to_date(ts_col).alias("_d"),
        F.col(value_col).cast("decimal(18,6)").alias("_v"),
    )
    anchor = events.agg(F.max(F.to_date(ts_col)).alias("_mxd"))
    u = (
        p.groupBy(user_col)
        .agg(
            F.max("_d").alias("_last"),
            F.count("*").cast("long").alias("frequency"),
            F.sum("_v").alias("_mon"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            user_col,
            F.datediff(F.col("_mxd"), F.col("_last")).cast("long").alias("recency_days"),
            "frequency",
            "_mon",
        )
        .localCheckpoint(eager=True)
    )
    _KEY = "decimal(28,6)"
    legs = [
        F.col("recency_days").cast(_KEY),
        (-F.col("frequency")).cast(_KEY),
        (-F.col("_mon")).cast(_KEY),
    ]
    stacked = None
    for i, key in enumerate(legs):
        leg = u.select(F.lit(i).alias("_m"), key.alias("_k"), F.col(user_col))
        stacked = leg if stacked is None else stacked.unionAll(leg)
    pos = global_rank(stacked, [F.col("_m"), F.col("_k"), F.col(user_col)], "_pos")
    n = u.agg(F.count("*").cast("long").alias("_n"))
    ranks = (
        pos.crossJoin(F.broadcast(n))
        .select(
            user_col, "_m",
            (F.col("_pos") - F.col("_m") * F.col("_n")).alias("_r"),
        )
        .groupBy(user_col)
        .agg(
            F.max(F.when(F.col("_m") == 0, F.col("_r"))).alias("_pr"),
            F.max(F.when(F.col("_m") == 1, F.col("_r"))).alias("_pf"),
            F.max(F.when(F.col("_m") == 2, F.col("_r"))).alias("_pm"),
        )
    )
    ranked = u.join(ranks, user_col)

    def q(pos_name):
        return (
            F.lit(1)
            + F.floor(
                F.lit(4.0) * (F.col(pos_name) - 1).cast("double")
                / F.col("_n").cast("double")
            )
        ).cast("int")

    return ranked.crossJoin(F.broadcast(n)).select(
        user_col, "recency_days", "frequency",
        F.col("_mon").cast("double").alias("monetary"),
        q("_pr").alias("r_q"), q("_pf").alias("f_q"), q("_pm").alias("m_q"),
        F.concat(
            q("_pr").cast("string"), q("_pf").cast("string"), q("_pm").cast("string")
        ).alias("segment"),
    ).orderBy(user_col)


def old_blocklist(spark, sf_dir):
    """ns_blocklist_filter with the exact banned.count() sizing scan."""
    from hybrid_cdc_demo_spark.operators.bloom import blocklist_filter
    from hybrid_cdc_demo_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    banned = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    survivors = blocklist_filter(
        spark, events, "user_id", banned, "c_custkey",
        expected_items=banned.count(),
    )
    return survivors.orderBy("event_id")


def old_bpe_vocab(spark, sf_dir):
    """ns_bpe_vocab with the distributed merge loop."""
    from hybrid_cdc_demo_spark.operators.bpe import merges_df, train_bpe
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, num_merges=6, partitions=4, mode="dist")
    return merges_df(spark, merges).orderBy("step")


def old_pagerank(spark, sf_dir):
    """ns_pagerank_tokens forced onto the distributed iteration loop
    (driver_threshold_edges=0; pays one extra cheap edges.count() the
    r9 shape didn't have — negligible vs the 10-iteration delta)."""
    from hybrid_cdc_demo_spark.operators.graph import pagerank, token_edges
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ranks = pagerank(
        token_edges(docs, directed=True), iterations=10,
        driver_threshold_edges=0,
    )
    return ranks.select(
        "node", F.round(F.col("rank"), 6).alias("rank_6dp")
    ).orderBy(F.desc("rank_6dp"), F.col("node")).limit(20)


def old_mmr(spark, sf_dir):
    """ns_mmr_diverse forced onto the distributed greedy loop."""
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.operators.similarity import mmr_select
    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    return mmr_select(
        emb, qv, k=10, lam=0.7, driver_threshold=0
    ).orderBy("rank")


def old_lr(spark, sf_dir):
    """ns_lr_training forced onto the distributed GD loop."""
    import hybrid_cdc_demo_spark.operators.classifier as CL
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    feats = CL.doc_feature_exprs("text")
    label = CL.logit_score(feats, CL.QUALITY_WEIGHTS) > 0
    _, hist = CL.train_logistic(
        docs, feats, label, iters=8, lr=1.0, driver_threshold=0
    )
    return CL.history_df(spark, hist)


def old_simhash_fps(spark, sf_dir):
    """simhash fingerprints via the pure-expression fold."""
    from hybrid_cdc_demo_spark.operators import dedup as D
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs, "text", "doc_id", impl="expr")


def new_simhash_fps(spark, sf_dir):
    from hybrid_cdc_demo_spark.operators import dedup as D
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs, "text", "doc_id", impl="arrow")


def old_simhash_query(spark, sf_dir):
    """ns_dedup_simhash with the expression fold."""
    from hybrid_cdc_demo_spark.operators import dedup as D
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fps = D.simhash(docs, "text", "doc_id", impl="expr")
    return D.simhash_candidates(fps, max_hamming=10).orderBy("id_a", "id_b")


TARGETS = {
    "opq": ("ns_simsearch_opq", old_opq),
    "pagerank": ("ns_pagerank_tokens", old_pagerank),
    "mmr": ("ns_mmr_diverse", old_mmr),
    "lr": ("ns_lr_training", old_lr),
    "simhash_fold": (new_simhash_fps, old_simhash_fps),
    "simhash_query": ("ns_dedup_simhash", old_simhash_query),
    "span": ("ns_dedup_substring", old_span),
    "pareto": ("ns_pareto_revenue", old_pareto),
    "lm": ("ns_lm_coherence", old_lm),
    "manifest": ("ns_training_manifest", old_manifest),
    "rfm": ("ns_rfm_segments", old_rfm),
    "blocklist": ("ns_blocklist_filter", old_blocklist),
    "bpe": ("ns_bpe_vocab", old_bpe_vocab),
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

    spark = get_spark(app_name="ab-shapes-r10b")
    spark.sparkContext.setLogLevel("ERROR")

    # plan/codegen warm at the smallest SF for BOTH shapes
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
            materialize((qname if callable(qname) else QUERIES[qname])(spark, args.sf))
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
