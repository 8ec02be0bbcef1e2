"""Sparse text retrieval over the document corpus: BM25 scoring and
PMI collocation mining — the inverted-index-shaped workloads a
training-data pipeline runs for query-based curation (picking docs
relevant to a benchmark/topic) and for phrase/stopword discovery.

Scale shape (100 TB posture):

* the *query side* of BM25 is a handful of terms — document-frequency
  and corpus stats reduce to term-count / one-row frames that ride
  into the scoring projection as broadcasts; the only wide exchange is
  the per-(doc, term) partial-aggregated groupBy, whose cardinality is
  bounded by |terms| x |matching docs|, not corpus size;
* PMI joins the bigram counts against the unigram vocabulary twice —
  both are key-partitioned equi-joins after map-side partial
  aggregation (the explode never materializes the corpus token stream
  through the driver);
* top-k is `orderBy().limit()` = TakeOrderedAndProject (per-partition
  heap + driver merge of k rows), never a global single-partition
  window sort.

Determinism (oracle hash-match): scores use only +,*,/ and integer
counts — each IEEE op is correctly rounded, so identical expression
trees produce identical bits in Spark and DuckDB. The classic
``ln``-based idf / PMI-log are libm-divergent between engines (PLANS.md
rule), so BM25 uses the *odds* form of Robertson idf,
``(N - df + 0.5) / (df + 0.5)``, and PMI is reported as *lift*
``p(xy) / (p(x) p(y))`` — ``log`` of either is monotone per term/pair,
so ranking and thresholding are unchanged. Per-document sums over
query terms fold in sorted term order (bounded arrays — |terms| is
tiny), the established reproducible-sum pattern.

Reference parity note: the reference engine has no retrieval surface —
these operators come from the north-star training-data brief
(benchmark-decontamination and corpus-curation pipelines score docs
against probe queries; collocation lift is the standard phrase-table
signal).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hybrid_cdc_demo_spark.functions.text import words_lower


def _sorted_fold_sum(key: F.Column, val: F.Column) -> F.Column:
    """Aggregate expression: strict left fold of ``val`` in ascending
    ``key`` order, zero-initialized — bitwise-reproducible double sum
    regardless of shuffle/arrival order (bounded groups only)."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(key.alias("k"), val.alias("v")))),
        F.lit(0.0),
        lambda acc, x: acc + x.getField("v"),
    )


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a fixed bag of query ``terms``.

    score(d) = sum_t idf_odds(t) * tf(t,d)*(k1+1)
                      / (tf + k1*(1-b) + k1*b*(dl/avgdl))

    with idf_odds = (N - df + 0.5)/(df + 0.5) — the Robertson idf
    without the engine-divergent ``ln`` (monotone-equivalent ranking).

    Three bounded side inputs broadcast into one scoring projection:
    corpus stats (1 row), per-term document frequency (|terms| rows).
    Documents containing none of the terms score nothing and are
    absent (standard inverted-index semantics).
    """
    if not terms:
        raise ValueError("terms must be a non-empty term list")
    toks = docs.select(
        F.col(id_col),
        words_lower(text_col).alias("_w"),
    ).withColumn("_dl", F.size("_w"))
    # corpus stats: one row, broadcast into the scoring projection
    stats = toks.agg(
        F.count("*").alias("_n_docs"), F.sum("_dl").alias("_sum_dl")
    )
    # per-(doc, term) tf over ONLY the query terms: the isin filter
    # runs before the aggregation, so the exchange carries at most
    # |terms| rows per document
    tf = (
        toks.select(id_col, "_dl", F.explode("_w").alias("term"))
        .filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("_tf"), F.max("_dl").alias("_dl"))
        # two consumers (dfreq and the scoring projection) — and
        # column pruning rewrites dfreq's copy of the aggregate, so
        # exchange reuse never fires (the r10 tfidf lesson) and the
        # corpus tokenize+explode ran once per consumer. The frame is
        # bounded by |terms| x matching docs; the dfreq aggregation
        # materializes it as a side effect (r11).
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n_docs").cast("double")
    idf = (F.col("_n_docs").cast("double") - F.col("_df").cast("double") + F.lit(0.5)) / (
        F.col("_df").cast("double") + F.lit(0.5)
    )
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
    return scored.groupBy(id_col).agg(
        _sorted_fold_sum(F.col("term"), F.col("_s")).alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    **kwargs,
) -> DataFrame:
    """Top-k documents by BM25 — ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject (distributed per-partition heaps, k rows to
    the driver); the rank window runs on the k-row result only."""
    id_col = kwargs.get("id_col", "doc_id")
    top = (
        bm25_scores(docs, terms, **kwargs)
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), id_col, "score"
    )


def pmi_collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 3,
    topk: int = 20,
) -> DataFrame:
    """Top collocations by PMI *lift* ``p(xy) / (p(x) p(y))`` over
    adjacent word pairs (lift > 1 == positive PMI; ``log2(lift)`` is
    the textbook PMI and is monotone per pair, so the ranking is
    identical while staying libm-free).

    Two partial-aggregated count jobs (unigrams, bigrams) + two
    key-partitioned equi-joins of the floored bigram table against the
    vocabulary; corpus totals ride in as a broadcast one-row frame.
    The ``min_count`` floor prunes the bigram table BEFORE the joins —
    at corpus scale the floor is what keeps the candidate set sparse.
    """
    w = docs.select(words_lower(text_col).alias("_w"))
    # ONE corpus explode builds the whole model (r11 — the
    # bigram_lm_coherence trick): each token occurrence emits exactly
    # one (x, next-or-NULL) pair via zip_with against the 1-shifted
    # array (zip_with null-pads), so the DISTINCT-BIGRAM-sized `full`
    # count table yields unigram counts as its x-rollup (every
    # occurrence of x heads one pair), bigram counts as its
    # NULL-free slice, and the corpus totals as integer sums over it
    # (t = all pairs, b = non-NULL pairs). Before, the unigram explode
    # ran TWICE (the cx and cy join branches re-ran it), the bigram
    # explode once more, and totals scanned the corpus a fourth time
    # (executed r11 plan: 3 Generates, 4 scans, 0 reuse). The lazy
    # checkpoint pins the model; every downstream job is model-sized.
    full = (
        w.select(
            F.explode(
                F.zip_with(
                    "_w",
                    F.slice("_w", 2, F.greatest(F.size("_w") - 1, F.lit(0))),
                    lambda x, y: F.struct(x.alias("x"), y.alias("y")),
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count("*").alias("_c"))
        .localCheckpoint(eager=False)
    )
    uni = full.groupBy(F.col("x").alias("tok")).agg(
        F.sum("_c").alias("c_tok")
    )
    big = (
        full.filter(F.col("y").isNotNull())
        .select("x", "y", F.col("_c").alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    totals = full.agg(
        F.sum("_c").alias("_t"),
        F.sum(F.when(F.col("y").isNotNull(), F.col("_c")).otherwise(F.lit(0))).alias(
            "_b"
        ),
    )
    cx = uni.select(F.col("tok").alias("x"), F.col("c_tok").alias("c_x"))
    cy = uni.select(F.col("tok").alias("y"), F.col("c_tok").alias("c_y"))
    # lift = (c_xy/B) / ((c_x/T) * (c_y/T)) — every op correctly
    # rounded; the exact expression tree is mirrored in the oracle
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
    top = scored.orderBy(F.desc("lift"), F.col("bigram")).limit(topk)
    from pyspark.sql import Window

    win = Window.orderBy(F.desc("lift"), F.col("bigram"))
    return top.select(
        F.row_number().over(win).cast("int").alias("rank"),
        "bigram",
        "c_xy",
        "lift",
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    terms: Sequence[str],
    *,
    query_vec_id: int = 0,
    n_cand: int = 50,
    k: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    **bm25_kwargs,
) -> DataFrame:
    """Hybrid sparse+dense retrieval fused with Reciprocal Rank Fusion
    (Cormack et al. 2009): ``rrf(d) = 1/(K + r_sparse) + 1/(K +
    r_dense)`` over the BM25 top-``n_cand`` and the exact-cosine
    top-``n_cand`` for one probe (query terms + query vector), the
    standard RAG retrieval shape.

    Scale shape: each leg reduces to its candidate list independently
    (BM25 via TakeOrderedAndProject, cosine via the WindowGroupLimit
    grouped-top-k) — the fusion join then touches ≤ 2 x n_cand rows
    regardless of corpus size, so the full-outer join is a broadcast
    at any scale. Ranks absent from a leg contribute 0 (reported as
    rank 0).

    Determinism (oracle hash-match): ranks are ints with unique id
    tiebreaks; the fused score is two correctly-rounded divisions
    summed in fixed syntactic order — bitwise-equal across engines.
    """
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.operators.similarity import (
        _as_double_array,
        batch_topk,
    )

    sp_top = (
        bm25_scores(docs, terms, id_col=id_col, **bm25_kwargs)
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(n_cand)
    )
    ws = Window.orderBy(F.desc("score"), F.col(id_col))
    sp = sp_top.select(
        F.col(id_col),
        F.row_number().over(ws).cast("long").alias("r_sparse"),
    )
    queries = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.lit(0).alias("qid"), _as_double_array("embedding").alias("qv")
    )
    dn = batch_topk(emb, queries, k=n_cand).select(
        F.col("vec_id").alias(id_col), F.col("rank").cast("long").alias("r_dense")
    )
    fused = sp.join(dn, id_col, "full_outer")
    leg = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(rrf_k)) + r.cast("double")), F.lit(0.0)
    )
    scored = fused.select(
        id_col,
        F.coalesce(F.col("r_sparse"), F.lit(0).cast("long")).alias("r_sparse"),
        F.coalesce(F.col("r_dense"), F.lit(0).cast("long")).alias("r_dense"),
        (leg(F.col("r_sparse")) + leg(F.col("r_dense"))).alias("rrf"),
    )
    top = scored.orderBy(F.desc("rrf"), F.col(id_col)).limit(k)
    wr = Window.orderBy(F.desc("rrf"), F.col(id_col))
    return top.select(
        F.row_number().over(wr).cast("int").alias("rank"),
        id_col,
        "r_sparse",
        "r_dense",
        "rrf",
    )


def bigram_lm_coherence(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram-LM coherence: the mean corpus-estimated
    transition probability ``avg over adjacent pairs of
    c(x,y) / c(x)`` — the libm-free surrogate of the CCNet/KenLM
    perplexity quality filter (document perplexity is monotone in the
    mean log transition probability; the arithmetic mean of the
    probabilities ranks fluent-vs-gibberish the same way without the
    engine-divergent ``ln``). Low coherence = improbable word
    transitions = the doc the perplexity filter would drop.

    Probabilities are Q20 FIXED-POINT: each bigram's weight is the
    integer ``(c(x,y) << 20) div c(x)`` computed once model-side, and
    a document's score is the plain integer SUM of its transitions'
    weights, divided by ``n << 20`` at the very end (one double
    division, correctly rounded identically on every engine). The
    quantization bias is < 2^-20 per transition — invisible to a
    quality ranking — and it buys the 100 TB property the r6 form
    lacked: the per-doc aggregation is an associative integer sum
    (map-side partial aggregation, constant memory per group) instead
    of a collect_list-then-sorted-fold whose per-doc array was
    unbounded (a 1 GB document materialized all its transitions in
    one aggregation buffer just to make double addition
    order-deterministic).

    Scale shape (r7 rewrite — the r6 form paid THREE interpreted
    explode passes over every corpus transition, 9.1 s at sf1): the
    token stream is exploded as (x, next-or-NULL) pairs via one
    zip_with against the 1-shifted array (zip_with null-pads, so each
    token's pair carries its successor and the last token a NULL —
    every token occurrence starts exactly one pair), which makes the
    unigram model a ROLLUP of the full pair counts: c(x) = Σ_y
    c(x, y incl. NULL). Both count models therefore come from ONE
    explode pass (map-side partial aggregation collapses the shuffle
    to vocabulary size); the scoring leg is the only other corpus
    pass — the same pair explode equi-joined against the
    integer-weight table and SUMMED per doc, whole-stage-codegen end
    to end (no higher-order-function fold, no object aggregation).
    Two corpus passes total, both linear in corpus tokens. NOTE the
    weight table is DISTINCT-BIGRAM-sized — it grows with the corpus
    (≈ linearly until the type inventory saturates), NOT
    unigram-vocabulary-sized — so the scoring join strategy is left
    to AQE's size-based runtime decision rather than a forced
    ``F.broadcast`` hint: at bench scale AQE broadcasts it (measured
    table size < autoBroadcastJoinThreshold), at 100 TB it degrades
    gracefully to a keyed shuffle join instead of OOMing the driver
    trying to broadcast a billion-row model. Docs with < 2 tokens
    report 0 transitions and NULL coherence.
    """
    from hybrid_cdc_demo_spark.functions.text import words_lower

    w = docs.select(F.col(id_col), words_lower(text_col).alias("_w"))

    def pair_explode(frame: DataFrame) -> DataFrame:
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

    # model pass: one partial-aggregated count over (x, next-or-NULL);
    # unigram counts are the rollup, bigram counts the NULL-free slice.
    # The model is VOCABULARY-sized after aggregation, so it is lazily
    # localCheckpoint-ed: without the barrier Catalyst re-plans (and
    # re-runs) the corpus explode underneath it once per consumer —
    # uneven not-null pushdown into the uni/big branches defeats
    # ReuseExchange (same bounded-materialization pattern as
    # PageRank's edge frame, graph.py).
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
            "x",
            "y",
            F.expr("(_c * CAST(1048576 AS BIGINT)) div c_x").alias("w_q20"),
        )
    )
    # scoring pass: per-doc transitions against the integer weights —
    # a plain partial-aggregable SUM, order-independent. No broadcast
    # hint: the weight table scales with distinct bigrams, so AQE
    # picks broadcast-vs-shuffle from the MEASURED size at runtime.
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
            F.coalesce(F.col("n_transitions"), F.lit(0).cast("long")).alias(
                "n_transitions"
            ),
            (
                F.col("_s").cast("double")
                / (F.col("n_transitions") * F.lit(1048576)).cast("double")
            ).alias("coherence"),
        )
    )
