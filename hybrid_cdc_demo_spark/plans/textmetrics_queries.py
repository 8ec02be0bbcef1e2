"""Corpus-statistics and retrieval-training queries: character-level
Shannon entropy (the low-entropy / boilerplate quality filter), the
Zipf rank-frequency slope (corpus naturalness diagnostic), hard-
negative mining over the embedding table (contrastive-training data
prep), and quality-weighted duplicate-cluster canonicalization — all
HASH-VERIFIED against DuckDB.

Determinism notes (oracle hash-match):

* entropy folds the per-character ``c*log2(c)`` terms in SORTED
  character order on both engines (sort_array + aggregate here,
  ``list(... ORDER BY ch)`` + list_reduce in DuckDB), so the double
  sum is order-identical; the single final ROUND(…, 4) absorbs any
  residual libm log2 ULP.
* the Zipf fit reduces 100 (ln rank, ln freq) points through explicit
  sum-of-products (never the engines' covar/regr internals, which use
  different update formulas); ROUND(…, 4) on slope/intercept.
* hard-negative cosine scores are raw IEEE doubles: zip_with +
  left-fold aggregate here and list_dot_product in DuckDB accumulate
  in the SAME element order, so the scores are bitwise-equal (the
  ns_simsearch_batch precedent).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table


@query(
    "ns_text_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ), cc AS (
      SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
      FROM ch WHERE ch <> '' GROUP BY doc_id, ch
    ), d AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS alphabet,
             list_reduce(
               list_prepend(
                 0.0,
                 list(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
                      ORDER BY ch)),
               (acc, x) -> acc + x) AS s
      FROM cc GROUP BY doc_id
    )
    SELECT doc_id, n, alphabet,
           ROUND(log2(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE), 4)
             AS entropy
    FROM d ORDER BY doc_id
    """,
)
def ns_text_entropy(spark, sf_dir):
    """Per-document character-level Shannon entropy (bits/char),
    HASH-VERIFIED — the classic low-entropy filter that catches
    repeated-character spam, base64 blobs (high side) and boilerplate
    (low side) in pretraining corpora.

    Scale shape: the char explode is corpus-size x 1, but the
    (doc, char) partial aggregation collapses it map-side to
    |docs| x |alphabet| before the only shuffle; the per-doc fold then
    runs over a bounded array (alphabet size, ~10^2), collected and
    SORTED so the floating sum is order-identical to the oracle's
    ``ORDER BY ch`` list_reduce. entropy = log2(n) - sum(c*log2(c))/n
    — one division, no per-term p=c/n (fewer FP ops to diverge).
    """
    docs = load_table(spark, sf_dir, "documents")
    cc = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
        )
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    d = cc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("alphabet"),
        F.sort_array(F.collect_list(F.struct("ch", "c"))).alias("_cs"),
    )
    term = F.aggregate(
        "_cs",
        F.lit(0.0),
        lambda acc, x: acc
        + x["c"].cast("double") * F.log2(x["c"].cast("double")),
    )
    return d.select(
        "doc_id",
        "n",
        "alphabet",
        F.round(
            F.log2(F.col("n").cast("double")) - term / F.col("n").cast("double"),
            4,
        ).alias("entropy"),
    ).orderBy("doc_id")


@query(
    "ns_zipf_slope",
    oracle="""
    WITH occ AS (
      SELECT unnest(string_split(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
             AS tok
      FROM documents
    ), freq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM occ GROUP BY tok
      ORDER BY n_occ DESC, tok LIMIT 100
    ), ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY n_occ DESC, tok)
                     AS DOUBLE)) AS x,
             ln(CAST(n_occ AS DOUBLE)) AS y
      FROM freq
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM ranked
    )
    SELECT n AS n_terms,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 4) AS slope,
           ROUND((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                         / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
                 / CAST(n AS DOUBLE), 4) AS intercept
    FROM s
    """,
)
def ns_zipf_slope(spark, sf_dir):
    """Zipf rank-frequency log-log slope over the top-100 tokens,
    HASH-VERIFIED — natural language sits near slope -1; a corpus that
    drifts far off is machine-generated, template-heavy, or broken
    tokenization (a one-row corpus health check).

    Scale shape: token frequencies are the vocabulary two-phase
    aggregate (map-side partials, token-keyed shuffle); the head is
    TakeOrderedAndProject (per-partition heaps, no global sort); the
    rank window and least-squares fold then run over exactly 100 rows
    — bounded driver-scale data no matter the corpus size. The fit
    uses explicit sums (n·Σxy - ΣxΣy)/(n·Σxx - (Σx)²), identical
    formula in the oracle, never engine covar/regr internals.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                " ",
            )
        ).alias("tok")
    )
    top = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .orderBy(F.desc("n_occ"), "tok")
        .limit(100)
    )
    w = Window.orderBy(F.desc("n_occ"), "tok")  # 100 rows: one task, bounded
    ranked = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n_occ").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 4).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 4).alias("intercept"),
    )


@query(
    "ns_hard_negatives",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlabel,
             CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.qid, e.vec_id, e.label,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qv, q.qv))) AS score
      FROM embeddings e CROSS JOIN q
      WHERE e.label <> q.qlabel
    )
    SELECT qid, CAST(row_number() OVER w AS INT) AS rank, vec_id, label,
           score
    FROM scored
    WINDOW w AS (PARTITION BY qid ORDER BY score DESC, vec_id)
    QUALIFY row_number() OVER w <= 5
    ORDER BY qid, rank
    """,
)
def ns_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training, HASH-VERIFIED:
    for each of 5 probe vectors, the top-5 most-cosine-similar vectors
    with a DIFFERENT label — the near-miss negatives an embedding
    trainer pairs with each anchor. Probe batch broadcasts (map-side
    expansion, no corpus shuffle); label exclusion filters before the
    rank window; WindowGroupLimit pre-reduces each task to its local
    top-k so only probes x partitions x k rows move."""
    from hybrid_cdc_demo_spark.operators.similarity import (
        _as_double_array,
        hard_negatives_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        _as_double_array("embedding").alias("qv"),
    )
    return hard_negatives_topk(emb, probes, k=5).orderBy("qid", "rank")


@query(
    "ns_transcript_assembly",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
           array_to_string(list(event_type ORDER BY rn), '>') AS transcript
    FROM r WHERE rn <= 8
    GROUP BY user_id ORDER BY user_id
    """,
)
def ns_transcript_assembly(spark, sf_dir):
    """Per-user ordered transcript assembly capped at 8 turns,
    HASH-VERIFIED — the stage that turns an event/message log into
    bounded training dialogues. The rank window prunes to 8 rows per
    user MAP-SIDE (WindowGroupLimit, plan-pinned — the output
    deliberately carries no whole-history aggregate, which would
    defeat the pruning); the transcript is a bounded sorted fold; one
    user-keyed shuffle end to end. (ts, event_id) totally orders
    turns, so transcripts are deterministic."""
    from hybrid_cdc_demo_spark.operators.analytics import transcript_assembly

    events = load_table(spark, sf_dir, "events")
    return transcript_assembly(events, max_turns=8).orderBy("user_id")


def _mmr_oracle_sql(k: int = 10, lam: float = 0.7) -> str:
    """GENERATED DuckDB oracle for greedy MMR: the k picks unrolled as
    a MATERIALIZED CTE chain (the PageRank/LR generated-SQL shape,
    round 9). Bitwise-safe because every floating expression mirrors
    operators/similarity.mmr_select term-for-term: DuckDB's
    list_dot_product is bitwise-identical to the engine's
    aggregate(zip_with) left fold (verified on the driver corpus),
    sqrt is IEEE correctly-rounded in both engines, and the literals
    reproduce the PYTHON-computed constants exactly (1 - lam is
    emitted as repr(1.0 - lam) = 0.30000000000000004, not 0.3 — the
    engine multiplies by the former). Identical doubles make the
    per-step argmax pick identical ids, so the greedy recursion stays
    in lockstep; scores are then equal bit-for-bit, not just within
    tolerance."""
    l1 = repr(float(lam))
    l2 = repr(1.0 - float(lam))
    score = f"{l1} * rel - {l2} * COALESCE(ms, 0.0)"
    head = f"""
    WITH q0 AS MATERIALIZED (
      SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings
      WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ), s0 AS MATERIALIZED (
      SELECT vec_id, v,
             1.0 / sqrt(list_dot_product(v, v)) AS inv,
             rel,
             CAST(NULL AS DOUBLE) AS ms
      FROM (
        SELECT e.vec_id, e.v,
               CASE WHEN sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(q.q, q.q)) = 0.0
                    THEN NULL
                    ELSE list_dot_product(e.v, q.q)
                         / (sqrt(list_dot_product(e.v, e.v))
                            * sqrt(list_dot_product(q.q, q.q)))
               END AS rel
        FROM (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[])) > 0
        ) e CROSS JOIN q0 q
      )
      WHERE rel IS NOT NULL
    )"""
    parts = [head]
    for i in range(1, k + 1):
        parts.append(
            f""",
    p{i} AS MATERIALIZED (
      SELECT * FROM s{i - 1}
      ORDER BY {score} DESC, vec_id
      LIMIT 1
    ), s{i} AS MATERIALIZED (
      SELECT t.vec_id, t.v, t.inv, t.rel,
             GREATEST(
               COALESCE(t.ms, -2.0),
               list_dot_product(
                 t.v, list_transform(p.v, x -> x * p.inv)
               ) * t.inv
             ) AS ms
      FROM s{i - 1} t CROSS JOIN p{i} p
      WHERE t.vec_id <> p.vec_id
    )"""
        )
    hist = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS rank, vec_id, rel AS relevance, "
        f"{score} AS mmr_score FROM p{i}"
        for i in range(1, k + 1)
    )
    parts.append(f"\n    SELECT * FROM ({hist}) ORDER BY rank")
    return "".join(parts)


@query("ns_mmr_diverse", oracle=_mmr_oracle_sql(k=10, lam=0.7))
def ns_mmr_diverse(spark, sf_dir):
    """Maximal-marginal-relevance diverse top-10 (lambda=0.7) against
    the min-id probe vector — the diversity-aware alternative to plain
    cosine top-k (which returns one neighborhood k times). Greedy by
    construction: k bounded argmax jobs over a checkpointed relevance
    frame, selected vectors broadcast as literals, corpus never
    collected. HASH-VERIFIED against a GENERATED DuckDB oracle (the k
    greedy picks unrolled as CTEs — see _mmr_oracle_sql; the bitwise
    fold parity makes each argmax pick the same id in both engines);
    the exact numpy-greedy differential in tests/test_textmetrics.py
    remains as the structural safety net."""
    from hybrid_cdc_demo_spark.operators.similarity import (
        _as_double_array,
        mmr_select,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # min-id row via one TakeOrderedAndProject scan (r11): the old
    # agg-then-join extraction scanned embeddings twice just to find
    # the probe vector (vec_id is unique — identical result).
    qv = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(_as_double_array("embedding").alias("qv"))
    )
    return mmr_select(emb, qv, k=10, lam=0.7)


@query(
    "ns_dedup_canonical",
    oracle="""
    WITH n AS (
      SELECT doc_id, n_chars,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS key
      FROM documents
    ), r AS (
      SELECT key, doc_id, n_chars,
             row_number() OVER (PARTITION BY key
                                ORDER BY n_chars DESC, doc_id) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT)
               AS cluster_size,
             CAST(SUM(n_chars) OVER (PARTITION BY key) AS BIGINT) AS qsum
      FROM n
    )
    SELECT doc_id AS kept_doc_id, CAST(n_chars AS BIGINT) AS kept_quality,
           cluster_size, CAST(qsum - n_chars AS BIGINT) AS bytes_dropped
    FROM r WHERE rn = 1 ORDER BY kept_doc_id
    """,
)
def ns_dedup_canonical(spark, sf_dir):
    """Duplicate-cluster representative selection, HASH-VERIFIED:
    cluster by whitespace/case-normalized text, keep the LONGEST copy
    (tiebreak lowest doc_id), report cluster size and bytes saved —
    the "which copy survives" decision after duplicate detection
    (ns_dedup_exact only counts copies). One keyed aggregation; the
    argmax is max(struct(quality, -id, id)) so it partial-aggregates
    map-side — the oracle's per-cluster window, without a window."""
    from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup

    docs = load_table(spark, sf_dir, "documents")
    return quality_weighted_dedup(docs, "text", "doc_id", "n_chars").orderBy(
        "kept_doc_id"
    )


@query(
    "ns_dedup_quality_weighted",
    oracle="""
    WITH sig AS (
      SELECT doc_id, n_chars, text,
             LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0) AS ln_,
             CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
               / CAST(LENGTH(text) AS DOUBLE) AS pr,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    t -> list_contains(['the','a','an','and','of','in','to','is','it','that'], t))) AS DOUBLE)
               / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS sr
      FROM documents
    ), sc AS (
      SELECT doc_id, n_chars,
             -1.4 + 1.0 * ln_ + 2.0 * pr + 8.0 * sr AS score,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS key
      FROM sig
    ), r AS (
      SELECT key, doc_id, n_chars, score,
             row_number() OVER (PARTITION BY key
                                ORDER BY score DESC, doc_id) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT)
               AS cluster_size,
             CAST(SUM(n_chars) OVER (PARTITION BY key) AS BIGINT) AS csum
      FROM sc
    )
    SELECT doc_id AS kept_doc_id, score AS kept_quality,
           cluster_size, CAST(csum - n_chars AS BIGINT) AS bytes_dropped
    FROM r WHERE rn = 1 ORDER BY kept_doc_id
    """,
)
def ns_dedup_quality_weighted(spark, sf_dir):
    """Duplicate-cluster representative selection ranked by a
    FRACTIONAL quality score, HASH-VERIFIED: cluster by normalized
    text, keep the copy with the highest classifier log-odds
    (ns_quality_classifier's bitwise-reproducible linear score;
    tiebreak lowest doc_id), account the savings in n_chars — the
    separated ranking/size API from ADVICE r6 #1, exercised end to end
    with a double-typed ranking key the old long-cast implementation
    would have truncated to a constant. Same single partial-aggregable
    max(struct) keyed aggregation as ns_dedup_canonical — the
    window-free argmax; kept_quality returned in the score's own
    double type, hash-matched unrounded."""
    from hybrid_cdc_demo_spark.operators import classifier as CL
    from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup

    docs = load_table(spark, sf_dir, "documents")
    scored = CL.score_documents(docs)
    return quality_weighted_dedup(
        scored, "text", "doc_id", "score", size_col="n_chars"
    ).orderBy("kept_doc_id")
