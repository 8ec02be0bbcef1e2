"""Retrieval north-star queries: BM25 probe-query scoring and PMI
collocation mining, both HASH-VERIFIED against DuckDB.

Determinism: both scores are built from integer counts with only
+,*,/ (each IEEE-correctly-rounded, so identical expression trees give
identical bits in both engines); the libm-divergent ``ln`` of textbook
BM25-idf / PMI is dropped for its monotone argument (odds-form idf,
lift) — ranking and thresholding are unchanged (PLANS.md rule). The
float constants are interpolated into the oracle SQL with ``repr()``
so DuckDB parses the *same Python double* Spark's ``lit()`` ships.
Per-document term sums fold in sorted term order (bounded arrays).
"""

from __future__ import annotations

from hybrid_cdc_demo_spark.operators.retrieval import bm25_topk, pmi_collocations
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table

#: fixed probe-query term bag (present in the synthetic corpus vocab)
BM25_TERMS = ["spark", "window", "hash", "query", "scan"]
_K1, _B = 1.2, 0.75
# exact doubles Spark's lit() uses, rendered at full precision for DuckDB
_K1P1 = repr(_K1 + 1.0)
_K1_1MB = repr(_K1 * (1.0 - _B))
_K1B = repr(_K1 * _B)
_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


@query(
    "ns_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(len(w)) AS sum_dl FROM toks
    ), hits AS (
      SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
      FROM hits WHERE term IN ({_TERMS_SQL})
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             ((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
              / (CAST(d.df AS DOUBLE) + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * {_K1P1})
                / (CAST(tf.tf AS DOUBLE) + {_K1_1MB}
                   + ({_K1B} * (CAST(tf.dl AS DOUBLE)
                      / (CAST(s.sum_dl AS DOUBLE)
                         / CAST(s.n_docs AS DOUBLE)))))) AS s
      FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
    ), doc AS (
      SELECT doc_id,
             list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                         (a, x) -> a + x) AS score
      FROM scored GROUP BY doc_id
    )
    SELECT CAST(row_number() OVER w AS INT) AS rank, doc_id, score
    FROM doc
    WINDOW w AS (ORDER BY score DESC, doc_id)
    QUALIFY row_number() OVER w <= 20
    ORDER BY rank
    """,
)
def ns_bm25_topk(spark, sf_dir):
    """BM25 top-20 for a 5-term probe query, HASH-VERIFIED: the
    inverted-index workload of query-based curation. Corpus stats and
    per-term document frequency broadcast into one scoring projection;
    the only wide exchange is the (doc, term) partial-aggregated
    groupBy (bounded by |terms| x matching docs, not corpus size);
    top-k is TakeOrderedAndProject, never a global window sort. The
    odds-form idf replaces ln (monotone-equivalent, libm-free)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=20, k1=_K1, b=_B)


@query(
    "ns_pmi_collocations",
    oracle="""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), uni AS (
      SELECT tok, COUNT(*) AS c_tok
      FROM (SELECT unnest(w) AS tok FROM toks) GROUP BY tok
    ), big AS (
      SELECT x, y, COUNT(*) AS c_xy FROM (
        SELECT w[i] AS x, w[i + 1] AS y
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
      ) GROUP BY x, y HAVING COUNT(*) >= 3
    ), totals AS (
      SELECT SUM(len(w)) AS t,
             SUM(CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END) AS b
      FROM toks
    ), scored AS (
      SELECT b2.x || ' ' || b2.y AS bigram, b2.c_xy,
             (CAST(b2.c_xy AS DOUBLE) / CAST(tt.b AS DOUBLE))
             / ((CAST(ux.c_tok AS DOUBLE) / CAST(tt.t AS DOUBLE))
                * (CAST(uy.c_tok AS DOUBLE) / CAST(tt.t AS DOUBLE))) AS lift
      FROM big b2
      JOIN uni ux ON b2.x = ux.tok
      JOIN uni uy ON b2.y = uy.tok
      CROSS JOIN totals tt
    )
    SELECT CAST(row_number() OVER w AS INT) AS rank, bigram, c_xy, lift
    FROM scored
    WINDOW w AS (ORDER BY lift DESC, bigram)
    QUALIFY row_number() OVER w <= 20
    ORDER BY rank
    """,
)
def ns_pmi_collocations(spark, sf_dir):
    """Top-20 collocations by PMI lift (count floor 3), HASH-VERIFIED:
    the phrase-discovery signal, as two partial-aggregated count jobs
    (unigrams, bigrams) + two key-partitioned equi-joins of the
    FLOORED bigram table against the vocabulary — the floor prunes
    before the joins, which is what keeps the candidate set sparse at
    corpus scale. Lift = p(xy)/(p(x)p(y)) is the monotone argument of
    textbook PMI, so the ranking is identical without ln()."""
    docs = load_table(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=3, topk=20)


@query(
    "ns_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(len(w)) AS sum_dl FROM toks
    ), hits AS (
      SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
      FROM hits WHERE term IN ({_TERMS_SQL})
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             ((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
              / (CAST(d.df AS DOUBLE) + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * {_K1P1})
                / (CAST(tf.tf AS DOUBLE) + {_K1_1MB}
                   + ({_K1B} * (CAST(tf.dl AS DOUBLE)
                      / (CAST(s.sum_dl AS DOUBLE)
                         / CAST(s.n_docs AS DOUBLE)))))) AS s
      FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
    ), doc AS (
      SELECT doc_id,
             list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                         (a, x) -> a + x) AS score
      FROM scored GROUP BY doc_id
    ), sp AS (
      SELECT doc_id,
             CAST(row_number() OVER ws AS BIGINT) AS r_sparse
      FROM doc
      WINDOW ws AS (ORDER BY score DESC, doc_id)
      QUALIFY row_number() OVER ws <= 50
    ), q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), dscored AS (
      SELECT e.vec_id AS doc_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qv, q.qv))) AS s
      FROM embeddings e CROSS JOIN q
    ), dn AS (
      SELECT doc_id, CAST(row_number() OVER wd AS BIGINT) AS r_dense
      FROM dscored
      WINDOW wd AS (ORDER BY s DESC, doc_id)
      QUALIFY row_number() OVER wd <= 50
    ), fused AS (
      SELECT COALESCE(sp.doc_id, dn.doc_id) AS doc_id,
             COALESCE(sp.r_sparse, 0) AS r_sparse,
             COALESCE(dn.r_dense, 0) AS r_dense,
             COALESCE(1.0 / (60.0 + CAST(sp.r_sparse AS DOUBLE)), 0.0)
             + COALESCE(1.0 / (60.0 + CAST(dn.r_dense AS DOUBLE)), 0.0) AS rrf
      FROM sp FULL OUTER JOIN dn ON sp.doc_id = dn.doc_id
    )
    SELECT CAST(row_number() OVER w AS INT) AS rank,
           doc_id, r_sparse, r_dense, rrf
    FROM fused
    WINDOW w AS (ORDER BY rrf DESC, doc_id)
    QUALIFY row_number() OVER w <= 20
    ORDER BY rank
    """,
)
def ns_hybrid_rrf(spark, sf_dir):
    """Hybrid sparse+dense retrieval via Reciprocal Rank Fusion,
    HASH-VERIFIED: BM25 top-50 for the probe terms fused with exact
    cosine top-50 for a probe vector by rrf = 1/(60+r_s) + 1/(60+r_d)
    — the standard RAG two-tower merge. Each leg pre-reduces to 50
    candidates (TakeOrderedAndProject / WindowGroupLimit), so the
    full-outer fusion join is candidate-bounded at any corpus scale;
    absent legs report rank 0 and contribute 0 to the fused score."""
    from hybrid_cdc_demo_spark.operators.retrieval import hybrid_rrf_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return hybrid_rrf_topk(docs, emb, BM25_TERMS, query_vec_id=0).orderBy("rank")


@query(
    "ns_lm_coherence",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), dpairs AS (
      SELECT doc_id, w[i] AS x, w[i + 1] AS y
      FROM toks, unnest(generate_series(1, len(w))) AS t(i)
    ), fullc AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM dpairs GROUP BY x, y
    ), uni AS (
      SELECT x, CAST(SUM(c) AS BIGINT) AS c_x FROM fullc GROUP BY x
    ), wq AS (
      SELECT f.x, f.y, (f.c * 1048576) // u.c_x AS w_q20
      FROM fullc f JOIN uni u USING (x) WHERE f.y IS NOT NULL
    ), agg AS (
      SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
             CAST(SUM(q.w_q20) AS BIGINT) AS s
      FROM dpairs d JOIN wq q USING (x, y)
      GROUP BY d.doc_id
    )
    SELECT t.doc_id,
           COALESCE(a.n_transitions, 0) AS n_transitions,
           CAST(a.s AS DOUBLE)
             / CAST(a.n_transitions * 1048576 AS DOUBLE) AS coherence
    FROM toks t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def ns_lm_coherence(spark, sf_dir):
    """Bigram-LM coherence quality scores, HASH-VERIFIED: mean
    corpus-estimated transition probability per document in Q20
    fixed-point — the libm-free stand-in for the CCNet perplexity
    filter (monotone ranking without ln()). Each token's pair carries
    its successor (NULL for the last token), so the unigram model is a
    rollup of the bigram counts — ONE corpus explode builds the whole
    model; per-bigram weights are integers (c_xy << 20) div c_x, and
    per-doc scoring is a plain integer SUM over a broadcast join (the
    r7 rewrite: the r6 form paid three explode passes plus a per-doc
    collect_list sorted fold, 9.1 s at sf1 — integer weights make the
    sum order-independent and exactly engine-reproducible without
    either)."""
    from hybrid_cdc_demo_spark.operators.retrieval import bigram_lm_coherence

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_coherence(docs).orderBy("doc_id")
