"""ML-adjacent north-star queries: distributed k-means, SemDeDup-style
semantic dedup, and quality-classifier scoring/training.

Determinism: the k-means entries train with the ``exact_fold`` sorted
strict-left-fold centroid update on a bounded id-slice sample, so every
IEEE intermediate matches a DuckDB ``list_reduce`` oracle bit for bit
(same fold order, same ``list_prepend`` zero-init); assignments are
integers, so the hash compare has no rounding surface at all. The
classifier score is emitted as UNROUNDED log-odds (fixed-order
products/sums of oracle-verified features) rather than a sigmoid —
exp() is libm-divergent between engines (PLANS.md rule), and log-odds
thresholding is equivalent.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators import classifier as CL
from hybrid_cdc_demo_spark.operators import clustering as C
from hybrid_cdc_demo_spark.operators.similarity import _as_double_array
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table, table_num_rows

# DuckDB fragment: squared-L2 distance as the same strict left fold
# (zero-init prepended) Spark's cell_assign_expr aggregate() computes.
_D2 = (
    "list_reduce(list_prepend(0.0, "
    "list_transform(t.e, (x,i) -> (x - c.c[i])*(x - c.c[i]))), "
    "(a,b) -> a+b)"
)

# DuckDB fragment: deterministic centroid update — element-wise strict
# left fold over members sorted by vec_id, then divide by the count.
_FOLD_MEAN = """
  SELECT cluster,
         list_transform(
           list_reduce(
             list_prepend(list_transform(generate_series(1, 64), i -> 0.0), rows_),
             (acc, r) -> list_transform(acc, (x,i) -> x + r[i])),
           x -> x / CAST(n AS DOUBLE)) AS c
  FROM {src}
"""


def semdedup_k(n: int, target_cluster_size: int = 64) -> int:
    """Corpus-scaled SemDeDup cluster count: k = max(8, n / target).
    Keeping expected cluster size constant bounds within-cluster pair
    work at O(n·target) — the round-5 scaling sweep caught fixed k=8
    going quadratic (SCALING_r05.json / PERF.md). The oracle mirrors
    this exactly as GREATEST(8, COUNT(*) // 64)."""
    return max(8, int(n) // target_cluster_size)


@query(
    "ns_kmeans_assign",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), train AS (
      SELECT * FROM emb WHERE vec_id < 500
    ), c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, e AS c
      FROM (SELECT * FROM train ORDER BY vec_id LIMIT 8)
    ), a0 AS (
      SELECT t.vec_id, t.e, c.cluster
      FROM train t CROSS JOIN c0 c
      QUALIFY row_number() OVER (
        PARTITION BY t.vec_id ORDER BY {_D2}, c.cluster) = 1
    ), g1 AS (
      SELECT cluster, list(e ORDER BY vec_id) AS rows_, COUNT(*) AS n
      FROM a0 GROUP BY cluster
    ), c1 AS ({_FOLD_MEAN.format(src="g1")}
    ), a1 AS (
      SELECT t.vec_id, t.e, c.cluster
      FROM train t CROSS JOIN c1 c
      QUALIFY row_number() OVER (
        PARTITION BY t.vec_id ORDER BY {_D2}, c.cluster) = 1
    ), g2 AS (
      SELECT cluster, list(e ORDER BY vec_id) AS rows_, COUNT(*) AS n
      FROM a1 GROUP BY cluster
    ), c2 AS ({_FOLD_MEAN.format(src="g2")}
    )
    SELECT t.vec_id, CAST(c.cluster AS INT) AS cluster
    FROM emb t CROSS JOIN c2 c
    QUALIFY row_number() OVER (
      PARTITION BY t.vec_id ORDER BY {_D2}, c.cluster) = 1
    ORDER BY vec_id
    """,
)
def ns_kmeans_assign(spark, sf_dir):
    """Distributed Lloyd's k-means, HASH-VERIFIED end to end: train 2
    exact-fold iterations on the bounded id-slice sample (vec_id <
    500 — constant size at every SF, the train-on-sample production
    shape), then assign the FULL corpus with a map-only nested-literal
    argmin (no shuffle, no driver data movement; the model is k x 64
    doubles). Assignments are integers — zero rounding surface."""
    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    centers, ids, _ = C.kmeans(
        train, k=8, iters=2, seed_by="id", exact_fold=True, on_empty="drop",
        mode="driver",  # bounded 500-row sample: collect once, train
        # local — bitwise-identical centers (r10, the pq_train r8
        # precedent; pinned in test_clustering.py)
    )
    full = emb.select(
        "vec_id", _as_double_array("embedding").alias("_v")
    )
    return full.select(
        "vec_id",
        C.assign_expr_with_ids(centers, ids).cast("int").alias("cluster"),
    ).orderBy("vec_id")


@query(
    "ns_semantic_dedup",
    # Assignment is TWO-STAGE so the oracle stays tractable at scale
    # (VERDICT r8 #4: the exact-fold n x k cross join was a >2 h
    # interpreted-lambda scan at sf3, forcing an oracle-cost
    # exclusion): stage 1 scores every (point, centroid) pair with the
    # NATIVE list_dot_product expansion |t|^2+|c|^2-2 t.c (vectorized
    # C++, no lambda interpreter) and keeps candidates within 1e-6 of
    # the per-point minimum; stage 2 re-ranks ONLY the candidates with
    # the exact fold the Spark side uses. Completeness: the two d^2
    # formulas agree to ~1e-12 absolute on this corpus (64 fused ops
    # on O(1) doubles), so the exact-fold argmin always survives a
    # 1e-6 window — the filter can only ADD near-tied candidates,
    # which the exact re-rank then orders. The final assignment is
    # therefore bit-identical to the pure exact-fold argmin, at
    # n x k native dots + |candidates| interpreted folds.
    oracle=f"""
    WITH emb AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), c0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, e AS c
      FROM emb
      QUALIFY row_number() OVER (ORDER BY vec_id)
              <= (SELECT GREATEST(8, COUNT(*) // 64) FROM emb)
    ), normc AS MATERIALIZED (
      SELECT cluster, c, list_dot_product(c, c) AS nc FROM c0
    ), normt AS MATERIALIZED (
      SELECT vec_id, e, list_dot_product(e, e) AS nt FROM emb
    ), cand AS MATERIALIZED (
      SELECT vec_id, cluster
      FROM (
        SELECT t.vec_id, c.cluster,
               t.nt + c.nc - 2.0 * list_dot_product(t.e, c.c) AS d2f
        FROM normt t CROSS JOIN normc c
      )
      QUALIFY d2f <= MIN(d2f) OVER (PARTITION BY vec_id) + 1e-6
    ), a AS MATERIALIZED (
      SELECT t.vec_id, t.e, CAST(c.cluster AS INT) AS cluster
      FROM cand z
      JOIN emb t ON z.vec_id = t.vec_id
      JOIN c0 c ON z.cluster = c.cluster
      QUALIFY row_number() OVER (
        PARTITION BY t.vec_id ORDER BY {_D2}, c.cluster) = 1
    )
    SELECT p.cluster, p.id_a, p.id_b, p.cos
    FROM (
      SELECT x.cluster, x.vec_id AS id_a, y.vec_id AS id_b,
             list_dot_product(x.e, y.e)
             / (sqrt(list_dot_product(x.e, x.e))
                * sqrt(list_dot_product(y.e, y.e))) AS cos
      FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    ) p
    WHERE p.cos >= 0.3
    ORDER BY id_a, id_b
    """,
)
def ns_semantic_dedup(spark, sf_dir):
    """SemDeDup (cluster-then-dedup): nearest-seed-centroid bucketing
    (map-only literal argmin) followed by exact pairwise cosine ONLY
    within clusters — the equi-join on cluster bounds the quadratic
    pair space to per-cluster work. k SCALES WITH THE CORPUS
    (k = max(8, n/64), identical GREATEST/COUNT formula in the oracle)
    so expected cluster size stays ~constant and total pair work is
    O(n · target_size), not O(n²/k_fixed) — the round-5 scaling sweep
    caught the fixed-k=8 form going quadratic (1.1 s → 22 s on 10x
    data); with scaled k it is back to ~linear. n comes from parquet
    FOOTER METADATA (memoized, no Spark job), so building this query
    is action-free like every other catalog entry (ADVICE r5 #3); at
    corpus scale the literal argmin hands over to the IVF index's
    join-based assignment (same operator family).
    Cosine emitted unrounded: both engines left-fold the dot products,
    bitwise-equal (see ns_embedding_neardup_exact).
    Assignment parity with the oracle (ADVICE r6 #2): below the
    threshold "auto" IS the fold-order-exact expression (the
    historically hash-verified configuration at every driver SF);
    above it "auto" resolves to the margin-GUARDED BLAS argmin
    (similarity.cell_assign_guarded) — BLAS answers kept only where
    the top-2 margin exceeds a rigorous float-error bound covering
    BOTH distance formulas, the remainder re-assigned by the literal
    expression in a lazy CASE branch — so the assignment is PROVABLY
    expr-identical at any scale while staying GEMM-fast (the raw
    "numpy" path can flip inside the error band, the r6 concern; the
    sf1 scale sweep additionally certifies numpy==expr empirically on
    the expanded corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = C.semantic_dedup(
        emb,
        k=semdedup_k(table_num_rows(sf_dir, "embeddings")),
        threshold=0.3,
        seed_by="id",
        assign_method="auto",
    )
    return pairs.select(
        F.col("cluster").cast("int").alias("cluster"), "id_a", "id_b", "cos"
    ).orderBy("id_a", "id_b")


@query(
    "ns_quality_classifier",
    oracle="""
    WITH sig AS (
      SELECT doc_id,
             LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0) AS ln_,
             CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
               / CAST(LENGTH(text) AS DOUBLE) AS pr,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    t -> list_contains(['the','a','an','and','of','in','to','is','it','that'], t))) AS DOUBLE)
               / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS sr
      FROM documents)
    SELECT doc_id,
           -1.4 + 1.0 * ln_ + 2.0 * pr + 8.0 * sr AS score,
           CAST((-1.4 + 1.0 * ln_ + 2.0 * pr + 8.0 * sr) > 0 AS INT) AS keep
    FROM sig ORDER BY doc_id
    """,
)
def ns_quality_classifier(spark, sf_dir):
    """Linear quality-filter scoring (fastText/CCNet-style) as a
    map-only projection: fixed-weight log-odds over the oracle-verified
    surface features, plus the keep/drop decision. Log-odds instead of
    sigmoid keeps the output bitwise-reproducible (exp() diverges
    between libm builds); thresholding is equivalent."""
    docs = load_table(spark, sf_dir, "documents")
    scored = CL.score_documents(docs)
    return scored.select(
        "doc_id", "score", F.col("keep").cast("int").alias("keep")
    ).orderBy("doc_id")


def _lr_training_oracle_sql(iters: int = 8, lr: float = 1.0) -> str:
    """GENERATED DuckDB oracle for full-batch logistic-regression GD:
    the ``iters`` gradient steps unrolled as a CTE chain carrying the
    4 weights as a 1-row relation per step (the PQ generated-SQL
    trick, VERDICT r8 #5). Feature extraction reuses the hash-verified
    ns_quality_classifier expressions; standardization, the stable
    cross-entropy, the sigmoid, and the update rule mirror
    operators/classifier.py:train_logistic term-for-term. Engine
    differences are ulp-level (SUM order; LN(1+x) vs log1p; AVG /
    STDDEV_POP accumulation order) and the training curve rounds to 3
    decimals, ~9 orders above the accumulated error — so the curve is
    hash-exact while the weights themselves (never emitted) remain
    iteration-order FP. Every CTE is MATERIALIZED: each step is
    referenced by the next AND by the history projection, and DuckDB
    inlining would re-evaluate the chain exponentially."""
    L = repr(lr)
    head = """
    WITH feats AS MATERIALIZED (
      SELECT LEAST(CAST(LENGTH(text) AS DOUBLE) / 200.0, 1.0) AS rf0,
             CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
               / CAST(LENGTH(text) AS DOUBLE) AS rf1,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                    t -> list_contains(['the','a','an','and','of','in','to','is','it','that'], t))) AS DOUBLE)
               / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS rf2
      FROM documents
    ), labeled AS MATERIALIZED (
      SELECT rf0, rf1, rf2,
             CAST(-1.4 + 1.0 * rf0 + 2.0 * rf1 + 8.0 * rf2 > 0 AS DOUBLE) AS y
      FROM feats
    ), st AS MATERIALIZED (
      SELECT AVG(rf0) AS m0, AVG(rf1) AS m1, AVG(rf2) AS m2,
             COALESCE(NULLIF(STDDEV_POP(rf0), 0.0), 1.0) AS s0,
             COALESCE(NULLIF(STDDEV_POP(rf1), 0.0), 1.0) AS s1,
             COALESCE(NULLIF(STDDEV_POP(rf2), 0.0), 1.0) AS s2
      FROM labeled
    ), norm AS MATERIALIZED (
      SELECT (rf0 - st.m0) / st.s0 AS f0,
             (rf1 - st.m1) / st.s1 AS f1,
             (rf2 - st.m2) / st.s2 AS f2,
             y
      FROM labeled CROSS JOIN st
    ),
    w0 AS MATERIALIZED (
      SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3
    )"""
    parts = [head]
    for i in range(iters):
        parts.append(
            f""",
    z{i} AS MATERIALIZED (
      SELECT f0, f1, f2, y,
             w.b + w.w1 * f0 + w.w2 * f1 + w.w3 * f2 AS z
      FROM norm CROSS JOIN w{i} w
    ), p{i} AS MATERIALIZED (
      SELECT f0, f1, f2, y, z, 1.0 / (1.0 + EXP(-z)) AS p FROM z{i}
    ), a{i} AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(GREATEST(z, 0.0) - z * y + LN(1.0 + EXP(-ABS(z)))) AS loss,
             SUM(CAST(CAST(p > 0.5 AS DOUBLE) = y AS DOUBLE)) AS hits,
             SUM(p - y) AS g0,
             SUM((p - y) * f0) AS g1,
             SUM((p - y) * f1) AS g2,
             SUM((p - y) * f2) AS g3
      FROM p{i}
    ), w{i + 1} AS MATERIALIZED (
      SELECT w.b - {L} * a.g0 / a.n AS b,
             w.w1 - {L} * a.g1 / a.n AS w1,
             w.w2 - {L} * a.g2 / a.n AS w2,
             w.w3 - {L} * a.g3 / a.n AS w3
      FROM w{i} w CROSS JOIN a{i} a
    )"""
        )
    hist = " UNION ALL ".join(
        f"SELECT {i} AS iteration, ROUND(loss / n, 3) AS loss, "
        f"ROUND(hits / n, 3) AS accuracy FROM a{i}"
        for i in range(iters)
    )
    parts.append(
        f"""
    SELECT CAST(iteration AS INT) AS iteration, loss, accuracy
    FROM ({hist}) ORDER BY iteration"""
    )
    return "".join(parts)


@query("ns_lr_training", oracle=_lr_training_oracle_sql(iters=8, lr=1.0))
def ns_lr_training(spark, sf_dir):
    """Distributed full-batch gradient descent for logistic regression
    (distilling the fixed-weight quality rule): one aggregation job
    per iteration, map-side partial gradient sums, only the
    O(num_features) model round-trips to the driver. Output is the
    training curve (loss/accuracy per iteration, rounded to 3 decimals
    — sub-ulp shuffle-order wobble rounds away). HASH-VERIFIED against
    a GENERATED DuckDB oracle (the 8 GD steps unrolled as CTEs — see
    _lr_training_oracle_sql); the convergence contract test in
    tests/test_classifier.py remains as the structural safety net."""
    docs = load_table(spark, sf_dir, "documents")
    feats = CL.doc_feature_exprs("text")
    label = CL.logit_score(feats, CL.QUALITY_WEIGHTS) > 0
    _, hist = CL.train_logistic(docs, feats, label, iters=8, lr=1.0)
    return CL.history_df(spark, hist)


@query(
    "ns_simsearch_batch",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT q.qid, e.vec_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q.qv, q.qv))) AS score
      FROM embeddings e CROSS JOIN q
    )
    SELECT qid, CAST(row_number() OVER w AS INT) AS rank, vec_id, score
    FROM scored
    WINDOW w AS (PARTITION BY qid ORDER BY score DESC, vec_id)
    QUALIFY row_number() OVER w <= 5
    ORDER BY qid, rank
    """,
)
def ns_simsearch_batch(spark, sf_dir):
    """Batch ANN baseline, HASH-VERIFIED: exact cosine top-5 for a
    BATCH of 8 query vectors in one pass. The query set broadcasts, so
    scoring is a map-side expansion; the per-query limit is a rank
    window that Spark >= 3.5 compiles with WindowGroupLimit — each map
    task pre-reduces to its local top-k per query BEFORE the shuffle,
    so only queries x partitions x k rows move (the grouped-top-k
    plan shape, pinned in tests/test_plans.py)."""
    from hybrid_cdc_demo_spark.operators.similarity import batch_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), _as_double_array("embedding").alias("qv")
    )
    return batch_topk(emb, queries, k=5).orderBy("qid", "rank")


@query(
    "ns_temperature_sampling",
    oracle="""
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), t AS (
      SELECT SUM(n_docs) AS n_total FROM c
    ), b0 AS (
      SELECT c.source, c.n_docs,
             CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share
      FROM c CROSS JOIN t
    ), b AS (
      SELECT source, n_docs, share, sqrt(share) AS s FROM b0
    ), d AS (
      SELECT list_reduce(list_prepend(0.0, list(s ORDER BY source)),
                         (acc, x) -> acc + x) AS denom
      FROM b
    )
    SELECT b.source, b.n_docs, b.share, b.s / d.denom AS weight
    FROM b CROSS JOIN d ORDER BY source
    """,
)
def ns_temperature_sampling(spark, sf_dir):
    """mC4/CC-100 temperature resampling weights (alpha = 0.5) per
    source, HASH-VERIFIED: shares are exact integer ratios, the
    tempering is sqrt (IEEE correctly rounded — pow() would be
    libm-divergent), and the normalizer folds the per-source terms in
    sorted source order so the double sum is bitwise-reproducible.
    One shuffle on the group key + two broadcast one-row frames."""
    from hybrid_cdc_demo_spark.operators.curation import temperature_weights

    docs = load_table(spark, sf_dir, "documents")
    return temperature_weights(docs, "source", alpha=0.5)


@query(
    "ns_pca_gram",
    oracle="""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 500
    ), cell AS (
      SELECT a.i AS i, b.i AS j
      FROM (SELECT unnest(generate_series(1, 64)) AS i) a,
           (SELECT unnest(generate_series(1, 64)) AS i) b
      WHERE a.i <= b.i
    ), g AS (
      SELECT c.i, c.j,
             list_reduce(
               list_prepend(0.0, list(e.e[c.i] * e.e[c.j] ORDER BY e.vec_id)),
               (a, x) -> a + x) AS v
      FROM cell c CROSS JOIN emb e
      GROUP BY c.i, c.j
    )
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, v FROM g ORDER BY i, j
    """,
)
def ns_pca_gram(spark, sf_dir):
    """Distributed Gram-matrix accumulation (the PCA/whitening
    reduction), HASH-VERIFIED on the bounded id-slice training sample:
    every G[i,j] folds its xi*xj terms in ascending vec_id order, so
    the 2,080-cell upper triangle is bitwise-equal to DuckDB's
    list_reduce. The production path for the same operator is the
    numpy partial-Gram mapInPandas (one d^2-sized partial per
    partition, ONE aggregation shuffle — tested against this exact
    fold in tests/test_linalg.py); train-on-sample bounds the
    exact-fold cost exactly like ns_kmeans_assign. Runs mode="driver"
    (r10, the ns_pq_encode precedent): the bounded sample collects
    once and the identical ascending-id fold runs in numpy — bitwise
    the same cells (pinned in test_linalg.py) without exploding the
    sample into rows x 2,080 structs and shuffling them to d²
    reducers; the full-corpus Gram keeps the mapInPandas partial
    path."""
    from hybrid_cdc_demo_spark.operators.linalg import gram_matrix

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return gram_matrix(
        emb, "embedding", "vec_id", dim=64, exact_fold=True, mode="driver"
    ).orderBy("i", "j")


@query("ns_pca_project")  # contract-pinned in tests/test_linalg.py
def ns_pca_project(spark, sf_dir):
    """PCA projection of the FULL corpus onto the top-4 components of
    the sample Gram matrix: eigendecomposition runs on the driver over
    d^2 numbers (model-sized — the IVF-centroid class of driver data),
    and the projection is a map-only nested-literal fold — no join, no
    shuffle, the kmeans-assign scale shape. No SQL oracle (eigenvectors
    are LAPACK-iteration FP); the contract test pins orthonormality,
    descending captured variance, determinism across runs, and parity
    between the numpy and exact-fold Gram paths."""
    from hybrid_cdc_demo_spark.operators.linalg import (
        gram_matrix,
        pca_components,
        pca_project,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    rows = gram_matrix(
        train, "embedding", "vec_id", dim=64, exact_fold=True, mode="driver"
    ).collect()  # d(d+1)/2 doubles — bounded model-sized driver data
    comps, _ = pca_components(rows, dim=64, n_components=4)
    return pca_project(emb, comps, "embedding", "vec_id").orderBy("vec_id")


def _random_projection_oracle(dim: int = 64, k: int = 4, seed: int = 42) -> str:
    """GENERATED DuckDB mirror of the JL random projection: the basis
    is data-independent (seeded gaussian + QR, linalg.py), so — unlike
    the PCA eigenbasis, whose training slice differs per sf — the SAME
    literal basis is valid at every scale point. Both sides are the
    identical strict left fold in index order (Spark F.aggregate over
    zip_with ≡ DuckDB list_reduce over list_transform), so values are
    bitwise-equal; the basis floats are rendered shortest-repr and both
    engines' literal parses are correctly rounded."""
    from hybrid_cdc_demo_spark.operators.linalg import (
        random_orthonormal_basis,
    )

    comps = random_orthonormal_basis(dim, k, seed)
    cols = []
    for i, c in enumerate(comps):
        arr = "[" + ", ".join(f"'{float(x)!r}'::DOUBLE" for x in c) + "]"
        cols.append(
            f"list_reduce(list_prepend(0.0, list_transform(e, "
            f"(x,j) -> x * {arr}[j])), (a,b) -> a + b) AS rp{i + 1}"
        )
    return f"""
    SELECT vec_id, {", ".join(cols)}
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    ORDER BY vec_id
    """


@query("ns_random_projection", oracle=_random_projection_oracle())
def ns_random_projection(spark, sf_dir):
    """Johnson–Lindenstrauss random projection of the full embedding
    corpus onto a seeded orthonormal k=4 basis — the data-independent
    dimensionality reduction an LLM pipeline runs BEFORE any training
    pass is affordable (distance-preserving sketch for ANN prefilters,
    near-dup blocking, cheap clustering; the PCA query above is the
    trained counterpart). Map-only: scan + one codegen projection per
    output dim, zero shuffles, zero driver data — at 100 TB this is a
    pure pass over the corpus. Hash-exact vs a generated literal-basis
    DuckDB oracle (see _random_projection_oracle)."""
    from hybrid_cdc_demo_spark.operators.linalg import (
        pca_project,
        random_orthonormal_basis,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    comps = random_orthonormal_basis(64, 4, 42)
    out = pca_project(emb, comps, "embedding", "vec_id").orderBy("vec_id")
    return out.select(
        "vec_id", *[F.col(f"pc{i + 1}").alias(f"rp{i + 1}") for i in range(4)]
    )


def _pq_oracle(m: int = 4, sub: int = 16, k: int = 8) -> str:
    """Generate the DuckDB mirror of PQ training+encoding: the
    ns_kmeans_assign CTE chain (seed -> 2 exact-fold Lloyd iterations
    -> argmin assignment), instantiated once per subspace over the
    1-based inclusive list slice, joined on vec_id at the end."""
    d2 = (
        "list_reduce(list_prepend(0.0, "
        "list_transform(t.e, (x,i) -> (x - c.c[i])*(x - c.c[i]))), "
        "(a,b) -> a+b)"
    )
    fold = (
        "SELECT cluster, list_transform(list_reduce(list_prepend("
        "list_transform(generate_series(1, {sub}), i -> 0.0), rows_), "
        "(acc, r) -> list_transform(acc, (x,i) -> x + r[i])), "
        "x -> x / CAST(n AS DOUBLE)) AS c FROM {src}"
    )
    ctes = []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        ctes.append(
            f"emb{s} AS (SELECT vec_id, "
            f"CAST(embedding AS DOUBLE[])[{lo}:{hi}] AS e FROM embeddings)"
        )
        ctes.append(f"train{s} AS (SELECT * FROM emb{s} WHERE vec_id < 500)")
        ctes.append(
            f"c0_{s} AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 "
            f"AS cluster, e AS c FROM "
            f"(SELECT * FROM train{s} ORDER BY vec_id LIMIT {k}))"
        )
        for it in (0, 1):
            ctes.append(
                f"a{it}_{s} AS (SELECT t.vec_id, t.e, c.cluster "
                f"FROM train{s} t CROSS JOIN c{it}_{s} c "
                f"QUALIFY row_number() OVER (PARTITION BY t.vec_id "
                f"ORDER BY {d2}, c.cluster) = 1)"
            )
            ctes.append(
                f"g{it + 1}_{s} AS (SELECT cluster, "
                f"list(e ORDER BY vec_id) AS rows_, COUNT(*) AS n "
                f"FROM a{it}_{s} GROUP BY cluster)"
            )
            ctes.append(
                f"c{it + 1}_{s} AS "
                f"({fold.format(sub=sub, src=f'g{it + 1}_{s}')})"
            )
        ctes.append(
            f"code{s} AS (SELECT t.vec_id, CAST(c.cluster AS INT) AS c{s + 1} "
            f"FROM emb{s} t CROSS JOIN c2_{s} c "
            f"QUALIFY row_number() OVER (PARTITION BY t.vec_id "
            f"ORDER BY {d2}, c.cluster) = 1)"
        )
    joins = " ".join(f"JOIN code{s} USING (vec_id)" for s in range(1, m))
    cols = ", ".join(f"c{s + 1}" for s in range(m))
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vec_id, {cols} FROM code0 {joins} ORDER BY vec_id"
    )


@query("ns_pq_encode", oracle=_pq_oracle())
def ns_pq_encode(spark, sf_dir):
    """Product quantization (Jégou et al. 2011), HASH-VERIFIED end to
    end: train 4 independent 8-centroid codebooks (one per 16-dim
    subspace) with the exact-fold Lloyd loop on the bounded id-slice
    sample, then encode the FULL corpus as 4 small codes in one
    map-only literal-argmin projection — 64 floats collapse to 4
    bytes, the compression that makes billion-vector ANN feasible.
    Codes are integers (zero FP surface in the result); the oracle
    replays all four training chains in generated SQL, so the hash
    match certifies the entire train->encode pipeline per subspace.
    Training runs mode="driver" (r8): the bounded sample collects once
    and the exact-fold Lloyd loop runs in plain Python — the FAISS
    train-on-sample shape, bitwise-identical codebooks (pinned in
    test_pq.py), ~5 scheduled jobs fewer per call."""
    from hybrid_cdc_demo_spark.operators.clustering import pq_encode, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    books = pq_train(
        train, dim=64, m=4, k=8, iters=2, exact_fold=True, seed_by="id",
        mode="driver",  # bounded 500-row sample: collect once, train local
    )
    return pq_encode(emb, books, dim=64).orderBy("vec_id")


def _pq_adc_oracle(m: int = 4, sub: int = 16, k: int = 8, topk: int = 10) -> str:
    """Extend the PQ training oracle with the ADC search: per-subspace
    query->centroid lookup tables (the same strict left fold) and the
    left-associated 4-term distance sum, then the top-k."""
    base = _pq_oracle(m=m, sub=sub, k=k)
    ctes, tail = base.split("\nSELECT", 1)
    extra = []
    for s in range(m):
        extra.append(
            f"q{s} AS (SELECT e AS qv FROM emb{s} WHERE vec_id = 0)"
        )
        extra.append(
            f"lut{s} AS (SELECT c.cluster, "
            f"list_reduce(list_prepend(0.0, "
            f"list_transform(q.qv, (x,i) -> (x - c.c[i])*(x - c.c[i]))), "
            f"(a,b) -> a+b) AS d FROM c2_{s} c CROSS JOIN q{s} q)"
        )
    code_joins = " ".join(f"JOIN code{s} USING (vec_id)" for s in range(1, m))
    lut_joins = " ".join(
        f"JOIN lut{s} l{s} ON l{s}.cluster = c{s + 1}" for s in range(m)
    )
    dist = " + ".join(f"l{s}.d" for s in range(m))  # left-associated
    return (
        ctes
        + ",\n"
        + ",\n".join(extra)
        + f""",
    adc AS (
      SELECT code0.vec_id, {dist} AS adc_d2
      FROM code0 {code_joins} {lut_joins}
    )
    SELECT CAST(row_number() OVER w AS INT) AS rank, vec_id, adc_d2
    FROM adc
    WINDOW w AS (ORDER BY adc_d2, vec_id)
    QUALIFY row_number() OVER w <= {topk}
    ORDER BY rank
    """
    )


@query("ns_pq_adc_topk", oracle=_pq_adc_oracle())
def ns_pq_adc_topk(spark, sf_dir):
    """PQ asymmetric-distance top-10 for the min-id query vector,
    HASH-VERIFIED end to end INCLUDING the search: the generated
    oracle replays codebook training per subspace, builds the same
    query->centroid lookup tables with the same strict left fold, and
    sums the per-subspace terms in the same association order — so the
    approximate distances are bitwise-equal and the ranking matches
    exactly. Spark side: LUTs are m·k doubles computed driver-side;
    the scan is a map-only projection over the encoded frame +
    TakeOrderedAndProject (the FAISS IVF-PQ cell-scan shape)."""
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.operators.clustering import pq_adc_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    books = pq_train(
        train, dim=64, m=4, k=8, iters=2, exact_fold=True, seed_by="id",
        mode="driver",  # bounded sample — see ns_pq_encode
    )
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    query_vec = [float(x) for x in qrow["embedding"]]
    top = pq_adc_topk(emb, books, query_vec, dim=64, topk=10)
    w = Window.orderBy("adc_d2", "vec_id")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "vec_id", "adc_d2"
    )


@query("ns_opq_rotation")  # contract-pinned in tests/test_pq.py (TestOPQ)
def ns_opq_rotation(spark, sf_dir):
    """OPQ rotation training diagnostics (Ge et al. 2013, the FAISS
    OPQMatrix pre-rotation): per-iteration mean quantization error of
    PQ in the learned rotated space, plus the rotation's orthogonality
    residual ‖WᵀW − I‖_max. iter=0 is the seed codebooks at the
    identity rotation, so the table IS the improvement story the
    alternation delivers (each later row has one more joint
    Lloyd+rotation step behind it). Train-
    on-sample (bounded id slice) like every codebook entry; each
    iteration is pq_train's one-pass-per-Lloyd-step plus ONE
    distributed d²-partial cross-correlation pass; the d×d SVD runs on
    the driver over model-sized data. No SQL oracle (iterative +
    SVD) — contract-pinned: monotone-ish error decrease, final < plain
    PQ, orthogonality at float precision."""
    import numpy as np

    from hybrid_cdc_demo_spark.operators.clustering import opq_train

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    W, _, history = opq_train(
        train, dim=64, m=4, k=8, iters=4, seed_by="id", partitions=4,
        mode="driver",  # bounded 500-row sample: collect once, train local
    )
    orth = float(np.abs(W.T @ W - np.eye(64)).max())
    rows = [
        (i, round(float(e), 6), round(orth, 9))
        for i, e in enumerate(history)
    ]
    return spark.createDataFrame(
        rows, "iter int, mean_qerror double, orth_residual double"
    )


@query("ns_simsearch_opq")  # contract-pinned in tests/test_pq.py (TestOPQ)
def ns_simsearch_opq(spark, sf_dir):
    """OPQ-rotated asymmetric-distance top-10 for the min-id query
    vector: rotate the corpus map-only (one GEMM Arrow stage — the
    rotation is orthogonal, so rotated-space ADC approximates true
    L2 with the OPQ-optimized subspace split), rotate the query
    driver-side, then the standard PQ LUT scan +
    TakeOrderedAndProject. Contract-pinned: recall@10 vs exact
    brute force >= plain PQ's recall on the same corpus."""
    from pyspark.sql import Window

    from hybrid_cdc_demo_spark.operators.clustering import (
        opq_adc_topk,
        opq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    W, books, _ = opq_train(
        train, dim=64, m=4, k=8, iters=3, seed_by="id", partitions=4,
        mode="driver",  # bounded sample — see ns_opq_rotation
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


def ensure_ivfpq_index(
    spark, sf_dir: str, num_cells: int = 16, m: int = 4, k_codes: int = 8,
    seed: int = 42,
) -> str:
    """Build the persisted IVF-PQ index if absent or stale (same
    corpus-fingerprint protocol as ensure_ivf_index; separate cache
    subdir so the raw / SQ8 / PQ variants coexist)."""
    import json
    import os

    from hybrid_cdc_demo_spark.operators.clustering import ivfpq_write
    from hybrid_cdc_demo_spark.plans.northstar import (
        corpus_fingerprint,
        ivf_index_path,
    )

    path = ivf_index_path(sf_dir, num_cells, seed) + f"-pq{m}x{k_codes}"
    fp = corpus_fingerprint(sf_dir)
    meta_path = os.path.join(path, "index.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            if json.load(fh).get("corpus_fingerprint") == fp:
                return path
    emb = load_table(spark, sf_dir, "embeddings")
    ivfpq_write(
        emb, path, dim=64, num_cells=num_cells, m=m, k_codes=k_codes,
        seed=seed, train_partitions=8,
        extra_meta={"corpus_fingerprint": fp},
    )
    return path


def ensure_ivfopq_index(
    spark, sf_dir: str, num_cells: int = 16, m: int = 4, k_codes: int = 8,
    seed: int = 42,
) -> str:
    """Build the persisted IVF-OPQ-PQ index if absent or stale (same
    corpus-fingerprint protocol as ensure_ivfpq_index; separate cache
    subdir so all ANN variants coexist)."""
    import json
    import os

    from hybrid_cdc_demo_spark.operators.clustering import ivfopq_write
    from hybrid_cdc_demo_spark.plans.northstar import (
        corpus_fingerprint,
        ivf_index_path,
    )

    path = ivf_index_path(sf_dir, num_cells, seed) + f"-opq{m}x{k_codes}"
    fp = corpus_fingerprint(sf_dir)
    meta_path = os.path.join(path, "index.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            if json.load(fh).get("corpus_fingerprint") == fp:
                return path
    emb = load_table(spark, sf_dir, "embeddings")
    ivfopq_write(
        emb, path, dim=64, num_cells=num_cells, m=m, k_codes=k_codes,
        seed=seed, train_partitions=8,
        extra_meta={"corpus_fingerprint": fp},
    )
    return path


@query("ns_simsearch_ivfopq")  # contract-pinned in tests/test_pq.py
def ns_simsearch_ivfopq(spark, sf_dir):
    """OPQ-rotated IVF-PQ residual search — the production FAISS
    billion-vector configuration (OPQMatrix + IVFPQ, Ge et al. 2013):
    identical coarse pruning and storage layout to ns_simsearch_ivfpq,
    but the per-cell residuals pass through a LEARNED orthogonal
    rotation (one map-only Arrow GEMM at build) before product
    quantization, balancing variance across the PQ subspaces so the
    same m×k codes quantize more faithfully. Query-side the rotation
    is a driver-side d×d matvec per probed cell; the scan stays a
    map-only LUT projection over partition-pruned code files. No SQL
    oracle (same reasons as ns_simsearch_ivfpq — shuffle-order coarse
    means); the contract test pins recall >= plain IVF-PQ on the same
    probes, self-retrieval, rotation orthogonality, and the
    PartitionFilters pruning."""
    from hybrid_cdc_demo_spark.operators.clustering import (
        ivfopq_topk_persisted,
    )

    path = ensure_ivfopq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return ivfopq_topk_persisted(spark, path, q, topk=10, nprobe=4)


@query("ns_simsearch_refine")  # contract-pinned in tests/test_pq.py
def ns_simsearch_refine(spark, sf_dir):
    """Two-stage refine search (FAISS IndexRefine): IVF-OPQ-PQ ADC
    shortlists topk*4 candidates through partition-pruned code files,
    then ONLY those ids are exactly re-scored against the raw vectors
    (bounded IN filter pushed to the parquet scan, map-only L2,
    TakeOrderedAndProject) — the production recall-recovery stage
    every compressed billion-vector deployment runs. No SQL oracle
    (the shortlist depends on the trained index, same as every ANN
    leg); the contract test pins exact distances on the result (d2
    matches brute-force L2 bitwise for the returned ids — the refine
    stage IS exact), recall >= the unrefined ADC top-k, and
    self-retrieval at distance 0."""
    from hybrid_cdc_demo_spark.operators.clustering import (
        ivfopq_refine_topk,
    )

    path = ensure_ivfopq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return ivfopq_refine_topk(spark, path, emb, q, topk=10, refine=4, nprobe=4)


@query(
    "ns_simsearch_binary",
    oracle="""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
      SELECT e AS qe FROM emb WHERE vec_id = (SELECT MIN(vec_id) FROM emb)
    ), w AS (
      SELECT m.vec_id, j.j,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 31),
                 i -> CASE WHEN m.e[j.j * 32 + i + 1] > 0
                      THEN (CAST(1 AS BIGINT) << i)
                      ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a + b) AS w,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(0, 31),
                 i -> CASE WHEN q.qe[j.j * 32 + i + 1] > 0
                      THEN (CAST(1 AS BIGINT) << i)
                      ELSE CAST(0 AS BIGINT) END)),
               (a, b) -> a + b) AS qw
      FROM emb m CROSS JOIN q
      CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS j) j
    ), h AS (
      SELECT vec_id, CAST(SUM(bit_count(xor(w, qw))) AS INT) AS hamming
      FROM w GROUP BY vec_id
    )
    SELECT CAST(row_number() OVER (ORDER BY hamming, vec_id) AS INT) AS rank,
           vec_id, hamming
    FROM h ORDER BY hamming, vec_id LIMIT 10
    """,
)
def ns_simsearch_binary(spark, sf_dir):
    """Binary-quantized (1-bit sign) similarity search, HASH-VERIFIED:
    pack each 64-dim vector's sign bits into two 32-bit-filled BIGINT
    words map-only, XOR against the driver-packed query, popcount, and
    take the 10 smallest Hamming distances (ties by id) — the cheapest
    quantization tier production vector stores ship (32x smaller than
    float32; Hamming approximates angular distance on roughly
    isotropic embeddings). The whole pipeline is INTEGER arithmetic,
    so unlike every float ANN leg it is bitwise engine-reproducible
    and carries a full DuckDB oracle replaying the identical packing.
    Plan: map-only projection + TakeOrderedAndProject (per-partition
    heaps) — no join, no shuffle; at 100 TB the packed words persist
    beside the ids and queries scan dim/8 bytes per vector."""
    from hybrid_cdc_demo_spark.operators.similarity import (
        binary_hamming_topk,
    )
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    top = binary_hamming_topk(emb, q, dim=64, topk=10)
    w = Window.orderBy("hamming", "vec_id")
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "vec_id",
        "hamming",
    ).orderBy("rank")


@query("ns_simsearch_ivfpq")  # contract-pinned in tests/test_pq.py
def ns_simsearch_ivfpq(spark, sf_dir):
    """IVF-PQ residual search for the min-id query vector — the
    billion-vector production layout: the corpus is coarse-clustered
    and PQ-encoded over RESIDUALS v - cell_center ONCE into a
    partitionBy(_cell) code table (ensure_ivfpq_index — built untimed
    by the bench warmup, exactly like the raw/SQ8 IVF variants); each
    query probes the nprobe L2-nearest cells through file-level
    partition pruning and runs the map-only ADC scan with per-cell
    query-residual lookup tables, never touching the raw vectors. No
    SQL oracle: the coarse centers use the production shuffle-order
    mean; the PQ math itself is hash-certified by
    ns_pq_encode/ns_pq_adc_topk, and the contract test pins
    self-retrieval, full-probe degradation to exhaustive scan, and
    the no-join plan."""
    from hybrid_cdc_demo_spark.operators.clustering import ivfpq_topk_persisted

    path = ensure_ivfpq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return ivfpq_topk_persisted(spark, path, q, topk=10, nprobe=4)
