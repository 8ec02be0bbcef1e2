"""Approximate-nearest-neighbor search over an embedding column.

* brute_force_topk — exact cosine top-k; the correctness baseline.
  Dot products stay JVM-side (zip_with + aggregate fold); the query
  side is a broadcast 1-row frame, so the same plan is a broadcast
  map-scan on a 1000-executor cluster (no driver collect).
* srp_buckets / lsh_topk — sign-random-projection (SRP) LSH scale
  path: H deterministic hyperplanes → H-bit bucket id; search probes
  the query's bucket plus multiprobe neighbors (1-bit flips), giving
  sublinear candidate sets at 100 TB while brute force stays O(n) per
  query.

The hyperplane matrix is generated once, driver-side, from a fixed
seed and embedded as literal arrays — deterministic across runs and
engines, no state to ship.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hybrid_cdc_demo_spark.operators.partitioning import spread


def _as_double_array(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_with_norms(
    a: F.Column, b: F.Column, na: F.Column, nb: F.Column
) -> F.Column:
    """``cosine(a, b)`` with the two self-norms hoisted: callers
    precompute ``sqrt(dot(v, v))`` ONCE PER ROW on each side instead of
    re-folding both self-dots for every scored pair (r10 — the fold is
    an interpreted higher-order expression, so a pair scan paid 3 folds
    per pair where 1 cross-fold suffices). Same expression tree —
    dot/(na*nb) with na the left operand — so the emitted double is
    bitwise-identical to :func:`cosine` (oracle hashes unchanged)."""
    return dot(a, b) / (na * nb)


def norm_col(vec: F.Column) -> F.Column:
    """sqrt(dot(v, v)) — the per-row self-norm cosine_with_norms hoists."""
    return F.sqrt(dot(vec, vec))


def cosine_qlit(vec: F.Column, qv) -> F.Column:
    """``cosine(vec, lit(qv))`` with the query self-norm folded ON THE
    DRIVER (r10): the JVM fold re-ran dot(q, q) — 64 interpreted
    multiplies + sqrt — for every scored row even though q is a
    literal (lambda-bearing HOFs are not constant-folded). The Python
    fold below runs the identical IEEE-754 sequence (strict left fold
    in index order, then a correctly-rounded sqrt), so the emitted
    double is bitwise-equal to :func:`cosine`; the vec side keeps its
    per-row fold as the left factor, same as cosine()'s sqrt order."""
    import math

    qn = 0.0
    for x in qv:
        fx = float(x)
        qn += fx * fx
    qn = math.sqrt(qn)
    qlit = double_array_lit(qv)
    return dot(vec, qlit) / (norm_col(vec) * F.lit(qn))


def brute_force_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Exact cosine top-k of ``query`` (1-row DataFrame with a
    double-array column) against every row of ``df``."""
    emb = df.select(
        F.col(id_col), _as_double_array(vec_col).alias("_v")
    ).withColumn("_n", norm_col(F.col("_v")))
    q = query.withColumn("_qn", norm_col(F.col(query_vec_col)))
    scored = emb.crossJoin(F.broadcast(q)).select(
        id_col,
        cosine_with_norms(
            F.col("_v"), F.col(query_vec_col), F.col("_n"), F.col("_qn")
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def batch_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors: (qid, rank,
    id, score), rank 1..k per query.

    ``queries`` is small (the realistic batch-inference shape) and is
    broadcast, so scoring is a map-side expansion — every corpus
    partition scores all queries locally, no corpus shuffle. The
    per-query limit uses a rank window, which Spark >= 3.5 compiles
    with WindowGroupLimit: each map task pre-reduces to its local
    top-k per qid BEFORE the shuffle, so only queries x partitions x k
    candidate rows move — the distributed grouped-top-k pattern
    (plan-pinned in tests/test_plans-adjacent checks)."""
    from pyspark.sql import Window

    emb = df.select(
        F.col(id_col), _as_double_array(vec_col).alias("_v")
    ).withColumn("_n", norm_col(F.col("_v")))
    q = queries.withColumn("_qn", norm_col(F.col(qvec_col)))
    scored = emb.crossJoin(F.broadcast(q)).select(
        qid_col,
        id_col,
        cosine_with_norms(
            F.col("_v"), F.col(qvec_col), F.col("_n"), F.col("_qn")
        ).alias("score"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "score")
    )


def hard_negatives_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    qid_col: str = "qid",
    qlabel_col: str = "qlabel",
    qvec_col: str = "qv",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar corpus vectors whose label DIFFERS
    from the query's — the near-miss examples a retrieval model must
    learn to push away (the batch-negative upgrade every embedding
    trainer runs after the random-negative warmup).

    Same scale shape as :func:`batch_topk`: the query batch broadcasts
    so scoring is a map-side expansion over corpus partitions (no
    corpus shuffle); the label-exclusion predicate filters BEFORE the
    rank window, and Spark >= 3.5's WindowGroupLimit pre-reduces each
    map task to its local top-k per query before the single
    queries x partitions x k shuffle.
    """
    from pyspark.sql import Window

    emb = df.select(
        F.col(id_col), F.col(label_col), _as_double_array(vec_col).alias("_v")
    ).withColumn("_n", norm_col(F.col("_v")))
    q = queries.withColumn("_qn", norm_col(F.col(qvec_col)))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col(label_col) != F.col(qlabel_col))
        .select(
            qid_col,
            id_col,
            label_col,
            cosine_with_norms(
                F.col("_v"), F.col(qvec_col), F.col("_n"), F.col("_qn")
            ).alias("score"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, label_col, "score")
    )


def mmr_select(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Maximal-marginal-relevance selection (Carbonell & Goldstein
    1998): greedily pick ``k`` items maximizing
    ``lam * rel(v) - (1 - lam) * max_{s in selected} cos(v, s)`` —
    the diversity-aware sampler used to de-redundify retrieval results
    and curate diverse training subsets (pure top-k returns k copies
    of the same neighborhood; MMR spreads the picks).

    Scale shape: the candidate corpus is NEVER collected, and the
    per-item diversity penalty is a RUNNING MAX-SIMILARITY column
    maintained across iterations — each pick adds ONE dot product per
    row (the newest selected vector, broadcast as a literal with its
    norm pre-folded) and re-checkpoints, so total work is O(n·k·dim)
    instead of the naive O(n·k²·dim) of re-scoring every row against
    the whole selected set each round. Each of the k iterations is two
    bounded jobs: the incremental checkpoint and a
    TakeOrderedAndProject argmax (one 1-row collect per pick). The
    inherently sequential greedy dependency is the algorithm, not the
    plan.

    Returns (rank, id, relevance, mmr_score) with rank 1..k in pick
    order; ties broken by id. Degenerate inputs are excluded up front:
    zero-norm embeddings (cosine is 0/0 = NaN, and Spark's descending
    sort places NaN ABOVE every real double, so they'd win every pick)
    are filtered before the greedy loop, and if the candidate pool
    exhausts before k picks the result simply has fewer rows.

    Size-gated execution (r10, the connected_components/pagerank
    precedent): the greedy loop is 2 scheduled jobs per pick by
    construction, so when the scored pool fits on the driver
    (``driver_threshold`` rows ≈ tens of MB with 64-dim vectors) the
    k picks replay locally — BITWISE identical (pinned in
    tests/test_textmetrics.py): every dot product is the same strict
    left fold (vectorized across rows but folded column-by-column in
    index order), argmax-first over id-sorted rows is exactly
    ORDER BY _s DESC, id LIMIT 1, and the −2.0/0.0 coalesce seams are
    replayed verbatim. Above the bound the loop below runs unchanged.
    """
    emb = df.select(F.col(id_col), _as_double_array(vec_col).alias("_v")).filter(
        dot(F.col("_v"), F.col("_v")) > 0
    )
    scored = (
        emb.crossJoin(F.broadcast(query))
        .select(
            id_col,
            "_v",
            # per-row inverse norm, computed once: penalty dots then
            # cost one multiply-add sweep, no sqrt per iteration
            (F.lit(1.0) / F.sqrt(dot(F.col("_v"), F.col("_v")))).alias("_inv"),
            F.try_divide(
                dot(F.col("_v"), F.col(query_vec_col)),
                F.sqrt(dot(F.col("_v"), F.col("_v")))
                * F.sqrt(
                    dot(F.col(query_vec_col), F.col(query_vec_col))
                ),
            ).alias("rel"),
        )
        # a zero-norm QUERY vector zeroes every denominator —
        # try_divide yields NULL (ANSI-safe), which we drop rather
        # than let NaN/NULL float to the top of the DESC sort
        .filter(F.col("rel").isNotNull())
        .withColumn("_ms", F.lit(None).cast("double"))
        # lazy checkpoint: the first argmax job materializes the frame;
        # an eager one spent a dedicated job per checkpoint and the
        # greedy loop is job-latency-bound (guide §1.2)
        .localCheckpoint(eager=False)
    )
    spark = df.sparkSession
    id_type = dict(df.select(id_col).dtypes)[id_col]
    # one cached count decides the gate (it materializes the lazy
    # checkpoint — work the first argmax needed anyway)
    if scored.count() <= driver_threshold:
        return _mmr_driver(
            spark, scored.collect(), k, lam, id_col, id_type
        )
    picked: list[tuple] = []  # (rank, id, rel, mmr_score)
    score = F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.coalesce(
        F.col("_ms"), F.lit(0.0)
    )
    for rank in range(1, k + 1):
        rows = (
            scored.withColumn("_s", score)
            .orderBy(F.desc("_s"), F.col(id_col))
            .limit(1)
            .collect()
        )
        if not rows:  # pool exhausted before k picks
            break
        top = rows[0]
        picked.append((rank, top[id_col], top["rel"], float(top["_s"])))
        if rank < k:
            # newest pick's unit vector as a literal; cos(v, s) =
            # dot(v, s_unit) * (1/||v||) — exact cosine, one dot
            s_unit = [float(x) * top["_inv"] for x in top["_v"]]
            pen = dot(
                F.col("_v"), double_array_lit(s_unit)
            ) * F.col("_inv")
            scored = (
                scored.filter(F.col(id_col) != top[id_col])
                .withColumn(
                    "_ms",
                    F.greatest(F.coalesce(F.col("_ms"), F.lit(-2.0)), pen),
                )
                .localCheckpoint(eager=False)  # next argmax materializes
            )
    return spark.createDataFrame(
        picked, f"rank int, {id_col} {id_type}, relevance double, mmr_score double"
    )


def _mmr_driver(spark, rows, k, lam, id_col, id_type) -> DataFrame:
    """The greedy MMR loop on the collected scored pool (see
    mmr_select's size gate). Bitwise-faithful replay of the
    distributed expressions:

    - dot products fold column-by-column in index order (vectorized
      across rows, but each row's accumulation is the identical
      strict left fold ``acc = acc + v[j]*s[j]`` — products are
      elementwise-exact, so pre-multiplying changes nothing);
    - the argmax scans id-ascending rows and keeps the FIRST maximum
      — exactly ORDER BY _s DESC, id LIMIT 1;
    - the score's COALESCE(_ms, 0.0) before the first update and the
      GREATEST(COALESCE(_ms, -2.0), pen) update are replayed as
      written.
    """
    rows = sorted(rows, key=lambda r: r[id_col])
    if not rows:
        return spark.createDataFrame(
            [],
            f"rank int, {id_col} {id_type}, relevance double, "
            "mmr_score double",
        )
    ids = [r[id_col] for r in rows]
    V = np.array([list(r["_v"]) for r in rows], dtype=np.float64)
    inv = np.array([r["_inv"] for r in rows], dtype=np.float64)
    rel = np.array([r["rel"] for r in rows], dtype=np.float64)
    n, dim = V.shape
    alive = np.ones(n, dtype=bool)
    ms = None  # NULL until the first penalty update, like the column
    picked: list[tuple] = []
    for rank in range(1, k + 1):
        if not alive.any():
            break  # pool exhausted before k picks
        base_ms = np.zeros(n) if ms is None else ms
        s = lam * rel - (1.0 - lam) * base_ms
        i = int(np.argmax(np.where(alive, s, -np.inf)))
        picked.append((rank, ids[i], float(rel[i]), float(s[i])))
        if rank < k:
            s_unit = V[i] * inv[i]
            prods = V * s_unit
            pen = np.zeros(n)
            for j in range(dim):  # strict left fold, index order
                pen = pen + prods[:, j]
            pen = pen * inv
            prev = ms if ms is not None else np.full(n, -2.0)
            ms = np.maximum(prev, pen)
            alive[i] = False
    return spark.createDataFrame(
        picked,
        f"rank int, {id_col} {id_type}, relevance double, mmr_score double",
    )


def hyperplanes(dim: int, num_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic SRP hyperplane matrix (fixed seed → same buckets
    every run/cluster)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def srp_bucket_expr(vec_col, planes: list[list[float]]) -> F.Column:
    """H-bit sign-random-projection bucket id as a long.

    Built as ONE SQL text parsed JVM-side when ``vec_col`` is a column
    name (r10): the per-plane Python loop (H×dim F.lit calls + H
    fold-lambda constructions) cost ~1.5 s of Py4J roundtrips PER
    QUERY BUILD at 16×64 — measured, the dominant cost of every SRP
    query's construction. The text mirrors the Column form
    operation-for-operation (same transform→CAST, same zip_with
    multiply, same left fold, same when/shiftleft/XOR integer chain),
    and plane literals use the shortest-repr 'D' rendering whose parse
    is bitwise-exact vs F.lit (the nested_double_lit guarantee), so
    bucket ids are unchanged. Column-typed inputs keep the Column
    path."""
    if not isinstance(vec_col, str):
        v = _as_double_array(vec_col)
        bucket = F.lit(0).cast("long")
        for i, plane in enumerate(planes):
            p = F.array(*[F.lit(float(x)) for x in plane])
            bit = F.when(dot(v, p) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
        return bucket
    v = f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))"
    terms = []
    for i, plane in enumerate(planes):
        arr = "array(" + ",".join(_double_sql(float(x)) for x in plane) + ")"
        d = (
            f"aggregate(zip_with({v}, {arr}, (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        bit = f"(CASE WHEN {d} >= CAST(0.0 AS DOUBLE) THEN 1L ELSE 0L END)"
        terms.append(f"shiftleft({bit}, {i})")
    body = "CAST(0 AS BIGINT)"
    for t in terms:
        body = f"({body} ^ {t})"
    return F.expr(body)


def srp_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Attach the SRP bucket id. At scale you'd persist this bucketed
    (partitionBy bucket) so queries prune to one partition."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, num_planes, seed)
    return df.withColumn("bucket", srp_bucket_expr(vec_col, planes))


def lsh_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
    num_planes: int = 8,
    multiprobe_bits: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the query's SRP bucket (+ all buckets
    within ``multiprobe_bits`` bit flips), exact-rank inside the probed
    set. Candidate volume ~ n * probes / 2^H instead of n."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, num_planes, seed)
    data = spread(df).select(
        F.col(id_col), _as_double_array(vec_col).alias("_v")
    ).withColumn("bucket", srp_bucket_expr("_v", planes))

    q = query.select(
        F.col(query_vec_col), srp_bucket_expr(query_vec_col, planes).alias("qbucket")
    )
    # multiprobe: query bucket plus its 1-bit-flip neighbors
    probe_ids = [F.col("qbucket")]
    if multiprobe_bits >= 1:
        for i in range(num_planes):
            probe_ids.append(F.col("qbucket").bitwiseXOR(F.lit(1 << i).cast("long")))
    probes = q.select(
        query_vec_col,
        F.explode(F.array(*probe_ids)).alias("bucket"),
        # query self-norm computed once per (broadcast) probe row so
        # the candidate scan folds 2 dots per row, not 3 (r10; the
        # fold mirrors cosine()'s dot(b, b) on the raw column, so
        # cosine_with_norms emits the bitwise-identical double)
        norm_col(F.col(query_vec_col)).alias("_qn"),
    )
    cands = data.join(F.broadcast(probes), "bucket")
    scored = cands.select(
        id_col,
        cosine_with_norms(
            F.col("_v"),
            F.col(query_vec_col),
            norm_col(F.col("_v")),
            F.col("_qn"),
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    max_bucket: int = 500,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: SRP-bucket, pair within
    buckets (skew-capped), verify exact cosine ≥ threshold."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, num_planes, seed)
    # bucketed projection feeds BOTH self-join branches and the size
    # guard — materialize once instead of hashing 3x
    data = spread(df).select(
        F.col(id_col).alias("_id"), _as_double_array(vec_col).alias("_v")
    ).withColumn("bucket", srp_bucket_expr("_v", planes)).withColumn(
        # self-norm hoisted into the persisted projection: the verify
        # cosine then folds ONE cross dot per candidate pair instead
        # of three (r10; bitwise-identical value)
        "_n", norm_col(F.col("_v"))
    ).persist()
    a = data.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("v_a"),
        F.col("_n").alias("n_a"), "bucket",
    )
    b = data.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("v_b"),
        F.col("_n").alias("n_b"), "bucket",
    )
    bucket_sizes = data.groupBy("bucket").count().filter(F.col("count") <= max_bucket)
    pairs = (
        a.join(F.broadcast(bucket_sizes.select("bucket")), "bucket")
        .join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                cosine_with_norms(
                    F.col("v_a"), F.col("v_b"), F.col("n_a"), F.col("n_b")
                ),
                4,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .distinct()
    )


# --- IVF (inverted-file) ANN ------------------------------------------------


def nested_double_lit(rows: list[list[float]]) -> F.Column:
    """A literal array<array<double>> built in O(1) Py4J roundtrips.

    pyspark's ``F.lit(nested_list)`` decomposes into one JVM call PER
    ELEMENT (lit → CreateArray → lit per number): a 312×64 centroid
    table costs ~20k driver socket roundtrips ≈ 13-17 s of pure build
    time before any execution (profiled r7 — it was most of the
    expression assignment's corpus-scale cost). Above a small size the
    literal is instead rendered as ONE SQL text of D-suffixed doubles
    and parsed JVM-side in a single call; repr() emits the shortest
    round-tripping decimal and Spark's double-literal parse is
    correctly rounded, so the values are BITWISE identical to the
    F.lit form (pinned in tests/test_round8_hardening.py, above and
    below the 256-element switch, incl. -0.0 and subnormals).
    Non-finite values (inf/-inf/NaN) are rendered as explicit DOUBLE
    casts — repr() would yield 'infD'/'nanD' which the SQL parser
    rejects. Centroid tables are finite by construction, but the
    builder must not emit unparseable SQL for any float input."""
    n = sum(len(r) for r in rows)
    if n <= 256:
        return F.lit([[float(x) for x in r] for r in rows])
    body = ",".join(
        "array(" + ",".join(_double_sql(float(x)) for x in r) + ")"
        for r in rows
    )
    return F.expr(f"array({body})")


def double_array_lit(vals: list[float]) -> F.Column:
    """A literal array<double> in O(1) Py4J roundtrips — the 1-D form
    of :func:`nested_double_lit` (r10): ``F.array(*[F.lit(x) ...])``
    costs one JVM call per element (~0.5 s for a 16×64 plane set), so
    every query-vector / component literal goes through the SQL-text
    render instead. Values are bitwise-identical to the F.lit form
    (same shortest-repr parse guarantee, pinned for the nested
    variant in tests/test_round8_hardening.py)."""
    if len(vals) == 0:  # len(), not truthiness: numpy arrays are accepted
        return F.array().cast("array<double>")
    return F.expr(
        "array(" + ",".join(_double_sql(float(x)) for x in vals) + ")"
    )


def _double_sql(x: float) -> str:
    """One double as Spark SQL text, bitwise-parse-exact vs F.lit(x):
    shortest-repr 'D' literal for finite values (incl. -0.0 and
    subnormals — Spark's literal parse is correctly rounded), explicit
    casts for the three non-finite values repr() can't express."""
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def cell_assign_expr(centers: list[list[float]], vec="_v") -> F.Column:
    """Nearest-centroid assignment for a double-array column (default
    ``_v``): one nested literal + transform + argmin — the expression
    tree is CONSTANT-size in num_cells (per-center expressions would
    cost thousands of driver roundtrips to build, and a running
    when(best)-chain even nests exponentially — driver OOM). Squared
    L2 metric (monotone with cosine for normalized embeddings)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    centers_lit = nested_double_lit(centers)
    dists = F.transform(
        centers_lit,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


#: cell count above which nearest-centroid assignment switches from
#: the nested-literal argmin expression (interpreted HOFs, n*k*d work)
#: to the BLAS batch argmin below.
CELL_ASSIGN_NUMPY_THRESHOLD = 64


def cell_assign_np(
    data: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "_v",
    out_col: str = "_cell",
) -> DataFrame:
    """Nearest-centroid POSITION assignment via an Arrow mapInPandas
    BLAS matmul — ``||v||^2 - 2 v.C^T + ||c||^2`` with a first-minimum
    argmin, the same tie rule as cell_assign_expr's
    array_position-of-array_min. One (batch, k) GEMM per Arrow batch:
    assignment cost is BLAS-bound instead of interpreted-HOF-bound,
    which matters because cell counts scale with the corpus (IVF
    sizing: cells ~ sqrt(n) or n/target, SemDeDup: k ~ n/64)."""
    import pandas as pd

    C = np.asarray(centers, dtype=np.float64)
    cn = (C * C).sum(axis=1)
    id_type = dict(data.dtypes)[id_col]

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (V * V).sum(axis=1, keepdims=True) - 2.0 * (V @ C.T) + cn
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col],
                    out_col: d2.argmin(axis=1).astype(np.int32),
                }
            )

    return data.select(id_col, vec_col).mapInPandas(
        assign,
        schema=f"{id_col} {id_type}, {vec_col} array<double>, {out_col} int",
    )


def cell_assign_guarded(
    data: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "_v",
    out_col: str = "_cell",
    slack: float = 8.0,
) -> DataFrame:
    """Margin-guarded BLAS assignment: PROVABLY identical to the
    fold-order-exact expression argmin, at GEMM speed (ADVICE r6 #2's
    'distance-margin guard' alternative, built in round 7).

    The BLAS pass computes ``||v||² − 2·v·Cᵀ + ||c||²`` distances plus
    each row's top-2 margin. Both that formula and the expression's
    strict left fold of ``Σ(vᵢ−cᵢ)²`` deviate from the true distance
    by at most B = (d+2)·u·(‖v‖ + ‖c‖)² (u = 2⁻⁵³; standard
    summation error analysis, Cauchy–Schwarz bounding Σ|vᵢcᵢ|), so the
    expression's argmin can differ from the BLAS argmin ONLY when the
    BLAS margin is ≤ 4B. Rows above ``slack·(d+2)·u·(‖v‖+‖c_max‖)²``
    (slack = 8 ≥ the required 4, doubled for headroom) keep the BLAS
    answer with a proof; the (in practice empty) remainder is
    re-scored INSIDE THE SAME ARROW BATCH by a strict-left-fold replay
    of the expression's arithmetic — a vectorized loop over dimensions
    performing ``acc = acc + (vᵢ−cᵢ)·(vᵢ−cᵢ)`` in dimension order, the
    exact same sequence of correctly-rounded IEEE operations the Spark
    expression evaluates, hence bitwise-identical distances and the
    same first-minimum argmin (exact ties land in the uncertain band
    by construction and inherit the expression's tie rule). Doing the
    fallback batch-side — rather than as a literal-expression CASE
    branch — matters at corpus-scaled k: a 312×64 centroid literal is
    a 20k-node Catalyst tree that costs seconds of analyzer/optimizer
    walking on EVERY query build (profiled r7), versus one closure-
    captured numpy array here."""
    import pandas as pd

    C = np.asarray(centers, dtype=np.float64)
    cn = (C * C).sum(axis=1)
    max_cnorm = float(np.sqrt(cn).max()) if len(C) else 0.0
    d = int(C.shape[1]) if C.ndim == 2 and C.shape[0] else 0
    coef = slack * (d + 2) * 2.0 ** -53
    id_type = dict(data.dtypes)[id_col]

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (V * V).sum(axis=1, keepdims=True) - 2.0 * (V @ C.T) + cn
            best = d2.argmin(axis=1)
            if d2.shape[1] > 1:
                two = np.partition(d2, 1, axis=1)
                margin = two[:, 1] - two[:, 0]
            else:
                margin = np.full(len(V), np.inf)
            vnorm = np.sqrt((V * V).sum(axis=1))
            bound = coef * (vnorm + max_cnorm) ** 2
            unc = np.flatnonzero(margin <= bound)
            if unc.size:
                U = V[unc]
                # strict left fold in dimension order — bitwise the
                # Spark expression's aggregate(zip_with(...)) chain
                acc = np.zeros((U.shape[0], C.shape[0]), dtype=np.float64)
                for i in range(d):
                    diff = U[:, i : i + 1] - C[None, :, i]
                    acc = acc + diff * diff
                best[unc] = acc.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col],
                    out_col: best.astype(np.int32),
                }
            )

    return data.select(id_col, vec_col).mapInPandas(
        assign,
        schema=(
            f"{id_col} {id_type}, {vec_col} array<double>, {out_col} int"
        ),
    )


def assign_cells(
    data: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "_v",
    out_col: str = "_cell",
    method: str = "auto",
) -> DataFrame:
    """(id, vec, cell) nearest-centroid position assignment.
    Methods: "expr" (literal expression — fold-order-exact, the small-k
    oracle path), "numpy" (raw BLAS argmin — fastest, tie-band answers
    may differ from expr by float association), "guarded" (BLAS +
    margin proof + lazy expression fallback — expr-identical at BLAS
    speed), "auto" (expr up to CELL_ASSIGN_NUMPY_THRESHOLD where the
    interpreted cost is negligible, guarded above it — so the default
    is fold-order-exact at EVERY scale)."""
    if method == "auto":
        method = (
            "guarded"
            if len(centers) > CELL_ASSIGN_NUMPY_THRESHOLD
            else "expr"
        )
    if method == "numpy":
        return cell_assign_np(data, centers, id_col, vec_col, out_col)
    if method == "guarded":
        return cell_assign_guarded(data, centers, id_col, vec_col, out_col)
    return data.select(id_col, vec_col).withColumn(
        out_col, cell_assign_expr(centers, vec=vec_col)
    )


def ivf_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 64,
    seed: int = 42,
    partitions: int | None = None,
):
    """Coarse-quantize the corpus into ``num_cells`` KMeans cells —
    the IVF partitioning (inverted file) used by every large-scale
    ANN system. Returns (indexed_df, centers) where indexed_df carries
    a ``_cell`` column.

    At 100 TB the indexed table is persisted ``partitionBy(_cell)`` so
    a query touches only the probed cells' files (partition pruning
    does the candidate filtering for free); here the filter expresses
    the same pruning logically.

    The quantizer is one Lloyd step over sampled seed centers, all in
    DataFrame ops: a coarse quantizer needs cell GEOMETRY, not
    convergence — ``nprobe`` absorbs boundary error — and a full
    iterative KMeans costs dozens of driver-coordinated jobs for
    accuracy IVF doesn't use.

    ``partitions`` compacts the input to that many partitions instead
    of spreading to full parallelism — right when the corpus slice is
    small and index building is task-scheduling-bound (the kmeans
    convention)."""
    base = df if partitions is None else df.repartition(partitions)
    data = (spread(base) if partitions is None else base).select(
        F.col(id_col), _as_double_array(vec_col).alias("_v")
    ).persist()

    # seed centers: deterministic sample (hash-ordered, corpus-spread)
    seeds = (
        data.orderBy(F.xxhash64(F.col(id_col) + seed))
        .limit(num_cells)
        .select("_v")
        .collect()
    )
    centers0 = [list(r["_v"]) for r in seeds]
    # one Lloyd refinement: per-cell per-dimension mean (single
    # shuffle); assignment auto-switches to the BLAS argmin above 64
    # cells (cell counts scale with the corpus at 100 TB)
    assigned0 = assign_cells(data, centers0, id_col)
    means = (
        assigned0.select("_cell", F.posexplode("_v").alias("_pos", "_x"))
        .groupBy("_cell", "_pos")
        .agg(F.avg("_x").alias("_m"))
        .collect()
    )
    by_cell: dict[int, dict[int, float]] = {}
    for r in means:
        by_cell.setdefault(r["_cell"], {})[r["_pos"]] = r["_m"]
    centers = [
        [by_cell[i][p] for p in sorted(by_cell[i])] if i in by_cell else centers0[i]
        for i in range(num_cells)
    ]
    indexed = assign_cells(data, centers, id_col)
    return indexed, centers


def probe_cells(centers: list[list[float]], qv, nprobe: int) -> list[int]:
    """Rank centroids by cosine to the query, driver-side (centroids
    are tiny metadata, never corpus data)."""
    q = np.asarray(qv, dtype=float)
    qn = np.linalg.norm(q) or 1.0
    sims = []
    for i, c in enumerate(centers):
        cv = np.asarray(c)
        denom = (np.linalg.norm(cv) or 1.0) * qn
        sims.append((float(cv.dot(q)) / denom, i))
    return [i for _, i in sorted(sims, reverse=True)[:nprobe]]


def _rank_in_cells(
    indexed: DataFrame, qv, probe: list[int], k: int, id_col: str
) -> DataFrame:
    cands = indexed.filter(F.col("_cell").isin(probe))
    scored = cands.select(
        id_col, cosine_qlit(F.col("_v"), qv).alias("score")
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def ivf_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
    num_cells: int = 64,
    nprobe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: rank centroids by cosine to the query
    (driver-side — centroids are tiny), probe the ``nprobe`` nearest
    cells, exact-rank inside the probed subset. Candidate volume is
    ~ n * nprobe / num_cells; nprobe == num_cells degrades gracefully
    to exact search.

    Builds the index inline — fine for one-shot exploration. Repeated
    queries should build ONCE with :func:`ivf_write` and probe the
    persisted, partition-pruned index via :func:`ivf_topk_persisted`."""
    indexed, centers = ivf_index(df, id_col, vec_col, num_cells, seed)
    qv = query.select(query_vec_col).first()[0]
    probe = probe_cells(centers, qv, nprobe)
    return _rank_in_cells(indexed, qv, probe, k, id_col)


def ivf_write(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 64,
    seed: int = 42,
    extra_meta: dict | None = None,
) -> list[list[float]]:
    """Build the IVF index ONCE and persist it: the corpus is written
    ``partitionBy(_cell)`` (the inverted file — each cell is its own
    parquet directory) and the centroid matrix lands in a JSON sidecar.
    At 100 TB this is the only sane shape: the index build is a single
    batch job, and every subsequent query scans just the probed cells'
    files via partition pruning instead of re-clustering the corpus.
    ``extra_meta`` (e.g. a corpus fingerprint for staleness detection)
    is merged into the sidecar."""
    import json
    import os

    indexed, centers = ivf_index(df, id_col, vec_col, num_cells, seed)
    indexed.write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(path, "data")
    )
    meta = {
        "id_col": id_col,
        "num_cells": num_cells,
        "seed": seed,
        "centers": centers,
        **(extra_meta or {}),
    }
    tmp = os.path.join(path, ".centroids.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "centroids.json"))
    return centers


def ivf_append(
    spark,
    path: str,
    df: DataFrame,
    vec_col: str = "embedding",
) -> int:
    """Incrementally add vectors to a persisted IVF index WITHOUT a
    rebuild: new rows are assigned to the EXISTING centroids (the
    standard IVF maintenance model — FAISS's add(), Milvus segment
    ingestion) and appended into the matching ``_cell=`` partition
    directories, so queries see them through the same partition-pruned
    scan immediately. Centroids are frozen; a drifted corpus
    eventually warrants a rebuild (monitor per-cell counts in the
    sidecar), but per-batch ingestion cost stays O(batch), never
    O(index).

    Intended for explicitly managed index paths (built via
    :func:`ivf_write`). Indexes managed by ``ensure_ivf_index`` are
    derived views of a source corpus dir — appending to those is
    overwritten by the next fingerprint-mismatch rebuild, by design.

    Returns the number of rows appended. The sidecar's
    ``appended_rows`` counter is updated atomically (tmp + rename).
    """
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as fh:
        meta = json.load(fh)
    id_col = meta["id_col"]
    data = df.select(F.col(id_col), _as_double_array(vec_col).alias("_v"))
    assigned = data.withColumn("_cell", cell_assign_expr(meta["centers"]))
    n = assigned.count()
    assigned.write.mode("append").partitionBy("_cell").parquet(
        os.path.join(path, "data")
    )
    meta["appended_rows"] = int(meta.get("appended_rows", 0)) + int(n)
    tmp = os.path.join(path, ".centroids.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "centroids.json"))
    return int(n)


def ivf_read(spark, path: str) -> tuple[DataFrame, list[list[float]], dict]:
    """Open a persisted IVF index: (indexed corpus with ``_cell`` as a
    PARTITION column, centroid matrix, metadata)."""
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as fh:
        meta = json.load(fh)
    indexed = spark.read.parquet(os.path.join(path, "data"))
    return indexed, meta["centers"], meta


def ivf_topk_persisted(
    spark,
    path: str,
    query: DataFrame,
    k: int = 10,
    query_vec_col: str = "qv",
    nprobe: int = 8,
) -> DataFrame:
    """Approximate top-k against a persisted IVF index. The
    ``_cell IN (probes)`` filter is a PartitionFilter — Spark plans a
    scan over only the probed cells' files (asserted in tests/
    test_ivf.py::test_persisted_index_prunes_partitions via the
    executed plan's PartitionFilters + the files actually touched), so
    query cost is ~ |corpus| * nprobe / num_cells I/O, independent of
    index size."""
    indexed, centers, meta = ivf_read(spark, path)
    qv = query.select(query_vec_col).first()[0]
    probe = probe_cells(centers, qv, nprobe)
    return _rank_in_cells(indexed, qv, probe, k, meta["id_col"])


# --- IVF-SQ8: scalar-quantized inverted file ---------------------------------


def sq8_columns(vec: F.Column) -> tuple[F.Column, F.Column]:
    """Int8 scalar quantization of a double-array column: per-vector
    scale = max|x|/127, code = round(x/scale) in [-127, 127] as
    tinyint. Returns (scale, codes). The standard ANN compression step
    (FAISS's SQ8): 4x less scan I/O than float32, 8x less than the
    double arrays parquet would otherwise store."""
    from hybrid_cdc_demo_spark.functions.text import let1

    scale = F.array_max(F.transform(vec, lambda x: F.abs(x))) / F.lit(127.0)
    codes = let1(
        # let-bound: the per-element division reads the scale as a
        # bound value instead of re-deriving the array max per element
        scale,
        lambda s: F.when(
            s == 0, F.transform(vec, lambda x: F.lit(0).cast("tinyint"))
        ).otherwise(
            F.transform(vec, lambda x: F.round(x / s).cast("tinyint"))
        ),
    )
    return scale, codes


def ivf_write_sq8(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 64,
    seed: int = 42,
    extra_meta: dict | None = None,
) -> list[list[float]]:
    """Persist an IVF index with SQ8-quantized cell data: ``data/``
    holds (id, _scale, _codes tinyint[], _cell) — the 4x-smaller
    representation every probe scans — and ``fullvec/`` holds the
    full-precision vectors, read only for the re-rank shortlist. Both
    are partitioned by ``_cell`` so partition pruning bounds each to
    the probed cells. This is the IVF+SQ8 architecture (public FAISS
    design): at 100 TB the probe's scan bytes shrink 4x while the
    exact re-rank touches only top-candidates-by-id."""
    import json
    import os

    indexed, centers = ivf_index(df, id_col, vec_col, num_cells, seed)
    indexed = indexed.persist()
    scale, codes = sq8_columns(F.col("_v"))
    (
        indexed.select(
            F.col(id_col), scale.alias("_scale"), codes.alias("_codes"), "_cell"
        )
        .write.mode("overwrite")
        .partitionBy("_cell")
        .parquet(os.path.join(path, "data"))
    )
    (
        indexed.select(F.col(id_col), "_v", "_cell")
        .write.mode("overwrite")
        .partitionBy("_cell")
        .parquet(os.path.join(path, "fullvec"))
    )
    indexed.unpersist()
    meta = {
        "id_col": id_col,
        "num_cells": num_cells,
        "seed": seed,
        "centers": centers,
        "quantized": True,
        **(extra_meta or {}),
    }
    tmp = os.path.join(path, ".centroids.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "centroids.json"))
    return centers


def ivf_topk_sq8(
    spark,
    path: str,
    query: DataFrame,
    k: int = 10,
    query_vec_col: str = "qv",
    nprobe: int = 8,
    rerank_factor: int = 4,
) -> DataFrame:
    """Top-k against an SQ8 IVF index: score the probed cells on the
    int8 CODES (cosine is scale-invariant, so the per-vector scale
    cancels and the codes need no dequantization), shortlist
    ``k * rerank_factor`` candidates, then re-rank exactly on the
    full-precision vectors joined by id from ``fullvec/`` (also
    partition-pruned to the probed cells). Scan cost: 4x fewer bytes
    than full-precision probing; exactness cost: only the shortlist
    touches floats."""
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as fh:
        meta = json.load(fh)
    assert meta.get("quantized"), "not an SQ8 index - use ivf_topk_persisted"
    id_col = meta["id_col"]
    qv = query.select(query_vec_col).first()[0]
    probe = probe_cells(meta["centers"], qv, nprobe)

    codes = spark.read.parquet(os.path.join(path, "data")).filter(
        F.col("_cell").isin(probe)
    )
    code_vec = F.transform("_codes", lambda c: c.cast("double"))
    # cosine is scale-invariant, so scoring int8 codes against the
    # FLOAT query is exact up to quantization; cosine_qlit folds the
    # query norm driver-side (bitwise-equal, one less per-row fold)
    shortlist = (
        codes.select(id_col, cosine_qlit(code_vec, qv).alias("_ascore"))
        .orderBy(F.desc("_ascore"), id_col)
        .limit(k * rerank_factor)
    )
    full = spark.read.parquet(os.path.join(path, "fullvec")).filter(
        F.col("_cell").isin(probe)
    )
    return (
        shortlist.join(full, id_col)
        .select(id_col, cosine_qlit(F.col("_v"), qv).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def binary_sign_words(
    vec: F.Column | str, dim: int, word_bits: int = 32
) -> list[F.Column]:
    """1-bit (sign) quantization: pack ``dim`` dimensions into
    ``ceil(dim/word_bits)`` BIGINT words, bit i of word j set iff
    ``v[j*word_bits + i] > 0`` — the binary-quantization encoding
    production vector stores use as their cheapest tier (32x smaller
    than float32; Hamming distance approximates angular distance for
    roughly isotropic embeddings). 32 bits per 64-bit word keeps every
    shift strictly in-range on BOTH engines (bit 63 of a signed BIGINT
    overflows differently across engines, so it is never used).

    Pure integer expressions — the packing, and therefore any distance
    computed from it, is bitwise engine-reproducible (the
    ns_simsearch_binary oracle replays it in DuckDB SQL exactly)."""
    name = vec if isinstance(vec, str) else None
    if name is None:
        raise ValueError("binary_sign_words needs a column NAME (expr-built)")
    words = []
    n_words = (dim + word_bits - 1) // word_bits
    for j in range(n_words):
        lo = j * word_bits
        n = min(word_bits, dim - lo)
        words.append(
            F.expr(
                f"aggregate(sequence(0, {n - 1}), CAST(0 AS BIGINT), "
                f"(acc, i) -> acc + IF(element_at({name}, {lo} + i + 1) > 0D, "
                f"shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
            ).alias(f"_w{j}")
        )
    return words


def pack_sign_bits(v: list[float], dim: int, word_bits: int = 32) -> list[int]:
    """Driver-side twin of :func:`binary_sign_words` (query vectors are
    model-sized)."""
    words = []
    for j in range((dim + word_bits - 1) // word_bits):
        w = 0
        for i in range(min(word_bits, dim - j * word_bits)):
            if v[j * word_bits + i] > 0:
                w |= 1 << i
        words.append(w)
    return words


def binary_hamming_topk(
    df: DataFrame,
    query: list[float],
    dim: int,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized top-k: pack the corpus sign bits map-only,
    XOR against the driver-packed query words, popcount, and take the
    smallest Hamming distances (ties by id). The scan touches
    dim/8 bytes per vector instead of dim*4, the projection is pure
    integer codegen, and the top-k compiles to TakeOrderedAndProject
    (per-partition heaps, k rows to the driver) — no join, no shuffle.
    At 100 TB the packed words persist next to the ids (the analog of
    ivf_write) so queries scan 32x fewer bytes than raw float32."""
    qwords = pack_sign_bits([float(x) for x in query], dim)
    src = df.select(F.col(id_col), _as_double_array(vec_col).alias("_v"))
    packed = src.select(id_col, *binary_sign_words("_v", dim))
    ham = None
    for j, qw in enumerate(qwords):
        term = F.bit_count(F.col(f"_w{j}").bitwiseXOR(F.lit(qw).cast("long")))
        ham = term if ham is None else ham + term
    return (
        packed.select(id_col, ham.cast("int").alias("hamming"))
        .orderBy("hamming", id_col)
        .limit(topk)
    )


def binary_write(
    df: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_meta: dict | None = None,
) -> None:
    """Persist the 1-bit index: (id, packed words) parquet + a JSON
    sidecar — the binary-quantization analog of ivf_write. At 100 TB
    queries scan dim/8 bytes per vector (32x less than float32) and
    never touch the raw embeddings until a rescore stage asks."""
    import json
    import os

    src = df.select(F.col(id_col), _as_double_array(vec_col).alias("_v"))
    packed = src.select(id_col, *binary_sign_words("_v", dim))
    packed.write.mode("overwrite").parquet(os.path.join(path, "data"))
    meta = {
        "id_col": id_col,
        "dim": dim,
        "word_bits": 32,
        **(extra_meta or {}),
    }
    tmp = os.path.join(path, ".index.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "index.json"))


def binary_topk_persisted(
    spark,
    path: str,
    query: list[float],
    topk: int = 10,
) -> DataFrame:
    """Hamming top-k over the persisted packed words — a map-only
    integer scan of dim/8 bytes per vector + TakeOrderedAndProject."""
    import json
    import os

    with open(os.path.join(path, "index.json")) as fh:
        meta = json.load(fh)
    dim, id_col = meta["dim"], meta["id_col"]
    qwords = pack_sign_bits([float(x) for x in query], dim)
    packed = spark.read.parquet(os.path.join(path, "data"))
    ham = None
    for j, qw in enumerate(qwords):
        term = F.bit_count(F.col(f"_w{j}").bitwiseXOR(F.lit(qw).cast("long")))
        ham = term if ham is None else ham + term
    return (
        packed.select(id_col, ham.cast("int").alias("hamming"))
        .orderBy("hamming", id_col)
        .limit(topk)
    )


def binary_rescore_topk(
    df: DataFrame,
    query: list[float],
    dim: int,
    topk: int = 10,
    rescore: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantized search with exact rescoring — the production
    BQ pattern (Lucene/Qdrant "oversample then rescore"): Hamming
    shortlists ``topk * rescore`` candidates over the 1-bit codes,
    then ONLY those ids are scored exactly by cosine against the raw
    vectors (bounded IN filter pushed to the scan) and the true top-k
    of the shortlist is returned as (vec_id, score). Same scale shape
    as ivfopq_refine_topk: the shortlist is model-sized, the exact
    pass map-only."""
    cand = [
        r[id_col]
        for r in binary_hamming_topk(
            df, query, dim, topk=topk * rescore, id_col=id_col,
            vec_col=vec_col,
        ).collect()
    ]
    exact = df.filter(F.col(id_col).isin(cand)).select(
        F.col(id_col),
        cosine_qlit(_as_double_array(vec_col), query).alias("score"),
    )
    return exact.orderBy(F.desc("score"), id_col).limit(topk)
