"""Distributed clustering over an embedding column: Lloyd's k-means
and SemDeDup-style semantic deduplication.

Reference parity note: the reference (NhaLeTruc/hybrid-cdc-demo) has no
clustering path — these operators are part of the north-star
training-data-pipeline surface (same family as operators/similarity.py
and operators/dedup.py).

Scale design (100 TB posture):

* The model (k centroid vectors, k x dim doubles) lives on the driver
  between iterations — the classic distributed-ML split: data never
  leaves the executors, only the tiny model round-trips. Assignment is
  a map-only nested-literal argmin (``cell_assign_expr`` — constant
  plan size in k, zero shuffle), identical to the IVF coarse quantizer
  in operators/similarity.py.
* Centroid updates have two modes:
  - ``exact_fold=False`` (production): per-cluster per-dimension mean
    via ``posexplode`` + partial-aggregated ``avg`` — one shuffle of
    (cluster, dim, partial-sum) rows, scales to any corpus.
  - ``exact_fold=True`` (verification): per-cluster sorted strict left
    fold (``array_sort(collect_list(...))`` then ``aggregate``), which
    makes the floating-point sum order deterministic so the result is
    bitwise-reproducible against a DuckDB ``list_reduce`` oracle.
    Bounded by cluster size — use it on a bounded TRAINING SAMPLE
    (train-on-sample / assign-everywhere is the production k-means
    shape anyway; FAISS, Spark MLlib and friends all subsample for
    Lloyd iterations).
* semantic_dedup is SemDeDup (Abbas et al., 2023): cluster first, then
  run exact pairwise cosine only WITHIN clusters — the cluster count k
  is chosen so expected cluster size stays bounded, turning the O(n^2)
  all-pairs problem into n/k-bounded local problems. The intra-cluster
  self-join is an equi-join on the cluster id, so Spark shuffles each
  vector once and never materializes cross-cluster pairs.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hybrid_cdc_demo_spark.operators.partitioning import spread
from hybrid_cdc_demo_spark.operators.similarity import (
    CELL_ASSIGN_NUMPY_THRESHOLD as ASSIGN_NUMPY_THRESHOLD,
    _as_double_array,
    cell_assign_expr,
    cell_assign_np,
    cosine,
    cosine_with_norms,
    double_array_lit,
    nested_double_lit,
    norm_col,
)


def assign_expr_with_ids(
    centers: list[list[float]], ids: list[int], vec="_v"
) -> F.Column:
    """Nearest-centroid assignment returning the ORIGINAL cluster id
    for each centroid row (centers may be a surviving subset after
    empty clusters were dropped, so positions are not ids)."""
    pos = cell_assign_expr(centers, vec)  # 0-based position of the argmin
    return F.element_at(F.lit([int(i) for i in ids]), pos + 1)


def seed_centers(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_by: str = "hash",
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic k seed centroids collected driver-side (k rows —
    bounded control data, the same collect the IVF index does).

    ``seed_by="hash"`` spreads seeds across the corpus
    (xxhash64-ordered sample, production default); ``seed_by="id"``
    takes the k lowest ids — fully mirrorable in ANSI SQL, used by the
    oracle-checked catalog entries."""
    data = df.select(F.col(id_col), _as_double_array(vec_col).alias("_v"))
    if seed_by == "hash":
        ordered = data.orderBy(F.xxhash64(F.col(id_col) + seed))
    else:
        ordered = data.orderBy(id_col)
    return [list(r["_v"]) for r in ordered.limit(k).select("_v").collect()]


def _update_centers_mean(assigned: DataFrame) -> dict[int, list[float]]:
    """Scalable centroid update: per-(cluster, dim) avg — shuffles only
    (cluster, dim) keys with map-side partial aggregation."""
    rows = (
        assigned.select("_cluster", F.posexplode("_v").alias("_pos", "_x"))
        .groupBy("_cluster", "_pos")
        .agg(F.avg("_x").alias("_m"))
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in rows:
        by_cluster.setdefault(r["_cluster"], {})[r["_pos"]] = r["_m"]
    return {c: [d[p] for p in sorted(d)] for c, d in by_cluster.items()}


def _update_centers_exact(
    assigned: DataFrame, id_col: str, dim: int
) -> dict[int, list[float]]:
    """Deterministic centroid update: sort each cluster's members by id
    and strict-left-fold the element-wise sum, so the IEEE result is
    independent of partitioning/shuffle order (and matches a DuckDB
    ``list_reduce`` over ``list(e ORDER BY id)`` bit for bit). Bounded
    by cluster size — call on a bounded training sample."""
    per = assigned.groupBy("_cluster").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("_v").alias("e")))
        ).alias("rows"),
        F.count("*").alias("n"),
    )
    cent = per.select(
        "_cluster",
        F.transform(
            F.aggregate(
                "rows",
                F.array_repeat(F.lit(0.0), dim),
                lambda acc, r: F.zip_with(acc, r.getField("e"), lambda a, b: a + b),
            ),
            lambda x: x / F.col("n").cast("double"),
        ).alias("c"),
    )
    return {r["_cluster"]: list(r["c"]) for r in cent.collect()}


def _kmeans_driver(
    df: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    seed_by: str,
    seed: int,
    on_empty: str,
    centers0: list[list[float]] | None,
    max_driver_sample: int,
) -> tuple[list[list[float]], list[int], DataFrame]:
    """kmeans's exact-fold Lloyd loop on the collected bounded sample
    (the pq_train mode='driver' pattern — see _pq_train_driver). Each
    arithmetic step mirrors the expression path operation for
    operation, so centers/ids are BITWISE identical to mode='dist'
    with exact_fold=True (pinned in tests/test_clustering.py):

    - distance: strict left fold ``acc = acc + (a-b)*(a-b)`` in dim
      order (cell_assign_expr's aggregate/zip_with fold) — and the
      guarded BLAS path above ASSIGN_NUMPY_THRESHOLD is expr-identical
      by proof, so the replica covers every k;
    - argmin: first strict minimum in current-centroid order;
    - update: members sorted by id, per-dim strict left-fold sum, one
      division by n;
    - on_empty: same drop/keep policy over ORIGINAL cluster ids.

    The returned ``assigned`` frame is the same map-only literal-
    argmin projection mode='dist' returns (built lazily — no extra
    job). The collect is bounded by contract: ``max_driver_sample``
    raises rather than silently pulling an unbounded frame."""
    data = df.select(F.col(id_col), _as_double_array(vec_col).alias("_v"))
    rows = data.collect()
    if len(rows) > max_driver_sample:
        raise ValueError(
            f"kmeans(mode='driver'): sample has {len(rows)} rows, over "
            f"the {max_driver_sample} driver-side bound — pass a bounded "
            "training sample (or raise max_driver_sample deliberately)"
        )
    sample = sorted(
        ((r[0], [float(x) for x in r[1]]) for r in rows), key=lambda t: t[0]
    )
    if centers0 is not None:
        centers = [[float(x) for x in c] for c in centers0]
    elif seed_by == "hash":
        # xxhash64 ordering is JVM-side; one k-row job, same as "dist"
        centers = [
            list(r["_v"])
            for r in data.orderBy(F.xxhash64(F.col(id_col) + seed))
            .limit(k)
            .collect()
        ]
    else:
        centers = [v for _, v in sample[:k]]
    if not centers:
        raise ValueError("kmeans(mode='driver'): empty training set")
    ids = list(range(len(centers)))
    dim = len(centers[0])
    for _ in range(max(iters, 0)):
        groups: dict[int, list[list[float]]] = {}
        for _i, v in sample:  # already id-sorted
            best_pos, best_d = 0, None
            for j, c in enumerate(centers):
                acc = 0.0
                for a, b in zip(v, c):
                    acc = acc + (a - b) * (a - b)
                if best_d is None or acc < best_d:
                    best_d, best_pos = acc, j
            groups.setdefault(ids[best_pos], []).append(v)
        new: dict[int, list[float]] = {}
        for cid, members in groups.items():
            acc = [0.0] * dim
            for e in members:
                acc = [a + b for a, b in zip(acc, e)]
            n = float(len(members))
            new[cid] = [x / n for x in acc]
        if on_empty == "drop":
            ids = [i for i in ids if i in new]
            centers = [new[i] for i in ids]
        else:
            centers = [new.get(i, centers[pos]) for pos, i in enumerate(ids)]
    assigned = assign_with_ids(data, centers, ids, id_col)
    return centers, ids, assigned


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_by: str = "hash",
    seed: int = 42,
    exact_fold: bool = False,
    on_empty: str = "keep",
    centers0: list[list[float]] | None = None,
    partitions: int | None = None,
    mode: str = "dist",
    max_driver_sample: int = 200_000,
) -> tuple[list[list[float]], list[int], DataFrame]:
    """Lloyd's k-means: ``iters`` rounds of (map-only literal argmin
    assignment -> distributed centroid update -> driver model refresh).

    Returns ``(centers, cluster_ids, assigned_df)`` where
    ``assigned_df`` carries ``_cluster`` (original cluster id) and
    ``_v`` (double vector). ``on_empty`` controls clusters that lose
    all members: ``"keep"`` retains the stale centroid (production
    default — cluster count is part of the contract), ``"drop"``
    removes it (mirrorable in plain SQL, used by the oracle entries).

    Train-on-sample: pass a filtered ``df`` here, then assign the full
    corpus with ``assign_expr_with_ids(centers, cluster_ids)`` — a
    map-only pass, no shuffle, no driver data movement.

    ``partitions`` compacts the training input to that many partitions
    instead of spreading it to full parallelism — right when the
    sample is small and the iteration cost is task scheduling, not
    compute (Lloyd runs several driver-coordinated jobs; fewer tasks
    per job beats idle-core scan parallelism on a few thousand rows).
    """
    if mode == "driver":
        if not exact_fold:
            raise ValueError(
                "kmeans(mode='driver') implements the exact-fold update "
                "only — the distributed avg path's partial-aggregation "
                "order cannot be reproduced driver-side"
            )
        return _kmeans_driver(
            df, k, iters, id_col, vec_col, seed_by, seed, on_empty,
            centers0, max_driver_sample,
        )
    if mode != "dist":
        raise ValueError(f"kmeans: unknown mode {mode!r}")
    base = df if partitions is None else df.repartition(partitions)
    data = (spread(base) if partitions is None else base).select(
        F.col(id_col), _as_double_array(vec_col).alias("_v")
    ).persist()
    try:
        if centers0 is None:
            centers = seed_centers(data, k, id_col, "_v", seed_by=seed_by, seed=seed)
        else:
            centers = [[float(x) for x in c] for c in centers0]
        ids = list(range(len(centers)))
        dim = len(centers[0])
        for _ in range(max(iters, 0)):
            # auto-switches to the BLAS argmin above k=64 — the
            # literal expression's interpreted n*k*d work would make
            # each Lloyd pass quadratic once k scales with the corpus
            assigned = assign_with_ids(data, centers, ids, id_col)
            new = (
                _update_centers_exact(assigned, id_col, dim)
                if exact_fold
                else _update_centers_mean(assigned)
            )
            if on_empty == "drop":
                ids = [i for i in ids if i in new]
                centers = [new[i] for i in ids]
            else:
                centers = [new.get(i, centers[pos]) for pos, i in enumerate(ids)]
        assigned = assign_with_ids(data, centers, ids, id_col)
        return centers, ids, assigned
    finally:
        data.unpersist()


def inertia(assigned: DataFrame, centers: list[list[float]], ids: list[int]) -> DataFrame:
    """Within-cluster sum of squared distances (the k-means objective)
    as a 1-row frame — map-only literal distance + one global agg."""
    centers_lit = nested_double_lit(centers)
    idx = F.array_position(
        F.lit([int(i) for i in ids]), F.col("_cluster")
    ).cast("int")
    d2 = F.aggregate(
        F.zip_with(
            "_v", F.element_at(centers_lit, idx), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return assigned.select(d2.alias("_d2")).agg(
        F.sum("_d2").alias("inertia"), F.count("*").alias("n_points")
    )


def assign_cells_np(
    data: DataFrame,
    centers: list[list[float]],
    ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "_v",
) -> DataFrame:
    """Nearest-centroid assignment via the shared BLAS batch argmin
    (similarity.cell_assign_np — the FAISS distance form with a
    first-minimum tie rule matching cell_assign_expr), mapping each
    centroid POSITION back to its ORIGINAL cluster id (centers may be
    a surviving subset, so positions are not ids — the
    assign_expr_with_ids contract). Returns (id, vec, cluster int)."""
    pos = cell_assign_np(data, centers, id_col, vec_col, out_col="_pos")
    return pos.select(
        id_col,
        vec_col,
        F.element_at(F.lit([int(i) for i in ids]), F.col("_pos") + 1)
        .cast("int")
        .alias("cluster"),
    )


def assign_with_ids(
    data: DataFrame,
    centers: list[list[float]],
    ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "_v",
    method: str = "auto",
) -> DataFrame:
    """(id, vec, _cluster) nearest-centroid assignment. One entry
    point so every assignment consumer (kmeans loop, SemDeDup,
    full-corpus scoring) inherits the same scale path; methods as in
    similarity.assign_cells — "auto" resolves to the fold-order-exact
    expression at small k and the margin-GUARDED BLAS argmin (expr-
    identical by proof, GEMM-fast) above ASSIGN_NUMPY_THRESHOLD, so
    the default answer is oracle-exact at every scale."""
    if method == "auto":
        method = (
            "guarded" if len(centers) > ASSIGN_NUMPY_THRESHOLD else "expr"
        )
    if method == "expr":
        return data.select(id_col, vec_col).withColumn(
            "_cluster", assign_expr_with_ids(centers, ids, vec=vec_col)
        )
    from hybrid_cdc_demo_spark.operators.similarity import assign_cells

    pos = assign_cells(
        data, centers, id_col, vec_col, out_col="_pos", method=method
    )
    return pos.select(
        id_col,
        vec_col,
        F.element_at(F.lit([int(i) for i in ids]), F.col("_pos") + 1)
        .cast("int")
        .alias("_cluster"),
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: list[list[float]] | None = None,
    ids: list[int] | None = None,
    seed_by: str = "hash",
    max_cluster: int | None = None,
    assign_method: str = "auto",
) -> DataFrame:
    """SemDeDup: bucket vectors by nearest centroid, then exact
    pairwise cosine ONLY within each cluster — pairs (id_a < id_b,
    cluster, cos) with cos >= threshold.

    The quadratic blowup is bounded per cluster: at 100 TB you pick k
    so the expected cluster size stays constant (k ~ n / target_size),
    making total pair work O(n * target_size). ``max_cluster`` is the
    skew guard (same no-silent-caps contract as the LSH dedup family):
    clusters larger than the cap are EXCLUDED from pairing — callers
    see the drop via cluster_sizes(), nothing is silently truncated
    mid-cluster.

    ``assign_method``: "expr" (nested-literal argmin — exact DuckDB
    fold-order parity at interpreted cost), "numpy" (raw BLAS matmul
    argmin — fastest; tie-band answers may differ from expr by float
    association), "guarded" (BLAS + rigorous margin proof + lazy
    expression fallback on the uncertain band — expr-IDENTICAL at GEMM
    speed, similarity.cell_assign_guarded), or "auto" (expr up to
    ASSIGN_NUMPY_THRESHOLD, guarded above it — since k ~ n/64 the
    expression path's n*k*d interpreted work would grow quadratically
    with the corpus; the round-6 heavy scaling sweep measured it at
    23 s for n=20k, k=312, vs 1.7 s BLAS).
    """
    data = spread(df).select(F.col(id_col), _as_double_array(vec_col).alias("_v"))
    if centers is None:
        centers = seed_centers(data, k, id_col, "_v", seed_by=seed_by)
    if ids is None:
        ids = list(range(len(centers)))
    assigned = (
        assign_with_ids(data, centers, ids, id_col, "_v", method=assign_method)
        .select(
            F.col(id_col),
            F.col("_v"),
            F.col("_cluster").alias("cluster"),
            # self-norm hoisted once per row (r10): the in-cluster pair
            # scan then folds ONE cross dot per pair instead of three —
            # cosine_with_norms is bitwise-identical to cosine()
            norm_col(F.col("_v")).alias("_nm"),
        )
        # the self-join's a/b sides (and the max_cluster size scan)
        # each re-ran the FULL n x k assignment — the dominant cost,
        # O(n*k*d) with k ~ n/64 — because union/join consumers do not
        # share subtrees (r11 executed plan: 2 scans, 0 reuse). The
        # lazy checkpoint materializes the assignment once; the first
        # consumer's job rides it (guide §2.4).
        .localCheckpoint(eager=False)
    )
    if max_cluster is not None:
        sizes = assigned.groupBy("cluster").agg(F.count("*").alias("_n"))
        keep = sizes.filter(F.col("_n") <= max_cluster).select("cluster")
        assigned = assigned.join(F.broadcast(keep), "cluster")
    a = assigned.select(
        F.col("cluster"), F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"), F.col("_nm").alias("_na"),
    )
    b = assigned.select(
        F.col("cluster"), F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"), F.col("_nm").alias("_nb"),
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster",
            "id_a",
            "id_b",
            cosine_with_norms(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    """Cluster-size histogram (skew diagnostics for semantic_dedup's
    max_cluster guard)."""
    return assigned.groupBy("cluster").agg(F.count("*").alias("n_members"))


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    exact_fold: bool = False,
    seed_by: str = "hash",
    partitions: int | None = None,
    mode: str = "dist",
    max_driver_sample: int = 200_000,
) -> list[tuple[list[list[float]], list[int]]]:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    vector into ``m`` contiguous subspaces and train an independent
    k-means codebook per subspace. The subspaces are mathematically
    independent, so the ``m`` Lloyd loops are trained JOINTLY: each
    iteration is ONE pass over the sample — a per-row explode into
    (subspace, cluster, subvector) terms and a single partial-
    aggregated groupBy(subspace, cluster) — instead of m sequential
    loops (m× the scheduled jobs for identical math). The model is
    m·k·(dim/m) doubles on the driver (model-sized); training is
    train-on-sample like every codebook in this repo. Empty clusters
    are dropped (the SQL-mirrorable policy the oracle replays).

    ``exact_fold=True`` makes the centroid update a per-(subspace,
    cluster) sorted strict left fold — bitwise-reproducible against
    DuckDB per subspace (ns_pq_encode's generated oracle).

    ``mode="driver"`` trains on the COLLECTED sample in plain Python —
    the FAISS production shape (ProductQuantizer::train runs on an
    in-memory sampled subset; only encode/search are distributed).
    The math is the exact_fold semantics verbatim (same left-fold
    distance, same first-minimum tie rule, same vec_id-sorted strict
    centroid fold — Python floats and JVM doubles are both IEEE-754
    binary64 evaluated in the same order, so codebooks are BITWISE
    identical to mode="dist"; pinned in tests/test_pq.py). Why it
    exists: the distributed Lloyd loop schedules one pass per
    iteration, and on a bounded sample (500 rows here; ~10^5-10^6 in
    production) per-job scheduling latency dominates arithmetic by
    100×. The collect is bounded by contract — ``max_driver_sample``
    raises rather than silently pulling an unbounded frame onto the
    driver. At 100 TB the flow is the same: sample a bounded training
    set, train driver-side, broadcast the model-sized codebooks into
    the map-only encode.
    """
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    if mode == "driver":
        if not exact_fold:
            raise ValueError(
                "pq_train(mode='driver') implements the exact-fold update "
                "only — the distributed avg path's partial-aggregation "
                "order cannot be reproduced driver-side"
            )
        return _pq_train_driver(
            df, dim, m, k, id_col, vec_col, iters, seed_by, max_driver_sample
        )
    if mode != "dist":
        raise ValueError(f"pq_train: unknown mode {mode!r}")
    base = df.repartition(partitions) if partitions else spread(df)
    data = base.select(
        F.col(id_col), _as_double_array(vec_col).alias("_v")
    ).persist()
    try:
        if seed_by == "hash":
            ordered = data.orderBy(F.xxhash64(F.col(id_col) + 42))
        else:
            ordered = data.orderBy(id_col)
        seed_rows = [list(r["_v"]) for r in ordered.limit(k).collect()]
        books = [
            [v[s * sub : (s + 1) * sub] for v in seed_rows] for s in range(m)
        ]
        ids: list[list[int]] = [list(range(len(books[s]))) for s in range(m)]
        for _ in range(max(iters, 0)):
            terms = F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        assign_expr_with_ids(
                            books[s], ids[s], F.slice("_v", s * sub + 1, sub)
                        ).alias("cl"),
                        F.slice("_v", s * sub + 1, sub).alias("sv"),
                    )
                    for s in range(m)
                ]
            )
            ex = data.select(F.col(id_col), F.explode(terms).alias("p")).select(
                id_col, "p.s", "p.cl", "p.sv"
            )
            if exact_fold:
                per = ex.groupBy("s", "cl").agg(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(id_col).alias("i"), F.col("sv").alias("e"))
                        )
                    ).alias("rows"),
                    F.count("*").alias("n"),
                )
                cent = per.select(
                    "s",
                    "cl",
                    F.transform(
                        F.aggregate(
                            "rows",
                            F.array_repeat(F.lit(0.0), sub),
                            lambda acc, r: F.zip_with(
                                acc, r.getField("e"), lambda a, b: a + b
                            ),
                        ),
                        lambda x: x / F.col("n").cast("double"),
                    ).alias("c"),
                )
                got = {(r["s"], r["cl"]): list(r["c"]) for r in cent.collect()}
            else:
                rows = (
                    ex.select("s", "cl", F.posexplode("sv").alias("_pos", "_x"))
                    .groupBy("s", "cl", "_pos")
                    .agg(F.avg("_x").alias("_m"))
                    .collect()
                )
                acc: dict = {}
                for r in rows:
                    acc.setdefault((r["s"], r["cl"]), {})[r["_pos"]] = r["_m"]
                got = {key: [d[p] for p in sorted(d)] for key, d in acc.items()}
            for s in range(m):
                ids[s] = [i for i in ids[s] if (s, i) in got]
                books[s] = [got[(s, i)] for i in ids[s]]
        return [(books[s], ids[s]) for s in range(m)]
    finally:
        data.unpersist()


def _pq_train_driver(
    df: DataFrame,
    dim: int,
    m: int,
    k: int,
    id_col: str,
    vec_col: str,
    iters: int,
    seed_by: str,
    max_driver_sample: int,
) -> list[tuple[list[list[float]], list[int]]]:
    """pq_train's exact-fold Lloyd loop on the collected bounded
    sample (see pq_train mode='driver'). Each arithmetic step mirrors
    the expression path operation-for-operation:

    - distance: strict left fold ``acc = acc + (a-b)*(a-b)`` in dim
      order (cell_assign_expr's aggregate/zip_with fold);
    - argmin: first strict minimum in current-centroid order
      (array_position-of-array_min keeps the FIRST equal element);
    - update: members sorted by id, per-dim strict left-fold sum,
      one division by n (the array_sort/collect_list/aggregate
      pipeline of the exact_fold branch);
    - empty clusters dropped, surviving original ids kept.
    """
    sub = dim // m
    data = df.select(F.col(id_col), _as_double_array(vec_col).alias("_v"))
    rows = data.collect()
    if len(rows) > max_driver_sample:
        raise ValueError(
            f"pq_train(mode='driver'): sample has {len(rows)} rows, over "
            f"the {max_driver_sample} driver-side bound — pass a bounded "
            "training sample (or raise max_driver_sample deliberately)"
        )
    sample = sorted(
        ((r[0], [float(x) for x in r[1]]) for r in rows), key=lambda t: t[0]
    )
    if seed_by == "hash":
        # xxhash64 ordering is JVM-side; one k-row job, same as "dist"
        seed_rows = [
            list(r["_v"])
            for r in data.orderBy(F.xxhash64(F.col(id_col) + 42))
            .limit(k)
            .collect()
        ]
    else:
        seed_rows = [v for _, v in sample[:k]]
    books = [[v[s * sub : (s + 1) * sub] for v in seed_rows] for s in range(m)]
    ids: list[list[int]] = [list(range(len(books[s]))) for s in range(m)]
    subvecs = [
        [(i, v[s * sub : (s + 1) * sub]) for i, v in sample] for s in range(m)
    ]
    for _ in range(max(iters, 0)):
        for s in range(m):
            centers = books[s]
            groups: dict[int, list[list[float]]] = {}
            for _i, sv in subvecs[s]:  # already id-sorted
                best_pos, best_d = 0, None
                for j, c in enumerate(centers):
                    acc = 0.0
                    for a, b in zip(sv, c):
                        acc = acc + (a - b) * (a - b)
                    if best_d is None or acc < best_d:
                        best_d, best_pos = acc, j
                groups.setdefault(ids[s][best_pos], []).append(sv)
            new_ids, new_books = [], []
            for cid in ids[s]:
                members = groups.get(cid)
                if not members:
                    continue  # empty cluster dropped (oracle policy)
                acc = [0.0] * sub
                for e in members:
                    acc = [a + b for a, b in zip(acc, e)]
                n = float(len(members))
                new_ids.append(cid)
                new_books.append([x / n for x in acc])
            ids[s], books[s] = new_ids, new_books
    return [(books[s], ids[s]) for s in range(m)]


def pq_encode(
    df: DataFrame,
    books: list[tuple[list[list[float]], list[int]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_prefix: str = "c",
    method: str = "auto",
) -> DataFrame:
    """Encode every vector as ``m`` small codes (nearest codebook
    centroid per subspace) — a single map-only pass, the codebooks
    ride in as literals/closures; dim·8 bytes collapse to m codes
    (64-float vector -> 4 bytes at m=4/k<=256). Integer output —
    zero FP surface in the result.

    ``method``: "expr" is the nested-literal argmin projection
    (interpreted HOFs — m·k·sub fold steps PER ROW, the whole-corpus
    cost of every PQ query); "guarded" runs all ``m`` subspace argmins
    in ONE Arrow batch pass (a GEMM per subspace plus the
    cell_assign_guarded margin proof with d=sub, strict-fold fallback
    on the uncertain band) — provably code-identical to "expr" at BLAS
    speed (r11; pinned in tests/test_pq.py). "auto" = guarded: unlike
    a single small-k assignment, the encode multiplies the interpreted
    cost by m and runs over the FULL corpus. Vectors must be non-null
    (the PQ contract; same as the IVF assignment kernels)."""
    m = len(books)
    sub = dim // m
    if method == "auto":
        method = "guarded"
    if method == "guarded":
        return _pq_encode_guarded(
            df, books, dim, id_col, vec_col, code_prefix
        )
    if method != "expr":
        raise ValueError(f"pq_encode: unknown method {method!r}")
    v = _as_double_array(vec_col)
    cols = [
        assign_expr_with_ids(
            centers, ids, F.slice(v, s * sub + 1, sub)
        ).cast("int").alias(f"{code_prefix}{s + 1}")
        for s, (centers, ids) in enumerate(books)
    ]
    return df.select(F.col(id_col), *cols)


def _pq_encode_guarded(
    df: DataFrame,
    books: list[tuple[list[list[float]], list[int]]],
    dim: int,
    id_col: str,
    vec_col: str,
    code_prefix: str,
    slack: float = 8.0,
    rotate: "np.ndarray | None" = None,
) -> DataFrame:
    """All m subspace assignments in one Arrow pass, expr-identical by
    the cell_assign_guarded margin proof applied per subspace (d=sub):
    BLAS distances + top-2 margin; rows whose margin clears
    ``slack·(sub+2)·u·(‖x_s‖+‖c_max_s‖)²`` keep the GEMM argmin with a
    proof, the rest are re-scored by the strict left fold in dimension
    order — the exact IEEE sequence the expression evaluates (ties
    land in the uncertain band by construction and inherit the
    expression's first-minimum rule). Positions map back to ORIGINAL
    cluster ids exactly as assign_expr_with_ids does.

    ``rotate`` fuses an OPQ-style rotation into the same Arrow pass
    (y = x·W per row — a row-independent GEMM, so values are identical
    to a separate rotate_vecs stage regardless of batch boundaries):
    the rotated corpus then never round-trips the Arrow boundary
    twice (r11, ns_simsearch_opq)."""
    import pandas as pd

    Wm = None if rotate is None else np.asarray(rotate, dtype=np.float64)
    m = len(books)
    sub = dim // m
    mats = []
    for centers, ids in books:
        C = np.asarray(centers, dtype=np.float64)
        cn = (C * C).sum(axis=1)
        cmax = float(np.sqrt(cn).max()) if len(C) else 0.0
        mats.append((C, cn, cmax, np.asarray([int(i) for i in ids])))
    coef = slack * (sub + 2) * 2.0 ** -53
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col), _as_double_array(vec_col).alias("_x"))

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.vstack(pdf["_x"].to_numpy()).astype(np.float64)
            if Wm is not None:
                V = V @ Wm
            out = {id_col: pdf[id_col].to_numpy()}
            for s, (C, cn, cmax, ids_arr) in enumerate(mats):
                X = V[:, s * sub : (s + 1) * sub]
                d2 = (X * X).sum(axis=1, keepdims=True) - 2.0 * (X @ C.T) + cn
                best = d2.argmin(axis=1)
                if d2.shape[1] > 1:
                    two = np.partition(d2, 1, axis=1)
                    margin = two[:, 1] - two[:, 0]
                else:
                    margin = np.full(len(X), np.inf)
                xnorm = np.sqrt((X * X).sum(axis=1))
                bound = coef * (xnorm + cmax) ** 2
                unc = np.flatnonzero(margin <= bound)
                if unc.size:
                    U = X[unc]
                    acc = np.zeros(
                        (U.shape[0], C.shape[0]), dtype=np.float64
                    )
                    for i in range(sub):
                        diff = U[:, i : i + 1] - C[None, :, i]
                        acc = acc + diff * diff
                    best[unc] = acc.argmin(axis=1)
                out[f"{code_prefix}{s + 1}"] = ids_arr[best].astype(np.int32)
            yield pd.DataFrame(out)

    schema = f"{id_col} {id_type}, " + ", ".join(
        f"{code_prefix}{s + 1} int" for s in range(m)
    )
    return src.mapInPandas(encode, schema=schema)


def pq_adc_topk(
    df: DataFrame,
    books: list[tuple[list[list[float]], list[int]]],
    query: list[float],
    dim: int,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: precompute the
    query→centroid lookup table per subspace ON THE DRIVER (m·k
    doubles), then approximate each corpus vector's squared L2 as the
    sum of LUT entries selected by its codes — a map-only projection
    over the encoded frame + TakeOrderedAndProject. This is the scan
    shape FAISS IVF-PQ runs per probed cell; at 100 TB the encoded
    table is ~dim·2/m% of the raw corpus and the scan never touches
    the original vectors."""
    enc = pq_encode(df, books, dim, id_col, vec_col)
    dist = adc_dist_expr(books, query, dim)
    return (
        enc.select(F.col(id_col), dist.alias("adc_d2"))
        .orderBy("adc_d2", id_col)
        .limit(topk)
    )


def adc_dist_expr(
    books: list[tuple[list[list[float]], list[int]]],
    query: list[float],
    dim: int,
    code_prefix: str = "c",
) -> F.Column:
    """The ADC distance as a column over code columns: per subspace a
    query→centroid LUT (m·k doubles, driver-computed, rides as a
    literal) indexed by the code, terms summed left-associated."""
    m = len(books)
    sub = dim // m
    dist = None
    for s, (centers, ids) in enumerate(books):
        q = query[s * sub : (s + 1) * sub]
        # LUT indexed by ORIGINAL cluster id (sparse ids -> map literal)
        lut = {
            int(cid): sum((a - b) * (a - b) for a, b in zip(q, c))
            for c, cid in zip(centers, ids)
        }
        keys = sorted(lut)
        term = F.element_at(
            F.lit([lut[i] for i in keys]),
            F.array_position(
                F.lit(keys), F.col(f"{code_prefix}{s + 1}")
            ).cast("int"),
        )
        dist = term if dist is None else dist + term
    return dist


def rotate_vecs(
    df: DataFrame,
    W: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "_y",
    passthrough: "tuple[str, ...]" = (),
) -> DataFrame:
    """Map-only rotation y = x·W via an Arrow mapInPandas GEMM (the
    d×d orthogonal matrix rides the closure — model-sized). One BLAS
    matmul per batch; zero shuffles, embarrassingly parallel at any
    corpus size. ``passthrough`` columns ride the same batch (e.g. the
    IVF ``_cell`` id, so the rotated-residual encode never needs a
    join back)."""
    import pandas as pd

    Wm = np.asarray(W, dtype=np.float64)
    dtypes = dict(df.dtypes)
    extra = list(passthrough)
    src = df.select(
        F.col(id_col), _as_double_array(vec_col).alias("_x"), *extra
    )

    def rot(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["_x"].to_numpy()).astype(np.float64)
            Y = X @ Wm
            out = {id_col: pdf[id_col].to_numpy(), out_col: list(Y)}
            for c in extra:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    schema = ", ".join(
        [f"{id_col} {dtypes[id_col]}", f"{out_col} array<double>"]
        + [f"{c} {dtypes[c]}" for c in extra]
    )
    return src.mapInPandas(rot, schema=schema)


def _books_matrices(books, dim: int):
    """Per-subspace (k, sub) centroid matrices for numpy encode/decode."""
    m = len(books)
    sub = dim // m
    return [np.asarray(centers, dtype=np.float64) for centers, _ in books], sub


import contextlib


@contextlib.contextmanager
def _blas_single_thread():
    """Pin this process's OpenBLAS to ONE thread for the duration —
    PySpark launches Python workers with OMP_NUM_THREADS=1 (task
    cpus), while the driver's BLAS may run threaded, and OpenBLAS's
    threaded GEMM reduces in a different order (~1 ulp on a d×d
    cross-correlation — enough to desync the Procrustes SVD between
    opq_train's two modes). Locates the loaded OpenBLAS via
    /proc/self/maps and flips openblas_set_num_threads; yields True
    when pinned, False when thread control is unavailable (callers
    then fall back to the distributed path, which needs no pinning).
    """
    set_fn = get_fn = None
    try:
        import ctypes

        libs = set()
        with open("/proc/self/maps") as fh:
            for line in fh:
                parts = line.split()
                path = parts[-1] if parts else ""
                if "openblas" in path.lower() and ".so" in path:
                    libs.add(path)
        for path in sorted(libs):
            handle = ctypes.CDLL(path)
            for suffix in ("64_", "", "_"):
                s = getattr(handle, f"openblas_set_num_threads{suffix}", None)
                g = getattr(handle, f"openblas_get_num_threads{suffix}", None)
                if s is not None and g is not None:
                    set_fn, get_fn = s, g
                    break
            if set_fn is not None:
                break
    except Exception:  # noqa: BLE001 — no /proc, no symbols: unpinnable
        set_fn = None
    if set_fn is None:
        yield False
        return
    old = int(get_fn())
    set_fn(1)
    try:
        yield True
    finally:
        set_fn(old)


def _opq_batch_update(X, Wm, mats, sub, A, sums, counts) -> float:
    """ONE Arrow batch's contribution to an OPQ alternation pass —
    the shared numpy kernel of _opq_pass (executor-side) and
    _opq_train_driver's local replay, so the two modes run literally
    the same operation sequence. Mutates A/sums/counts in place and
    returns the batch's quantization-error sum."""
    m = len(mats)
    Y = X @ Wm
    Xhat = np.empty_like(Y)
    for s, C in enumerate(mats):
        Ys = Y[:, s * sub : (s + 1) * sub]
        d2 = (
            (Ys * Ys).sum(axis=1, keepdims=True)
            - 2.0 * (Ys @ C.T)
            + (C * C).sum(axis=1)
        )
        pos = d2.argmin(axis=1)
        Xhat[:, s * sub : (s + 1) * sub] = C[pos]
        np.add.at(sums[s], pos, Ys)
        np.add.at(counts[s], pos, 1)
    A += X.T @ Xhat
    return float(((Y - Xhat) ** 2).sum())


def _opq_pass(
    data: DataFrame,
    W: "np.ndarray",
    books,
    dim: int,
    vec_col: str = "_x",
):
    """ONE distributed pass accumulating everything an OPQ alternation
    step needs: the Procrustes cross-correlation A = Σ xᵀ·x̂ (d×d,
    original vectors against their rotated-then-quantized
    reconstructions), the quantization error Σ‖x·W − x̂‖², the row
    count, AND the Lloyd statistics (per-(subspace, cluster) subvector
    sums + member counts) for the codebook update. Each partition
    folds its rows into constant-size partials
    (d² + m·k·(d/m) + m·k + 2 doubles — the gram_matrix pattern); one
    collect of per-partition partials reduces them on the driver."""
    import pandas as pd

    Wm = np.asarray(W, dtype=np.float64)
    mats, sub = _books_matrices(books, dim)
    m = len(mats)
    k_max = max(len(C) for C in mats)

    def fold(batches):
        A = np.zeros((dim, dim), dtype=np.float64)
        sums = np.zeros((m, k_max, sub), dtype=np.float64)
        counts = np.zeros((m, k_max), dtype=np.int64)
        err = 0.0
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            err += _opq_batch_update(X, Wm, mats, sub, A, sums, counts)
            n += len(X)
        if n:
            yield pd.DataFrame(
                {
                    "a": [A.reshape(-1).tobytes()],
                    "sums": [sums.reshape(-1).tobytes()],
                    "counts": [counts.reshape(-1).tobytes()],
                    "err": [err],
                    "n": [n],
                }
            )

    rows = data.mapInPandas(
        fold, schema="a binary, sums binary, counts binary, err double, n long"
    ).collect()
    A = np.zeros((dim, dim), dtype=np.float64)
    sums = np.zeros((m, k_max, sub), dtype=np.float64)
    counts = np.zeros((m, k_max), dtype=np.int64)
    err, n = 0.0, 0
    for r in rows:  # bounded: one partial per non-empty partition
        A += np.frombuffer(r["a"], dtype=np.float64).reshape(dim, dim)
        sums += np.frombuffer(r["sums"], dtype=np.float64).reshape(m, k_max, sub)
        counts += np.frombuffer(r["counts"], dtype=np.int64).reshape(m, k_max)
        err += r["err"]
        n += r["n"]
    return A, err, n, sums, counts


def opq_train(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_by: str = "id",
    partitions: int | None = None,
    mode: str = "dist",
    max_driver_sample: int = 200_000,
):
    """Optimized Product Quantization, non-parametric alternation
    (Ge et al., CVPR 2013 — the published technique behind FAISS's
    OPQMatrix pre-rotation): learn an orthogonal d×d rotation W so
    that PQ's per-subspace quantization loses less. Each iteration is
    EXACTLY ONE distributed pass (_opq_pass) from which BOTH updates
    derive — the canonical single-step alternation:

    1. Lloyd codebook update from the pass's per-(subspace, cluster)
       sums/counts (empty clusters dropped, the pq_train policy);
    2. the orthogonal Procrustes rotation update: with reconstructions
       fixed, Σ‖x·W − x̂‖² is minimized over orthogonal W by W = U·Vᵀ
       where U·S·Vᵀ = svd(Σ xᵀx̂) — the cross-correlation accumulates
       in distributed d²-sized partials and the d×d SVD runs on the
       driver over model-sized data.

    Returns (W, books, history) where history[i] is the mean
    quantization error measured at the START of iteration i
    (history[0] = plain PQ at the identity rotation with seed
    codebooks — so the sequence is the improvement story OPQ exists
    to deliver).

    Scale shape: iters+0 aggregation passes total, constant-size
    partials, data never leaves the executors; only
    d² + m·k·(d/m) doubles round-trip per pass. Train-on-sample like
    every codebook here; rotate+encode everything else map-only.
    ``partitions`` compacts the (small) training sample so the
    driver-coordinated passes don't each spin a full fleet of Arrow
    workers — the pq_train/kmeans convention.

    ``mode="driver"`` collects the bounded training sample ONCE
    (with its partition layout) and replays the IDENTICAL numpy
    operation sequence locally — same per-partition Arrow batching,
    same per-partition GEMM partials, same ascending-partition
    accumulation order — so (W, books, history) are BITWISE equal to
    mode="dist" (pinned in tests/test_pq.py). Why it exists: the
    alternation is iters driver-coordinated distributed passes over a
    sample-sized frame, where per-job scheduling latency dominates
    arithmetic by ~100× (the pq_train/kmeans mode="driver"
    precedent). The collect is bounded by contract —
    ``max_driver_sample`` raises rather than silently pulling an
    unbounded frame (ivfopq_write trains on full-corpus residuals and
    therefore stays mode="dist" — that is the 100 TB shape)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    if mode == "driver":
        result = _opq_train_driver(
            df, dim, m, k, iters, id_col, vec_col, seed_by, partitions,
            max_driver_sample,
        )
        if result is not None:
            return result
        # BLAS thread control unavailable on this platform: the local
        # replay could not be made bitwise-faithful, so run the
        # distributed path (identical results, just more jobs).
    elif mode != "dist":
        raise ValueError(f"opq_train: unknown mode {mode!r}")
    base = df.repartition(partitions) if partitions else spread(df)
    data = base.select(
        F.col(id_col), _as_double_array(vec_col).alias("_x")
    ).persist()
    try:
        # seed codebooks: k deterministic sample vectors, subspace-split
        # (identity-rotation space), the pq_train seeding policy
        if seed_by == "hash":
            ordered = data.orderBy(F.xxhash64(F.col(id_col) + 42))
        else:
            ordered = data.orderBy(id_col)
        seed_rows = [list(r["_x"]) for r in ordered.limit(k).collect()]
        if not seed_rows:
            raise ValueError(
                "opq_train: empty training set (no rows with a non-null "
                f"{vec_col!r}) — cannot seed codebooks"
            )
        books = [
            ([v[s * sub : (s + 1) * sub] for v in seed_rows], list(range(len(seed_rows))))
            for s in range(m)
        ]
        W = np.eye(dim, dtype=np.float64)
        history: list[float] = []
        for it in range(max(iters, 0)):
            A, err, n, sums, counts = _opq_pass(data, W, books, dim, "_x")
            books, W = _opq_update_step(
                books, W, A, err, n, sums, counts, history, it, iters
            )
        return W, books, history
    finally:
        data.unpersist()


def _opq_update_step(books, W, A, err, n, sums, counts, history, it, iters):
    """The driver-side half of one OPQ alternation: record the error,
    apply the Lloyd codebook update (empty clusters dropped), and —
    except on the last iteration — the Procrustes rotation update.
    Shared verbatim by mode='dist' and mode='driver'."""
    if n == 0:
        # Degenerate training set (ADVICE r6 #3): without this
        # guard the all-zero Lloyd counts drop EVERY cluster and
        # the next pass fails deep in an executor with an
        # obscure ValueError (max() over empty codebooks),
        # while history silently records err/max(n,1) = 0.
        raise ValueError(
            "opq_train: _opq_pass saw zero training rows at "
            f"iteration {it} — empty/degenerate training set"
        )
    history.append(err / n)
    # Lloyd update (per subspace; empty clusters dropped)
    new_books = []
    for s, (_, ids) in enumerate(books):
        keep = [p for p in range(len(ids)) if counts[s][p] > 0]
        if not keep:
            raise ValueError(
                f"opq_train: subspace {s} lost every cluster in "
                f"the Lloyd update at iteration {it} — training "
                "set degenerate for this (m, k)"
            )
        centers = [
            list(sums[s][p] / counts[s][p]) for p in keep
        ]
        new_books.append((centers, [ids[p] for p in keep]))
    books = new_books
    if it < iters - 1:
        # Procrustes rotation update — skipped on the LAST
        # iteration so the returned (W, books) are consistent:
        # the final codebooks were trained in the final W space
        U, _, Vt = np.linalg.svd(A)
        W = U @ Vt
    return books, W


def _opq_train_driver(
    df: DataFrame,
    dim: int,
    m: int,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    seed_by: str,
    partitions: int | None,
    max_driver_sample: int,
):
    """opq_train's alternation on the collected bounded sample (see
    opq_train mode='driver'). Bitwise-equal to mode='dist' because
    every float operation replays in the same order: rows are
    collected WITH their partition layout (same repartition, same
    in-partition order), each partition's rows are re-chunked at the
    session's Arrow batch size, every batch runs the SAME numpy
    kernel (_opq_batch_update), per-partition partials accumulate in
    ascending-partition collect order (exactly _opq_pass's reduce),
    and the update step is the shared _opq_update_step. The replay's
    batch kernels run under a one-thread BLAS pin (_blas_single_thread
    — PySpark workers run OMP_NUM_THREADS=1, and OpenBLAS's threaded
    GEMM reduces in a different order); the Procrustes SVD stays
    UNPINNED because it runs on the (possibly threaded) driver in
    both modes. Returns None when BLAS threads cannot be controlled —
    the caller falls back to the distributed path."""
    with _blas_single_thread() as pinned:
        if not pinned:
            return None
    sub = dim // m
    spark = df.sparkSession
    base = df.repartition(partitions) if partitions else spread(df)
    data = base.select(
        F.col(id_col), _as_double_array(vec_col).alias("_x")
    )
    rows = data.withColumn("_pid", F.spark_partition_id()).collect()
    if len(rows) > max_driver_sample:
        raise ValueError(
            f"opq_train(mode='driver'): sample has {len(rows)} rows, over "
            f"the {max_driver_sample} driver-side bound — pass a bounded "
            "training sample (or raise max_driver_sample deliberately)"
        )
    parts: dict[int, list] = {}
    for r in rows:  # collect preserves partition-major row order
        parts.setdefault(int(r["_pid"]), []).append(
            (r[0], [float(x) for x in r["_x"]])
        )
    # seed codebooks — same policy as mode='dist'
    if seed_by == "hash":
        # xxhash64 ordering is JVM-side; one k-row job (pq_train parity)
        seed_rows = [
            list(r["_x"])
            for r in data.orderBy(F.xxhash64(F.col(id_col) + 42))
            .limit(k)
            .collect()
        ]
    else:
        ordered = sorted(
            (iv for plist in parts.values() for iv in plist),
            key=lambda t: t[0],
        )
        seed_rows = [v for _, v in ordered[:k]]
    if not seed_rows:
        raise ValueError(
            "opq_train: empty training set (no rows with a non-null "
            f"{vec_col!r}) — cannot seed codebooks"
        )
    books = [
        ([v[s * sub : (s + 1) * sub] for v in seed_rows], list(range(len(seed_rows))))
        for s in range(m)
    ]
    try:
        batch_max = int(
            spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        )
    except Exception:  # noqa: BLE001 — conf unset: Spark's default
        batch_max = 10_000
    if batch_max <= 0:
        # Spark treats a non-positive conf as 'unlimited' (one Arrow
        # batch per partition); mirror that so the replay's GEMM batch
        # boundaries — and float accumulation order — match the
        # distributed pass (0 = whole partition in local_pass below)
        batch_max = 0

    def local_pass(Wm, bks):
        mats, sub_ = _books_matrices(bks, dim)
        k_max = max(len(C) for C in mats)
        A = np.zeros((dim, dim), dtype=np.float64)
        sums = np.zeros((m, k_max, sub_), dtype=np.float64)
        counts = np.zeros((m, k_max), dtype=np.int64)
        err, n = 0.0, 0
        with _blas_single_thread():  # match the worker's GEMM order
            for pid in sorted(parts):  # ascending = collect reduce order
                plist = parts[pid]
                A_p = np.zeros((dim, dim), dtype=np.float64)
                sums_p = np.zeros((m, k_max, sub_), dtype=np.float64)
                counts_p = np.zeros((m, k_max), dtype=np.int64)
                err_p = 0.0
                step = batch_max or max(len(plist), 1)
                for lo in range(0, len(plist), step):
                    chunk = plist[lo : lo + step]
                    X = np.vstack(
                        [np.asarray(v, dtype=np.float64) for _, v in chunk]
                    )
                    err_p += _opq_batch_update(
                        X, Wm, mats, sub_, A_p, sums_p, counts_p
                    )
                A += A_p
                sums += sums_p
                counts += counts_p
                err += err_p
                n += len(plist)
        return A, err, n, sums, counts

    W = np.eye(dim, dtype=np.float64)
    history: list[float] = []
    for it in range(max(iters, 0)):
        A, err, n, sums, counts = local_pass(W, books)
        books, W = _opq_update_step(
            books, W, A, err, n, sums, counts, history, it, iters
        )
    return W, books, history


def opq_adc_topk(
    df: DataFrame,
    W: "np.ndarray",
    books,
    query: list[float],
    dim: int,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k in the OPQ-rotated space: rotate the
    corpus map-only (rotation is distance-preserving, so rotated-space
    ADC approximates true L2), rotate the query on the driver, then
    the standard PQ LUT scan. Same plan shape as pq_adc_topk plus one
    GEMM map stage."""
    Wm = np.asarray(W, dtype=np.float64)
    q = list(np.asarray(query, dtype=np.float64) @ Wm)
    # Rotation FUSED into the encode's Arrow pass (r11): a separate
    # rotate_vecs stage shipped the rotated corpus back across the
    # Arrow boundary only for the encode to ship it in again. The
    # per-row GEMM is row-independent, so the fused values are
    # identical to the two-stage shape.
    enc = _pq_encode_guarded(
        df, books, dim, id_col, vec_col, "c", rotate=Wm
    )
    dist = adc_dist_expr(books, q, dim)
    return (
        enc.select(F.col(id_col), dist.alias("adc_d2"))
        .orderBy("adc_d2", id_col)
        .limit(topk)
    )


def ivfpq_topk(
    df: DataFrame,
    query: list[float],
    dim: int,
    num_cells: int = 16,
    nprobe: int = 4,
    m: int = 4,
    k_codes: int = 8,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_partitions: int | None = None,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the FAISS billion-vector
    layout, composed from this repo's coarse quantizer and PQ:

    1. IVF cells prune the corpus (probe the nprobe nearest cells —
       at 100 TB the encoded table persists partitionBy(_cell), so
       pruning is file-level, as ivf_write already demonstrates);
    2. PQ codebooks are trained on RESIDUALS ``v - cell_center``
       (residuals concentrate near zero, so k codewords cover them
       far better than raw vectors — the reason every production
       IVF-PQ encodes residuals);
    3. the scan is per probed cell: the query residual
       ``q - cell_center`` builds that cell's LUTs driver-side, and
       the ADC projection runs map-only over the cell's codes.

    Returns the approximate L2 top-k as (id, adc_d2). Everything the
    driver holds is model-sized: centers (cells·dim), codebooks
    (m·k·dim/m), per-cell LUTs (m·k)."""
    from functools import reduce

    from hybrid_cdc_demo_spark.operators.similarity import ivf_index

    indexed, centers = ivf_index(
        df, id_col, vec_col, num_cells, seed, partitions=train_partitions
    )
    centers_lit = nested_double_lit(centers)
    resid = F.zip_with(
        "_v",
        F.element_at(centers_lit, F.col("_cell") + 1),
        lambda a, b: a - b,
    )
    rdf = indexed.withColumn("_r", resid)
    books = pq_train(
        rdf, dim, m=m, k=k_codes, id_col=id_col, vec_col="_r",
        partitions=train_partitions,
    )
    sub = dim // m
    enc = rdf.select(
        F.col(id_col),
        "_cell",
        *[
            assign_expr_with_ids(
                centers_s, ids_s, F.slice("_r", s * sub + 1, sub)
            ).cast("int").alias(f"c{s + 1}")
            for s, (centers_s, ids_s) in enumerate(books)
        ],
    ).localCheckpoint(eager=True)  # scanned once per probed cell
    qv = [float(x) for x in query]
    import numpy as np

    by_l2 = sorted(
        range(len(centers)),
        key=lambda i: float(
            np.sum((np.asarray(centers[i]) - np.asarray(qv)) ** 2)
        ),
    )
    probe = by_l2[:nprobe]
    scans = []
    for cell in probe:
        qr = [qv[i] - centers[cell][i] for i in range(dim)]
        dist = adc_dist_expr(books, qr, dim)
        scans.append(
            enc.filter(F.col("_cell") == cell).select(
                F.col(id_col), dist.alias("adc_d2")
            )
        )
    allc = reduce(DataFrame.unionByName, scans)
    return allc.orderBy("adc_d2", id_col).limit(topk)


def ivfpq_write(
    df: DataFrame,
    path: str,
    dim: int,
    num_cells: int = 16,
    m: int = 4,
    k_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_partitions: int | None = None,
    extra_meta: dict | None = None,
):
    """Build the IVF-PQ index ONCE and persist it: PQ codes over
    residuals written ``partitionBy(_cell)`` (each cell its own
    parquet directory — the inverted file), coarse centers + codebooks
    in a JSON sidecar. At 100 TB this is the production shape: one
    index job, then every query scans only the probed cells' CODE
    files (m small ints per vector, ~dim·8/m× smaller than the raw
    corpus) via partition pruning."""
    import json
    import os

    from hybrid_cdc_demo_spark.operators.similarity import ivf_index

    indexed, centers = ivf_index(
        df, id_col, vec_col, num_cells, seed, partitions=train_partitions
    )
    centers_lit = nested_double_lit(centers)
    resid = F.zip_with(
        "_v", F.element_at(centers_lit, F.col("_cell") + 1), lambda a, b: a - b
    )
    rdf = indexed.withColumn("_r", resid)
    books = pq_train(
        rdf, dim, m=m, k=k_codes, id_col=id_col, vec_col="_r",
        partitions=train_partitions,
    )
    sub = dim // m
    enc = rdf.select(
        F.col(id_col),
        "_cell",
        *[
            assign_expr_with_ids(
                centers_s, ids_s, F.slice("_r", s * sub + 1, sub)
            ).cast("int").alias(f"c{s + 1}")
            for s, (centers_s, ids_s) in enumerate(books)
        ],
    )
    enc.write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(path, "data")
    )
    meta = {
        "id_col": id_col,
        "dim": dim,
        "num_cells": num_cells,
        "m": m,
        "k_codes": k_codes,
        "seed": seed,
        "centers": centers,
        "books": [[c, i] for c, i in books],
        **(extra_meta or {}),
    }
    tmp = os.path.join(path, ".index.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "index.json"))
    return centers, books


def ivfpq_topk_persisted(
    spark,
    path: str,
    query: list[float],
    topk: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ADC top-k against a persisted IVF-PQ index: probe the nprobe
    L2-nearest cells (driver-side over model-sized centers), build the
    per-cell query-residual LUTs, and scan ONLY those cells' code
    files — the ``_cell = n`` filters are PartitionFilters, so I/O is
    ~ |index| * nprobe / num_cells and the raw vectors are never
    read."""
    import json
    import os
    from functools import reduce

    import numpy as np

    with open(os.path.join(path, "index.json")) as fh:
        meta = json.load(fh)
    centers = meta["centers"]
    books = [(c, i) for c, i in meta["books"]]
    dim, id_col = meta["dim"], meta["id_col"]
    enc = spark.read.parquet(os.path.join(path, "data"))
    qv = [float(x) for x in query]
    probe = sorted(
        range(len(centers)),
        key=lambda i: float(
            np.sum((np.asarray(centers[i]) - np.asarray(qv)) ** 2)
        ),
    )[:nprobe]
    scans = []
    for cell in probe:
        qr = [qv[i] - centers[cell][i] for i in range(dim)]
        scans.append(
            enc.filter(F.col("_cell") == cell).select(
                F.col(id_col), adc_dist_expr(books, qr, dim).alias("adc_d2")
            )
        )
    allc = reduce(DataFrame.unionByName, scans)
    return allc.orderBy("adc_d2", id_col).limit(topk)


def ivfopq_write(
    df: DataFrame,
    path: str,
    dim: int,
    num_cells: int = 16,
    m: int = 4,
    k_codes: int = 8,
    opq_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_partitions: int | None = None,
    extra_meta: dict | None = None,
):
    """IVF + OPQ-rotated residual PQ — the production FAISS layout
    ``OPQMatrix + IVFPQ`` (Ge et al. 2013 §6; FAISS index factory
    "OPQ..,IVF..,PQ.."): the coarse quantizer prunes, and the learned
    orthogonal rotation is applied to the RESIDUALS inside each cell
    before product quantization, so the PQ subspaces are balanced in
    the residual space where the codes actually live — strictly more
    faithful codes than plain IVF-PQ at identical storage.

    Build pipeline (one-time, like every index here):
    1. ivf_index coarse cells + centers;
    2. residuals r = v - cell_center (map-only);
    3. opq_train on the residuals (ONE distributed pass per
       alternation, model-sized driver state);
    4. rotate the residuals y = r·W as ONE map-only Arrow GEMM stage
       (rotate_vecs, the _cell id riding the same batch — no join);
    5. PQ-encode y and persist partitionBy(_cell) with centers, W,
       and codebooks in the JSON sidecar.
    """
    import json
    import os

    from hybrid_cdc_demo_spark.operators.similarity import ivf_index

    indexed, centers = ivf_index(
        df, id_col, vec_col, num_cells, seed, partitions=train_partitions
    )
    centers_lit = nested_double_lit(centers)
    resid = F.zip_with(
        "_v", F.element_at(centers_lit, F.col("_cell") + 1), lambda a, b: a - b
    )
    rdf = indexed.withColumn("_r", resid)
    W, books, _ = opq_train(
        rdf, dim, m=m, k=k_codes, iters=opq_iters, id_col=id_col,
        vec_col="_r", seed_by="id", partitions=train_partitions,
    )
    rot = rotate_vecs(
        rdf, W, id_col, "_r", out_col="_y", passthrough=("_cell",)
    )
    sub = dim // m
    enc = rot.select(
        F.col(id_col),
        "_cell",
        *[
            assign_expr_with_ids(
                centers_s, ids_s, F.slice("_y", s * sub + 1, sub)
            ).cast("int").alias(f"c{s + 1}")
            for s, (centers_s, ids_s) in enumerate(books)
        ],
    )
    enc.write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(path, "data")
    )
    meta = {
        "id_col": id_col,
        "dim": dim,
        "num_cells": num_cells,
        "m": m,
        "k_codes": k_codes,
        "seed": seed,
        "centers": centers,
        "rotation": [[float(x) for x in row] for row in W],
        "books": [[c, i] for c, i in books],
        **(extra_meta or {}),
    }
    tmp = os.path.join(path, ".index.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "index.json"))
    return centers, W, books


def ivfopq_topk_persisted(
    spark,
    path: str,
    query: list[float],
    topk: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ADC top-k against a persisted IVF-OPQ-PQ index: probe the
    nprobe L2-nearest cells in the RAW space (rotation is applied to
    residuals, so coarse probing is unchanged), rotate each cell's
    query residual on the driver (d×d matvec, model-sized), and run
    the map-only LUT scan over that cell's rotated-residual codes —
    the ``_cell = n`` filters stay PartitionFilters, identical
    file-level pruning to plain IVF-PQ."""
    import json
    import os
    from functools import reduce

    import numpy as np

    with open(os.path.join(path, "index.json")) as fh:
        meta = json.load(fh)
    centers = meta["centers"]
    Wm = np.asarray(meta["rotation"], dtype=np.float64)
    books = [(c, i) for c, i in meta["books"]]
    dim, id_col = meta["dim"], meta["id_col"]
    enc = spark.read.parquet(os.path.join(path, "data"))
    qv = np.asarray([float(x) for x in query], dtype=np.float64)
    probe = sorted(
        range(len(centers)),
        key=lambda i: float(np.sum((np.asarray(centers[i]) - qv) ** 2)),
    )[:nprobe]
    scans = []
    for cell in probe:
        qr = list((qv - np.asarray(centers[cell], dtype=np.float64)) @ Wm)
        scans.append(
            enc.filter(F.col("_cell") == cell).select(
                F.col(id_col), adc_dist_expr(books, qr, dim).alias("adc_d2")
            )
        )
    allc = reduce(DataFrame.unionByName, scans)
    return allc.orderBy("adc_d2", id_col).limit(topk)


def ivfopq_refine_topk(
    spark,
    path: str,
    raw_df: DataFrame,
    query: list[float],
    topk: int = 10,
    refine: int = 4,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage refine over the IVF-OPQ-PQ index — FAISS's
    IndexRefine/"RFlat" pattern, the standard production recall
    recovery: the compressed index shortlists ``topk * refine``
    candidates by ADC (cheap, partition-pruned code scan), then ONLY
    those ids are re-scored EXACTLY against the raw vectors and the
    true top-k of the shortlist is returned.

    Scale shape: the shortlist is model-sized (k·refine ids collected
    to the driver — bounded by the API, not the corpus), so the exact
    pass is a literal IN filter on the raw table: it reaches the
    parquet scan as a pushed filter (row-group pruning on id stats),
    one map-only distance projection, TakeOrderedAndProject. ADC
    quantization error can reorder near-ties; exact re-ranking of the
    shortlist removes that error for every candidate the coarse stage
    surfaced — recall is never below plain ADC at identical probes."""
    cand = [
        r[id_col]
        for r in ivfopq_topk_persisted(
            spark, path, query, topk=topk * refine, nprobe=nprobe
        ).collect()
    ]
    qlit = double_array_lit(query)
    exact = (
        raw_df.filter(F.col(id_col).isin(cand))
        .select(
            F.col(id_col),
            F.aggregate(
                F.zip_with(
                    _as_double_array(vec_col), qlit, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    return exact.orderBy("d2", id_col).limit(topk)
