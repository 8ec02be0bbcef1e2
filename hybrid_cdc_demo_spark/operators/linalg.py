"""Distributed dense linear algebra over the embedding column: Gram
matrix accumulation and PCA projection — the dimensionality-reduction
leg of an embedding-curation pipeline (whitening before clustering /
near-dup, compressing vectors for ANN).

Scale shape (100 TB posture): the Gram matrix G = Xᵀ X is the classic
"model fits on the driver, data never does" reduction — each partition
folds its rows into a d×d partial (d² doubles, constant size) with
numpy inside Arrow batches, and ONE aggregation shuffle of d²-sized
partials produces the result; eigendecomposition runs on the driver
over d² numbers (bounded model-sized data, same class as the IVF
centroid read), and the projection rides back as a nested literal —
map-only, no join, no shuffle (the kmeans-assign pattern).

Determinism: the numpy fast path sums partials in arrival order (fine
in production, not oracle-matchable). ``exact_fold=True`` computes
each G[i,j] as a strict left fold in ascending vec_id order over
exploded (i, j, xᵢ·xⱼ) terms — bitwise-reproducible and DuckDB-
mirrorable, for the bounded training slice the PCA model derives from
(train-on-sample, project-everything — the production shape, and the
same split ns_kmeans_assign uses).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hybrid_cdc_demo_spark.operators.similarity import (
    _as_double_array,
    double_array_lit,
)


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    dim: int,
    exact_fold: bool = False,
    mode: str = "dist",
    max_driver_sample: int = 200_000,
) -> DataFrame:
    """Upper-triangle Gram matrix G[i,j] = Σ_rows v[i]·v[j] (1-based
    i ≤ j) as a (i, j, v) DataFrame of d(d+1)/2 rows.

    exact_fold=False (production): per-partition numpy outer-product
    partials via mapInPandas, one d²-row aggregation — the scan never
    explodes. exact_fold=True (oracle-matchable): explode the i ≤ j
    terms and fold each cell in sorted vec_id order.

    ``mode="driver"`` (r10, the pq_train mode="driver" precedent)
    computes the SAME ascending-vec_id strict left fold on the
    COLLECTED bounded sample: Python/numpy float64 ``G += vᵢ·vⱼ`` in
    vec_id order is the identical IEEE-754 addition sequence, so every
    cell is BITWISE-equal to the distributed exact fold (pinned in
    tests/test_linalg.py) — without exploding the sample into
    rows × d(d+1)/2 structs and shuffling them to d² reducers just to
    re-serialize 2,080 doubles. The collect is bounded by contract
    (``max_driver_sample`` raises rather than pulling an unbounded
    frame); at 100 TB the flow is unchanged — train-on-sample
    driver-side, the FULL-corpus Gram keeps the mapInPandas partial
    path (exact_fold=False), which never collects row data.
    """
    emb = df.select(F.col(id_col), _as_double_array(vec_col).alias("_v"))
    if mode == "driver":
        if not exact_fold:
            raise ValueError(
                "gram_matrix(mode='driver') implements the exact-fold "
                "update only — the distributed partial-aggregation "
                "order cannot be reproduced driver-side"
            )
        import numpy as np

        rows = emb.collect()
        if len(rows) > max_driver_sample:
            raise ValueError(
                f"gram_matrix(mode='driver'): sample has {len(rows)} "
                f"rows, over the {max_driver_sample} driver-side bound "
                "— pass a bounded training sample (or raise "
                "max_driver_sample deliberately)"
            )
        sample = sorted(
            ((r[0], [float(x) for x in r[1]]) for r in rows),
            key=lambda t: t[0],
        )
        g = np.zeros((dim, dim), dtype=np.float64)
        for _, v in sample:  # ascending id: the exact fold's order
            a = np.asarray(v, dtype=np.float64)
            g += np.outer(a, a)
        iu, ju = np.triu_indices(dim)
        out = [
            (int(i) + 1, int(j) + 1, float(g[i, j])) for i, j in zip(iu, ju)
        ]
        return df.sparkSession.createDataFrame(out, "i int, j int, v double")
    if mode != "dist":
        raise ValueError(f"gram_matrix: unknown mode {mode!r}")
    if exact_fold:
        pairs = F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.transform(
                    F.sequence(i, F.lit(dim)),
                    lambda j: F.struct(
                        i.cast("int").alias("i"),
                        j.cast("int").alias("j"),
                        (F.element_at("_v", i) * F.element_at("_v", j)).alias(
                            "p"
                        ),
                    ),
                ),
            )
        )
        terms = emb.select(id_col, F.explode(pairs).alias("t")).select(
            id_col, "t.i", "t.j", "t.p"
        )
        fold = F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("k"), F.col("p").alias("x")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x.getField("x"),
        )
        return terms.groupBy("i", "j").agg(fold.alias("v"))

    def partial_gram(batches):
        import numpy as np
        import pandas as pd

        acc = np.zeros((dim, dim), dtype=np.float64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            x = np.stack(pdf["_v"].to_numpy())  # rows x dim
            acc += x.T @ x
        if any_rows:
            iu, ju = np.triu_indices(dim)
            yield pd.DataFrame(
                {"i": iu + 1, "j": ju + 1, "v": acc[iu, ju]}
            ).astype({"i": "int32", "j": "int32"})

    partials = emb.mapInPandas(partial_gram, schema="i int, j int, v double")
    return partials.groupBy("i", "j").agg(F.sum("v").alias("v"))


def pca_components(
    gram_rows,
    *,
    dim: int,
    n_components: int,
):
    """Driver-side eigendecomposition of a collected Gram upper
    triangle (d² doubles — model-sized). Returns the top
    ``n_components`` eigenvectors (rows) with a deterministic sign
    convention (largest-|coordinate| positive) and their eigenvalues,
    descending.
    """
    import numpy as np

    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram_rows:
        g[r["i"] - 1, r["j"] - 1] = r["v"]
        g[r["j"] - 1, r["i"] - 1] = r["v"]
    vals, vecs = np.linalg.eigh(g)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T  # n_components x dim
    for c in comps:  # sign convention: largest-|coord| positive
        k = int(np.argmax(np.abs(c)))
        if c[k] < 0.0:
            c *= -1.0
    return comps, vals[order]


def random_orthonormal_basis(dim: int, k: int, seed: int = 42):
    """Seeded random orthonormal k×dim basis (rows orthonormal) — the
    Johnson–Lindenstrauss projection model: a DATA-INDEPENDENT rotation
    that preserves pairwise distances within (1±ε) at k = O(log n/ε²),
    the standard cheap precursor to ANN / near-dup over very wide
    embeddings (no training pass over the corpus at all, unlike PCA).
    Deterministic: fixed-seed gaussian → QR → sign convention
    (largest-|coordinate| positive per row), so the same (dim, k, seed)
    yields the same basis everywhere in one process — which is what
    lets the projection query carry a GENERATED literal-basis oracle
    (the eigh-based PCA basis can't: it depends on the per-sf training
    slice, see tests/test_query_contracts.py PINNED_NO_ORACLE notes)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    g = rng.standard_normal((dim, k))
    q, _ = np.linalg.qr(g)  # dim x k, orthonormal columns
    comps = q.T  # k x dim rows
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0.0:
            c *= -1.0
    return comps


def project_expr(vec: F.Column, component) -> F.Column:
    """Dot product of a vector column against one literal component —
    a strict left fold in index order (deterministic), whole-stage
    codegen'd, no join."""
    lit = double_array_lit(component)
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(
    df: DataFrame,
    components,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Map-only projection of every row onto the literal components:
    scan + one codegen projection, zero shuffles (presentation sort is
    the caller's choice)."""
    v = _as_double_array(vec_col)
    return df.select(
        F.col(id_col),
        *[
            project_expr(v, c).alias(f"pc{k + 1}")
            for k, c in enumerate(components)
        ],
    )
