"""Contract tests for operators/clustering.py (k-means + SemDeDup).

Oracle parity for ns_kmeans_assign / ns_semantic_dedup lives in
test_oracle_parity.py; these tests pin the operator-level invariants
the SQL hash can't see: objective decrease, exact-vs-mean update
agreement, map-only assignment plans, the SemDeDup subset/recall
relationship to brute force, and the skew-guard semantics.
"""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators import clustering as C
from hybrid_cdc_demo_spark.operators.similarity import _as_double_array, cosine
from hybrid_cdc_demo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_kmeans_inertia_decreases(spark, emb):
    """Lloyd's objective must not increase with iterations."""
    vals = []
    for iters in (0, 1, 3):
        centers, ids, assigned = C.kmeans(emb, k=4, iters=iters, seed_by="id")
        row = C.inertia(assigned, centers, ids).collect()[0]
        vals.append(row["inertia"])
        assert row["n_points"] == emb.count()
    assert vals[1] <= vals[0] + 1e-9
    assert vals[2] <= vals[1] + 1e-9


def test_kmeans_exact_fold_matches_mean_update(spark, emb):
    """The deterministic sorted-fold update and the scalable avg
    update compute the same centroids up to FP reassociation."""
    ce, ide, _ = C.kmeans(emb, k=4, iters=2, seed_by="id", exact_fold=True)
    cm, idm, _ = C.kmeans(emb, k=4, iters=2, seed_by="id", exact_fold=False)
    assert ide == idm
    for a, b in zip(ce, cm):
        assert max(abs(x - y) for x, y in zip(a, b)) < 1e-9


def test_kmeans_driver_mode_bitwise_equals_dist(spark, emb):
    """kmeans(mode='driver') replays the exact-fold Lloyd loop on the
    collected bounded sample with the identical IEEE-754 operation
    sequence (r10, the pq_train mode='driver' precedent) — centers and
    surviving ids must be BITWISE equal to the distributed path, for
    both seeding policies and both on_empty policies."""
    for seed_by, on_empty, k, iters in (
        ("id", "drop", 8, 2),
        ("hash", "keep", 5, 3),
    ):
        cd, idd, _ = C.kmeans(
            emb, k=k, iters=iters, seed_by=seed_by, exact_fold=True,
            on_empty=on_empty, partitions=4,
        )
        cv, idv, _ = C.kmeans(
            emb, k=k, iters=iters, seed_by=seed_by, exact_fold=True,
            on_empty=on_empty, mode="driver",
        )
        assert idd == idv
        assert cd == cv  # exact float equality, element-wise


def test_kmeans_driver_mode_bounds_and_policy(spark, emb):
    """The driver-side collect is bounded by contract, and the mean
    (non-exact-fold) update refuses driver mode."""
    with pytest.raises(ValueError, match="max_driver_sample|driver-side bound"):
        C.kmeans(emb, k=4, iters=1, exact_fold=True, mode="driver",
                 max_driver_sample=3)
    with pytest.raises(ValueError, match="exact-fold"):
        C.kmeans(emb, k=4, iters=1, exact_fold=False, mode="driver")


def test_kmeans_assignment_covers_all_clusters(spark, emb):
    _, ids, assigned = C.kmeans(emb, k=4, iters=2, seed_by="hash")
    got = {r["_cluster"] for r in assigned.select("_cluster").distinct().collect()}
    assert got <= set(ids)
    # balanced synthetic corpus: no cluster collapses to empty
    assert len(got) == 4


def test_assignment_plan_is_map_only(spark, emb):
    """The full-corpus assignment pass (the part that scales) must be
    scan + project — no Exchange, no join: the model rides in as a
    nested literal."""
    centers, ids, _ = C.kmeans(emb, k=4, iters=1, seed_by="id")
    full = emb.select("vec_id", _as_double_array("embedding").alias("_v"))
    out = full.select(
        "vec_id", C.assign_expr_with_ids(centers, ids).alias("cluster")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_semantic_dedup_matches_bruteforce_within_clusters(spark, emb):
    """Every emitted pair must be a true >=tau pair, and every
    >=tau pair whose endpoints share a cluster must be emitted —
    SemDeDup is exact within clusters, blind across them."""
    tau = 0.25
    pairs = C.semantic_dedup(emb, k=4, threshold=tau, seed_by="id")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}

    data = emb.select("vec_id", _as_double_array("embedding").alias("_v"))
    centers = C.seed_centers(data, 4, "vec_id", "_v", seed_by="id")
    assigned = data.withColumn(
        "c", C.assign_expr_with_ids(centers, list(range(4)))
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("_v").alias("va"), F.col("c").alias("ca")
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("_v").alias("vb"), F.col("c").alias("cb")
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", "ca", "cb", cosine(F.col("va"), F.col("vb")).alias("cos")
        )
        .filter(F.col("cos") >= tau)
        .collect()
    )
    same_cluster = {(r["id_a"], r["id_b"]) for r in brute if r["ca"] == r["cb"]}
    assert got == same_cluster


def test_semantic_dedup_max_cluster_guard(spark, emb):
    """max_cluster excludes oversized clusters WHOLE (no silent
    mid-cluster truncation): with a cap below every cluster size,
    zero pairs; with a huge cap, identical to unguarded."""
    unguarded = C.semantic_dedup(emb, k=4, threshold=0.2, seed_by="id")
    n_unguarded = unguarded.count()
    assert n_unguarded > 0

    capped = C.semantic_dedup(
        emb, k=4, threshold=0.2, seed_by="id", max_cluster=1
    )
    assert capped.count() == 0

    roomy = C.semantic_dedup(
        emb, k=4, threshold=0.2, seed_by="id", max_cluster=10**9
    )
    assert roomy.count() == n_unguarded


def test_cluster_sizes_sum_to_corpus(spark, emb):
    _, ids, assigned = C.kmeans(emb, k=4, iters=1, seed_by="id")
    sizes = C.cluster_sizes(
        assigned.select(F.col("_cluster").alias("cluster"))
    ).collect()
    assert sum(r["n_members"] for r in sizes) == emb.count()
