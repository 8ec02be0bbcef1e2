"""Product quantization (operators/clustering.py pq_*).

ns_pq_encode's train->encode pipeline is hash-checked per subspace by
the generated-SQL oracle sweep; these tests pin the ADC search
quality (recall vs exact top-k), the reconstruction property on
planted clusters, and the plan shapes (map-only encode, distributed
top-k scan).
"""

import math
import random

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.clustering import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)

SF = "/root/testdata/sf0.001"


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )


def _planted(seed=13, n=120, dim=8, groups=4):
    rng = random.Random(seed)
    anchors = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(groups)]
    vecs = []
    for i in range(n):
        a = anchors[i % groups]
        vecs.append([x + rng.gauss(0, 0.02) for x in a])
    return vecs, anchors


def test_planted_clusters_share_codes(spark):
    vecs, _ = _planted()
    df = _emb(spark, vecs)
    books = pq_train(df, dim=8, m=2, k=4, seed_by="id")
    codes = {r["vec_id"]: (r["c1"], r["c2"]) for r in pq_encode(df, books, dim=8).collect()}
    # members of the same planted group must collapse to one codeword
    for g in range(4):
        group_codes = {codes[i] for i in range(len(vecs)) if i % 4 == g}
        assert len(group_codes) == 1, f"group {g} split across {group_codes}"
    # distinct groups must not all collapse together
    assert len({codes[g] for g in range(4)}) > 1


def test_adc_topk_retrieves_query_group(spark):
    """PQ quantizes away the within-cluster noise, so exact noise-level
    ranking is unrecoverable BY DESIGN — the retrieval contract is at
    the cluster level: every ADC top-k hit must come from the query's
    planted group, and its ADC distance must sit far below any other
    group's."""
    vecs, _ = _planted(seed=29, n=200, dim=16)
    df = _emb(spark, vecs)
    q = vecs[0]
    books = pq_train(df, dim=16, m=4, k=8, seed_by="id")
    rows = pq_adc_topk(df, books, q, dim=16, topk=10).collect()
    assert all(r["vec_id"] % 4 == 0 for r in rows), rows  # group 0 only
    all_d = {
        r["vec_id"]: r["adc_d2"]
        for r in pq_adc_topk(df, books, q, dim=16, topk=200).collect()
    }
    worst_same = max(all_d[i] for i in all_d if i % 4 == 0)
    best_other = min(all_d[i] for i in all_d if i % 4 != 0)
    assert worst_same < best_other


def test_adc_distance_approximates_exact(spark):
    vecs, _ = _planted(seed=31, n=80, dim=8)
    df = _emb(spark, vecs)
    q = vecs[1]
    books = pq_train(df, dim=8, m=2, k=4, seed_by="id")
    rows = pq_adc_topk(df, books, q, dim=8, topk=80).collect()
    for r in rows:
        exact = sum((a - b) ** 2 for a, b in zip(vecs[r["vec_id"]], q))
        # quantization error scales with distance (the corpus vector is
        # replaced by its centroid): tight near zero, relative farther out
        assert math.isclose(r["adc_d2"], exact, rel_tol=0.15, abs_tol=0.05), (
            r, exact,
        )


def test_pq_encode_plan_is_map_only(spark):
    vecs, _ = _planted(n=40, dim=8)
    df = _emb(spark, vecs)
    books = pq_train(df, dim=8, m=2, k=4, seed_by="id")
    plan = pq_encode(df, books, dim=8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_pq_encode_guarded_matches_expr(spark):
    """The r11 Arrow encode (one GEMM + margin proof per subspace)
    must emit code-identical tables to the nested-literal expression
    path — including on exact ties, which land in the uncertain band
    by construction and inherit the expression's first-minimum rule."""
    rng = random.Random(41)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(300)]
    df = _emb(spark, vecs)
    books = pq_train(df, dim=16, m=4, k=6, seed_by="id")
    expr = sorted(
        tuple(r) for r in pq_encode(df, books, dim=16, method="expr").collect()
    )
    grd = sorted(
        tuple(r)
        for r in pq_encode(df, books, dim=16, method="guarded").collect()
    )
    assert expr == grd
    # adversarial ties: duplicated centroids make every row's top-2
    # margin exactly zero — the fallback must reproduce the
    # first-minimum-in-centroid-order rule
    dup_books = [(c + c, list(range(len(c) * 2))) for c, _ in books]
    e2 = sorted(
        tuple(r)
        for r in pq_encode(df, dup_books, dim=16, method="expr").collect()
    )
    g2 = sorted(
        tuple(r)
        for r in pq_encode(df, dup_books, dim=16, method="guarded").collect()
    )
    assert e2 == g2


def test_pq_encode_guarded_matches_expr_testdata(spark):
    """The exact call ns_pq_encode makes, on the real testdata slice."""
    from hybrid_cdc_demo_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    train = emb.filter(F.col("vec_id") < 500)
    books = pq_train(
        train, dim=64, m=4, k=8, iters=2, exact_fold=True, seed_by="id",
        mode="driver",
    )
    expr = sorted(
        tuple(r) for r in pq_encode(emb, books, dim=64, method="expr").collect()
    )
    grd = sorted(
        tuple(r)
        for r in pq_encode(emb, books, dim=64, method="guarded").collect()
    )
    assert expr == grd


def test_adc_plan_is_distributed_topk(spark):
    vecs, _ = _planted(n=40, dim=8)
    df = _emb(spark, vecs)
    books = pq_train(df, dim=8, m=2, k=4, seed_by="id")
    plan = (
        pq_adc_topk(df, books, vecs[0], dim=8, topk=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_dim_not_divisible_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        pq_train(_emb(spark, [[1.0, 2.0, 3.0]]), dim=3, m=2, k=2)


def test_adc_is_exact_on_centroid_members(spark):
    """ADC property: when a corpus vector IS a codebook centroid in
    every subspace, the quantization error is zero and the ADC
    distance must equal the exact squared L2 bit for bit (LUT entries
    are the exact per-subspace distances)."""
    # 4 distinct anchor vectors, k=4 codebooks with zero noise: every
    # vector quantizes to itself
    anchors = [
        [1.0, 0.0, 2.0, -1.0],
        [-3.0, 0.5, 0.0, 4.0],
        [0.25, -0.75, 1.5, 2.0],
        [5.0, 5.0, -5.0, -5.0],
    ]
    vecs = [anchors[i % 4] for i in range(40)]
    df = _emb(spark, vecs)
    books = pq_train(df, dim=4, m=2, k=4, seed_by="id")
    q = [0.1, 0.2, 0.3, 0.4]
    rows = pq_adc_topk(df, books, q, dim=4, topk=40).collect()
    for r in rows:
        exact = sum((a - b) ** 2 for a, b in zip(vecs[r["vec_id"]], q))
        assert math.isclose(r["adc_d2"], exact, rel_tol=1e-12), r


def test_ivfpq_residual_recall(spark):
    """IVF-PQ composition: on planted clusters, probing a few cells
    must retrieve the query's planted group; residual encoding keeps
    ADC distances near exact within the probed cells."""
    from hybrid_cdc_demo_spark.operators.clustering import ivfpq_topk

    vecs, _ = _planted(seed=41, n=160, dim=16)
    df = _emb(spark, vecs)
    q = vecs[0]
    rows = ivfpq_topk(
        df, q, dim=16, num_cells=8, nprobe=3, m=4, k_codes=8, topk=10
    ).collect()
    assert len(rows) == 10
    assert all(r["vec_id"] % 4 == 0 for r in rows), rows  # query's group
    for r in rows:
        exact = sum((a - b) ** 2 for a, b in zip(vecs[r["vec_id"]], q))
        assert abs(r["adc_d2"] - exact) < 0.1, (r, exact)


def test_ivfpq_full_probe_covers_all_cells(spark):
    from hybrid_cdc_demo_spark.operators.clustering import ivfpq_topk

    vecs, _ = _planted(seed=43, n=60, dim=8)
    df = _emb(spark, vecs)
    rows = ivfpq_topk(
        df, vecs[2], dim=8, num_cells=4, nprobe=4, m=2, k_codes=4, topk=60
    ).collect()
    assert len(rows) == 60  # nprobe == num_cells -> every vector scanned
    assert len({r["vec_id"] for r in rows}) == 60


def test_ivfpq_plan_no_join_distributed_topk(spark):
    from hybrid_cdc_demo_spark.operators.clustering import ivfpq_topk

    vecs, _ = _planted(seed=47, n=60, dim=8)
    df = _emb(spark, vecs)
    out = ivfpq_topk(df, vecs[0], dim=8, num_cells=4, nprobe=2, m=2, k_codes=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ns_simsearch_ivfpq_contract(spark):
    from hybrid_cdc_demo_spark.plans import QUERIES

    df = QUERIES["ns_simsearch_ivfpq"](spark, SF)
    assert df.dtypes == [("vec_id", "bigint"), ("adc_d2", "double")]
    rows = df.collect()
    assert len(rows) == 10
    dists = [r["adc_d2"] for r in rows]
    assert dists == sorted(dists)
    # the query vector is corpus member 0 -> residual quantization error
    # is small enough that it must retrieve itself first
    assert rows[0]["vec_id"] == 0


def test_ivfpq_persisted_prunes_partitions(spark, tmp_path):
    """The persisted IVF-PQ probe must scan only the probed cells'
    code files: _cell filters are PartitionFilters, and the files
    actually read are a subset of the probed cell directories."""
    from hybrid_cdc_demo_spark.operators.clustering import (
        ivfpq_topk_persisted,
        ivfpq_write,
    )

    vecs, _ = _planted(seed=53, n=120, dim=8)
    df = _emb(spark, vecs)
    path = str(tmp_path / "ivfpq")
    ivfpq_write(df, path, dim=8, num_cells=6, m=2, k_codes=4, seed=7)
    out = ivfpq_topk_persisted(spark, path, vecs[0], topk=5, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and any("_cell" in ln for ln in pf_lines), plan
    import re

    probed = {int(x) for x in re.findall(r"_cell#\d+L?\s*=\s*(\d+)", plan)}
    assert len(probed) == 2
    # files ACTUALLY touched at execution are only the probed cells'
    enc = spark.read.parquet(path + "/data")
    touched = [
        r[0]
        for r in enc.filter(F.col("_cell").isin(list(probed)))
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    assert touched and all(
        any(f"_cell={c}" in f for c in probed) for f in touched
    ), touched


class TestIVFOPQ:
    """OPQ rotation composed with IVF residual PQ — the FAISS
    OPQMatrix+IVFPQ production layout. The rotation must not hurt
    recall vs plain IVF-PQ at identical (cells, m, k, probes), must
    stay orthogonal, and the persisted scan must keep file-level
    partition pruning."""

    def test_recall_not_worse_than_ivfpq_same_probes(self, spark, tmp_path):
        from hybrid_cdc_demo_spark.operators.clustering import (
            ivfopq_topk_persisted,
            ivfopq_write,
            ivfpq_topk,
        )
        from hybrid_cdc_demo_spark.operators.similarity import (
            brute_force_topk,
        )

        vecs, _ = _planted(seed=61, n=160, dim=16)
        df = _emb(spark, vecs)
        q = vecs[0]
        qdf = spark.createDataFrame([(q,)], "qv array<double>")
        exact = {
            r["vec_id"] for r in brute_force_topk(df, qdf, k=10).collect()
        }
        pq_ids = {
            r["vec_id"]
            for r in ivfpq_topk(
                df, q, dim=16, num_cells=8, nprobe=3, m=4, k_codes=8,
                topk=10,
            ).collect()
        }
        path = str(tmp_path / "ivfopq")
        ivfopq_write(df, path, dim=16, num_cells=8, m=4, k_codes=8, seed=42)
        opq_ids = {
            r["vec_id"]
            for r in ivfopq_topk_persisted(
                spark, path, q, topk=10, nprobe=3
            ).collect()
        }
        assert len(opq_ids & exact) >= len(pq_ids & exact)
        assert all(i % 4 == 0 for i in opq_ids)  # query's planted group

    def test_rotation_orthogonal_in_sidecar(self, spark, tmp_path):
        import json
        import os

        import numpy as np

        from hybrid_cdc_demo_spark.operators.clustering import ivfopq_write

        vecs, _ = _planted(seed=67, n=100, dim=8)
        df = _emb(spark, vecs)
        path = str(tmp_path / "ivfopq")
        ivfopq_write(df, path, dim=8, num_cells=4, m=2, k_codes=4, seed=5)
        with open(os.path.join(path, "index.json")) as fh:
            meta = json.load(fh)
        W = np.asarray(meta["rotation"])
        assert W.shape == (8, 8)
        assert np.abs(W.T @ W - np.eye(8)).max() < 1e-9

    def test_persisted_prunes_partitions(self, spark, tmp_path):
        import re

        from hybrid_cdc_demo_spark.operators.clustering import (
            ivfopq_topk_persisted,
            ivfopq_write,
        )

        vecs, _ = _planted(seed=71, n=120, dim=8)
        df = _emb(spark, vecs)
        path = str(tmp_path / "ivfopq")
        ivfopq_write(df, path, dim=8, num_cells=6, m=2, k_codes=4, seed=7)
        out = ivfopq_topk_persisted(spark, path, vecs[0], topk=5, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf_lines and any("_cell" in ln for ln in pf_lines), plan
        probed = {int(x) for x in re.findall(r"_cell#\d+L?\s*=\s*(\d+)", plan)}
        assert len(probed) == 2

    def test_ns_simsearch_ivfopq_contract(self, spark):
        from hybrid_cdc_demo_spark.plans import QUERIES

        df = QUERIES["ns_simsearch_ivfopq"](spark, SF)
        assert df.dtypes == [("vec_id", "bigint"), ("adc_d2", "double")]
        rows = df.collect()
        assert len(rows) == 10
        dists = [r["adc_d2"] for r in rows]
        assert dists == sorted(dists)
        assert rows[0]["vec_id"] == 0  # self-retrieval

    def test_catalog_recall_not_worse_than_ivfpq(self, spark):
        """On the shared catalog corpus: overlap with the exact cosine
        top-10 for query 0 must be >= plain IVF-PQ's (same nprobe)."""
        import pyspark.sql.functions as F

        from hybrid_cdc_demo_spark.operators.similarity import (
            brute_force_topk,
        )
        from hybrid_cdc_demo_spark.plans import QUERIES
        from hybrid_cdc_demo_spark.sources.tables import load_table

        emb = load_table(spark, SF, "embeddings")
        q = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0][
                "embedding"
            ]
        ]
        qdf = spark.createDataFrame([(q,)], "qv array<double>")
        exact = {
            r["vec_id"] for r in brute_force_topk(emb, qdf, k=10).collect()
        }
        pq_ids = {
            r["vec_id"]
            for r in QUERIES["ns_simsearch_ivfpq"](spark, SF).collect()
        }
        opq_ids = {
            r["vec_id"]
            for r in QUERIES["ns_simsearch_ivfopq"](spark, SF).collect()
        }
        assert len(opq_ids & exact) >= len(pq_ids & exact)


class TestRefineAndBinary:
    """Round-7 surplus ANN tiers: two-stage exact refine (FAISS
    IndexRefine) and 1-bit binary quantization."""

    def test_ns_simsearch_refine_contract(self, spark):
        import pyspark.sql.functions as F

        from hybrid_cdc_demo_spark.plans import QUERIES
        from hybrid_cdc_demo_spark.sources.tables import load_table

        df = QUERIES["ns_simsearch_refine"](spark, SF)
        assert df.dtypes == [("vec_id", "bigint"), ("d2", "double")]
        rows = df.collect()
        assert len(rows) == 10
        dists = [r["d2"] for r in rows]
        assert dists == sorted(dists)
        assert rows[0]["vec_id"] == 0 and rows[0]["d2"] == 0.0
        # the refine stage is EXACT: every returned d2 must equal the
        # brute-force L2 for that id, bitwise (same zip_with fold)
        emb = load_table(spark, SF, "embeddings")
        q = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0][
                "embedding"
            ]
        ]
        qlit = F.array(*[F.lit(x) for x in q])
        ids = [r["vec_id"] for r in rows]
        truth = {
            r["vec_id"]: r["d2"]
            for r in emb.filter(F.col("vec_id").isin(ids))
            .select(
                "vec_id",
                F.aggregate(
                    F.zip_with(
                        F.transform("embedding", lambda x: x.cast("double")),
                        qlit,
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d2"),
            )
            .collect()
        }
        for r in rows:
            assert r["d2"] == truth[r["vec_id"]]

    def test_refine_recall_not_worse_than_adc(self, spark):
        import pyspark.sql.functions as F

        from hybrid_cdc_demo_spark.operators.similarity import (
            brute_force_topk,
        )
        from hybrid_cdc_demo_spark.plans import QUERIES
        from hybrid_cdc_demo_spark.sources.tables import load_table

        emb = load_table(spark, SF, "embeddings")
        q = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0][
                "embedding"
            ]
        ]
        qdf = spark.createDataFrame([(q,)], "qv array<double>")
        exact = {
            r["vec_id"] for r in brute_force_topk(emb, qdf, k=10).collect()
        }
        adc = {
            r["vec_id"]
            for r in QUERIES["ns_simsearch_ivfopq"](spark, SF).collect()
        }
        ref = {
            r["vec_id"]
            for r in QUERIES["ns_simsearch_refine"](spark, SF).collect()
        }
        assert len(ref & exact) >= len(adc & exact)

    def test_binary_hamming_planted_and_plan(self, spark):
        from hybrid_cdc_demo_spark.operators.similarity import (
            binary_hamming_topk,
            pack_sign_bits,
        )

        vecs, _ = _planted(seed=73, n=120, dim=16)
        df = _emb(spark, vecs)
        out = binary_hamming_topk(df, vecs[0], dim=16, topk=10)
        rows = out.collect()
        assert rows[0]["vec_id"] == 0 and rows[0]["hamming"] == 0
        # brute-force python twin over the packed words
        qw = pack_sign_bits(vecs[0], 16)
        def ham(v):
            return sum(
                bin(a ^ b).count("1") for a, b in zip(pack_sign_bits(v, 16), qw)
            )
        truth = sorted((ham(v), i) for i, v in enumerate(vecs))[:10]
        assert [(r["hamming"], r["vec_id"]) for r in rows] == truth
        # map-only + distributed top-k: no join, no hash exchange
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Join" not in plan
        assert "Exchange hashpartitioning" not in plan


def test_ivfpq_persisted_matches_inline(spark, tmp_path):
    from hybrid_cdc_demo_spark.operators.clustering import (
        ivfpq_topk,
        ivfpq_topk_persisted,
        ivfpq_write,
    )

    vecs, _ = _planted(seed=59, n=100, dim=8)
    df = _emb(spark, vecs)
    path = str(tmp_path / "ivfpq")
    ivfpq_write(df, path, dim=8, num_cells=4, m=2, k_codes=4, seed=3)
    a = ivfpq_topk_persisted(spark, path, vecs[5], topk=8, nprobe=2).collect()
    b = ivfpq_topk(
        df, vecs[5], dim=8, num_cells=4, nprobe=2, m=2, k_codes=4, topk=8,
        seed=3,
    ).collect()
    assert [(r["vec_id"], r["adc_d2"]) for r in a] == [
        (r["vec_id"], r["adc_d2"]) for r in b
    ]


class TestOPQ:
    """OPQ (Ge et al. 2013): learned orthogonal pre-rotation for PQ.
    The alternation must keep the rotation orthogonal, reduce the
    quantization error vs plain PQ, and the rotated ADC search must
    retrieve at least as well as plain PQ."""

    def test_rotation_orthogonal_and_error_decreases(self, spark):
        import numpy as np

        from hybrid_cdc_demo_spark.operators.clustering import opq_train

        vecs, _ = _planted(seed=23, n=150, dim=8, groups=4)
        df = _emb(spark, vecs)
        W, books, history = opq_train(
            df, dim=8, m=2, k=4, iters=4, seed_by="id"
        )
        assert np.abs(W.T @ W - np.eye(8)).max() < 1e-9
        assert len(history) == 4  # seed baseline + 3 joint updates
        # final rotated-space error never worse than plain PQ (iter 0)
        assert history[-1] <= history[0] + 1e-12
        assert len(books) == 2 and all(len(c) <= 4 for c, _ in books)

    def test_opq_adc_recall_not_worse_than_pq(self, spark):
        from hybrid_cdc_demo_spark.operators.clustering import (
            opq_adc_topk,
            opq_train,
        )
        from hybrid_cdc_demo_spark.operators.similarity import (
            brute_force_topk,
        )

        vecs, _ = _planted(seed=31, n=160, dim=8, groups=4)
        df = _emb(spark, vecs)
        q = vecs[7]
        qdf = spark.createDataFrame([(q,)], "qv array<double>")
        exact = {
            r["vec_id"] for r in brute_force_topk(df, qdf, k=10).collect()
        }
        books_pq = pq_train(df, dim=8, m=2, k=4, iters=2, seed_by="id")
        pq_ids = {
            r["vec_id"]
            for r in pq_adc_topk(df, books_pq, q, dim=8, topk=10).collect()
        }
        W, books, _ = opq_train(
            df, dim=8, m=2, k=4, iters=3, seed_by="id"
        )
        opq_ids = {
            r["vec_id"]
            for r in opq_adc_topk(df, W, books, q, dim=8, topk=10).collect()
        }
        assert len(opq_ids & exact) >= len(pq_ids & exact)
        # every retrieved id must come from the query's planted group
        # (i % 4 == 7 % 4): within-group ranking is tie-dominated at
        # k=4 codes, but cross-group confusion would be a real bug
        assert all(i % 4 == 3 for i in opq_ids)

    def test_empty_training_set_raises_clearly(self, spark):
        """ADVICE r6 #3: a degenerate (empty) training set must raise
        a clear ValueError on the driver, not fail deep in an executor
        with an argmin-over-zero-width-matrix error — and must never
        silently record a 0.0 error history."""
        import pytest as _pytest

        from hybrid_cdc_demo_spark.operators.clustering import opq_train

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError, match="empty training set"):
            opq_train(empty, dim=8, m=2, k=4, iters=2, seed_by="id")

    def test_ns_opq_rotation_contract(self, spark):
        from hybrid_cdc_demo_spark.plans import QUERIES

        rows = (
            QUERIES["ns_opq_rotation"](spark, SF).orderBy("iter").collect()
        )
        assert [r["iter"] for r in rows] == [0, 1, 2, 3]
        assert all(r["orth_residual"] < 1e-9 for r in rows)
        assert rows[-1]["mean_qerror"] <= rows[0]["mean_qerror"] + 1e-9
        assert rows[0]["mean_qerror"] > 0.0

    def test_ns_simsearch_opq_contract(self, spark):
        from hybrid_cdc_demo_spark.plans import QUERIES

        df = QUERIES["ns_simsearch_opq"](spark, SF)
        assert df.dtypes == [
            ("rank", "int"),
            ("vec_id", "bigint"),
            ("adc_d2", "double"),
        ]
        rows = df.orderBy("rank").collect()
        assert len(rows) == 10
        assert rows[0]["vec_id"] == 0  # the query vector retrieves itself
        d2 = [r["adc_d2"] for r in rows]
        assert d2 == sorted(d2)

    def test_rotate_vecs_is_map_only(self, spark):
        import numpy as np

        from hybrid_cdc_demo_spark.operators.clustering import rotate_vecs

        vecs, _ = _planted(seed=5, n=40, dim=8)
        df = _emb(spark, vecs)
        rotated = rotate_vecs(df, np.eye(8), "vec_id", "embedding")
        plan = rotated._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        got = {r["vec_id"]: list(r["_y"]) for r in rotated.collect()}
        for i, v in enumerate(vecs):  # identity rotation: unchanged
            assert max(abs(a - b) for a, b in zip(got[i], v)) < 1e-12


class TestBinaryPersistedAndRescore:
    """Round-7: the persisted 1-bit index and the BQ oversample-then-
    rescore composition."""

    def test_persisted_matches_inline(self, spark, tmp_path):
        from hybrid_cdc_demo_spark.operators.similarity import (
            binary_hamming_topk,
            binary_topk_persisted,
            binary_write,
        )

        vecs, _ = _planted(seed=79, n=100, dim=16)
        df = _emb(spark, vecs)
        path = str(tmp_path / "bin")
        binary_write(df, path, dim=16)
        a = binary_topk_persisted(spark, path, vecs[3], topk=8).collect()
        b = binary_hamming_topk(df, vecs[3], dim=16, topk=8).collect()
        assert [(r["vec_id"], r["hamming"]) for r in a] == [
            (r["vec_id"], r["hamming"]) for r in b
        ]

    def test_rescore_recall_not_worse_than_binary_order(self, spark):
        """Exact rescoring of the Hamming shortlist must rank by TRUE
        cosine: every returned score equals brute force for that id,
        and overlap with the exact top-k is >= the raw Hamming
        ordering's overlap."""
        import pyspark.sql.functions as F

        from hybrid_cdc_demo_spark.operators.similarity import (
            binary_hamming_topk,
            binary_rescore_topk,
            brute_force_topk,
        )
        from hybrid_cdc_demo_spark.sources.tables import load_table

        emb = load_table(spark, SF, "embeddings")
        q = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0][
                "embedding"
            ]
        ]
        qdf = spark.createDataFrame([(q,)], "qv array<double>")
        exact_rows = brute_force_topk(emb, qdf, k=10).collect()
        exact = {r["vec_id"] for r in exact_rows}
        truth = {r["vec_id"]: r["score"] for r in exact_rows}
        ham = {
            r["vec_id"]
            for r in binary_hamming_topk(emb, q, dim=64, topk=10).collect()
        }
        res_rows = binary_rescore_topk(emb, q, dim=64, topk=10).collect()
        res = {r["vec_id"] for r in res_rows}
        assert len(res & exact) >= len(ham & exact)
        assert res_rows[0]["vec_id"] == 0  # self-retrieval, score 1.0
        for r in res_rows:  # rescore stage is exact cosine
            if r["vec_id"] in truth:
                assert r["score"] == truth[r["vec_id"]]


class TestDriverTrainParity:
    """pq_train(mode='driver') must be BITWISE identical to the
    distributed exact-fold path — same codebooks (struct-packed double
    comparison, not approximate), same surviving cluster ids — on
    random data, planted clusters (empty-cluster drops exercised), and
    both seeding strategies."""

    def _books_bits(self, books):
        import struct

        return [
            ([tuple(struct.pack(">d", x) for x in c) for c in centers], ids)
            for centers, ids in books
        ]

    def test_bitwise_parity_random(self, spark):
        from hybrid_cdc_demo_spark.operators.clustering import pq_train

        rng = random.Random(88)
        vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(150)]
        df = _emb(spark, vecs)
        dist = pq_train(df, dim=16, m=4, k=6, iters=3, exact_fold=True,
                        seed_by="id")
        drv = pq_train(df, dim=16, m=4, k=6, iters=3, exact_fold=True,
                       seed_by="id", mode="driver")
        assert self._books_bits(drv) == self._books_bits(dist)

    def test_bitwise_parity_planted_with_drops(self, spark):
        from hybrid_cdc_demo_spark.operators.clustering import pq_train

        # only 3 DISTINCT vectors: the 8 id-ordered seeds contain
        # duplicates, every row lands on the FIRST of each duplicate
        # set (first-minimum rule) and the later seeds go empty — the
        # drop policy must match too
        anchors = [[float(g + j) for j in range(8)] for g in range(3)]
        vecs = [anchors[i % 3] for i in range(90)]
        df = _emb(spark, vecs)
        dist = pq_train(df, dim=8, m=2, k=8, iters=2, exact_fold=True,
                        seed_by="id")
        drv = pq_train(df, dim=8, m=2, k=8, iters=2, exact_fold=True,
                       seed_by="id", mode="driver")
        assert self._books_bits(drv) == self._books_bits(dist)
        assert any(len(ids) < 8 for _, ids in drv)  # drops actually happened

    def test_bitwise_parity_hash_seed(self, spark):
        from hybrid_cdc_demo_spark.operators.clustering import pq_train

        rng = random.Random(9)
        vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(60)]
        df = _emb(spark, vecs)
        dist = pq_train(df, dim=8, m=2, k=4, iters=2, exact_fold=True,
                        seed_by="hash")
        drv = pq_train(df, dim=8, m=2, k=4, iters=2, exact_fold=True,
                       seed_by="hash", mode="driver")
        assert self._books_bits(drv) == self._books_bits(dist)

    def test_driver_mode_guards(self, spark):
        import pytest

        from hybrid_cdc_demo_spark.operators.clustering import pq_train

        df = _emb(spark, [[0.0] * 8] * 10)
        with pytest.raises(ValueError, match="exact-fold"):
            pq_train(df, dim=8, m=2, k=2, mode="driver")
        with pytest.raises(ValueError, match="driver-side bound"):
            pq_train(df, dim=8, m=2, k=2, exact_fold=True, mode="driver",
                     max_driver_sample=5)


class TestOPQDriverParity:
    """opq_train(mode='driver') must be BITWISE identical to the
    distributed path: rows are collected with their partition layout
    and the same numpy kernel replays per partition in collect order,
    so (W, books, history) carry the exact same doubles (r10
    optimization — the pq_train/kmeans driver-mode precedent)."""

    def _bits(self, W, books, history):
        import struct

        def d(x):
            return struct.pack(">d", float(x))

        return (
            [tuple(d(x) for x in row) for row in W],
            [([tuple(d(x) for x in c) for c in centers], ids)
             for centers, ids in books],
            [d(h) for h in history],
        )

    def test_bitwise_parity_random(self, spark):
        from hybrid_cdc_demo_spark.operators.clustering import opq_train

        rng = random.Random(17)
        vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(150)]
        df = _emb(spark, vecs)
        dist = opq_train(df, dim=16, m=4, k=6, iters=3, seed_by="id",
                         partitions=4)
        drv = opq_train(df, dim=16, m=4, k=6, iters=3, seed_by="id",
                        partitions=4, mode="driver")
        assert self._bits(*drv) == self._bits(*dist)

    def test_bitwise_parity_query_shape(self, spark):
        """The exact call ns_simsearch_opq makes, on the real testdata
        slice — the shape the optimization actually ships."""
        from hybrid_cdc_demo_spark.operators.clustering import opq_train
        from hybrid_cdc_demo_spark.sources.tables import load_table

        emb = load_table(spark, SF, "embeddings")
        train = emb.filter(F.col("vec_id") < 500)
        dist = opq_train(train, dim=64, m=4, k=8, iters=3, seed_by="id",
                         partitions=4, mode="dist")
        drv = opq_train(train, dim=64, m=4, k=8, iters=3, seed_by="id",
                        partitions=4, mode="driver")
        assert self._bits(*drv) == self._bits(*dist)

    def test_bitwise_parity_unlimited_arrow_batch(self, spark):
        """arrow.maxRecordsPerBatch <= 0 means 'one batch per
        partition' in Spark; the driver replay must chunk the same way
        or its GEMM accumulation order — and the Procrustes rotation —
        diverges from the distributed pass (r10 ADVICE)."""
        from hybrid_cdc_demo_spark.operators.clustering import opq_train

        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old = spark.conf.get(key, None)
        spark.conf.set(key, "0")
        try:
            rng = random.Random(23)
            vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(80)]
            df = _emb(spark, vecs)
            dist = opq_train(df, dim=8, m=2, k=4, iters=2, seed_by="id",
                             partitions=3)
            drv = opq_train(df, dim=8, m=2, k=4, iters=2, seed_by="id",
                            partitions=3, mode="driver")
            assert self._bits(*drv) == self._bits(*dist)
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)

    def test_driver_mode_guards(self, spark):
        import pytest

        from hybrid_cdc_demo_spark.operators.clustering import opq_train

        df = _emb(spark, [[0.0] * 8] * 10)
        with pytest.raises(ValueError, match="driver-side bound"):
            opq_train(df, dim=8, m=2, k=2, mode="driver",
                      max_driver_sample=5)
        with pytest.raises(ValueError, match="unknown mode"):
            opq_train(df, dim=8, m=2, k=2, mode="nope")
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="empty training set"):
            opq_train(empty, dim=8, m=2, k=4, iters=2, seed_by="id",
                      mode="driver")
