"""Round-7 hardening pins: the margin-guarded BLAS centroid
assignment (ADVICE r6 #2's distance-margin-guard alternative) must be
bit-identical to the fold-order-exact expression argmin — including on
exact ties and engineered near-ties, where the guard must detect the
ambiguity and route the row through the expression path."""

SF = "/root/testdata/sf0.01"


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, _v array<double>",
    )


class TestGuardedAssignment:
    def test_matches_expr_on_random_corpus_large_k(self, spark):
        """k above the auto threshold: guarded (what auto now runs)
        must equal the expression argmin on every row."""
        import random

        from hybrid_cdc_demo_spark.operators.similarity import (
            assign_cells,
        )

        rng = random.Random(71)
        vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(400)]
        df = _emb(spark, vecs)
        centers = vecs[:80]  # k=80 > 64
        expr = {
            r["vec_id"]: r["_cell"]
            for r in assign_cells(df, centers, method="expr").collect()
        }
        guarded = {
            r["vec_id"]: r["_cell"]
            for r in assign_cells(df, centers, method="guarded").collect()
        }
        auto = {
            r["vec_id"]: r["_cell"]
            for r in assign_cells(df, centers, method="auto").collect()
        }
        assert guarded == expr
        assert auto == expr

    def test_exact_ties_take_first_minimum(self, spark):
        """Duplicate centroids: every row is an exact tie, the guard
        must flag it and inherit the expression's first-minimum rule
        (position of the FIRST duplicate), never the BLAS tiebreak."""
        import random

        from hybrid_cdc_demo_spark.operators.similarity import (
            assign_cells,
        )

        rng = random.Random(73)
        vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(50)]
        df = _emb(spark, vecs)
        base = [rng.uniform(-1, 1) for _ in range(8)]
        other = [rng.uniform(-1, 1) for _ in range(8)]
        centers = [other, base, list(base)]  # centers 1 and 2 identical
        rows = assign_cells(df, centers, method="guarded").collect()
        expr = {
            r["vec_id"]: r["_cell"]
            for r in assign_cells(df, centers, method="expr").collect()
        }
        assert {r["vec_id"]: r["_cell"] for r in rows} == expr
        assert all(r["_cell"] != 2 for r in rows)  # first duplicate wins

    def test_engineered_near_tie_equidistant_midpoint(self, spark):
        """A vector EXACTLY equidistant from two distinct centroids:
        the margin is ~0 (inside any error bound), so the guard must
        fall back to the expression and pick the first centroid."""
        from hybrid_cdc_demo_spark.operators.similarity import (
            assign_cells,
        )

        a = [1.0, 0.0, 0.0, 0.0]
        b = [-1.0, 0.0, 0.0, 0.0]
        mid = [0.0, 0.25, -0.5, 0.125]  # equidistant from a and b
        df = _emb(spark, [mid])
        (row,) = assign_cells(df, [a, b], method="guarded").collect()
        (erow,) = assign_cells(df, [a, b], method="expr").collect()
        assert row["_cell"] == erow["_cell"] == 0

    def test_k_equals_one_always_certain(self, spark):
        from hybrid_cdc_demo_spark.operators.similarity import (
            assign_cells,
        )

        df = _emb(spark, [[0.5, 0.5], [1.5, -0.5]])
        rows = assign_cells(df, [[0.0, 0.0]], method="guarded").collect()
        assert [r["_cell"] for r in rows] == [0, 0]

    def test_semantic_dedup_guarded_equals_expr_pairs(self, spark):
        """The catalog configuration end-to-end: SemDeDup pairs under
        guarded assignment must equal the expr-pinned pairs exactly."""
        from hybrid_cdc_demo_spark.operators.clustering import (
            semantic_dedup,
        )
        from hybrid_cdc_demo_spark.sources.tables import load_table

        emb = load_table(spark, SF, "embeddings")
        key = lambda r: (r["cluster"], r["id_a"], r["id_b"], r["cos"])
        a = sorted(
            map(
                key,
                semantic_dedup(
                    emb, k=8, seed_by="id", assign_method="expr"
                ).collect(),
            )
        )
        g = sorted(
            map(
                key,
                semantic_dedup(
                    emb, k=8, seed_by="id", assign_method="guarded"
                ).collect(),
            )
        )
        assert a == g and len(a) > 0
