"""Round-6 hardening: regression pins for the round-5 ADVICE findings —
mmr_select degenerate-input handling (pool exhaustion, zero-norm
vectors), quality_weighted_dedup's separated ranking/size columns and
NULL-quality behavior, and action-free catalog-query construction via
parquet-footer row counts."""

import pyspark.sql.functions as F
import pytest


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _query_df(spark, qv):
    return spark.createDataFrame(
        [([float(x) for x in qv],)], "qv array<double>"
    )


class TestMMRDegenerate:
    """ADVICE r5 #1: mmr_select must not crash on pool exhaustion and
    must never pick NaN-relevance (zero-norm) rows."""

    def test_pool_exhaustion_returns_fewer_rows(self, spark):
        from hybrid_cdc_demo_spark.operators.similarity import mmr_select

        emb = _emb_df(spark, [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
        q = _query_df(spark, [1.0, 0.5])
        got = mmr_select(emb, q, k=10, lam=0.5, query_vec_col="qv")
        rows = got.orderBy("rank").collect()
        assert len(rows) == 3  # pool of 3, k=10 — no IndexError
        assert [r["rank"] for r in rows] == [1, 2, 3]

    def test_zero_norm_candidates_excluded(self, spark):
        from hybrid_cdc_demo_spark.operators.similarity import mmr_select

        # vec_id 0 is the zero vector: cosine = 0/0 = NaN, which
        # Spark's DESC sort would place above every real score
        emb = _emb_df(spark, [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        q = _query_df(spark, [1.0, 0.0])
        rows = mmr_select(emb, q, k=3, lam=0.5, query_vec_col="qv").collect()
        ids = {r["vec_id"] for r in rows}
        assert 0 not in ids
        assert ids == {1, 2}
        assert all(r["relevance"] == r["relevance"] for r in rows)  # no NaN

    def test_zero_norm_query_yields_empty(self, spark):
        from hybrid_cdc_demo_spark.operators.similarity import mmr_select

        emb = _emb_df(spark, [[1.0, 0.0], [0.0, 1.0]])
        q = _query_df(spark, [0.0, 0.0])
        assert mmr_select(emb, q, k=2, lam=0.5, query_vec_col="qv").count() == 0


class TestQualityWeightedDedupSizes:
    """ADVICE r5 #2: quality_col ranks, size_col (separate) accounts
    the savings; NULL quality never wins; NULL size counts 0."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, quality double, n_bytes long"
        )

    def test_separate_size_col(self, spark):
        from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup

        # The HIGHER fractional quality sits on the HIGHER doc_id, so
        # this can only pass if quality genuinely ranks at its native
        # value — any integer truncation (0.9 and 0.5 both -> 0) would
        # fall back to the lowest-id tiebreak and pick doc 1.
        df = self._df(
            spark,
            [
                (1, "same doc", 0.5, 300),
                (2, "same  doc", 0.9, 100),  # normalizes to same key
                (3, "other", 0.1, 50),
            ],
        )
        got = {
            r["kept_doc_id"]: r
            for r in quality_weighted_dedup(
                df, "text", "doc_id", "quality", size_col="n_bytes"
            ).collect()
        }
        # doc 2 wins on quality (0.9 > 0.5); savings is doc 1's bytes
        assert got[2]["cluster_size"] == 2
        assert got[2]["kept_quality"] == 0.9  # returned untruncated
        assert got[2]["bytes_dropped"] == 300
        assert got[3]["bytes_dropped"] == 0

    def test_fractional_quality_tie_breaks_on_lowest_id(self, spark):
        from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup

        df = self._df(spark, [(7, "dup", 0.4, 10), (4, "dup", 0.4, 20)])
        (row,) = quality_weighted_dedup(
            df, "text", "doc_id", "quality", size_col="n_bytes"
        ).collect()
        assert row["kept_doc_id"] == 4
        assert row["kept_quality"] == 0.4

    def test_null_quality_never_wins(self, spark):
        from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup

        df = self._df(
            spark,
            [
                (1, "dup", None, 500),
                (2, "dup", 0.1, 200),
            ],
        )
        (row,) = quality_weighted_dedup(
            df, "text", "doc_id", "quality", size_col="n_bytes"
        ).collect()
        assert row["kept_doc_id"] == 2  # NULL quality loses to any real score
        assert row["bytes_dropped"] == 500

    def test_all_null_quality_cluster_still_deterministic(self, spark):
        from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup

        df = self._df(spark, [(5, "dup", None, 10), (3, "dup", None, None)])
        (row,) = quality_weighted_dedup(
            df, "text", "doc_id", "quality", size_col="n_bytes"
        ).collect()
        assert row["kept_doc_id"] == 3  # lowest-id tiebreak
        assert row["kept_quality"] is None  # honest: no quality known
        assert row["bytes_dropped"] == 10  # NULL size counted 0

    def test_default_size_col_is_quality_col(self, spark):
        """Back-compat: the only production caller passes n_chars as
        both ranking and size — one arg, unchanged output."""
        from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup

        df = spark.createDataFrame(
            [(1, "dup", 100), (2, "dup", 40)],
            "doc_id long, text string, n_chars long",
        )
        (row,) = quality_weighted_dedup(df, "text", "doc_id", "n_chars").collect()
        assert row["kept_doc_id"] == 1
        assert row["kept_quality"] == 100
        assert row["bytes_dropped"] == 40


class TestFooterRowCounts:
    """ADVICE r5 #3: corpus-size-dependent query shapes read n from
    parquet footers (memoized, no Spark job)."""

    def test_matches_spark_count(self, spark, sf_dir):
        from hybrid_cdc_demo_spark.sources.tables import (
            load_table,
            table_num_rows,
        )

        for t in ("documents", "embeddings", "lineitem"):
            assert table_num_rows(sf_dir, t) == load_table(
                spark, sf_dir, t
            ).count()

    def test_memoized(self, sf_dir):
        from hybrid_cdc_demo_spark.sources import tables

        n1 = tables.table_num_rows(sf_dir, "documents")
        assert (sf_dir, "documents") in tables._NUM_ROWS_CACHE
        assert tables.table_num_rows(sf_dir, "documents") == n1

    def test_directory_of_part_files(self, spark, tmp_path):
        from hybrid_cdc_demo_spark.sources.tables import table_num_rows

        df = spark.range(1000).withColumnRenamed("id", "doc_id")
        df.repartition(4).write.parquet(str(tmp_path / "documents.parquet"))
        assert table_num_rows(str(tmp_path), "documents") == 1000

    def test_cache_invalidates_on_regenerated_files(self, spark, tmp_path):
        """ADVICE r6 #4: regenerating the parquet at the same path must
        refresh the memoized count — the entry is stamped with the
        files' (count, size, mtime), not path-forever."""
        from hybrid_cdc_demo_spark.sources.tables import table_num_rows

        target = str(tmp_path / "documents.parquet")
        spark.range(100).withColumnRenamed("id", "doc_id").repartition(
            2
        ).write.parquet(target)
        assert table_num_rows(str(tmp_path), "documents") == 100
        spark.range(250).withColumnRenamed("id", "doc_id").repartition(
            3
        ).write.mode("overwrite").parquet(target)
        assert table_num_rows(str(tmp_path), "documents") == 250

    def test_semantic_dedup_builds_without_count_job(
        self, spark, sf_dir, monkeypatch
    ):
        """Building the query must not run a full-corpus count() — n
        comes from footer metadata now. (The bounded k-seed collect is
        the literal-argmin design and stays; this pins only the eager
        count ADVICE r5 #3 flagged.)"""
        from pyspark.sql import DataFrame

        from hybrid_cdc_demo_spark.plans import QUERIES

        def _no_count(self):
            raise AssertionError("count() during query construction")

        monkeypatch.setattr(DataFrame, "count", _no_count)
        QUERIES["ns_semantic_dedup"](spark, sf_dir)  # build only


class TestNumpyCentroidAssignment:
    """The BLAS assignment path (semantic_dedup's scale form once
    k > ASSIGN_NUMPY_THRESHOLD — k grows with the corpus, so the
    interpreted literal-argmin's n*k*d work would grow quadratically)."""

    def test_matches_expression_path(self, spark, sf_dir):
        from hybrid_cdc_demo_spark.operators.clustering import (
            assign_cells_np,
            assign_expr_with_ids,
            seed_centers,
        )
        from hybrid_cdc_demo_spark.operators.similarity import _as_double_array
        from hybrid_cdc_demo_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double_array("embedding").alias("_v")
        )
        centers = seed_centers(emb, 8, "vec_id", "_v", seed_by="id")
        ids = [10, 11, 12, 13, 14, 15, 16, 17]  # non-positional ids
        via_expr = {
            r["vec_id"]: r["_cluster"]
            for r in emb.withColumn(
                "_cluster", assign_expr_with_ids(centers, ids)
            ).collect()
        }
        via_np = {
            r["vec_id"]: r["cluster"]
            for r in assign_cells_np(emb, centers, ids, "vec_id", "_v").collect()
        }
        assert via_np == via_expr

    def test_semantic_dedup_pairs_identical_both_paths(self, spark, sf_dir):
        from hybrid_cdc_demo_spark.operators.clustering import semantic_dedup
        from hybrid_cdc_demo_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        key = lambda r: (r["cluster"], r["id_a"], r["id_b"], round(r["cos"], 9))
        a = sorted(
            map(key, semantic_dedup(emb, k=8, seed_by="id",
                                    assign_method="expr").collect())
        )
        b = sorted(
            map(key, semantic_dedup(emb, k=8, seed_by="id",
                                    assign_method="numpy").collect())
        )
        assert a == b and len(a) > 0

    def test_auto_threshold(self):
        from hybrid_cdc_demo_spark.operators import clustering as C

        # auto flips off the pure expression exactly above the
        # threshold (to the margin-GUARDED BLAS path since r7)
        assert C.ASSIGN_NUMPY_THRESHOLD == 64
