"""Unit tests for the text-metrics tier: character entropy, Zipf
slope, hard-negative mining, and quality-weighted canonical dedup.
Oracle parity at sf0.01 is covered by test_oracle_parity; these pin
the operator semantics on constructed inputs."""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup
from hybrid_cdc_demo_spark.operators.similarity import hard_negatives_topk


def _docs(spark, rows):
    # rows: (doc_id, text); n_chars derived
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows], ["doc_id", "text", "n_chars"]
    )


class TestCharEntropy:
    def _entropy(self, spark, text):
        from hybrid_cdc_demo_spark.plans.textmetrics_queries import (
            ns_text_entropy,
        )
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            _docs(spark, [(0, text)]).withColumn(
                "lang", F.lit("en")
            ).withColumn("source", F.lit("t")).write.parquet(
                os.path.join(d, "documents.parquet")
            )
            rows = ns_text_entropy(spark, d).collect()
        return rows[0]

    def test_uniform_two_symbols_is_one_bit(self, spark):
        r = self._entropy(spark, "abab")
        assert r["entropy"] == 1.0
        assert r["n"] == 4 and r["alphabet"] == 2

    def test_single_symbol_is_zero_bits(self, spark):
        r = self._entropy(spark, "aaaa")
        assert r["entropy"] == 0.0

    def test_known_mixed_distribution(self, spark):
        # 'aabc': p = 1/2, 1/4, 1/4 -> H = 1.5 bits
        r = self._entropy(spark, "aabc")
        assert r["entropy"] == 1.5
        assert r["alphabet"] == 3


class TestZipfSlope:
    def test_exact_zipf_corpus_has_slope_minus_one(self, spark):
        # token k appears 120/k times -> ln f = ln 120 - ln rank,
        # an exact line with slope -1 (ranks tie-broken by token).
        from hybrid_cdc_demo_spark.plans.textmetrics_queries import (
            ns_zipf_slope,
        )
        import os
        import tempfile

        words = []
        for k in range(1, 7):
            words += [f"t{k}"] * (120 // k)
        text = " ".join(words)
        with tempfile.TemporaryDirectory() as d:
            _docs(spark, [(0, text)]).withColumn(
                "lang", F.lit("en")
            ).withColumn("source", F.lit("t")).write.parquet(
                os.path.join(d, "documents.parquet")
            )
            r = ns_zipf_slope(spark, d).collect()[0]
        assert r["n_terms"] == 6
        assert r["slope"] == pytest.approx(-1.0, abs=1e-3)


class TestHardNegatives:
    def test_same_label_neighbors_excluded(self, spark):
        # q = [1,0]; nearest by cosine is same-label v1 -> must be
        # skipped; top negative is the different-label v2.
        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.0], 0),
                (1, [0.99, 0.1], 0),  # same label, most similar
                (2, [0.8, 0.6], 1),
                (3, [0.0, 1.0], 1),
                (4, [-1.0, 0.0], 2),
            ],
            ["vec_id", "embedding", "label"],
        )
        probes = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("embedding").alias("qv"),
        )
        got = hard_negatives_topk(emb, probes, k=3).orderBy("rank").collect()
        assert [r["vec_id"] for r in got] == [2, 3, 4]
        assert all(r["label"] != 0 for r in got)
        assert got[0]["score"] > got[1]["score"] > got[2]["score"]

    def test_rank_is_dense_per_query(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i), 1.0], i % 2) for i in range(8)],
            ["vec_id", "embedding", "label"],
        )
        probes = emb.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("embedding").alias("qv"),
        )
        got = hard_negatives_topk(emb, probes, k=2).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["qid"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2] for v in by_q.values())


class TestMMR:
    @staticmethod
    def _numpy_mmr(vecs, qv, k, lam):
        import numpy as np

        v = np.asarray(vecs, dtype=float)
        q = np.asarray(qv, dtype=float)

        def cos(a, b):
            return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

        rel = [cos(row, q) for row in v]
        picked, order = [], []
        while len(order) < k:
            best, best_s = None, None
            for i in range(len(v)):
                if i in order:
                    continue
                s = lam * rel[i]
                if picked:
                    s -= (1 - lam) * max(cos(v[i], p) for p in picked)
                # tie-break by id, matching the operator
                if best_s is None or s > best_s + 1e-12:
                    best, best_s = i, s
            order.append(best)
            picked.append(v[best])
        return order

    def test_matches_exact_greedy_reference(self, spark):
        import random

        from hybrid_cdc_demo_spark.operators.similarity import mmr_select

        rng = random.Random(11)
        vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
        qv = [rng.uniform(-1, 1) for _ in range(8)]
        emb = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
        )
        q = spark.createDataFrame([(qv,)], ["qv"])
        got = mmr_select(emb, q, k=6, lam=0.7).orderBy("rank").collect()
        want = self._numpy_mmr(vecs, qv, 6, 0.7)
        assert [r["vec_id"] for r in got] == want
        # rank 1 is the plain relevance argmax
        rels = {r["vec_id"]: r["relevance"] for r in got}
        assert got[0]["relevance"] == max(rels.values())

    def test_diversity_beats_plain_topk_on_clustered_corpus(self, spark):
        # two tight clusters; plain top-k returns only cluster A,
        # MMR with strong diversity pressure must mix in cluster B
        from hybrid_cdc_demo_spark.operators.similarity import mmr_select

        a = [[1.0, 0.01 * i, 0.0] for i in range(5)]  # near the query
        b = [[0.0, 0.0, 1.0 + 0.01 * i] for i in range(5)]  # orthogonal
        emb = spark.createDataFrame(
            [(i, v) for i, v in enumerate(a + b)], ["vec_id", "embedding"]
        )
        q = spark.createDataFrame([([1.0, 0.0, 0.0],)], ["qv"])
        got = mmr_select(emb, q, k=4, lam=0.3).collect()
        picked = {r["vec_id"] for r in got}
        assert any(i >= 5 for i in picked), "no cluster-B pick -> no diversity"

    def test_ns_mmr_diverse_pinned(self, spark):
        from hybrid_cdc_demo_spark.plans import QUERIES

        df = QUERIES["ns_mmr_diverse"](spark, "/root/testdata/sf0.001")
        rows = df.orderBy("rank").collect()
        assert df.dtypes == [
            ("rank", "int"),
            ("vec_id", "bigint"),
            ("relevance", "double"),
            ("mmr_score", "double"),
        ]
        assert [r["rank"] for r in rows] == list(range(1, 11))
        ids = [r["vec_id"] for r in rows]
        assert len(set(ids)) == 10
        # probe is the min-id vector -> it is its own best pick
        assert ids[0] == 0 and rows[0]["relevance"] == 1.0

    def test_driver_gate_bitwise_matches_distributed(self, spark):
        """mmr_select's r10 size-gated driver replay must equal the
        distributed greedy loop BITWISE — same picks, same relevance
        and mmr_score doubles — on the real testdata query shape and
        on a tie-heavy synthetic pool."""
        import struct

        from hybrid_cdc_demo_spark.operators.similarity import mmr_select
        from hybrid_cdc_demo_spark.sources.tables import load_table

        def bits(rows):
            return [
                (
                    r["rank"],
                    r["vec_id"],
                    struct.pack(">d", r["relevance"]),
                    struct.pack(">d", r["mmr_score"]),
                )
                for r in rows
            ]

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        qv = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").cast("array<double>").alias("qv")
        )
        drv = mmr_select(emb, qv, k=10, lam=0.7).orderBy("rank").collect()
        dist = (
            mmr_select(emb, qv, k=10, lam=0.7, driver_threshold=0)
            .orderBy("rank")
            .collect()
        )
        assert bits(drv) == bits(dist)

        # tie-heavy pool: duplicated vectors force the id tie-break
        vecs = [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                [0.0, 1.0, 0.0], [0.6, 0.8, 0.0]]
        pool = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        q2 = spark.createDataFrame([([1.0, 0.0, 0.0],)], "qv array<double>")
        a = mmr_select(pool, q2, k=4, lam=0.5).orderBy("rank").collect()
        b = (
            mmr_select(pool, q2, k=4, lam=0.5, driver_threshold=0)
            .orderBy("rank")
            .collect()
        )
        assert bits(a) == bits(b)


class TestQualityWeightedDedup:
    def test_normalization_clusters_and_argmax(self, spark):
        docs = _docs(
            spark,
            [
                (10, "Hello  World"),  # normalizes to "hello world"
                (11, "hello world"),
                (12, "  HELLO WORLD  "),
                (20, "unique doc"),
            ],
        )
        got = {
            r["kept_doc_id"]: r
            for r in quality_weighted_dedup(
                docs, "text", "doc_id", "n_chars"
            ).collect()
        }
        # longest copy wins: doc 12 has 15 chars raw
        assert set(got) == {12, 20}
        assert got[12]["cluster_size"] == 3
        assert got[12]["kept_quality"] == 15
        assert got[12]["bytes_dropped"] == 12 + 11
        assert got[20]["cluster_size"] == 1
        assert got[20]["bytes_dropped"] == 0

    def test_tiebreak_lowest_id(self, spark):
        docs = _docs(spark, [(5, "same"), (3, "same"), (9, "same")])
        got = quality_weighted_dedup(docs, "text", "doc_id", "n_chars").collect()
        assert len(got) == 1 and got[0]["kept_doc_id"] == 3


# --------------------------------------------------------------------------
# property-based invariants (hypothesis draws adversarial corpora)
# --------------------------------------------------------------------------

import math

from hypothesis import given, settings, strategies as st

texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab cXYé\t1.")),
        min_size=0,
        max_size=30,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=5, deadline=None)
@given(texts)
def test_entropy_bounds_and_conservation(spark, docs):
    """0 <= H <= log2(alphabet) for every doc; n conserves the non-empty
    char count; docs with no countable chars produce no row."""
    import os
    import tempfile

    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.plans.textmetrics_queries import ns_text_entropy

    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(docs)],
        ["doc_id", "text", "n_chars"],
    ).withColumn("lang", F.lit("x")).withColumn("source", F.lit("t"))
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        rows = ns_text_entropy(spark, d).collect()
    by_id = {r["doc_id"]: r for r in rows}
    for i, t in enumerate(docs):
        # Spark split(text, '') yields [''] for the empty string only
        n_countable = len(t)
        if n_countable == 0:
            assert i not in by_id
            continue
        r = by_id[i]
        assert r["n"] == n_countable
        assert 0.0 <= r["entropy"] <= round(math.log2(r["alphabet"]), 4) + 1e-9


@settings(max_examples=5, deadline=None)
@given(texts)
def test_canonical_dedup_conserves_docs_and_bytes(spark, docs):
    """Cluster sizes sum to the doc count; kept+dropped bytes sum to
    the corpus bytes; every kept id is a real doc id."""
    from hybrid_cdc_demo_spark.operators.dedup import quality_weighted_dedup

    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(docs)],
        ["doc_id", "text", "n_chars"],
    )
    got = quality_weighted_dedup(df, "text", "doc_id", "n_chars").collect()
    assert sum(r["cluster_size"] for r in got) == len(docs)
    assert sum(r["kept_quality"] + r["bytes_dropped"] for r in got) == sum(
        len(t) for t in docs
    )
    assert {r["kept_doc_id"] for r in got} <= set(range(len(docs)))


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=60), min_size=2, max_size=6))
def test_zipf_slope_is_negative_on_distinct_counts(spark, counts):
    """Any corpus with strictly decreasing rank-frequency pairs fits a
    negative slope; n_terms matches the distinct vocabulary."""
    import os
    import tempfile

    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.plans.textmetrics_queries import ns_zipf_slope

    # make counts strictly decreasing so x/y are not degenerate
    counts = sorted(set(counts), reverse=True)
    if len(counts) < 2:
        counts = [counts[0] + 1, counts[0]]
    words = []
    for k, c in enumerate(counts):
        words += [f"w{k}"] * c
    df = spark.createDataFrame(
        [(0, " ".join(words), 1)], ["doc_id", "text", "n_chars"]
    ).withColumn("lang", F.lit("x")).withColumn("source", F.lit("t"))
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        r = ns_zipf_slope(spark, d).collect()[0]
    assert r["n_terms"] == len(counts)
    assert r["slope"] < 0


class TestTranscriptAssembly:
    def test_order_and_cap(self, spark):
        import datetime

        from hybrid_cdc_demo_spark.operators.analytics import (
            transcript_assembly,
        )

        rows = []
        # user 1: 10 events, types cycle v/c/p — cap at 3 keeps v>c>p
        for i in range(10):
            rows.append(
                (i, datetime.datetime(2024, 1, 1, 0, i), 1,
                 ["view", "click", "purchase"][i % 3], 0.0)
            )
        # user 2: two events arriving out of id order but in ts order
        rows.append((100, datetime.datetime(2024, 1, 2), 2, "click", 0.0))
        rows.append((99, datetime.datetime(2024, 1, 3), 2, "view", 0.0))
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value"]
        )
        got = {
            r["user_id"]: r
            for r in transcript_assembly(ev, max_turns=3).collect()
        }
        assert got[1]["n_turns"] == 3
        assert got[1]["transcript"] == "view>click>purchase"
        # ts orders turns, not event_id
        assert got[2]["transcript"] == "click>view"
        assert got[2]["n_turns"] == 2

    def test_ties_break_by_event_id(self, spark):
        import datetime

        from hybrid_cdc_demo_spark.operators.analytics import (
            transcript_assembly,
        )

        t = datetime.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [(2, t, 1, "b", 0.0), (1, t, 1, "a", 0.0)],
            ["event_id", "ts", "user_id", "event_type", "value"],
        )
        got = transcript_assembly(ev, max_turns=8).collect()[0]
        assert got["transcript"] == "a>b"
