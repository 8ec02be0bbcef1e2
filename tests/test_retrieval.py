"""BM25 + PMI collocation operators (operators/retrieval.py).

Oracle parity is covered by the parametrized test_oracle_parity sweep
(ns_bm25_topk / ns_pmi_collocations are ORACLE_SQL entries); these
tests pin the operator SEMANTICS on hand-built corpora where the
expected scores are computable by hand, plus the plan-shape contract
(distributed top-k, broadcast side inputs).
"""

import math

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    pmi_collocations,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bm25_ref(tf, dl, n_docs, df, avgdl, k1=1.2, b=0.75):
    idf = (n_docs - df + 0.5) / (df + 0.5)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b) + k1 * b * (dl / avgdl))


def test_bm25_matches_hand_formula(spark):
    docs = _docs(
        spark,
        [
            (1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "durian durian durian durian"),
        ],
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["apple", "banana"]).collect()
    }
    # corpus: N=3, sum_dl=9, avgdl=3; df(apple)=2, df(banana)=1
    exp1 = _bm25_ref(2, 3, 3, 2, 3.0) + _bm25_ref(1, 3, 3, 1, 3.0)
    exp2 = _bm25_ref(1, 2, 3, 2, 3.0)
    assert set(got) == {1, 2}  # doc 3 matches no term -> absent
    assert math.isclose(got[1], exp1, rel_tol=1e-12)
    assert math.isclose(got[2], exp2, rel_tol=1e-12)
    # rarer term must out-weigh the common one at equal tf/dl
    assert _bm25_ref(1, 3, 3, 1, 3.0) > _bm25_ref(1, 3, 3, 2, 3.0)


def test_bm25_topk_rank_and_limit(spark):
    docs = _docs(spark, [(i, "apple " + "pad " * (i % 5)) for i in range(30)])
    out = bm25_topk(docs, ["apple"], k=7).collect()
    assert [r["rank"] for r in out] == list(range(1, 8))
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # shorter docs (lower dl) must rank first at equal tf
    assert out[0]["doc_id"] in {0, 5, 10, 15, 20, 25}


def test_bm25_empty_terms_rejected(spark):
    with pytest.raises(ValueError):
        bm25_scores(_docs(spark, [(1, "x")]), [])


def test_bm25_plan_is_distributed_topk(spark):
    docs = _docs(spark, [(1, "apple banana"), (2, "apple")])
    plan = bm25_topk(docs, ["apple"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan  # dfreq + stats ride as broadcasts


def test_pmi_lift_matches_hand_formula(spark):
    # corpus engineered so "rare pair" has high lift, "common x" low:
    # 6 docs of "a b", 6 docs of "c d" interleaved with filler "a z"
    rows = []
    i = 0
    for _ in range(6):
        rows.append((i, "a b")); i += 1
        rows.append((i, "c d")); i += 1
        rows.append((i, "a z")); i += 1
    docs = _docs(spark, rows)
    out = {r["bigram"]: r for r in pmi_collocations(docs, min_count=3).collect()}
    # totals: T = 36 tokens, B = 18 bigrams
    # c(a)=12, c(b)=6, c(z)=6, c(c)=6, c(d)=6; c_xy("a b")=6, ("c d")=6, ("a z")=6
    lift_ab = (6 / 18) / ((12 / 36) * (6 / 36))
    lift_cd = (6 / 18) / ((6 / 36) * (6 / 36))
    assert math.isclose(out["a b"]["lift"], lift_ab, rel_tol=1e-12)
    assert math.isclose(out["c d"]["lift"], lift_cd, rel_tol=1e-12)
    # "c d" is the tighter collocation (c less ambiguous than a)
    assert out["c d"]["rank"] < out["a b"]["rank"]
    assert out["a b"]["c_xy"] == 6


def test_pmi_min_count_floor(spark):
    docs = _docs(spark, [(1, "p q"), (2, "p q"), (3, "r s")])
    out = pmi_collocations(docs, min_count=2).collect()
    assert {r["bigram"] for r in out} == {"p q"}  # "r s" floored out


def test_pmi_single_token_docs_contribute_no_bigrams(spark):
    docs = _docs(spark, [(1, "solo"), (2, "x y"), (3, "x y")])
    out = pmi_collocations(docs, min_count=2).collect()
    assert {r["bigram"] for r in out} == {"x y"}
    # T counts the solo token, B does not
    assert math.isclose(
        out[0]["lift"], (2 / 2) / ((2 / 5) * (2 / 5)), rel_tol=1e-12
    )


def test_pmi_plan_is_distributed_topk(spark):
    docs = _docs(spark, [(1, "x y"), (2, "x y")])
    plan = pmi_collocations(docs)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_bm25_differential_vs_reference_random_corpora(spark):
    """Exact-math differential on random corpora: the operator must
    equal the textbook formula computed in pure Python (same odds-form
    idf), doc by doc, to fp tolerance."""
    import random

    for seed in (3, 4):
        rng = random.Random(seed)
        vocab = ["red", "green", "blue", "cyan", "teal", "pink"]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(50)
        ]
        terms = ["red", "blue", "pink"]
        docs_toks = {i: t.split() for i, t in rows}
        n = len(rows)
        avgdl = sum(len(v) for v in docs_toks.values()) / n
        dfreq = {
            t: sum(1 for v in docs_toks.values() if t in v) for t in terms
        }
        want = {}
        for i, toks in docs_toks.items():
            s = 0.0
            for t in sorted(terms):
                tf = toks.count(t)
                if not tf or not dfreq[t]:
                    continue
                idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
                s += idf * (tf * 2.2) / (tf + 0.3 + 0.9 * (len(toks) / avgdl))
            if s:
                want[i] = s
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(_docs(spark, rows), terms).collect()
        }
        assert set(got) == set(want), f"seed={seed}"
        for i in want:
            assert math.isclose(got[i], want[i], rel_tol=1e-12), (seed, i)


def test_bm25_terms_absent_from_corpus(spark):
    docs = _docs(spark, [(1, "alpha beta"), (2, "gamma")])
    assert bm25_scores(docs, ["zzz"]).count() == 0
    assert bm25_topk(docs, ["zzz"], k=5).count() == 0


def test_pmi_floor_above_all_counts_is_empty(spark):
    docs = _docs(spark, [(1, "x y"), (2, "x z")])
    assert pmi_collocations(docs, min_count=99).count() == 0


class TestHybridRRF:
    """hybrid_rrf_topk vs a brute-force Python fusion."""

    def _fixture(self, spark):
        # 6 docs; terms probe favors docs 1-3, vector probe favors 4-6
        docs = _docs(
            spark,
            [
                (1, "apple banana apple cherry"),
                (2, "apple cherry plum"),
                (3, "banana banana mango"),
                (4, "durian fig grape"),
                (5, "kiwi lemon mango"),
                (6, "nectarine orange peach"),
            ],
        )
        vecs = [
            (0, [1.0, 0.0, 0.0]),  # the probe vector (vec_id 0)
            (1, [0.0, 1.0, 0.0]),
            (2, [0.1, 0.9, 0.0]),
            (3, [0.0, 0.0, 1.0]),
            (4, [0.9, 0.1, 0.0]),
            (5, [0.8, 0.0, 0.6]),
            (6, [1.0, 0.1, 0.0]),
        ]
        emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        return docs, emb, vecs

    def test_matches_bruteforce(self, spark):
        from hybrid_cdc_demo_spark.operators.retrieval import hybrid_rrf_topk

        docs, emb, vecs = self._fixture(spark)
        terms = ["apple", "banana"]
        got = hybrid_rrf_topk(
            docs, emb, terms, query_vec_id=0, n_cand=4, k=6, rrf_k=60
        ).collect()

        # brute-force sparse leg
        toks = {r["doc_id"]: r["text"].split() for r in docs.collect()}
        n, sum_dl = len(toks), sum(len(w) for w in toks.values())
        avgdl = sum_dl / n
        dfq = {
            t: sum(1 for w in toks.values() if t in w) for t in terms
        }
        sp_scores = {}
        for i, w in toks.items():
            s = 0.0
            for t in sorted(terms):
                tf = w.count(t)
                if tf:
                    s += _bm25_ref(tf, len(w), n, dfq[t], avgdl)
            if s:
                sp_scores[i] = s
        sp_rank = {
            i: r + 1
            for r, (i, _) in enumerate(
                sorted(sp_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
            )
        }
        # brute-force dense leg (cosine vs vec 0)
        qv = vecs[0][1]
        cos = {}
        for vid, v in vecs:
            dot = sum(a * b for a, b in zip(v, qv))
            na = math.sqrt(sum(a * a for a in v))
            nq = math.sqrt(sum(a * a for a in qv))
            cos[vid] = dot / (na * nq)
        dn_rank = {
            i: r + 1
            for r, (i, _) in enumerate(
                sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
            )
        }
        fused = {}
        for i in set(sp_rank) | set(dn_rank):
            fused[i] = (1.0 / (60 + sp_rank[i]) if i in sp_rank else 0.0) + (
                1.0 / (60 + dn_rank[i]) if i in dn_rank else 0.0
            )
        want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:6]
        assert [(r["doc_id"], r["r_sparse"], r["r_dense"]) for r in got] == [
            (i, sp_rank.get(i, 0), dn_rank.get(i, 0)) for i, _ in want
        ]
        for r, (_, f) in zip(got, want):
            assert abs(r["rrf"] - f) < 1e-12

    def test_both_legs_beat_single_leg_at_equal_rank(self, spark):
        from hybrid_cdc_demo_spark.operators.retrieval import hybrid_rrf_topk

        docs, emb, _ = self._fixture(spark)
        rows = hybrid_rrf_topk(
            docs, emb, ["apple", "banana"], query_vec_id=0, n_cand=6, k=6
        ).collect()
        by_doc = {r["doc_id"]: r for r in rows}
        both = [r for r in rows if r["r_sparse"] > 0 and r["r_dense"] > 0]
        for r in both:
            for s in rows:
                if (
                    s["r_sparse"] == 0
                    and s["r_dense"] >= r["r_dense"]
                    and s["doc_id"] != r["doc_id"]
                ):
                    assert r["rrf"] > s["rrf"]
        assert by_doc  # fixture sanity


class TestBigramCoherence:
    def test_fluent_beats_gibberish_and_edges(self, spark):
        from hybrid_cdc_demo_spark.operators.retrieval import bigram_lm_coherence

        common = "the cat sat on the mat"
        rows = [
            (1, common),
            (2, common),
            (3, common),
            (4, "mat the on sat cat the"),  # same unigrams, rare transitions
            (5, "zq"),                       # 1 token -> no transitions
        ]
        got = {
            r["doc_id"]: r
            for r in bigram_lm_coherence(_docs(spark, rows)).collect()
        }
        assert got[1]["coherence"] > got[4]["coherence"]
        assert got[5]["n_transitions"] == 0 and got[5]["coherence"] is None
        assert got[1]["n_transitions"] == 5

    def test_mean_matches_bruteforce(self, spark):
        from collections import Counter

        from hybrid_cdc_demo_spark.operators.retrieval import bigram_lm_coherence

        rows = [(1, "a b a b c"), (2, "b c a a"), (3, "c c b a b")]
        toks = {i: t.split() for i, t in rows}
        uni = Counter(x for w in toks.values() for x in w)
        big = Counter(
            (w[j], w[j + 1]) for w in toks.values() for j in range(len(w) - 1)
        )
        got = {
            r["doc_id"]: r["coherence"]
            for r in bigram_lm_coherence(_docs(spark, rows)).collect()
        }
        for i, w in toks.items():
            n = len(w) - 1
            # exact Q20 fixed-point reference: integer weights summed,
            # one final double division — must match BITWISE
            s = sum(
                (big[(w[j], w[j + 1])] * 1048576) // uni[w[j]]
                for j in range(n)
            )
            assert got[i] == s / (n * 1048576)
            # and the quantization stays a faithful surrogate of the
            # true mean transition probability (< 2^-20 per term)
            ps = [big[(w[j], w[j + 1])] / uni[w[j]] for j in range(n)]
            assert abs(got[i] - sum(ps) / len(ps)) < 1e-6
