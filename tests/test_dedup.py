"""Property tests for the dedup operator family: planted near-dups
must be found; LSH candidates verified against exact Jaccard."""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators import dedup as D


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and dreams of fish dinners "
        "under the bright summer moon near the old stone bridge"
    )
    rows = []
    # 0/1: exact duplicates. 2: near-dup of 0 (one word changed).
    # 3: near-dup of 0 (two words changed). 4-9: unrelated.
    rows.append((0, base))
    rows.append((1, base))
    rows.append((2, base.replace("quick", "slow")))
    rows.append((3, base.replace("quick", "slow").replace("lazy", "happy")))
    for i in range(4, 10):
        rows.append(
            (i, " ".join(f"w{i}_{j} token{(i * 31 + j) % 97}" for j in range(30)))
        )
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_canonical(spark, corpus):
    out = D.exact_dedup_canonical(corpus, "text", "doc_id")
    rows = {r["canonical_id"]: r["n_copies"] for r in out.collect()}
    assert rows[0] == 2  # docs 0 and 1 collapse
    assert len(rows) == 9


def test_minhash_signatures_shape(spark, corpus):
    sigs = D.minhash_signatures(corpus, "text", "doc_id", num_hashes=64)
    row = sigs.filter(F.col("_id") == 0).collect()[0]
    assert len(row["signature"]) == 64
    # identical docs → identical signatures
    s0 = sigs.filter(F.col("_id") == 0).collect()[0]["signature"]
    s1 = sigs.filter(F.col("_id") == 1).collect()[0]["signature"]
    assert s0 == s1


def test_minhash_lsh_finds_planted_neardups(spark, corpus):
    pairs = D.minhash_lsh_dedup(
        corpus, "text", "doc_id", num_hashes=64, bands=16, threshold=0.5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found  # exact dup
    assert (0, 2) in found  # one-word change
    # unrelated docs never pass the jaccard verify
    for a, b in found:
        assert not (a >= 4 and b >= 4 and a != b) or False
    jacc = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jacc[(0, 1)] == 1.0


def test_jaccard_verify_matches_python(spark, corpus):
    """LSH-verified Jaccard equals a direct Python computation."""
    rows = {r["doc_id"]: r["text"] for r in corpus.collect()}

    def shingles(t, k=3):
        toks = t.lower().split()
        return {" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 1))}

    sigs = D.minhash_signatures(corpus, "text", "doc_id")
    cands = D.minhash_lsh_candidates(sigs)
    verified = D.verify_jaccard(cands, corpus, "text", "doc_id").collect()
    for r in verified:
        a, b = shingles(rows[r["id_a"]]), shingles(rows[r["id_b"]])
        expected = len(a & b) / len(a | b)
        assert abs(r["jaccard"] - expected) < 1e-3


def test_simhash_neardups(spark, corpus):
    fps = D.simhash(corpus, "text", "doc_id")
    vals = {r["_id"]: r["simhash"] for r in fps.collect()}
    assert vals[0] == vals[1]  # identical docs → identical fingerprint
    ham_02 = bin(vals[0] ^ vals[2]).count("1")
    ham_04 = bin(vals[0] ^ vals[4]).count("1")
    assert ham_02 < ham_04  # near-dup closer than unrelated
    cands = D.simhash_candidates(fps, max_hamming=10).collect()
    found = {(r["id_a"], r["id_b"]) for r in cands}
    assert (0, 1) in found


def test_simhash_arrow_fold_matches_expression(spark, corpus):
    """The r10 vectorized simhash fold (token hashes -> numpy
    counters) must produce IDENTICAL fingerprints to the pure
    higher-order-expression fold — integer math replayed exactly —
    on the planted corpus, real testdata, and edge rows (null text,
    whitespace-only text, single token)."""
    from hybrid_cdc_demo_spark.sources.tables import load_table

    def fp_map(df):
        return {r["_id"]: r["simhash"] for r in df.collect()}

    for frame in (
        corpus,
        load_table(spark, "/root/testdata/sf0.001", "documents"),
        spark.createDataFrame(
            [(1, None), (2, "   "), (3, "oneword"), (4, "")],
            "doc_id long, text string",
        ),
    ):
        arrow = fp_map(D.simhash(frame, "text", "doc_id", impl="arrow"))
        expr = fp_map(D.simhash(frame, "text", "doc_id", impl="expr"))
        assert arrow == expr

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown impl"):
        D.simhash(corpus, "text", "doc_id", impl="nope")


def test_ngram_jaccard_pairs(spark, corpus):
    out = D.ngram_jaccard_pairs(corpus, "text", "doc_id", n=3, threshold=0.5)
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert found[(0, 1)] == 1.0
    assert (0, 2) in found


def test_connected_components_transitive_chain(spark):
    """A~B, B~C, C~D (no direct A~D edge): all four must land in one
    component labeled by the minimum id — the transitivity that
    pairwise dedup output alone misses."""
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"]
    )
    out = {
        r["id"]: r["component"]
        for r in D.connected_components(nodes, edges).collect()
    }
    assert out == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5}


def test_connected_components_two_clusters_and_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(7)], ["id"])
    edges = spark.createDataFrame(
        [(5, 6), (0, 1), (1, 2)], ["id_a", "id_b"]
    )
    out = {
        r["id"]: r["component"]
        for r in D.connected_components(nodes, edges).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5}


def test_connected_components_no_edges(spark):
    nodes = spark.createDataFrame([(3,), (7,)], ["id"])
    edges = spark.createDataFrame([], "id_a long, id_b long")
    out = {
        r["id"]: r["component"]
        for r in D.connected_components(nodes, edges).collect()
    }
    assert out == {3: 3, 7: 7}


def test_connected_components_paths_agree(spark):
    """The size-gated driver union-find and the distributed min-label
    propagation must produce identical labels — same random graph run
    through both paths (driver_threshold=0 forces the distributed
    loop)."""
    import random

    rng = random.Random(7)
    n = 60
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edge_rows = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(40)
    ]
    edges = spark.createDataFrame(edge_rows, ["id_a", "id_b"])
    fast = {
        r["id"]: r["component"]
        for r in D.connected_components(nodes, edges).collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in D.connected_components(
            nodes, edges, driver_threshold=0
        ).collect()
    }
    assert fast == dist
    # labels are component minima in both
    for i, c in fast.items():
        assert c <= i


def test_connected_components_distributed_path_chain(spark):
    """Distributed path correctness on the transitive chain (the gate
    must not be load-bearing for semantics)."""
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"])
    out = {
        r["id"]: r["component"]
        for r in D.connected_components(
            nodes, edges, driver_threshold=0
        ).collect()
    }
    assert out == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5}


def test_minhash_slots_are_independent_estimators(spark):
    """Regression: the Kirsch-Mitzenmacher masks (62-bit h1, 32-bit h2)
    made i*h2 ~2^38 against h1 gaps of ~2^57 — every slot picked the
    same argmin(h1) shingle, so the matching-slot fraction was a 0/1
    coin instead of an estimator of Jaccard. With per-slot rehash the
    fraction must concentrate near the true Jaccard, and the slots of
    one signature must not be one arithmetic progression."""
    base = " ".join(f"tok{i}" for i in range(40))
    variant = " ".join(f"tok{i}" if i % 5 else f"alt{i}" for i in range(40))
    df = spark.createDataFrame([(0, base), (1, variant)], ["doc_id", "text"])
    sigs = {
        r["_id"]: r["signature"]
        for r in D.minhash_signatures(df, "text", "doc_id", 128, 3).collect()
    }
    sh = {
        r["doc_id"]: set(r["s"])
        for r in df.select(
            "doc_id", D.word_shingles("text", 3).alias("s")
        ).collect()
    }
    true_j = len(sh[0] & sh[1]) / len(sh[0] | sh[1])
    est = sum(a == b for a, b in zip(sigs[0], sigs[1])) / 128
    assert 0.0 < true_j < 1.0
    assert abs(est - true_j) < 0.15, (est, true_j)
    # degenerate signatures were an arithmetic progression (same argmin
    # element winning every slot): constant second difference
    diffs = [b - a for a, b in zip(sigs[0], sigs[0][1:])]
    assert len(set(diffs)) > 1


def test_simhash_skew_guard_bounds_hot_band(spark, corpus):
    """A planted hot band (every doc shares one 16-bit band value —
    the boilerplate-header corpus shape) must be dropped by the
    max_bucket guard: candidate volume stays bounded instead of going
    quadratic, the drop is COUNTED (never silent), and planted
    near-dup recall is preserved via the remaining bands."""
    n = 40
    rows = []
    # fingerprints: band 0 (low 16 bits) identical for ALL docs (the
    # hot band); bands 1-3 distinct per doc except docs 0/1 which are
    # near-identical overall (hamming 1, differing inside band 1)
    hot = 0xBEEF
    for i in range(n):
        fp = hot | (i << 16) | (i << 32) | (i << 48)
        rows.append((i, fp))
    rows[1] = (1, rows[0][1] ^ (1 << 20))  # doc1 = doc0 with 1 bit flipped
    fps = spark.createDataFrame(rows, "_id long, simhash long")

    report = {}
    cands = D.simhash_candidates(
        fps, max_hamming=3, max_bucket=10, dropped_out=report
    )
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    # the hot band-0 bucket (40 members > 10) was dropped + accounted
    assert report["buckets_dropped"] >= 1
    assert report["pairs_suppressed"] >= 40 * 39 // 2
    # recall survives: docs 0/1 still agree on bands 2 and 3
    assert (0, 1) in got
    # everything found is a true near-dup (hamming ≤ 3), and volume is
    # bounded — nowhere near the 780 pairs the hot band would emit
    # ((1, 16) is a genuine hamming-2 pair planted by the bit overlap)
    assert got <= {(0, 1), (1, 16)}


def test_simhash_guard_off_path_equivalent(spark):
    """With no hot bucket, the guarded plan returns the same pairs as
    before the guard existed (pure refactor for the common case)."""
    def spread64(i):  # well-separated fingerprints (pairwise hamming ~32)
        v = ((i + 1) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [(i, spread64(i)) for i in range(8)]
    rows.append((8, rows[0][1] ^ 0b11))  # near-dup of doc 0, hamming 2
    fps = spark.createDataFrame(rows, "_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_candidates(fps, max_hamming=3).collect()
    }
    assert got == {(0, 8, 2)}


def test_minhash_dropped_bucket_accounting(spark, corpus):
    """minhash_lsh_candidates reports its skew-guard drops through the
    same dropped_out contract (no-silent-caps)."""
    sigs = D.minhash_signatures(corpus, "text", "doc_id")
    report = {}
    # max_bucket=1 drops every bucket with >1 member — exactly the
    # buckets that would have produced candidates
    cands = D.minhash_lsh_candidates(sigs, max_bucket=1, dropped_out=report)
    assert cands.count() == 0
    assert report["buckets_dropped"] >= 1
    assert report["pairs_suppressed"] >= 1
    ok = {}
    full = D.minhash_lsh_candidates(sigs, dropped_out=ok)
    assert full.count() > 0
    assert ok["buckets_dropped"] == 0 and ok["pairs_suppressed"] == 0


class TestSpanDedup:
    """span_dedup_stats vs a brute-force Python reference."""

    @staticmethod
    def _brute(rows, k=8, min_count=2):
        from collections import Counter

        toks = {i: t.lower().strip().split() for i, t in rows}
        wins = {
            i: [tuple(w[j : j + k]) for j in range(len(w) - k + 1)]
            for i, w in toks.items()
        }
        counts = Counter(g for ws in wins.values() for g in ws)
        out = {}
        for i, w in toks.items():
            flagged = [
                j for j, g in enumerate(wins[i]) if counts[g] >= min_count
            ]
            covered = set()
            for j in flagged:
                covered.update(range(j, j + k))
            out[i] = (
                len(w),
                max(len(w) - k + 1, 0),
                len(flagged),
                len(covered),
                len(w) - len(covered),
            )
        return out

    def _check(self, spark, rows, k=8):
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["n_windows"],
                r["dup_windows"],
                r["covered_tokens"],
                r["kept_tokens"],
            )
            for r in D.span_dedup_stats(df, "text", "doc_id", k=k).collect()
        }
        assert got == self._brute(rows, k=k)

    def test_planted_cross_doc_span(self, spark):
        span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        rows = [
            (0, "x0 x1 x2 " + span + " y0 y1"),
            (1, "z0 " + span + " z1 z2 z3 z4"),
            (2, "totally unrelated words here only once spoken aloud now"),
        ]
        self._check(spark, rows)

    def test_within_doc_repeat_counts(self, spark):
        span = "a b c d e f g h"
        rows = [(0, span + " filler0 filler1 " + span), (1, "q r s t u v w x y")]
        self._check(spark, rows)

    def test_short_docs_have_no_windows(self, spark):
        rows = [(0, "one two three"), (1, "one two three"), (2, "a b c d e f g h")]
        self._check(spark, rows)  # exact dups but < k tokens -> 0 windows

    def test_overlapping_intervals_union_once(self, spark):
        # doc 0 shares two OVERLAPPING 8-windows with doc 1 — the
        # covered-token union must not double count the overlap
        rows = [
            (0, "p0 a b c d e f g h i p1 p2 p3"),
            (1, "q0 q1 a b c d e f g h i q2"),
        ]
        self._check(spark, rows)

    def test_string_grams_match_hashed(self, spark, corpus):
        a = (
            D.span_dedup_stats(corpus, "text", "doc_id", k=5, hash_grams=True)
            .orderBy("doc_id")
            .collect()
        )
        b = (
            D.span_dedup_stats(corpus, "text", "doc_id", k=5, hash_grams=False)
            .orderBy("doc_id")
            .collect()
        )
        assert a == b
