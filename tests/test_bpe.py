"""Distributed BPE trainer (operators/bpe.py).

ns_bpe_merges' pair statistics are hash-checked by the oracle sweep;
here we pin the trainer loop itself — the textbook corpus from the
BPE paper, leftmost-first merge semantics, determinism, and the
ns_bpe_vocab contract for the no-oracle registry entry.
"""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.bpe import (
    encode_expr,
    merge_pair_expr,
    train_bpe,
    word_freq_table,
)
from hybrid_cdc_demo_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _classic(spark):
    # Sennrich et al. corpus shape: low x5, lower x2, newest x6, widest x3
    return _docs(
        spark,
        ["low " * 5, "lower " * 2, "newest " * 6, "widest " * 3],
    )


def test_classic_corpus_first_merges(spark):
    merges = train_bpe(_classic(spark), num_merges=3)
    got = [(m["left"], m["right"], m["cnt"]) for m in merges]
    # (e,s)=9 ties (s,t)=9 -> lexicographic; then (es,t)=9; then (l,o)=7
    assert got == [("e", "s", 9), ("es", "t", 9), ("l", "o", 7)]
    assert [m["step"] for m in merges] == [1, 2, 3]
    assert merges[1]["merged"] == "est"


def test_max_count_is_nonincreasing(spark, sf_dir):
    from hybrid_cdc_demo_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    merges = train_bpe(docs, num_merges=6)
    cnts = [m["cnt"] for m in merges]
    # a merge can only create pairs no more frequent than itself
    assert cnts == sorted(cnts, reverse=True)


def test_trainer_is_deterministic(spark):
    a = train_bpe(_classic(spark), num_merges=4)
    b = train_bpe(_classic(spark), num_merges=4)
    assert a == b


def test_driver_mode_matches_distributed(spark, sf_dir):
    """train_bpe mode='driver' (the r10 collected-vocab loop) must
    produce the IDENTICAL merge table to the distributed loop — exact
    integer counts, lexicographic tie-break, leftmost-first fold — on
    the classic corpus, a tie-heavy corpus, and real testdata."""
    from hybrid_cdc_demo_spark.sources.tables import load_table

    for docs, k in [
        (_classic(spark), 4),
        (_docs(spark, ["ab ab ba", "ba ab", "aaa bbb"]), 5),
        (load_table(spark, sf_dir, "documents").limit(200), 6),
    ]:
        dist = train_bpe(docs, num_merges=k, mode="dist")
        drv = train_bpe(docs, num_merges=k, mode="driver")
        assert drv == dist


def test_driver_mode_bound_raises_and_auto_falls_back(spark):
    import pytest

    docs = _docs(spark, ["one two three four five six"])
    with pytest.raises(ValueError, match="driver-side bound"):
        train_bpe(docs, num_merges=2, mode="driver", max_driver_vocab=2)
    # auto over the bound silently stays distributed, same table
    a = train_bpe(docs, num_merges=2, mode="auto", max_driver_vocab=2)
    b = train_bpe(docs, num_merges=2, mode="dist")
    assert a == b
    with pytest.raises(ValueError, match="unknown mode"):
        train_bpe(docs, num_merges=1, mode="nope")


def test_merge_is_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame([(["b", "b", "b"],)], ["sym"])
    out = df.select(merge_pair_expr(F.col("sym"), "b", "b").alias("m")).collect()
    assert out[0]["m"] == ["bb", "b"]  # NOT ["b","bb"], NOT ["bb","bb"]


def test_merge_handles_repeats_after_merge(spark):
    df = spark.createDataFrame([(["a", "b", "a", "b"],)], ["sym"])
    out = df.select(merge_pair_expr(F.col("sym"), "a", "b").alias("m")).collect()
    assert out[0]["m"] == ["ab", "ab"]


def test_encode_expr_applies_training_order(spark):
    merges = train_bpe(_classic(spark), num_merges=3)
    df = spark.createDataFrame([("lowest",), ("low",)], ["word"])
    got = {
        r["word"]: r["toks"]
        for r in df.select(
            "word", encode_expr("word", merges).alias("toks")
        ).collect()
    }
    # es -> est -> lo: "lowest" = lo + w + est ; "low" = lo + w
    assert got["lowest"] == ["lo", "w", "est"]
    assert got["low"] == ["lo", "w"]


def test_word_freq_drops_empty_tokens(spark):
    wf = word_freq_table(_docs(spark, ["  ", "a a"])).collect()
    assert {r["word"]: r["freq"] for r in wf} == {"a": 2}


def test_ns_bpe_vocab_contract(spark):
    df = QUERIES["ns_bpe_vocab"](spark, SF)
    assert df.dtypes == [
        ("step", "int"), ("left", "string"), ("right", "string"),
        ("merged", "string"), ("cnt", "bigint"),
    ]
    rows = df.collect()
    assert len(rows) == 6
    assert [r["step"] for r in rows] == list(range(1, 7))
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True) and cnts[-1] >= 1


def _ref_bpe(word_freqs, num_merges):
    """Pure-Python reference BPE (Sennrich greedy, leftmost-first
    non-overlapping, count-then-lexicographic argmax)."""
    table = [(tuple(w), f) for w, f in sorted(word_freqs.items())]
    merges = []
    for step in range(1, num_merges + 1):
        pc = {}
        for syms, f in table:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b, a + b, cnt))
        new_table = []
        for syms, f in table:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_table.append((tuple(out), f))
        table = new_table
    return merges


def test_differential_vs_reference_random_corpora(spark):
    import random
    from collections import Counter

    for seed in (5, 6, 7):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("xyz") for _ in range(rng.randint(1, 5)))
            for _ in range(40)
        ]
        texts = [" ".join(words[k::4]) for k in range(4)]
        wf = Counter(w for t in texts for w in t.split())
        want = _ref_bpe(wf, 5)
        got = train_bpe(_docs(spark, texts), num_merges=5)
        assert [
            (m["left"], m["right"], m["merged"], m["cnt"]) for m in got
        ] == want, f"seed={seed}"


def test_train_bpe_exhausts_gracefully(spark):
    # single 1-char word: no pairs ever -> empty merge list, and
    # merges_df of an empty list still builds the typed frame
    from hybrid_cdc_demo_spark.operators.bpe import merges_df

    merges = train_bpe(_docs(spark, ["a", "a"]), num_merges=3)
    assert merges == []
    assert merges_df(spark, merges).count() == 0


def test_ns_bpe_encode_contract(spark):
    from hybrid_cdc_demo_spark.operators.bpe import train_bpe as _t  # noqa: F401
    from hybrid_cdc_demo_spark.sources.tables import load_table

    df = QUERIES["ns_bpe_encode"](spark, SF)
    assert df.dtypes == [
        ("doc_id", "bigint"), ("n_words", "bigint"), ("n_bpe_tokens", "bigint")
    ]
    rows = df.collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    # every doc with at least one word appears exactly once
    assert len(rows) == sum(1 for t in docs.values() if t.split())
    for r in rows:
        words = docs[r["doc_id"]].lower().split()
        n_chars = sum(len(w) for w in words)
        assert r["n_words"] == len(words)
        # each word is >= 1 token and <= its character count
        assert r["n_words"] <= r["n_bpe_tokens"] <= n_chars
    # merges actually compress: total bpe tokens strictly below chars
    assert sum(r["n_bpe_tokens"] for r in rows) < sum(
        len(w) for t in docs.values() for w in t.lower().split()
    )


def test_encode_token_counts_matches_python_reference(spark):
    from hybrid_cdc_demo_spark.operators.bpe import encode_token_counts

    corpus = _classic(spark)
    merges = train_bpe(corpus, num_merges=3)

    def ref_encode(word):
        syms = list(word)
        for m in merges:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == m["left"]
                    and syms[i + 1] == m["right"]
                ):
                    out.append(m["merged"]); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return syms

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in encode_token_counts(corpus, merges).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for i, t in texts.items():
        words = t.lower().split()
        want = (len(words), sum(len(ref_encode(w)) for w in words))
        assert got[i] == want, (i, t)


def test_shared_doc_word_counts_paths_match_defaults(spark):
    """r11: the composed train+encode shape (one doc_word_counts
    checkpoint feeding training's word-freq table and the encode
    join) must produce the identical merge table and identical
    per-doc counts as the default per-call corpus scans."""
    from hybrid_cdc_demo_spark.operators.bpe import (
        doc_word_counts,
        encode_token_counts,
    )

    corpus = _classic(spark)
    wdc = doc_word_counts(corpus)
    wf = wdc.groupBy("word").agg(F.sum("cnt").alias("freq"))
    shared_merges = train_bpe(corpus, num_merges=4, word_freq=wf)
    default_merges = train_bpe(corpus, num_merges=4)
    assert shared_merges == default_merges
    shared = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in encode_token_counts(
            corpus, shared_merges, word_counts=wdc
        ).collect()
    }
    default = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in encode_token_counts(corpus, default_merges).collect()
    }
    assert shared == default
