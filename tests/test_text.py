"""Text-analysis functions: language ID accuracy against the corpus
lang labels, token counting, fingerprint stability."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.functions import text as T


def test_lang_id_on_clear_samples(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der hund ist nicht in das haus und die katze"),
            (3, "le chat est dans la maison et il est pour"),
            (4, "el gato es un animal y la casa es de madera"),
            (5, "xyzzy plugh qwerty asdf"),
        ],
        ["id", "text"],
    )
    out = {r["id"]: r["lp"] for r in df.select("id", T.lang_id("text").alias("lp")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "es"
    assert out[5] == "und"


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, it's 42 degrees!")], ["id", "text"])
    r = df.select(
        T.token_count("text").alias("ws"),
        T.bpe_ish_token_count("text").alias("bpe"),
    ).collect()[0]
    assert r["ws"] == 5
    # hello | world | , | it | ' | s | 42 | degrees | !
    assert r["bpe"] == 9


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different text")],
        ["id", "text"],
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", T.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]  # case/whitespace-insensitive
    assert fps[1] != fps[3]


def test_winnowing_fingerprint_overlap(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, base.replace("lazy", "busy")), (3, "zz qq ww ee rr tt yy uu ii oo")],
        ["id", "text"],
    )
    out = {
        r["id"]: set(r["w"])
        for r in df.select("id", T.winnowing_fingerprint("text").alias("w")).collect()
    }
    overlap_near = len(out[1] & out[2]) / len(out[1] | out[2])
    overlap_far = len(out[1] & out[3]) / len(out[1] | out[3])
    assert overlap_near > overlap_far
    assert overlap_near > 0.3


def test_quality_score_ranges(spark):
    df = spark.createDataFrame(
        [(1, "a decent length sentence with the usual words in it and more"),
         (2, "!!! ,,, ;;; ...")],
        ["id", "text"],
    )
    out = {r["id"]: r["q"] for r in df.select("id", T.quality_score("text").alias("q")).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),                # all unique
            (2, "a a a a"),                # one word repeated
            (3, "x y x y x y"),            # repeated bigram "x y"
            (4, "word"),                   # too short for bigrams
        ],
        ["id", "text"],
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            T.dup_word_frac("text").alias("dw"),
            T.top_word_frac("text").alias("tw"),
            T.dup_ngram_frac("text", 2).alias("db"),
        ).collect()
    }
    assert out[1]["dw"] == 0.0 and out[1]["tw"] == 0.25 and out[1]["db"] == 0.0
    # "a a a a": 3 bigrams, 1 distinct -> dup 2/3
    assert out[2]["dw"] == 0.75 and out[2]["tw"] == 1.0
    assert abs(out[2]["db"] - 2 / 3) < 1e-12
    # "x y x y x y": 6 words, 2 distinct -> dup 4/6; bigrams: 5 total,
    # 2 distinct ("x y","y x") -> dup 3/5
    assert abs(out[3]["dw"] - 4 / 6) < 1e-12
    assert abs(out[3]["db"] - 3 / 5) < 1e-12
    # single word: no bigrams -> 0.0, not null/error
    assert out[4]["db"] == 0.0 and out[4]["dw"] == 0.0 and out[4]["tw"] == 1.0


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "one")], ["id", "text"])
    out = {
        r["id"]: r["g"]
        for r in df.select("id", T.word_ngrams("text", 3).alias("g")).collect()
    }
    assert out[1] == [] and out[2] == []
    out2 = {
        r["id"]: r["g"]
        for r in df.select("id", T.word_ngrams("text", 2).alias("g")).collect()
    }
    assert out2[1] == ["one two"] and out2[2] == []
