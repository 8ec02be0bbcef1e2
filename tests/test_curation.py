"""Corpus-curation operators (operators/curation.py): deterministic
split, sequence packing, contamination — semantics + plan-shape tests.
(The exact-oracle hash checks run in the test_oracle_parity sweep.)"""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators import curation as C
from hybrid_cdc_demo_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_hash_split_total_and_determinism(docs):
    split = C.hash_split(docs, "doc_id")
    counts = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    # train gets 13/16 of hex space; loose bounds that hold at any sf
    frac = counts["train"] / sum(counts.values())
    assert 0.70 < frac < 0.92
    # same input -> bit-identical assignment (content-independent hash)
    again = C.hash_split(docs, "doc_id")
    assert split.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")
    ).count() == 0


def test_hash_split_no_shuffle(docs):
    plan = C.hash_split(docs, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_budget_and_coverage(docs):
    toks = docs.select(
        "source", "doc_id", F.length("text").cast("long").alias("n_tok")
    )
    packed = C.pack_sequences(
        toks, "n_tok", "doc_id", budget=500, partition_col="source"
    )
    # every doc assigned exactly one bin
    assert packed.count() == toks.count()
    bins = (
        packed.groupBy("source", "bin_id")
        .agg(
            F.sum("n_tok").alias("tot"),
            F.max("n_tok").alias("mx"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    for r in bins:
        # next-fit invariant: the cum-before-last stays inside the bin's
        # budget window, so total minus the last (<= largest) doc is
        # under budget; only a single oversized doc can blow past it
        if r["n"] > 1:
            assert r["tot"] - r["mx"] < 500
    # each source starts at bin 0 and bin ids are monotone in doc order
    # (a doc larger than the budget may legitimately skip a window)
    per_src = packed.groupBy("source").agg(F.min("bin_id").alias("lo")).collect()
    assert all(r["lo"] == 0 for r in per_src)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    non_monotone = packed.withColumn(
        "prev", F.lag("bin_id").over(w)
    ).filter(F.col("prev").isNotNull() & (F.col("bin_id") < F.col("prev")))
    assert non_monotone.count() == 0


def test_pack_sequences_single_shuffle(docs):
    """The window cumsum and the per-bin aggregation share the source
    partitioning — the whole pack-and-count plan needs ONE exchange."""
    toks = docs.select(
        "source", "doc_id", F.length("text").cast("long").alias("n_tok")
    )
    packed = C.pack_sequences(
        toks, "n_tok", "doc_id", budget=500, partition_col="source"
    )
    agg = packed.groupBy("source", "bin_id").agg(F.sum("n_tok").alias("t"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_contamination_detects_planted_dup(spark):
    rows = [
        # identical long text in train (id 1: sha256("1") starts '6')
        # and test (id 20: sha256("20") starts 'f')
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (20, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    split = C.hash_split(df, "doc_id")
    assert {r["split"] for r in split.filter("doc_id = 20").collect()} == {"test"}
    hits = C.ngram_contamination(split, "text", "doc_id", n=5).collect()
    assert len(hits) == 1 and hits[0]["doc_id"] == 20
    # 10 tokens -> 6 distinct 5-grams, all contaminated
    assert hits[0]["n_hits"] == 6


def test_contamination_hashed_matches_string(docs):
    split = C.hash_split(docs, "doc_id")
    s = C.ngram_contamination(split, "text", "doc_id", n=5, hashed=False)
    h = C.ngram_contamination(split, "text", "doc_id", n=5, hashed=True)
    assert s.exceptAll(h).count() == 0 and h.exceptAll(s).count() == 0


def test_stratified_sample_deterministic_and_uniformish(docs):
    s1 = C.stratified_sample(docs, "lang", "doc_id", k=5)
    s2 = C.stratified_sample(docs, "lang", "doc_id", k=5)
    a = s1.select("lang", "doc_id", "rk")
    assert a.exceptAll(s2.select("lang", "doc_id", "rk")).count() == 0
    per = s1.groupBy("lang").count().collect()
    assert all(r["count"] == 5 for r in per)
    # sample ids differ across strata (not the same head-of-table rows)
    ids = [r["doc_id"] for r in s1.collect()]
    assert len(set(ids)) == len(ids)


def test_chunk_documents_covers_every_token_with_overlap(spark):
    from hybrid_cdc_demo_spark.operators.curation import chunk_documents

    text = " ".join(f"t{i}" for i in range(150))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")],
                               "doc_id int, text string")
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=64, stride=48)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc1: n=150 → 1 + ceil(86/48) = 3 chunks at starts 0/48/96
    assert {k[1] for k in rows if k[0] == 1} == {0, 1, 2}
    c0, c1, c2 = (rows[(1, k)]["chunk_text"].split(" ") for k in (0, 1, 2))
    assert c0[0] == "t0" and len(c0) == 64
    assert c1[0] == "t48" and len(c1) == 64          # 16-token overlap
    assert c0[48:] == c1[:16]
    assert c2[0] == "t96" and len(c2) == 54          # short tail
    assert c2[-1] == "t149"                           # full coverage
    # short and empty docs yield exactly one chunk
    assert rows[(2, 0)]["n_tok"] == 2
    assert (3, 0) in rows and len([k for k in rows if k[0] == 3]) == 1


def test_weighted_mixture_rates_are_monotone_and_deterministic(spark):
    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.operators.curation import weighted_mixture

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    kept = {}
    for rate in (0, 4, 8, 16):
        out = weighted_mixture(
            df.withColumn("rate", F.lit(rate)), F.col("rate"), "doc_id"
        )
        kept[rate] = {r["doc_id"] for r in out.filter("kept").collect()}
    assert kept[0] == set()
    assert len(kept[16]) == 2000
    # nested: raising the rate only ADDS rows (stable subsampling — the
    # property that makes mixture re-weighting reproducible)
    assert kept[4] <= kept[8] <= kept[16]
    # ~uniform: 4/16 keeps about 25%
    assert 0.18 < len(kept[4]) / 2000 < 0.32


class TestWeightedPrioritySample:
    def test_bias_toward_heavy_weights(self, spark):
        from hybrid_cdc_demo_spark.operators.curation import (
            weighted_priority_sample,
        )

        # two weight classes: heavy rows must dominate the sample
        rows = [(i, 1000 if i % 2 == 0 else 10) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = weighted_priority_sample(df, "w", "doc_id", k=50).collect()
        assert len(got) == 50
        heavy = sum(1 for r in got if r["w"] == 1000)
        assert heavy >= 40  # 100:1 odds per pick

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from hybrid_cdc_demo_spark.operators.curation import (
            weighted_priority_sample,
        )

        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, -4), (4, None), (5, 7)],
            "doc_id long, w long",
        )
        got = {r["doc_id"] for r in
               weighted_priority_sample(df, "w", "doc_id", k=10).collect()}
        assert got == {1, 5}

    def test_deterministic_across_partitionings(self, spark):
        from hybrid_cdc_demo_spark.operators.curation import (
            weighted_priority_sample,
        )

        rows = [(i, 1 + i % 7) for i in range(300)]
        df1 = spark.createDataFrame(rows, "doc_id long, w long").repartition(1)
        df2 = spark.createDataFrame(rows, "doc_id long, w long").repartition(13)
        a = [r["doc_id"] for r in
             weighted_priority_sample(df1, "w", "doc_id", k=30).collect()]
        b = [r["doc_id"] for r in
             weighted_priority_sample(df2, "w", "doc_id", k=30).collect()]
        assert a == b
