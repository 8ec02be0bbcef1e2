"""global_rank: distributed total-order enumeration
(operators/partitioning.py). Corpus-wide parity is hash-checked by
the oracle sweep (ns_corpus_shuffle); here we pin the semantics and
the cross-partition offset stitching under adversarial partition
counts.
"""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.partitioning import global_rank


def _rank(spark, rows, cols=("v", "i"), partitions=None):
    df = spark.createDataFrame(rows, ["i", "v"])
    out = global_rank(df, list(cols), rank_col="pos", partitions=partitions)
    return {r["i"]: r["pos"] for r in out.collect()}


def test_matches_sorted_order(spark):
    rows = [(1, "c"), (2, "a"), (3, "b"), (4, "aa")]
    got = _rank(spark, rows)
    # sorted by v: a(2) < aa(4) < b(3) < c(1)
    assert got == {2: 1, 4: 2, 3: 3, 1: 4}


def test_positions_are_a_permutation_across_partition_counts(spark):
    import random

    rng = random.Random(9)
    rows = [(i, rng.random()) for i in range(500)]
    want = {
        i: k + 1
        for k, (i, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    for parts in (1, 3, 16, 64):
        got = _rank(spark, rows, partitions=parts)
        assert got == want, f"partitions={parts}"


def test_more_partitions_than_rows(spark):
    got = _rank(spark, [(1, "x"), (2, "y")], partitions=32)
    assert got == {1: 1, 2: 2}


def test_keeps_all_columns(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], ["i", "v", "w"])
    out = global_rank(df, ["v"], rank_col="pos")
    assert set(out.columns) == {"i", "v", "w", "pos"}
    assert out.dtypes[-1] == ("pos", "bigint")


def test_plan_has_no_global_window(spark):
    df = spark.range(100).select(
        F.col("id").alias("i"), F.rand(7).alias("v")
    )
    plan = (
        global_rank(df, ["v", "i"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "MapInPandas" in plan
