"""Bloom-filter membership operator (operators/bloom.py): sizing
math, the no-false-negatives contract the exactness argument rests
on, a bounded false-positive rate, equivalence of blocklist_filter to
a plain anti-join, and the map-only shape of the probe."""

import numpy as np
import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.bloom import (
    blocklist_filter,
    build_bloom,
    might_contain,
    optimal_params,
)
from hybrid_cdc_demo_spark.sources.tables import load_table


def test_optimal_params_sizing():
    m, k = optimal_params(1000, 0.01)
    assert m % 64 == 0
    assert 9000 <= m <= 10100  # ~9.6 bits/key at 1% fpp
    assert 6 <= k <= 8
    m0, k0 = optimal_params(0, 0.01)
    assert m0 >= 64 and k0 >= 1


def test_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    m, k = optimal_params(500, 0.01)
    bitmap = build_bloom(keys, "k", m, k)
    probed = keys.withColumn("hit", might_contain(spark, "k", bitmap, k))
    assert probed.filter(~F.col("hit")).count() == 0


def test_false_positive_rate_bounded(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    m, k = optimal_params(500, 0.01)
    bitmap = build_bloom(keys, "k", m, k)
    # Disjoint probe set: ids 10_000..20_000 were never inserted.
    others = spark.range(10_000, 20_000).select(F.col("id").alias("k"))
    fp = (
        others.withColumn("hit", might_contain(spark, "k", bitmap, k))
        .filter(F.col("hit"))
        .count()
    )
    assert fp / 10_000 < 0.05  # 5x headroom over the 1% design point


def test_empty_blocklist_passes_everything(spark):
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    empty = keys.filter(F.lit(False))
    out = blocklist_filter(spark, keys, "k", empty, "k", expected_items=0)
    assert out.count() == 100


def test_blocklist_filter_equals_anti_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    banned = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    got = blocklist_filter(
        spark, events, "user_id", banned, "c_custkey",
        expected_items=banned.count(),
    )
    want = events.join(
        banned, F.col("user_id") == F.col("c_custkey"), "left_anti"
    )
    assert got.count() == want.count()
    assert (
        sorted(r["event_id"] for r in got.collect())
        == sorted(r["event_id"] for r in want.collect())
    )
    # Something must actually be blocked for this test to mean anything.
    assert got.count() < events.count()


def test_probe_is_map_only(spark, sf_dir):
    """The membership probe must add zero shuffles to the corpus scan
    — that is the whole point of the operator at 100 TB."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    m, k = optimal_params(100, 0.01)
    bitmap = np.zeros(m // 64, dtype=np.uint64)
    probed = events.withColumn(
        "hit", might_contain(spark, "user_id", bitmap, k)
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_duplicate_bits_in_one_batch_all_land():
    """np.bitwise_or.at is required for the build fold: plain fancy-
    index |= drops duplicate word indices within one batch. Guard the
    numpy idiom directly."""
    words = np.zeros(1, dtype=np.uint64)
    pos = np.array([0, 1, 2], dtype=np.int64)  # all in word 0
    np.bitwise_or.at(
        words, pos >> 6, np.left_shift(np.uint64(1), (pos & 63).astype(np.uint64))
    )
    assert words[0] == 0b111


def test_two_level_fold_matches_and_bounds_collect(spark):
    """VERDICT r5 #3: the partial bitmaps are OR-folded in a second
    distributed level, so the driver collect is bounded at
    min(sqrt(P), 64) rows regardless of scan partition count P — and
    the folded bitmap is bit-identical to a single-partition build."""
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    m, k = optimal_params(2000, 0.01)
    ref = build_bloom(keys.coalesce(1), "k", m, k)
    wide = build_bloom(keys.repartition(30), "k", m, k)
    assert np.array_equal(ref, wide)

    # bound the fan-in: spy on collect() of the final partials frame
    captured = {}
    orig_collect = type(keys).collect

    def spy(self):
        rows = orig_collect(self)
        if self.columns == ["bitmap"]:
            captured["n"] = len(rows)
        return rows

    type(keys).collect = spy
    try:
        build_bloom(keys.repartition(30), "k", m, k)
    finally:
        type(keys).collect = orig_collect
    # isqrt(30) = 5 second-level slots, some possibly empty
    assert 1 <= captured["n"] <= 5


def test_blocklist_filter_unchanged_with_many_partitions(spark):
    """The exact anti-join equivalence survives the two-level fold."""
    corpus = spark.range(0, 300).select(F.col("id").alias("k")).repartition(17)
    bad = spark.range(0, 300, 7).select(F.col("id").alias("b")).repartition(9)
    got = blocklist_filter(spark, corpus, "k", bad, "b", expected_items=50)
    want = corpus.join(bad, F.col("k") == F.col("b"), "left_anti")
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in want.collect()
    )
