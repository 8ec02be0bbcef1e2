"""Partitioning helpers: spread no-op/raise behavior and salted-join
row equivalence with the plain join."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.partitioning import skew_salted_join, spread
from hybrid_cdc_demo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_spread_is_noop_when_already_parallel(spark):
    df = load_table(spark, SF, "lineitem").repartition(64)
    assert spread(df) is df  # no extra shuffle layered on


def test_spread_raises_parallelism_of_single_partition_input(spark):
    df = spark.range(100).coalesce(1)
    out = spread(df, 8)
    assert out.rdd.getNumPartitions() >= 8
    assert out.count() == 100


def test_salted_join_equals_plain_join(spark):
    """Same rows out, even with a pathologically hot key (90% of the
    large side on one key)."""
    large = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )
    plain = large.join(small, "k").select("k", "payload", "dim")
    salted = skew_salted_join(large, small, "k", salt_buckets=8).select(
        "k", "payload", "dim"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()


def test_salted_join_left_outer(spark):
    large = spark.createDataFrame(
        [(1, "a"), (1, "b"), (99, "c")], ["k", "payload"]
    )
    small = spark.createDataFrame([(1, "dim1")], ["k", "dim"])
    out = skew_salted_join(large, small, "k", salt_buckets=4, how="left").collect()
    by_payload = {r["payload"]: r["dim"] for r in out}
    assert by_payload == {"a": "dim1", "b": "dim1", "c": None}
