"""Bucketed co-located joins: same-bucketed tables join with ZERO
Exchange operators, and results match the plain join."""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators.bucketing import bucketed_join, write_bucketed
from hybrid_cdc_demo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"),
        "orders_b",
        ["okey"],
        num_buckets=8,
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"),
        "lineitem_b",
        ["okey"],
        num_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    """With broadcast off (sf0.01 dims fit under the threshold; at
    real fact⋈fact scale neither side broadcasts) the join must reuse
    the bucket partitioning: a shuffle-based join with NO Exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", ["okey"]).select(
            "okey", "o_totalprice", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    plain = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert bucketed_join(spark, "orders_b", "lineitem_b", ["okey"]).count() == plain


def test_bucketed_agg_avoids_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key reuses the bucket partitioning."""
    agg = (
        spark.table("lineitem_b")
        .groupBy("okey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
