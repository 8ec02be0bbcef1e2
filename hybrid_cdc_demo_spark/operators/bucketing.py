"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling
both sides. Writing both tables bucketed (hash-partitioned INTO
FILES) on the join key means every join on that key is
exchange-free: Spark reads matching buckets pairwise. This is the
`bucketing` leg of the shuffle-minimization strategy (broadcast for
small dims, AQE for skew, bucketing for repeated big-big joins).

Bucketed tables must live in the session catalog (`saveAsTable` —
parquet files + bucket metadata); a plain `.parquet(path)` write
cannot carry bucket info. The plan test asserts the join compiles
with zero `Exchange` operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by the
    join key. ``num_buckets`` should match across tables that join
    together and divide evenly into cluster cores."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    planned without any Exchange when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
