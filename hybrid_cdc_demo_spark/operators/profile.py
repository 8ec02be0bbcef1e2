"""Dataset profiling: column-level statistics (rows, nulls, exact
distinct count, min/max) for selected columns in ONE aggregation pass
— the data-discovery report published next to every curated table
(df.summary()'s shape, but deterministic, hash-verifiable, and with
EXACT distincts).

Plan shape: Spark rewrites multiple COUNT(DISTINCT col) aggregates
into one Expand + two-phase aggregate — a single scan of the input
regardless of how many columns are profiled. min/max are emitted as
strings so one report schema serves any column type (the cast is
deterministic for ints/strings; profile numeric columns whose textual
form is exact, or pre-round).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_s, max_s) per profiled
    column, ordered by column name."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_null_{c}"),
            F.countDistinct(F.col(c)).cast("long").alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_s"),
                F.col(f"_max_{c}").alias("max_s"),
            )
            for c in sorted(cols)
        ]
    )
    return (
        row.select(F.col("_n").alias("n_rows"), F.explode(per_col).alias("p"))
        .select(
            F.col("p.col_name").alias("col_name"),
            F.col("n_rows"),
            F.col("p.n_null").alias("n_null"),
            F.col("p.n_distinct").alias("n_distinct"),
            F.col("p.min_s").alias("min_s"),
            F.col("p.max_s").alias("max_s"),
        )
        .orderBy("col_name")
    )
