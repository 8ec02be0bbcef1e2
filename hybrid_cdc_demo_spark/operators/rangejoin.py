"""Banded range join: |left.v − right.v| ≤ ε as an EQUI-join.

Spark has no native range-join optimization — a plain inequality join
plans as BroadcastNestedLoopJoin (or a cartesian product), O(n·m)
comparisons, the scale killer behind 'joins on closeness' (sensor
alignment, price banding, numeric near-dup blocking). The standard
rewrite, implemented here: bucket each value at ε granularity; any
pair within ε lands in the same or an adjacent bucket, so exploding
ONE side into its 3 candidate buckets and hash-joining on the bucket
id finds every candidate pair with an equi-join, and the exact |a−b|
≤ ε predicate then filters false candidates. Cost: one hash shuffle
per side at 3× one side's rows — linear, partitionable, skew-capped
by the bucket width — instead of the quadratic loop. (Same family as
the Databricks range-join hint and the interval-join state layout in
streaming.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def band_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    epsilon: float,
    right_value_col: str | None = None,
) -> DataFrame:
    """Inner join of ``left`` × ``right`` on |l.value − r.value| ≤ ε
    (the COMPUTED double predicate). Output carries all columns of
    both sides. ``right_value_col`` defaults to ``value_col``.

    Candidate generation explodes ±2 buckets (5, not the textbook 3):
    in exact arithmetic a qualifying pair is at most 1 bucket apart,
    but hypothesis found the boundary case (tests/
    test_property_invariants.py) where the COMPUTED |a−b| rounds down
    to exactly ε while the true difference crosses one extra bucket
    boundary — and floor(v/ε)'s own quotient rounding can shift each
    side one more. ±2 covers both effects whenever |value|/ε < 2⁵⁰
    (beyond that, float bucketing is ill-defined — rescale ε).
    Candidate volume is 5× one side's rows, still linear."""
    rv = right_value_col or value_col
    bucket_l = F.floor(F.col(value_col) / epsilon).cast("long")
    bucket_r = F.floor(F.col(rv) / epsilon).cast("long")
    lx = left.withColumn(
        "__band",
        F.explode(
            F.array(
                bucket_l - 2, bucket_l - 1, bucket_l, bucket_l + 1,
                bucket_l + 2,
            )
        ),
    ).alias("__band_l")
    rx = right.withColumn("__band", bucket_r).alias("__band_r")
    # side-qualified references: with the default right_value_col
    # (same name both sides) an unqualified F.col(value_col) after the
    # join is ambiguous and raises AnalysisException
    lval = F.col(f"__band_l.{value_col}")
    rval = F.col(f"__band_r.{rv}")
    joined = lx.join(rx, F.col("__band_l.__band") == F.col("__band_r.__band"))
    return (
        joined.filter(F.abs(lval - rval) <= F.lit(epsilon))
        .drop(F.col("__band_l.__band"))
        .drop(F.col("__band_r.__band"))
    )
