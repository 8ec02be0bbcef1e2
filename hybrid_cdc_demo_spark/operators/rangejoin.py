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


#: tz-free microseconds-since-epoch for a TIMESTAMP_NTZ column — the
#: session timezone never enters, so the mapping is an exact bijection
#: (unix_micros(cast(ntz as timestamp)) is NOT: a DST-observing
#: session timezone makes it non-injective around transitions, which
#: would break bucket completeness below)
def ntz_micros(ts_col: str) -> F.Column:
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"{ts_col})"
    )


def keyed_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    left_us: str,
    right_us: str,
    upper_us: int,
    lower_us: int = 0,
) -> DataFrame:
    """INNER join on equal ``on`` key pairs AND
    ``right_us ∈ [left_us + lower_us, left_us + upper_us]`` (integer
    microsecond columns, e.g. from :func:`ntz_micros`) — planned as a
    pure hash EQUI-join on (keys, time bucket).

    Why not the plain equi-join with a residual range predicate: the
    shuffle key is then ONLY the join key, so a hot key (one user
    emitting half the event stream — the round-8 skew corpus) lands
    every one of its rows in ONE task whose pair loop is quadratic in
    the key's density. Bucketing time at ``w = upper - lower`` width
    and joining on (key, bucket) splits the hot key across its time
    range: parallelism scales with the key's LIFETIME, not its volume,
    and each task's pair space is bounded by rows-per-(key, window).
    This is the batch analogue of the state layout a watermarked
    stream-stream interval join keeps per (key, window).

    Candidate completeness (exact integer arithmetic, no float
    rounding): a qualifying pair has ``right_us - (left_us + lower)
    ∈ [0, w]``, so ``bucket(right) ∈ {bucket(left_us + lower),
    bucket(left_us + lower) + 1}`` — exploding the LEFT side into
    those two buckets finds every pair exactly once (the right row's
    own bucket is unique). Timestamps must be nonnegative (``div``
    truncates toward zero). Cost: 2× the left rows through one hash
    shuffle — linear, vs the hot-key quadratic stall.

    Output: all columns of both sides except the bucket; apply
    residual predicates (e.g. id inequality) on the result.
    """
    w = upper_us - lower_us
    if w <= 0:
        raise ValueError("keyed_interval_join: upper_us must exceed lower_us")
    lb = F.expr(f"(({left_us} + {lower_us}) div {w})")
    lx = left.withColumn("__ib", F.explode(F.array(lb, lb + 1))).alias("__il")
    rx = right.withColumn(
        "__ib", F.expr(f"({right_us} div {w})")
    ).alias("__ir")
    cond = F.col("__il.__ib") == F.col("__ir.__ib")
    for lc, rc in on:
        cond = cond & (F.col(f"__il.{lc}") == F.col(f"__ir.{rc}"))
    rus, lus = F.col(f"__ir.{right_us}"), F.col(f"__il.{left_us}")
    cond = (
        cond
        & (rus >= lus + F.lit(lower_us))
        & (rus <= lus + F.lit(upper_us))
    )
    return (
        lx.join(rx, cond)
        .drop(F.col("__il.__ib"))
        .drop(F.col("__ir.__ib"))
    )
