"""As-of join: attach to each left row the most recent right row at
or before its timestamp (per key).

Spark has no native AS-OF JOIN (DuckDB/kdb/QuestDB do). The naive
translation — range join + row_number — explodes to an O(n·m)
candidate set per key before pruning. This implementation is the
scale-correct union trick:

1. tag both sides and union them on (key, ts) — one dataset,
2. ONE shuffle: window per key ordered by (ts, side) where the right
   side sorts first at equal timestamps (ties are matches),
3. ``last(value, ignorenulls=True)`` over the unbounded-preceding
   frame carries the latest right values forward,
4. keep the left rows.

Cost: one hash shuffle + one sort — the same as a groupBy, no
candidate blowup regardless of how many right rows precede a left
row. Rows with no preceding right row keep NULLs (left-asof
semantics, matching DuckDB's ``ASOF LEFT JOIN``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. ``value_cols`` are the right-side columns to
    attach. ``direction="backward"`` matches the latest right row with
    ``right_ts <= left_ts``; ``"forward"`` the earliest with
    ``right_ts >= left_ts``."""
    assert direction in ("backward", "forward")
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    for c in left_cols:
        if c != key:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(*l.columns))
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc()]
        frame = Window.partitionBy(key).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0
        )
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
        frame = Window.partitionBy(key).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0
        )
    filled = u.select(
        *left_cols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(frame).alias(c)
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
