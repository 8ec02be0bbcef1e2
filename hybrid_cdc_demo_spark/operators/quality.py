"""Declarative data-quality gate: named boolean rules evaluated in ONE
pass over the frame — the generic expectations/constraints stage
(Delta CHECK constraints / Great-Expectations class) that a production
pipeline runs between ingest and publish. The pipeline's envelope
checks (streaming/pipeline.py:_build_checks) are the CDC-specific
instance of the same shape; this operator generalizes it to any table.

Scale design: rules are unbound Column predicates, so the summary is a
single map-side aggregate (SUM(CASE) per rule — one scan, no shuffle
beyond the 1-row final combine) and the gate is a plain filter that
pushes down with the rest of the plan. Never a per-rule pass, never a
driver-side loop over rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def violation_summary(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_violations, n_rows, violation_rate).
    All rules evaluate in a single aggregate over one scan; the rate is
    one IEEE division of exact longs (hash-exact cross-engine)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0))
            .cast("long")
            .alias(f"_v_{name}")
        )
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"_v_{name}").alias("n_violations")
            )
            for name in rules
        ]
    )
    return (
        row.select(F.col("_n").alias("n_rows"), F.explode(pairs).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.n_violations").alias("n_violations"),
            F.col("n_rows").alias("n_rows"),
            (
                F.col("r.n_violations").cast("double")
                / F.col("n_rows").cast("double")
            ).alias("violation_rate"),
        )
        .orderBy("rule")
    )


def gate(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split (passing, failing): a row fails if ANY rule is violated
    (nulls count as violations, the conservative contract). Both sides
    are filters over the same plan — Catalyst pushes them to the scan;
    callers route the failing side to a DLQ/quarantine table exactly
    like the streaming pipeline's invalid split."""
    ok = F.lit(True)
    for pred in rules.values():
        ok = ok & F.coalesce(pred, F.lit(False))
    return df.filter(ok), df.filter(~ok)


def winsorize(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    lower_pct: int = 1,
    upper_pct: int = 99,
) -> DataFrame:
    """EXACT-percentile winsorization (outlier capping): clip
    ``value_col`` to its [lower_pct%, upper_pct%] order statistics — the
    tail-robust cleaning step the approximate quantile sketch
    (stats_queries.ns_quantile_sketch) deliberately trades away.

    Scale shape — exact TAIL order statistics WITHOUT a global sort:
    the boundary at ascending rank r is the MAX of the r smallest
    rows, so each boundary is one TakeOrderedAndProject (distributed
    per-partition heaps, r rows to one reducer) + a 1-row aggregate —
    for tail quantiles r ≪ n, so this stays cheap where a full
    ranking pass would shuffle everything. The row count (one count
    action, bounded driver control data) fixes the ranks; ties break
    on ``id_col`` so the boundary row is unique. Clipping is then a
    map-side CASE over the broadcast boundaries.

    Determinism: boundaries are exact values from the data (no
    interpolation); the percentile ranks use INTEGER ceiling
    arithmetic (ceil(n*pct/100) = (n*pct + 99) // 100) — a float
    ceil(0.01*n) rounds differently across engines — and the clip is
    a value copy, so every output bit equals the oracle's row_number
    formulation.
    """
    n = df.count()
    if n == 0:
        raise ValueError("winsorize needs a non-empty frame")
    lo_r = max((n * lower_pct + 99) // 100, 1)
    hi_r = max((n * upper_pct + 99) // 100, 1)
    v, i = F.col(value_col), F.col(id_col)
    lo = (
        df.select(value_col, id_col)
        .orderBy(v.asc(), i.asc())
        .limit(lo_r)
        .agg(F.max(F.struct(v.alias("v"), i.alias("i"))).getField("v").alias("_lo"))
    )
    hi = (
        df.select(value_col, id_col)
        .orderBy(v.desc(), i.desc())
        .limit(n - hi_r + 1)
        .agg(F.min(F.struct(v.alias("v"), i.alias("i"))).getField("v").alias("_hi"))
    )
    clipped = (
        F.when(v < F.col("_lo"), F.col("_lo"))
        .when(v > F.col("_hi"), F.col("_hi"))
        .otherwise(v)
    )
    return (
        df.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            id_col,
            value_col,
            F.col("_lo").alias("lo_bound"),
            F.col("_hi").alias("hi_bound"),
            clipped.alias("clipped"),
            ((v < F.col("_lo")) | (v > F.col("_hi"))).cast("int").alias(
                "is_clipped"
            ),
        )
    )
