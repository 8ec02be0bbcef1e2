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
