"""Frequent-items (heavy hitters) via a Misra-Gries sketch with exact
verification — the third mergeable sketch family next to HLL
cardinality and KLL quantiles (plans/stats_queries.py).

Why a sketch at all when groupBy(col).count() is exact: at 100 TB the
full frequency table itself is huge (every distinct token shuffles),
while the heavy-hitter question ("which items exceed φN?") has a
bounded answer. Misra-Gries summarizes each partition in O(capacity)
space with the deterministic guarantee

    est(x) ≥ true(x) − n_partition/(capacity+1)

so summing per-partition summaries keeps every item with global
frequency > N/(capacity+1) in the candidate set (est > 0). The exact
pass then recounts ONLY candidate items (a broadcast semi-join —
capacity×partitions rows, kilobytes) and applies the φ threshold, so
the final answer is EXACT and independent of partitioning — which is
what lets a DuckDB oracle hash-check a sketch-powered query
(ns_heavy_hitters). The sketch prunes the shuffle; it never decides
the answer.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hybrid_cdc_demo_spark.operators.partitioning import spread


def _mg_summaries(capacity: int):
    """mapInPandas worker: one weighted Misra-Gries summary per
    partition. Batch-vectorized: per Arrow batch only the DISTINCT
    items touch Python dict ops (value_counts does the heavy lifting
    in C), so cost scales with distinct-per-batch, not rows."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item, w in pdf["_item"].value_counts().items():
                if item in counters:
                    counters[item] += int(w)
                elif len(counters) < capacity:
                    counters[item] = int(w)
                else:
                    # weighted decrement: remove the largest mass m that
                    # zeroes at least one counter (min of current + w)
                    m = min(min(counters.values()), int(w))
                    dead = []
                    for k in counters:
                        counters[k] -= m
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
                    if int(w) > m:
                        counters[item] = int(w) - m
        if counters:
            yield pd.DataFrame(
                {"_item": list(counters), "_w": list(counters.values())}
            )

    return fn


def heavy_hitters(
    df: DataFrame,
    col: str,
    capacity: int = 64,
    out_item: str = "item",
    out_count: str = "n_occ",
) -> DataFrame:
    """Exact frequencies of every item occurring more than
    ``N/(capacity+1)`` times in ``df[col]`` (N = total rows), computed
    as Misra-Gries candidate generation + broadcast-semi-join exact
    recount. Returns ``(item, n_occ)`` — deterministic and equal to
    the brute-force answer by the MG guarantee (pinned in
    tests/test_sketches.py with adversarial partitioning)."""
    # three consumers read the token stream (summaries, exact recount,
    # total) — persist so the scan+explode upstream runs once, not 3×;
    # released before returning (ADVICE r4 #4: a long-lived session
    # calling this repeatedly must not accumulate cached blocks)
    items = spread(df).select(F.col(col).alias("_item")).filter(
        F.col("_item").isNotNull()
    ).persist()
    try:
        summaries = items.mapInPandas(
            _mg_summaries(capacity), schema="_item string, _w long"
        )
        candidates = summaries.groupBy("_item").agg(F.sum("_w").alias("_est"))
        # ONE exact pass serves both the candidate recount and the
        # total N (r10; previously a semi-join recount plus a separate
        # full count = two scans of the cached stream): non-candidates
        # collapse into a single NULL bucket map-side, so the
        # aggregated frame is ≤ capacity+1 rows and N is its row-count
        # sum. The φ threshold then runs on collected control data —
        # bounded by the same pigeonhole argument as the result itself.
        flagged = items.join(
            F.broadcast(
                candidates.select("_item").withColumn("_c", F.lit(1))
            ),
            "_item",
            "left",
        )
        counts = (
            flagged.groupBy(
                F.when(F.col("_c") == 1, F.col("_item")).alias("_item")
            )
            .agg(F.count(F.lit(1)).cast("long").alias(out_count))
        )
        # ≤ capacity+1 rows (candidates + the NULL rest-bucket):
        # bounded driver-side control data at any scale
        buckets = counts.collect()
        n = sum(r[out_count] for r in buckets)
        rows = [
            (r["_item"], r[out_count])
            for r in buckets
            if r["_item"] is not None and r[out_count] * (capacity + 1) > n
        ]
        return items.sparkSession.createDataFrame(
            rows, f"{out_item} string, {out_count} long"
        )
    finally:
        items.unpersist()
