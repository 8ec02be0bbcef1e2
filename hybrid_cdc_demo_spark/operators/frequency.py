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

Execution shape (r11): ONE pass over the raw item stream collapses it
per partition to bounded (item, weight) partials (value_counts in C,
flushed every ``flush_at`` distinct items so per-task memory stays
bounded on adversarial vocabularies); the MG sketch and the exact
recount both consume the PERSISTED partials. Previously the full item
stream itself was persisted and scanned twice — at 100 TB that caches
a corpus-sized exploded stream where the partials are vocabulary-
per-partition-sized (guide §2.3: aggregate/collapse before you move
or materialize). Both the MG bound and the exact recount are
weight-oblivious: MG over (item, w) partials carries the identical
n_partition/(capacity+1) guarantee, and summing partial counts IS the
exact count.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _partial_counts(flush_at: int = 262_144):
    """mapInPandas worker: collapse a partition's item stream to
    (item, weight) partials. Per Arrow batch only the DISTINCT items
    touch Python dict ops (value_counts does the heavy lifting in C);
    the dict flushes whenever it reaches ``flush_at`` entries, so task
    memory is bounded regardless of per-partition vocabulary —
    repeated items across flushes simply yield several partials, which
    every consumer sums."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for item, w in pdf["_item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(w)
            if len(counts) >= flush_at:
                yield pd.DataFrame(
                    {"_item": list(counts), "_n": list(counts.values())}
                )
                counts = {}
        if counts:
            yield pd.DataFrame(
                {"_item": list(counts), "_n": list(counts.values())}
            )

    return fn


def _mg_summaries(capacity: int):
    """mapInPandas worker: one weighted Misra-Gries summary per
    partition of (item, weight) partials. The weighted decrement
    removes the largest mass m that zeroes at least one counter, so
    the per-partition guarantee est(x) ≥ true(x) − n_partition/
    (capacity+1) holds for any weighted stream — including the same
    item arriving in several partials."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item, w in zip(pdf["_item"], pdf["_n"]):
                w = int(w)
                if item in counters:
                    counters[item] += w
                elif len(counters) < capacity:
                    counters[item] = w
                else:
                    # weighted decrement: remove the largest mass m that
                    # zeroes at least one counter (min of current + w)
                    m = min(min(counters.values()), w)
                    dead = []
                    for k in counters:
                        counters[k] -= m
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
                    if w > m:
                        counters[item] = w - m
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
    tests/test_sketches.py with adversarial partitioning).

    The raw stream is scanned ONCE (the bounded per-partition collapse
    above); only the vocabulary-sized partials persist — released
    before returning (ADVICE r4 #4: a long-lived session calling this
    repeatedly must not accumulate cached blocks). Parallelism follows
    the input's partitioning: spread the UPSTREAM (pre-explode) frame
    if the local input is a single row group — repartitioning the
    exploded stream here would shuffle every item occurrence just to
    parallelize a map-only pass (removed r11)."""
    items = df.select(F.col(col).alias("_item")).filter(
        F.col("_item").isNotNull()
    )
    collapsed = items.mapInPandas(
        _partial_counts(), schema="_item string, _n long"
    ).persist()
    try:
        summaries = collapsed.mapInPandas(
            _mg_summaries(capacity), schema="_item string, _w long"
        )
        candidates = summaries.groupBy("_item").agg(F.sum("_w").alias("_est"))
        # ONE exact pass serves both the candidate recount and the
        # total N (r10): non-candidates collapse into a single NULL
        # bucket map-side, so the aggregated frame is ≤ capacity+1
        # rows and N is its row-count sum. The φ threshold then runs
        # on collected control data — bounded by the same pigeonhole
        # argument as the result itself.
        flagged = collapsed.join(
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
            .agg(F.sum("_n").cast("long").alias(out_count))
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
        return df.sparkSession.createDataFrame(
            rows, f"{out_item} string, {out_count} long"
        )
    finally:
        collapsed.unpersist()
