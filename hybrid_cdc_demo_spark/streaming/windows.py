"""Streaming window constructors (S1-S5) — the true readStream forms
of the batch-replay queries in plans.catalog.

Each takes an event stream with an event-time column and returns the
windowed aggregation; watermarks bound state so these run forever at
scale (state store size ∝ open windows, not history).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    watermark: str = "10 minutes",
    group_extra: list[str] | None = None,
) -> DataFrame:
    groups = [F.window(ts_col, size)] + [F.col(c) for c in (group_extra or [])]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*groups)
        .agg(F.count("*").alias("c"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(c) for c in (group_extra or [])],
            "c",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, size, slide))
        .agg(F.count("*").alias("c"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "c",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stateful_dedup(
    events: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """S5: duplicate-delivery removal with bounded state —
    dropDuplicatesWithinWatermark keeps ids only inside the watermark
    horizon (the reference's event_key dedup, event.py:124-129, with
    state that does not grow forever)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )
