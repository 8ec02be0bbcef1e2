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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    interval: str = "5 minutes",
) -> DataFrame:
    """Stream-stream equi-join with a time-interval condition: rows
    pair only when the right event lands within ``interval`` of the
    left event. Both sides carry watermarks so the join state is
    BOUNDED — without the interval + watermarks Spark must keep every
    row forever (unbounded state, the classic stream-join trap at
    scale)."""
    import pyspark.sql.functions as F

    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {interval}"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond)


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    interval: str = "5 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: like interval_join, but
    a left row with no partner still emits (right side null) once the
    watermark passes its interval — the shape used to detect *missing*
    follow-up events (order with no payment, click with no conversion).
    Outer emission REQUIRES the watermark + time-range condition:
    without them Spark cannot ever conclude "no match will come" and
    rejects the query. State stays bounded exactly as in the inner
    form."""
    import pyspark.sql.functions as F

    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {interval}"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond, "leftOuter")


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join each streaming row to a
    broadcast dimension table — the canonical CDC enrichment (event →
    customer/account attributes). Stream-static joins are STATELESS in
    Spark (no watermark, no state store); broadcasting the dimension
    keeps the stream side shuffle-free, so throughput is unchanged at
    any scale where the dimension fits an executor (~GBs). For larger
    dimensions, drop the broadcast hint and pre-bucket both sides."""
    import pyspark.sql.functions as F

    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], how
    )


def running_totals_with_state(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    running (count, sum) maintained in explicit state across
    micro-batches — the escape hatch for aggregation semantics the
    built-in windowed operators can't express. Arrow-batched per
    group; state is two floats per key, not the row history."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("events", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("events", LongType()), StructField("total", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        events, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            events += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((events, total))
        import pandas as pd

        yield pd.DataFrame(
            {"key": [key[0]], "events": [events], "total": [total]}
        )

    return (
        stream.select(key_col, value_col, ts_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def merge_topk(
    held: list[tuple[int, float]],
    incoming: list[tuple[int, float]],
    k: int,
) -> list[tuple[int, float]]:
    """Deterministic top-k state merge: union held state with the
    batch's arrivals, rank value-desc with id-asc tiebreak, truncate
    to k. Pure function so the ranking semantics are unit-testable
    without the state-v2 runtime."""
    merged = list(held) + list(incoming)
    merged.sort(key=lambda t: (-t[1], t[0]))
    return merged[:k]


def topk_per_key_with_state(
    stream: DataFrame,
    k: int = 3,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming per-key top-k maintenance via transformWithStateInPandas
    (the state-v2 arbitrary-state API): each key's ListState holds ONLY
    its current top-k rows — merged with every batch's arrivals
    (:func:`merge_topk` — value desc, id asc to break ties
    deterministically) and re-emitted. The batch contract is q13's
    window rank: after all batches, each key's emission equals the
    batch top-k over the same rows.

    Why state v2 over applyInPandasWithState for this op: ListState
    gives a typed per-key collection with element-level puts (plus
    optional TTL) instead of one opaque state tuple — the natural shape
    for bounded-ranking state. State stays O(k) per key at any stream
    length; the 100 TB posture is the same as any keyed stateful op
    (hash partition on key, RocksDB-backed store, no history kept).

    Environment note: plan construction, schema resolution, and the
    merge semantics are always tested; END-TO-END execution requires
    the RocksDB state store AND the ``protobuf`` package (the state-v2
    Python worker protocol), which this container lacks — the e2e test
    auto-skips there and runs wherever protobuf is installed
    (tests/test_stream_join_state.py)."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = f"{id_col} long, {value_col} double"
    out_schema = (
        f"{key_col} string, rank int, {id_col} long, {value_col} double"
    )

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("topk", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            held = [(r[0], r[1]) for r in self._top.get()]
            incoming: list[tuple[int, float]] = []
            for pdf in rows:
                incoming.extend(
                    zip(pdf[id_col].astype(int), pdf[value_col].astype(float))
                )
            held = merge_topk(held, incoming, k)
            self._top.put([tuple(t) for t in held])
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(held),
                    "rank": list(range(1, len(held) + 1)),
                    id_col: [t[0] for t in held],
                    value_col: [t[1] for t in held],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select(key_col, value_col, id_col)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=TopK(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
