"""Streaming point-anomaly detection: per-key running moment state
(count / sum / sum-of-squares) maintained across micro-batches with
``applyInPandasWithState``; each batch's values are z-scored against
the state BEFORE the batch folds in (prequential scoring — a value
never justifies itself). The batch-mode semantic contract is
``plans.analytics_queries.ns_prequential_anomaly``: an expanding
window over (ts, event_id) order per key, which this operator equals
when batches arrive in timestamp order (asserted in
tests/test_stream_anomaly.py by replaying the same rows in ordered
micro-batches).

Scale shape: state is THREE numbers per key (never row history), the
stream shuffles once on the key, and scoring is vectorized numpy per
Arrow batch. The reference's monitoring surface (reference
src/observability/metrics.py moving averages) is the same consumer;
this is the stateful generalization Spark's built-in windowed
aggregates can't express (the score must use only PRIOR state).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def prequential_flags(
    values: list[float], n: int, sx: float, sxx: float, z_threshold: float
) -> tuple[list[float | None], int, float, float]:
    """Pure prequential scorer: z-score each value against the running
    (n, sx, sxx) BEFORE folding it in; returns (z list with None while
    n < 2 or variance <= 0, updated state). Unit-testable without the
    streaming runtime; the streaming operator and the tests share it."""
    zs: list[float | None] = []
    for x in values:
        if n >= 2:
            mean = sx / n
            var = (sxx - sx * sx / n) / (n - 1)
            zs.append((x - mean) / math.sqrt(var) if var > 0 else None)
        else:
            zs.append(None)
        n, sx, sxx = n + 1, sx + x, sxx + x * x
    return zs, n, sx, sxx


def stream_value_anomaly(
    stream: DataFrame,
    *,
    z_threshold: float = 2.0,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key streaming anomaly flags via applyInPandasWithState:
    emits one row per input event with its prequential z-score and
    flag; state per key is (n, sum, sumsq). Rows inside a batch score
    in (ts, id) order so replaying ordered batches reproduces the
    batch oracle exactly."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("etype", StringType()),
            StructField("event_id", LongType()),
            StructField("x", DoubleType()),
            StructField("z", DoubleType()),
            StructField("is_anomaly", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("sx", DoubleType()),
            StructField("sxx", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, sx, sxx = state.get if state.exists else (0, 0.0, 0.0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            zs, n, sx, sxx = prequential_flags(
                [float(v) for v in pdf[value_col]], n, sx, sxx, z_threshold
            )
            out.append(
                pd.DataFrame(
                    {
                        "etype": key[0],
                        "event_id": pdf[id_col].to_numpy(),
                        "x": pdf[value_col].astype(float).to_numpy(),
                        "z": pd.array(zs, dtype="float64"),
                        "is_anomaly": pd.array(
                            [
                                None if z is None else int(abs(z) > z_threshold)
                                for z in zs
                            ],
                            dtype="Int32",
                        ),
                    }
                )
            )
        state.update((n, sx, sxx))
        if out:
            yield pd.concat(out)

    return (
        stream.select(key_col, id_col, value_col, ts_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
