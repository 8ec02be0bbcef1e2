"""Data-layout queries: Z-order curve math, oracle-verified.

The curve itself (quantize + bit-interleave) is deterministic integer/
IEEE arithmetic, so DuckDB mirrors it bit for bit; the layout BENEFIT
(footer-stats pruning) is asserted in tests/test_layout.py where real
parquet files exist to measure.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators import layout as L
from hybrid_cdc_demo_spark.plans.catalog import query
from hybrid_cdc_demo_spark.sources.tables import load_table

_BITS = 10


def _interleave_sql(q0: str, q1: str, bits: int) -> str:
    """DuckDB Morton interleave: same static shift/mask/OR tree the
    Spark expression builds (bit i of dim c -> position i*2 + c)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({q0} >> {i}) & 1) << {i * 2})")
        terms.append(f"((({q1} >> {i}) & 1) << {i * 2 + 1})")
    return " | ".join(terms)


_Q_USER = (
    "GREATEST(0, LEAST(1023, CAST(floor((CAST(user_id AS DOUBLE) - lo_u) "
    "/ (hi_u - lo_u) * 1023.0) AS BIGINT)))"
)
_Q_VALUE = (
    "GREATEST(0, LEAST(1023, CAST(floor((value - lo_v) "
    "/ (hi_v - lo_v) * 1023.0) AS BIGINT)))"
)


@query(
    "ns_zorder_curve",
    oracle=f"""
    WITH b AS (
      SELECT CAST(MIN(user_id) AS DOUBLE) AS lo_u, CAST(MAX(user_id) AS DOUBLE) AS hi_u,
             MIN(value) AS lo_v, MAX(value) AS hi_v
      FROM events
    ), q AS (
      SELECT e.event_id, {_Q_USER} AS q0, {_Q_VALUE} AS q1
      FROM events e CROSS JOIN b
    )
    SELECT event_id, {_interleave_sql("q0", "q1", _BITS)} AS z
    FROM q ORDER BY z, event_id
    """,
)
def ns_zorder_curve(spark, sf_dir):
    """Z-order key for every event over (user_id, value), HASH-VERIFIED:
    bounds are one min/max aggregation (4 doubles of driver control
    data — the production shape reads them from table stats), the
    curve is a static 20-term shift/mask/OR tree inside whole-stage
    codegen. This key is what zorder_write range-partitions on to make
    footer stats prune on BOTH dimensions (benefit measured in
    tests/test_layout.py)."""
    ev = load_table(spark, sf_dir, "events")
    (lo_u, hi_u), (lo_v, hi_v) = L.column_bounds(ev, ["user_id", "value"])
    z = L.zorder_key(
        [F.col("user_id"), F.col("value")],
        bounds=[(lo_u, hi_u), (lo_v, hi_v)],
        bits=_BITS,
    )
    return ev.select("event_id", z.alias("z")).orderBy("z", "event_id")
