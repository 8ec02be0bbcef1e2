"""Z-order layout: curve-math properties plus the actual pruning
benefit, measured from real parquet footer min-max stats (the same
skipping decision the scan planner makes). Oracle parity for
ns_zorder_curve lives in test_oracle_parity.py.
"""

import os

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators import layout as L
from hybrid_cdc_demo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _deinterleave(z: int, ndim: int, bits: int) -> list[int]:
    vals = [0] * ndim
    for i in range(bits):
        for c in range(ndim):
            vals[c] |= ((z >> (i * ndim + c)) & 1) << i
    return vals


def test_interleave_roundtrip(spark):
    """interleave_bits is invertible: de-interleaving the key restores
    the quantized inputs exactly."""
    rows = [(a, b) for a in (0, 1, 5, 513, 1023) for b in (0, 2, 77, 1023)]
    df = spark.createDataFrame(rows, "q0 long, q1 long").withColumn(
        "z", L.interleave_bits([F.col("q0"), F.col("q1")], 10)
    )
    for r in df.collect():
        assert _deinterleave(r["z"], 2, 10) == [r["q0"], r["q1"]]


def test_quantize_clamps_and_orders(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double"
    ).select(L.quantize(F.col("v"), 0.0, 100.0, 10).alias("q"))
    qs = [r["q"] for r in df.collect()]
    assert qs[0] == 0 and qs[1] == 0  # below-range clamps to 0
    assert qs[3] == 1023 and qs[4] == 1023  # at/above-range clamps to top
    assert qs == sorted(qs)  # quantization is monotone


def test_zorder_key_plan_is_codegen_only(spark):
    ev = load_table(spark, SF, "events")
    out = ev.select(
        L.zorder_key(
            [F.col("user_id"), F.col("value")],
            bounds=[(0.0, 100.0), (0.0, 400.0)],
            bits=10,
        ).alias("z")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """Write the SAME events twice: z-ordered on (user_id, value) vs
    sorted on user_id alone — the single-key layout every naive
    pipeline ships with."""
    ev = load_table(spark, SF, "events")
    d = tmp_path_factory.mktemp("layout")
    zp, up = str(d / "zorder"), str(d / "user_sorted")
    L.zorder_write(ev, zp, ["user_id", "value"], bits=10, num_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(up)
    )
    bounds = L.column_bounds(ev, ["user_id", "value"])
    return zp, up, bounds


def test_zorder_prunes_on_both_dimensions(layouts):
    """The point of the curve: a narrow predicate on EITHER dimension
    skips most files, where the single-key layout only prunes its own
    sort key."""
    zp, up, ((lo_u, hi_u), (lo_v, hi_v)) = layouts
    puser = (lo_u + 0.4 * (hi_u - lo_u), lo_u + 0.45 * (hi_u - lo_u))
    pval = (lo_v + 0.4 * (hi_v - lo_v), lo_v + 0.45 * (hi_v - lo_v))

    z_user, z_total = L.file_pruning_stats(zp, {"user_id": puser})
    z_val, _ = L.file_pruning_stats(zp, {"value": pval})
    u_user, u_total = L.file_pruning_stats(up, {"user_id": puser})
    u_val, _ = L.file_pruning_stats(up, {"value": pval})

    # z-order: both dimensions prune to at most half the files
    assert z_user <= z_total / 2
    assert z_val <= z_total / 2
    # user-sorted: perfect on its key, (near-)zero pruning on value
    assert u_user <= u_total / 4
    assert u_val >= 0.9 * u_total

    # conjunction prunes at least as hard as either conjunct
    z_both, _ = L.file_pruning_stats(zp, {"user_id": puser, "value": pval})
    assert z_both <= min(z_user, z_val)


def test_zorder_write_preserves_rows(spark, layouts):
    zp, _, _ = layouts
    ev = load_table(spark, SF, "events")
    back = spark.read.parquet(zp)
    assert back.count() == ev.count()
    assert set(back.columns) == set(ev.columns)
    # every original event_id survives exactly once
    assert back.select("event_id").distinct().count() == ev.count()


def test_file_pruning_stats_counts_all_files(layouts):
    zp, _, _ = layouts
    n_parquet = sum(1 for f in os.listdir(zp) if f.endswith(".parquet"))
    needed, total = L.file_pruning_stats(zp, {})
    assert total == n_parquet
    assert needed == total  # empty predicate reads everything
