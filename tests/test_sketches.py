"""Mergeable-sketch operators: HLL cardinality (tolerance vs exact +
union consistency) and KLL-family quantiles (rank-error tolerance vs
the exact per-group quantiles)."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.plans import QUERIES
from hybrid_cdc_demo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_hll_per_group_and_total_within_tolerance(spark):
    out = {r["event_type"]: r["distinct_users"]
           for r in QUERIES["ns_sketch_cardinality"](spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    exact_per = {
        r["event_type"]: r["cd"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("cd"))
        .collect()
    }
    exact_total = ev.agg(F.countDistinct("user_id").alias("cd")).collect()[0]["cd"]
    for et, exact in exact_per.items():
        assert abs(out[et] - exact) / exact < 0.05, (et, out[et], exact)
    assert abs(out["__total__"] - exact_total) / exact_total < 0.05


def test_hll_union_equals_direct_sketch(spark):
    """Mergeability: the union of per-group sketches must estimate the
    SAME cardinality as one sketch built over the whole table — the
    property that makes persisted per-partition sketches rollup-able
    without rescanning."""
    ev = load_table(spark, SF, "events")
    unioned = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    assert unioned == direct


def test_quantile_sketch_rank_error(spark):
    approx = {r["lang"]: (r["p25"], r["p50"], r["p90"])
              for r in QUERIES["ns_quantile_sketch"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    exact = {
        r["lang"]: (r["p25"], r["p50"], r["p90"])
        for r in docs.groupBy("lang")
        .agg(
            F.expr("percentile(n_chars, 0.25)").alias("p25"),
            F.expr("percentile(n_chars, 0.5)").alias("p50"),
            F.expr("percentile(n_chars, 0.9)").alias("p90"),
        )
        .collect()
    }
    for lang, (a25, a50, a90) in approx.items():
        e25, e50, e90 = exact[lang]
        for a, e in ((a25, e25), (a50, e50), (a90, e90)):
            assert abs(a - e) / max(e, 1.0) < 0.10, (lang, a, e)


def test_misra_gries_guarantee_under_adversarial_partitioning(spark):
    """The MG candidate set must contain EVERY item with frequency
    > N/(capacity+1) regardless of how rows are partitioned — the
    deterministic sketch guarantee the exact-verify stage relies on.
    Adversarial layout: each heavy item concentrated in one partition,
    drowned locally by distinct noise items."""
    import pyspark.sql.functions as F

    from hybrid_cdc_demo_spark.operators.frequency import heavy_hitters

    rows = []
    # 3 heavy items: 400 occurrences each; N = 3*400 + 2800 noise = 4000
    for h in range(3):
        rows += [(f"heavy{h}",)] * 400
    rows += [(f"noise{i}",) for i in range(2800)]
    df = spark.createDataFrame(rows, "tok string").repartition(8)
    # capacity 9 → threshold N/10 = 400 ... heavy items sit exactly at
    # the boundary, so use capacity 15 (threshold 250): heavies must
    # all survive, every noise item (freq 1) must be filtered
    out = {r["item"]: r["n_occ"] for r in heavy_hitters(df, "tok", capacity=15).collect()}
    assert out == {"heavy0": 400, "heavy1": 400, "heavy2": 400}

    # and the result equals brute force at a second capacity
    brute = {
        r["tok"]: r["c"]
        for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()
        if r["c"] * 64 > 4000
    }
    out64 = {r["item"]: r["n_occ"] for r in heavy_hitters(df, "tok", capacity=63).collect()}
    assert out64 == brute
