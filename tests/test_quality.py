"""Data-quality gate operator: one-pass summary, conservative null
handling, pass/fail split correctness, and the single-scan plan."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.quality import gate, violation_summary


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -1.0, "A"),     # violates positive
            (3, 5.0, "Z"),      # violates known_flag
            (4, None, "A"),     # null -> violates positive (conservative)
        ],
        "id long, qty double, flag string",
    )


RULES = None


def _rules():
    return {
        "positive": F.col("qty") > 0,
        "known_flag": F.col("flag").isin("A", "B"),
    }


def test_summary_counts_and_rates(spark):
    out = {r["rule"]: r for r in violation_summary(_df(spark), _rules()).collect()}
    assert out["positive"]["n_violations"] == 2  # -1 and NULL
    assert out["known_flag"]["n_violations"] == 1
    assert out["positive"]["n_rows"] == 4
    assert out["positive"]["violation_rate"] == 0.5


def test_gate_splits_any_violation(spark):
    good, bad = gate(_df(spark), _rules())
    assert sorted(r["id"] for r in good.collect()) == [1]
    assert sorted(r["id"] for r in bad.collect()) == [2, 3, 4]


def test_summary_is_single_scan(spark):
    df = _df(spark)
    plan = (
        violation_summary(df, _rules())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all rules fold into ONE aggregate over one source scan
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1
