"""Reconciliation operator: drift classification, fingerprint
insensitivity to column order, and summary accounting."""

import pyspark.sql.functions as F

from hybrid_cdc_demo_spark.operators.reconcile import (
    reconcile,
    reconcile_summary,
    row_fingerprint,
)


def test_drift_classification(spark):
    src = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, s string, v double"
    )
    tgt = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (4, "d", 4.0)], "k long, s string, v double"
    )
    out = {r["k"]: r["status"] for r in reconcile(src, tgt, ["k"], ["s", "v"]).collect()}
    assert out == {2: "mismatch", 3: "missing_in_target", 4: "missing_in_source"}


def test_fingerprint_is_column_order_canonical(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "k long, a string, b double")
    fp_ab = df.select(row_fingerprint(["a", "b"]).alias("f")).collect()[0]["f"]
    fp_ba = df.select(row_fingerprint(["b", "a"]).alias("f")).collect()[0]["f"]
    assert fp_ab == fp_ba


def test_summary_accounts_every_source_key(spark):
    src = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    tgt = spark.createDataFrame(
        [(i, float(i) if i % 3 else -1.0) for i in range(8)], "k long, v double"
    )
    out = {r["status"]: r["n"] for r in
           reconcile_summary(src, tgt, ["k"], ["v"]).collect()}
    # keys 0,3,6 mismatch (corrupted); 8,9 missing in target; rest ok
    assert out["mismatch"] == 3
    assert out["missing_in_target"] == 2
    assert out["in_sync_keys"] == 5
    assert "missing_in_source" not in out
    assert out["mismatch"] + out["missing_in_target"] + out["in_sync_keys"] == 10


def test_join_carries_fingerprints_not_payload(spark):
    """The reconciliation join must project (key, fingerprint) below
    the join — never the full payload columns."""
    src = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    tgt = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    plan = (
        reconcile(src, tgt, ["k"], ["s", "v"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the join node's output references fingerprints, not raw s/v
    join_part = plan.split("Join")[1].splitlines()[0]
    assert "_fp_s" in join_part or "_fp_t" in plan
