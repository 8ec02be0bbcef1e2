"""Contract tests for operators/classifier.py — the pinned contract
for the no-oracle ns_lr_training catalog entry (registered in
test_query_contracts.PINNED_NO_ORACLE), plus scoring invariants.
ns_quality_classifier itself is hash-verified in test_oracle_parity.
"""

import pyspark.sql.functions as F
import pytest

from hybrid_cdc_demo_spark.operators import classifier as CL
from hybrid_cdc_demo_spark.plans import QUERIES
from hybrid_cdc_demo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


def test_score_documents_splits_corpus(spark, docs):
    scored = CL.score_documents(docs)
    n = docs.count()
    kept = scored.filter("keep").count()
    # fixed weights are tuned so both branches stay populated
    assert 0 < kept < n
    # keep is exactly score > 0
    assert scored.filter((F.col("score") > 0) != F.col("keep")).count() == 0


def test_logit_score_weight_arity():
    with pytest.raises(ValueError):
        CL.logit_score([F.lit(1.0)], [0.0, 1.0, 2.0])


def test_scoring_plan_is_map_only(spark, docs):
    plan = (
        CL.score_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lr_training_converges(spark, docs):
    """Pinned contract for ns_lr_training: distributed GD on the
    distillation task must monotonically reduce loss and recover the
    separating rule to >=90% accuracy."""
    feats = CL.doc_feature_exprs("text")
    label = CL.logit_score(feats, CL.QUALITY_WEIGHTS) > 0
    w, hist = CL.train_logistic(docs, feats, label, iters=8, lr=1.0)
    losses = [h.loss for h in hist]
    assert all(b < a + 1e-12 for a, b in zip(losses, losses[1:])), losses
    assert hist[-1].accuracy >= 0.90
    # the rule loads positively on stopword ratio (feature 3) — the
    # trained model must agree on the sign in standardized space
    assert w[3] > 0


def test_lr_driver_gate_matches_distributed(spark, docs):
    """The r10 size-gated driver GD replay must agree with the
    distributed loop at the pinned 3-dp training-curve rounding (the
    declared output), and on weights to float-accumulation precision
    — the only deviations are SUM order and numpy-vs-JVM exp/log1p
    ulps, the classes the rounding absorbs."""
    import pytest as _pytest

    feats = CL.doc_feature_exprs("text")
    label = CL.logit_score(feats, CL.QUALITY_WEIGHTS) > 0
    w_drv, h_drv = CL.train_logistic(docs, feats, label, iters=8, lr=1.0)
    w_dist, h_dist = CL.train_logistic(
        docs, feats, label, iters=8, lr=1.0, driver_threshold=0
    )
    assert [
        (h.iteration, round(h.loss, 3), round(h.accuracy, 3)) for h in h_drv
    ] == [
        (h.iteration, round(h.loss, 3), round(h.accuracy, 3)) for h in h_dist
    ]
    for a, b in zip(w_drv, w_dist):
        assert a == _pytest.approx(b, rel=1e-9, abs=1e-12)


def test_lr_driver_gate_null_features_match_distributed(spark):
    """NULL features must train identically on both paths: F.sum skips
    the NULL gradient/loss/hit terms a NULL feature induces while
    count(1) still counts the row — the numpy replay masks NaN rows to
    replicate that (r10 ADVICE: un-masked NaN poisons every sum and
    NaN > 0.5 scores as a miss/hit)."""
    import math

    import pytest as _pytest

    data = [
        (
            None if i % 5 == 0 else float(i % 7) / 7.0,
            float((i * 3) % 5) / 5.0,
            i % 2,
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(data, "f0 double, f1 double, y int")
    feats = [F.col("f0"), F.col("f1")]
    label = F.col("y") == 1
    w_drv, h_drv = CL.train_logistic(df, feats, label, iters=4, lr=0.5)
    w_dist, h_dist = CL.train_logistic(
        df, feats, label, iters=4, lr=0.5, driver_threshold=0
    )
    assert [
        (h.iteration, round(h.loss, 3), round(h.accuracy, 3)) for h in h_drv
    ] == [
        (h.iteration, round(h.loss, 3), round(h.accuracy, 3)) for h in h_dist
    ]
    for a, b in zip(w_drv, w_dist):
        assert a == _pytest.approx(b, rel=1e-9, abs=1e-12)
    assert all(
        math.isfinite(h.loss) and math.isfinite(h.accuracy) for h in h_drv
    )


def test_lr_training_query_shape(spark):
    df = QUERIES["ns_lr_training"](spark, SF)
    assert df.dtypes == [
        ("iteration", "int"),
        ("loss", "double"),
        ("accuracy", "double"),
    ]
    rows = df.collect()
    assert [r["iteration"] for r in rows] == list(range(8))
    assert rows[-1]["loss"] < rows[0]["loss"]
