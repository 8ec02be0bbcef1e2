"""Quality-classifier operators: linear/logistic document scoring and
distributed logistic-regression training.

The production pattern (fastText/CCNet-style quality filtering at
corpus scale) is: score every document with a tiny linear model over
cheap surface features, keep/drop on the score. Scoring is a map-only
projection — no shuffle, no Python — so it runs at scan speed on any
corpus size. Training follows the classic distributed-ML split: the
model (a handful of doubles) lives on the driver; each gradient-descent
iteration is ONE distributed aggregation over the executors (map-side
partial sums of per-row gradient contributions), so data never moves
and the per-iteration network cost is O(num_features) bytes.

Reference parity: the reference (NhaLeTruc/hybrid-cdc-demo) has no ML
path — this module is north-star training-data-pipeline surface, like
operators/clustering.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from hybrid_cdc_demo_spark.functions import text as T


def doc_feature_exprs(text: Column | str) -> list[Column]:
    """The classifier's surface features, in contract order:
    [len_norm, punct_ratio, stopword_ratio]. Each is plain IEEE
    arithmetic over the oracle-verified ns_text_stats signals, so the
    doubles are bitwise-reproducible in ANSI SQL."""
    c = F.col(text) if isinstance(text, str) else text
    len_norm = F.least(F.length(c).cast("double") / F.lit(200.0), F.lit(1.0))
    return [len_norm, T.punct_ratio(c), T.stopword_ratio(c)]


#: Fixed published-style filter weights: [bias, len_norm, punct, stop].
#: Chosen to split the synthetic corpus roughly in half so both the
#: keep and drop branches stay exercised at every SF.
QUALITY_WEIGHTS = [-1.4, 1.0, 2.0, 8.0]


def logit_score(features: list[Column], weights: list[float]) -> Column:
    """w0 + w1*f1 + ... in fixed left-to-right order — the log-odds
    score. Emitted UNROUNDED: products and sums of bitwise-equal
    feature doubles in a fixed association order are deterministic in
    both engines, while exp()/ROUND() are not (libm last-ulp / .xx5
    boundary divergence — see PLANS.md determinism rules)."""
    if len(weights) != len(features) + 1:
        raise ValueError(
            f"weights must be [bias] + one per feature: "
            f"{len(weights)} weights for {len(features)} features"
        )
    score = F.lit(float(weights[0]))
    for w, f in zip(weights[1:], features):
        score = score + F.lit(float(w)) * f
    return score


def score_documents(
    df: DataFrame,
    text_col: str = "text",
    weights: list[float] | None = None,
) -> DataFrame:
    """Map-only quality scoring: adds ``score`` (log-odds double) and
    ``keep`` (score > 0). Log-odds is monotone in the logistic
    probability, so thresholding it IS thresholding the probability —
    without the non-reproducible exp()."""
    feats = doc_feature_exprs(text_col)
    s = logit_score(feats, weights or QUALITY_WEIGHTS)
    return df.withColumn("score", s).withColumn("keep", F.col("score") > 0)


@dataclass
class TrainHistory:
    iteration: int
    loss: float
    accuracy: float


def train_logistic(
    df: DataFrame,
    features: list[Column],
    label: Column,
    iters: int = 15,
    lr: float = 1.0,
    standardize: bool = True,
    driver_threshold: int = 500_000,
) -> tuple[list[float], list[TrainHistory]]:
    """Full-batch gradient descent for logistic regression, distributed.

    Each iteration evaluates the CURRENT weights as literals inside one
    aggregation job: per-row p = sigmoid(z), gradient contributions
    (p - y) * x_j, stable cross-entropy max(z,0) - z*y + log1p(exp(-|z|)),
    and accuracy — all partial-aggregated map-side, so the driver
    receives len(weights) + 2 doubles per iteration regardless of
    corpus size. Weights update driver-side (the model is the only
    state that round-trips).

    ``standardize`` z-scores each feature first (one extra stats
    aggregation) — without it, low-variance surface features (stopword
    ratio has sigma ~ 0.04) make the loss surface so ill-conditioned
    that fixed-step GD crawls. The returned weights are in the
    STANDARDIZED feature space (paired with the fitted means/scales
    they fold back algebraically; the training-curve contract doesn't
    need the fold-back).

    Floating-point note: the gradient sums are shuffle-order-dependent
    doubles, so trained weights are reproducible only to ~1 ulp across
    runs — fine for training (contract tests assert loss decrease and
    accuracy, not bitwise weights); use fixed weights (QUALITY_WEIGHTS)
    for oracle-checked scoring.

    Size-gated execution (r10, the pagerank/MMR precedent): each GD
    step is one scheduled aggregation job over the cached feature
    frame — pure scheduling latency once the frame is a few MB. Under
    ``driver_threshold`` rows the (already distributed-extracted)
    features collect once and the ``iters`` steps run in numpy:
    standardization uses the SAME collected Spark stats (elementwise,
    bitwise), and the per-step deviations are float SUM order and
    numpy-vs-JVM exp/log1p ulps — exactly the deviation classes the
    3-dp training-curve rounding already absorbs between runs and
    between engines (the generated oracle makes the same argument for
    DuckDB). Above the bound the distributed loop runs unchanged.
    """
    d = len(features)
    cols = [f.alias(f"_f{i}") for i, f in enumerate(features)]
    # (r10 A/B: spread() before the feature projection measured 12%
    # SLOWER at sf0.1 — the extra round-robin shuffle and 32-task
    # iteration jobs cost more than the parallel regex extraction
    # saved; the scan's native partitioning stays.)
    data = df.select(*cols, label.cast("double").alias("_y")).persist()
    try:
        if standardize:
            stats = data.agg(
                F.count(F.lit(1)).alias("n_rows"),
                *[F.avg(f"_f{i}").alias(f"m{i}") for i in range(d)],
                *[F.stddev_pop(f"_f{i}").alias(f"s{i}") for i in range(d)],
            ).collect()[0]
            if int(stats["n_rows"]) <= driver_threshold:
                return _train_logistic_driver(
                    data.collect(), stats, d, iters, lr
                )
            norm = [
                (F.col(f"_f{i}") - F.lit(float(stats[f"m{i}"])))
                / F.lit(float(stats[f"s{i}"]) or 1.0)
                for i in range(d)
            ]
            data2 = data.select(
                *[n.alias(f"_f{i}") for i, n in enumerate(norm)], "_y"
            ).persist()
            data.unpersist()
            data = data2
        w = [0.0] * (d + 1)
        history: list[TrainHistory] = []
        for it in range(iters):
            z = logit_score([F.col(f"_f{i}") for i in range(d)], w)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            resid = p - F.col("_y")
            ce = (
                F.greatest(z, F.lit(0.0))
                - z * F.col("_y")
                + F.log1p(F.exp(-F.abs(z)))
            )
            hit = ((p > 0.5).cast("double") == F.col("_y")).cast("double")
            aggs = [
                F.count(F.lit(1)).alias("n"),
                F.sum(ce).alias("loss"),
                F.sum(hit).alias("hits"),
                F.sum(resid).alias("g0"),
                *[
                    F.sum(resid * F.col(f"_f{i}")).alias(f"g{i + 1}")
                    for i in range(d)
                ],
            ]
            row = data.agg(*aggs).collect()[0]
            n = float(row["n"])
            w = [w[j] - lr * float(row[f"g{j}"]) / n for j in range(d + 1)]
            history.append(
                TrainHistory(it, float(row["loss"]) / n, float(row["hits"]) / n)
            )
        return w, history
    finally:
        data.unpersist()


def _train_logistic_driver(
    rows, stats, d: int, iters: int, lr: float
) -> tuple[list[float], list[TrainHistory]]:
    """The GD loop on the collected feature frame (see train_logistic's
    size gate; standardize=True path only — the gate rides the stats
    aggregation). Standardization replays the Spark expression
    elementwise with the SAME collected stats (bitwise); z folds
    term-by-term in weight order like logit_score; loss/hit/gradient
    formulas are term-for-term the distributed expressions."""
    import numpy as np

    X = np.array(
        [[r[f"_f{i}"] for i in range(d)] for r in rows], dtype=np.float64
    )
    y = np.array([r["_y"] for r in rows], dtype=np.float64)
    for i in range(d):
        X[:, i] = (X[:, i] - float(stats[f"m{i}"])) / (
            float(stats[f"s{i}"]) or 1.0
        )
    # Replicate Spark's NULL semantics: a NULL feature (or label) makes
    # z — and so every loss/hit/gradient term — NULL, which F.sum SKIPS
    # while F.count(lit(1)) still counts the row. numpy turns None into
    # NaN, which would instead poison the sums (and NaN > 0.5 is False,
    # so a NULL-feature row could score as a hit). Mask those rows out
    # of every sum; with no NULLs the np.where is the identity and the
    # arithmetic is unchanged (the bitwise-parity pins still hold).
    ok = ~(np.isnan(X).any(axis=1) | np.isnan(y))
    # Zero the masked rows' features/labels so 0.0-masked terms never
    # multiply a NaN back in (0.0 * NaN is NaN); every use of a masked
    # row is itself np.where(ok, ...)-masked below.
    X = np.where(ok[:, None], X, 0.0)
    y = np.where(ok, y, 0.0)
    n = float(len(rows))
    w = [0.0] * (d + 1)
    history: list[TrainHistory] = []
    with np.errstate(invalid="ignore", over="ignore"):
        for it in range(iters):
            z = np.full(len(rows), w[0], dtype=np.float64)
            for i in range(d):  # b + w1*f0 + w2*f1 + ... , left to right
                z = z + w[i + 1] * X[:, i]
            p = 1.0 / (1.0 + np.exp(-z))
            resid = np.where(ok, p - y, 0.0)
            ce = np.where(
                ok,
                np.maximum(z, 0.0) - z * y + np.log1p(np.exp(-np.abs(z))),
                0.0,
            )
            hit = np.where(
                ok,
                ((p > 0.5).astype(np.float64) == y).astype(np.float64),
                0.0,
            )
            g = [float(resid.sum())] + [
                float((resid * X[:, i]).sum()) for i in range(d)
            ]
            w = [w[j] - lr * g[j] / n for j in range(d + 1)]
            history.append(
                TrainHistory(it, float(ce.sum()) / n, float(hit.sum()) / n)
            )
    return w, history


def history_df(spark: SparkSession, history: list[TrainHistory]) -> DataFrame:
    """Training curve as a DataFrame (loss/accuracy rounded to 3
    decimals — sub-ulp run-to-run shuffle-order wobble rounds away,
    real convergence movement does not)."""
    rows = [
        (h.iteration, round(h.loss, 3), round(h.accuracy, 3)) for h in history
    ]
    return spark.createDataFrame(
        rows, "iteration INT, loss DOUBLE, accuracy DOUBLE"
    )
