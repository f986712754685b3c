"""Batch-GD logistic regression: exactness vs a numpy replica, learning
on a separable corpus, and the quantized-sum partitioning invariance."""

from __future__ import annotations

import math

import numpy as np

from ml_pipelines_spark.operators.classifier import (
    GRAD_SCALE,
    score_accuracy,
    train_logreg,
)


def _round_half_away(v: float) -> int:
    # F.round (HALF_UP) and DuckDB round() both break ties AWAY from zero;
    # Python's round() is banker's (half-to-even) and would diverge on a
    # gradient term landing exactly on a .5 quantum.
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def _numpy_train(X, y, iters, lr):
    w = np.zeros(X.shape[1])
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        # Same quantized-integer fold as the Spark plan and the SQL twin.
        s = np.array(
            [
                int(sum(_round_half_away(v) for v in (p - y) * X[:, j] * GRAD_SCALE))
                for j in range(X.shape[1])
            ]
        )
        w = w - lr * (s / (GRAD_SCALE * n))
    return w


def _frame(spark, X, y):
    rows = [(float(yy), *map(float, xx)) for yy, xx in zip(y, X)]
    return spark.createDataFrame(rows, ["y", "x0", "x1", "x2"])


def test_train_logreg_matches_numpy_bitwise(spark):
    rng = np.random.RandomState(7)
    X = np.column_stack([np.ones(64), rng.rand(64), rng.rand(64)])
    y = (X[:, 1] + 0.5 * X[:, 2] > 0.8).astype(float)
    df = _frame(spark, X, y).repartition(5)  # exactness must survive partitioning
    w_spark, n = train_logreg(df, ["x0", "x1", "x2"], "y", iters=4, lr=1.0)
    w_np = _numpy_train(X, y, iters=4, lr=1.0)
    assert n == 64
    assert w_spark == list(w_np)  # bit-equal, not approx: integer sums


def test_train_logreg_learns_separable_labels(spark):
    rng = np.random.RandomState(3)
    X = np.column_stack([np.ones(200), rng.rand(200)])
    y = (X[:, 1] > 0.5).astype(float)
    df = _frame(spark, np.column_stack([X, np.zeros(200)]), y)
    w, _ = train_logreg(df, ["x0", "x1", "x2"], "y", iters=40, lr=8.0)
    acc = score_accuracy(df, ["x0", "x1", "x2"], "y", w)
    assert acc >= 0.9  # a 1-D threshold is learnable to near-perfect
    assert w[1] > 0  # weight points along the generating direction
