"""Batch-GD logistic regression: exactness vs a numpy replica, learning
on a separable corpus, and the quantized-sum partitioning invariance."""

from __future__ import annotations

import pytest

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


@pytest.mark.slow  # 31-job GD training soak (~14s)
def test_train_logreg_learns_separable_labels(spark):
    rng = np.random.RandomState(3)
    X = np.column_stack([np.ones(200), rng.rand(200)])
    y = (X[:, 1] > 0.5).astype(float)
    df = _frame(spark, np.column_stack([X, np.zeros(200)]), y)
    w, _ = train_logreg(df, ["x0", "x1", "x2"], "y", iters=40, lr=8.0)
    acc = score_accuracy(df, ["x0", "x1", "x2"], "y", w)
    assert acc >= 0.9  # a 1-D threshold is learnable to near-perfect
    assert w[1] > 0  # weight points along the generating direction


def test_target_encoding_is_leave_one_out(monkeypatch, spark, tmp_path):
    # LOO property: a singleton group's encoding collapses to the
    # global prior (its own target contributes nothing), and within a
    # group the row with the LARGER target gets the SMALLER encoding.
    import pyspark.sql.functions as F

    from ml_pipelines_spark.queries.classifier import target_encode_segments

    import datetime

    cust = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "A"), (2, "c2", 0, 0.0, "A"), (3, "c3", 1, 0.0, "B")],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    d = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (10, 1, "O", 100.0, d, "1-URGENT"),
            (11, 2, "O", 300.0, d, "1-URGENT"),
            (12, 3, "F", 200.0, d, "5-LOW"),
        ],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    cust.write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    orders.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    rows = {
        r.o_orderkey: r.enc_value
        for r in target_encode_segments(spark, str(tmp_path)).collect()
    }
    prior = (100.0 + 300.0 + 200.0) / 3
    m = 20
    # singleton group B: (S_g - y + m*prior)/(n_g - 1 + m) = m*prior/m
    assert abs(rows[12] - prior) < 1e-6
    # group A: order 10 (y=100) keeps sibling's 300 -> larger encoding
    assert rows[10] > rows[11]
    want_10 = (300.0 + m * prior) / (1 + m)
    want_11 = (100.0 + m * prior) / (1 + m)
    assert abs(rows[10] - want_10) < 1e-6
    assert abs(rows[11] - want_11) < 1e-6
