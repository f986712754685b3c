"""Distributed Gram/PCA kernels: partitioning invariance and agreement
with dense numpy linear algebra."""

from __future__ import annotations

import numpy as np

from ml_pipelines_spark.operators.linalg import (
    covariance_from_counts,
    gram_counts,
    power_iteration_quantized,
)


def _emb_frame(spark, X, parts):
    rows = [(i, [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


def test_gram_counts_partition_invariant_and_exact(spark):
    rng = np.random.RandomState(11)
    X = rng.randn(60, 8).astype(np.float32)
    a = {
        (r["i"], r["j"]): r["s"]
        for r in gram_counts(_emb_frame(spark, X, 1), "embedding", 8).collect()
    }
    b = {
        (r["i"], r["j"]): r["s"]
        for r in gram_counts(_emb_frame(spark, X, 7), "embedding", 8).collect()
    }
    assert a == b  # integer sums: bit-equal across partitionings
    # Spot-check one diagonal cell against a serial quantized fold.
    x0 = X[:, 0].astype(np.float64)
    expect = int(sum(int(np.floor(v * v * 1e6 + 0.5)) for v in x0))
    assert a[(0, 0)] == expect


def test_power_iteration_matches_dense_eigendecomposition(spark):
    rng = np.random.RandomState(5)
    X = rng.randn(200, 8).astype(np.float32)
    # Plant a dominant direction so the spectrum has a clear gap.
    X[:, 2] += 4.0 * rng.randn(200).astype(np.float32)
    df = _emb_frame(spark, X, 5)
    rows = gram_counts(df, "embedding", 8).collect()
    cov = covariance_from_counts(rows, 8, 200)
    v, lam = power_iteration_quantized(cov, iters=25)
    Xc = X.astype(np.float64) - X.astype(np.float64).mean(axis=0)
    dense = Xc.T @ Xc / len(X)
    w, V = np.linalg.eigh(dense)
    top = V[:, -1] * np.sign(V[2, -1]) * np.sign(v[2])
    assert abs(lam - w[-1]) < 1e-3 * max(1.0, w[-1])
    assert np.abs(np.abs(v @ top) - 1.0) < 1e-6  # same direction
