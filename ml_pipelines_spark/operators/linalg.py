"""Distributed linear algebra over embedding columns — the MLlib
``computeGramianMatrix`` pattern re-expressed with mapInPandas: each
partition folds its rows into one d x d partial, partials are summed by
key, and only the d x d result (never the data) reaches the driver.

The reference has no linear-algebra surface; this is a north-star
extension for embedding-table analytics (PCA whitening, drift checks,
spectral diagnostics) at 100 TB: the shuffled volume is O(P * d^2)
partials, independent of row count.

Cross-engine exactness: per-row contributions are quantized to int64
with ``floor(x * SCALE + 0.5)`` (explicit half-up — numpy's round() is
banker's, SQL's is half-away; floor(+0.5) is identical everywhere) and
summed as integers, so partitioning and summation order cannot change a
bit. The power iteration then runs on exact integer-derived doubles
with the same quantized fold on both engines.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_SCALE = 1e6  # per-row product quantum
MV_SCALE = 1e9    # matvec contribution quantum
SQ_SCALE = 1e12   # squared-norm contribution quantum


def _half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


def gram_counts(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Quantized Gram partials: rows (i, j, s) for j >= i plus the
    component sums as (i, -1, s); one fold per partition, integer-exact.
    """

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.int64)
        sums = np.zeros(dim, dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # Quantize each row's outer product, THEN accumulate in
            # int64 — bit-identical to the SQL twin's per-row fold.
            for row in x:
                gram += _half_up(np.outer(row, row) * GRAM_SCALE).astype(
                    np.int64
                )
                sums += _half_up(row * GRAM_SCALE).astype(np.int64)
        if not seen:
            return
        iu, ju = np.triu_indices(dim)
        out = pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(dim)]),
                "j": np.concatenate([ju, np.full(dim, -1)]),
                "s": np.concatenate([gram[iu, ju], sums]),
            }
        )
        yield out

    partials = df.select(vec_col).mapInPandas(fold, "i int, j int, s long")
    return partials.groupBy("i", "j").agg(F.sum("s").alias("s"))


def covariance_from_counts(
    rows: list, dim: int, n: int
) -> np.ndarray:
    """Exact covariance (biased, /n) from quantized integer sums."""
    g = np.zeros((dim, dim), dtype=np.float64)
    mu = np.zeros(dim, dtype=np.float64)
    for r in rows:
        if r["j"] == -1:
            mu[r["i"]] = r["s"] / GRAM_SCALE / n
        else:
            g[r["i"], r["j"]] = r["s"] / GRAM_SCALE
            g[r["j"], r["i"]] = r["s"] / GRAM_SCALE
    return g / n - np.outer(mu, mu)


def power_iteration_quantized(
    cov: np.ndarray, iters: int = 8
) -> tuple[np.ndarray, float]:
    """Dominant eigenvector by power iteration with the quantized fold
    (contributions floored to the MV/SQ grids before integer-exact
    summation), mirrored term-for-term by the SQL twin's chained CTEs.
    Returns (unit eigenvector, eigenvalue estimate ||C v||)."""
    d = cov.shape[0]
    v = np.full(d, 1.0 / np.sqrt(d))
    lam = 0.0
    for _ in range(iters):
        u = np.array(
            [
                int(np.sum(_half_up(cov[i] * v * MV_SCALE).astype(np.int64)))
                / MV_SCALE
                for i in range(d)
            ]
        )
        nrm_sq = (
            int(np.sum(_half_up(u * u * SQ_SCALE).astype(np.int64))) / SQ_SCALE
        )
        lam = float(np.sqrt(nrm_sq))
        v = u / lam
    return v, lam
