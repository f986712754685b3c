"""Distributed linear-classifier training — the fastText-style quality
classifier of LLM data pipelines (GPT-3 / LLaMA-style "train a small
classifier on features, score the whole corpus"), expressed Spark-first.

The reference has no model-training surface at all; this is a north-star
extension. Batch gradient descent over a logistic model:

- the model (a handful of doubles) lives on the driver and is pushed
  into the plan as LITERALS each iteration — the standard broadcast-GD
  shape (MLlib GradientDescent does the same with treeAggregate);
- each iteration is ONE aggregate pass over the data (map-side combine,
  4 bigint sums + a count), so at 100 TB an iteration costs a scan, not
  a shuffle of rows;
- the only driver materialization is the 1-row gradient collect per
  iteration — the same k-row pattern as the k-means center collect.

Cross-engine exactness: per-row gradient contributions are quantized to
integers (``round(term * 1e9)`` as bigint) before summing, so the sum is
independent of partitioning and summation order — Spark's parallel sum
and DuckDB's serial sum agree bit-for-bit, and every downstream weight
is an exact function of those integer sums. The only residual risk is a
half-ulp difference in ``exp`` landing exactly on a rounding boundary,
which the 1e-9 grid makes vanishingly rare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAD_SCALE = 1e9


def sigmoid(margin: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-margin))


def _margin(weights: list[float], feats: list[Column]) -> Column:
    m = F.lit(0.0)
    for w, x in zip(weights, feats):
        m = m + F.lit(w) * x
    return m


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 0.5,
) -> tuple[list[float], int]:
    """Batch-GD logistic regression; returns (weights, n_rows).

    Weights start at zero. Update per iteration (mirrored verbatim by
    the SQL oracle's chained CTEs):

        s_j = sum(round((sigmoid(w . x) - y) * x_j * 1e9)::bigint)
        w_j <- w_j - lr * (s_j / (1e9 * n))
    """
    feats = [F.col(c) for c in feature_cols]
    y = F.col(label_col)
    weights = [0.0] * len(feature_cols)
    n: int | None = None
    for _ in range(iters):
        p = sigmoid(_margin(weights, feats))
        aggs = [
            F.sum(F.round((p - y) * x * GRAD_SCALE, 0).cast("long")).alias(f"s{j}")
            for j, x in enumerate(feats)
        ]
        row = df.agg(*aggs, F.count(F.lit(1)).alias("n")).first()
        n = row["n"]
        weights = [
            w - lr * (row[f"s{j}"] / (GRAD_SCALE * n))
            for j, w in enumerate(weights)
        ]
    return weights, int(n if n is not None else df.count())


def score_accuracy(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    weights: list[float],
) -> float:
    """Training accuracy at the 0.5 threshold — decided on the margin's
    sign, so no ``exp`` is evaluated at the decision boundary."""
    feats = [F.col(c) for c in feature_cols]
    pred = (_margin(weights, feats) >= 0).cast("double")
    row = df.agg(F.avg((pred == F.col(label_col)).cast("double")).alias("acc")).first()
    return float(row["acc"])
