"""PCA top-component query over the embeddings table.

The oracle re-derives the quantized Gram/mean sums, the covariance
matrix, and all eight power-iteration steps (matvec + normalization,
each on the same integer grid) in chained MATERIALIZED CTEs — an
end-to-end cross-engine VALUE check of a distributed linear-algebra
pipeline: if any of the d^2 covariance cells or any iteration's fold
differed by one quantum, every downstream loading would hash-mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linalg import (
    covariance_from_counts,
    gram_counts,
    power_iteration_quantized,
)
from .registry import query
from .relational import t

_DIM = 64
_ITERS = 8


def _pca_sql() -> str:
    ctes = [
        "e AS MATERIALIZED (SELECT embedding FROM embeddings)",
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM e)",
        f"""g AS MATERIALIZED (
        SELECT u.i AS i, u2.j AS j,
               SUM(CAST(floor(CAST(embedding[u.i + 1] AS DOUBLE)
                              * CAST(embedding[u2.j + 1] AS DOUBLE)
                              * 1000000.0 + 0.5) AS BIGINT)) AS s
        FROM e,
             unnest(generate_series(0, {_DIM - 1})) AS u(i),
             unnest(generate_series(0, {_DIM - 1})) AS u2(j)
        WHERE u2.j >= u.i
        GROUP BY u.i, u2.j
    )""",
        f"""m AS MATERIALIZED (
        SELECT u.i AS i,
               (SUM(CAST(floor(CAST(embedding[u.i + 1] AS DOUBLE)
                               * 1000000.0 + 0.5) AS BIGINT))
                / 1000000.0) / (SELECT n FROM nn) AS mu
        FROM e, unnest(generate_series(0, {_DIM - 1})) AS u(i)
        GROUP BY u.i
    )""",
        """c AS MATERIALIZED (
        SELECT g.i, g.j,
               (g.s / 1000000.0) / nn.n - m1.mu * m2.mu AS val
        FROM g, nn, m m1, m m2
        WHERE m1.i = g.i AND m2.i = g.j
    )""",
        """cf AS MATERIALIZED (
        SELECT i, j, val FROM c
        UNION ALL SELECT j AS i, i AS j, val FROM c WHERE i <> j
    )""",
        f"""v0 AS MATERIALIZED (
        SELECT u.i AS i, 1.0 / sqrt({_DIM}.0) AS val
        FROM unnest(generate_series(0, {_DIM - 1})) AS u(i)
    )""",
    ]
    for it in range(_ITERS):
        ctes.append(
            f"""u{it} AS MATERIALIZED (
        SELECT cf.i AS i,
               SUM(CAST(floor(cf.val * v.val * 1000000000.0 + 0.5)
                        AS BIGINT)) / 1000000000.0 AS val
        FROM cf JOIN v{it} v ON cf.j = v.i GROUP BY cf.i
    )"""
        )
        ctes.append(
            f"""l{it} AS MATERIALIZED (
        SELECT sqrt(SUM(CAST(floor(val * val * 1000000000000.0 + 0.5)
                             AS BIGINT)) / 1000000000000.0) AS l
        FROM u{it}
    )"""
        )
        ctes.append(
            f"v{it + 1} AS MATERIALIZED ("
            f"SELECT i, u.val / l.l AS val FROM u{it} u, l{it} l)"
        )
    final = (
        f"SELECT CAST(i AS INT) AS component, round(val, 6) AS loading"
        f" FROM v{_ITERS}"
        f" UNION ALL SELECT -1, round(l, 6) FROM l{_ITERS - 1}"
    )
    return "WITH " + ",\n    ".join(ctes) + "\n" + final


@query("pca_top_component", _pca_sql())
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows (component, loading) for the dominant covariance
    eigenvector of the embedding table, plus (-1, eigenvalue)."""
    emb = t(spark, sf_dir, "embeddings")
    n = emb.count()
    rows = gram_counts(emb, "embedding", _DIM).collect()  # d(d+3)/2 ints
    cov = covariance_from_counts(rows, _DIM, n)
    v, lam = power_iteration_quantized(cov, iters=_ITERS)
    out = [(int(i), float(x)) for i, x in enumerate(v)] + [(-1, float(lam))]
    return spark.createDataFrame(out, ["component", "loading"]).select(
        F.col("component").cast("int").alias("component"),
        F.round(F.col("loading"), 6).alias("loading"),
    )
