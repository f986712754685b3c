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


def _pca_ctes() -> list[str]:
    """Shared fit CTEs (quantized Gram/mean sums, covariance, power
    iteration) — both final SELECTs are assembled from this list, the
    same structure classifier._logreg_ctes uses (no string-slicing of a
    rendered query; ADVICE r5)."""
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
    return ctes


def _pca_sql() -> str:
    final = (
        f"SELECT CAST(i AS INT) AS component, round(val, 6) AS loading"
        f" FROM v{_ITERS}"
        f" UNION ALL SELECT -1, round(l, 6) FROM l{_ITERS - 1}"
    )
    return "WITH " + ",\n    ".join(_pca_ctes()) + "\n" + final


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


# ---------------------------------------------------------------------------
# PCA APPLY: project every embedding onto the dominant component and
# report the orthogonal residual norm — the whitening/denoising shape
# (large residual = far from the principal subspace; the spectral
# companion to the centroid-distance embedding_outliers). The fit reuses
# the quantized Gram/power-iteration pipeline; the per-row fold is a
# SERIAL left-to-right sum over dimensions on both engines (Spark
# F.aggregate, DuckDB list_aggregate), so no rounding-order slack is
# needed beyond the output rounding. The oracle re-derives the fit AND
# re-projects every row.
# ---------------------------------------------------------------------------
def _project_sql() -> str:
    ctes = ",\n    ".join(_pca_ctes())
    return f"""
    WITH {ctes},
    vl AS MATERIALIZED (SELECT list(val ORDER BY i) AS v FROM v{_ITERS}),
    ml AS MATERIALIZED (SELECT list(mu ORDER BY i) AS mm FROM m),
    pr AS (
        SELECT e2.vec_id, e2.embedding,
               list_aggregate(list_transform(generate_series(1, {_DIM}),
                   i -> (CAST(e2.embedding[i] AS DOUBLE) - ml.mm[i]) * vl.v[i]),
                   'sum') AS proj
        FROM embeddings e2, vl, ml
    )
    SELECT pr.vec_id,
           round(pr.proj, 6) AS proj,
           round(list_aggregate(list_transform(generate_series(1, {_DIM}),
                     i -> pow(CAST(pr.embedding[i] AS DOUBLE) - ml.mm[i]
                              - pr.proj * vl.v[i], 2)),
                     'sum'), 6) AS residual_sq
    FROM pr, vl, ml
    """


@query("pca_project_embeddings", _project_sql())
def pca_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    n = emb.count()
    rows = gram_counts(emb, "embedding", _DIM).collect()
    cov = covariance_from_counts(rows, _DIM, n)
    v, _ = power_iteration_quantized(cov, iters=_ITERS)
    mu = [0.0] * _DIM
    for r in rows:
        if r["j"] == -1:
            mu[r["i"]] = r["s"] / 1e6 / n
    vlit = F.array(*[F.lit(float(x)) for x in v])
    mlit = F.array(*[F.lit(float(x)) for x in mu])
    idx = F.sequence(F.lit(1), F.lit(_DIM))
    e = F.col("embedding")
    proj = F.aggregate(
        F.transform(
            idx,
            lambda i: (F.element_at(e, i).cast("double") - F.element_at(mlit, i))
            * F.element_at(vlit, i),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pr = emb.select("vec_id", "embedding", proj.alias("proj"))
    res = F.aggregate(
        F.transform(
            idx,
            lambda i: F.pow(
                F.element_at(F.col("embedding"), i).cast("double")
                - F.element_at(mlit, i)
                - F.col("proj") * F.element_at(vlit, i),
                F.lit(2.0),
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return pr.select(
        "vec_id",
        F.round("proj", 6).alias("proj"),
        F.round(res, 6).alias("residual_sq"),
    )
