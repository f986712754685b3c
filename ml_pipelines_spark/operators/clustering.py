"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative-algorithm showcase of the similarity family: each Lloyd
iteration is ONE scan of the vectors — the current centers ride into the
plan as literals (the broadcast-model pattern; k x dim doubles is a few
KB at any corpus scale), assignment is an Arrow-batched argmin (no
cross join, no shuffle), and the center update is a posexplode +
groupBy(cluster, pos) whose map-side partial aggregation collapses every
partition to at most k*dim rows before the shuffle. At 100 TB the
per-iteration cost is a scan plus a k*dim-row shuffle — the same shape
MLlib's KMeans uses, expressed in plain DataFrame ops so the arithmetic
is engine-portable and oracle-checkable (unlike MLlib's RNG-seeded
kmeans||, whose init cannot be reproduced in SQL).

Determinism contract (what makes a cross-engine value oracle possible):

- init: the k vectors with the smallest ids, in id order (cid 0..k-1);
- distances: float64 squared-L2 folded LEFT-TO-RIGHT in index order
  (serial-over-dims numpy accumulation, see ``_assign_udf``) —
  bit-identical to a serial engine's in-order sum;
- ties: argmin breaks toward the smaller cid (struct min over
  (dist, cid)), identical to ``ORDER BY d, cid LIMIT 1``;
- empty clusters keep no center (they drop out, as in the SQL
  re-derivation; surviving cids keep their original numbering).

Mean centers are the one place the engines may differ in the last float
bit (grouped AVG accumulates in partition order); outputs are rounded
and the argmin gap of real clustered data is many orders above 1e-15,
so assignments are stable. Reference parity: the reference has no
clustering — this extends SURVEY §2.8 (embedding ops) the way a
training-data pipeline needs (corpus bucketing / diversity sampling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_udf(centers: dict[int, list[float]]):
    """Arrow-batched argmin assignment with EXACT left-fold distance
    semantics: the accumulation loop is serial over dimensions
    (vectorized over rows), so each squared-L2 sum is bit-identical to a
    serial engine's in-order fold — numpy's pairwise matmul summation
    would not be. Ties go to the smaller cid (``argmin`` returns the
    first minimum; candidate columns are in cid order)."""
    from pyspark.sql.types import IntegerType

    cids = sorted(centers)
    C = [np.asarray(centers[cid], dtype=np.float64) for cid in cids]
    cid_arr = np.asarray(cids, dtype=np.int64)

    @F.pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype=np.float64)
        D = np.empty((X.shape[0], len(C)))
        for j, c in enumerate(C):
            acc = np.zeros(X.shape[0])
            for k in range(X.shape[1]):
                d = X[:, k] - c[k]
                acc += d * d
            D[:, j] = acc
        return pd.Series(cid_arr[np.argmin(D, axis=1)].astype("int32"))

    return assign


def assign_clusters(
    df: DataFrame, vec_col: str, centers: dict[int, list[float]]
) -> DataFrame:
    """Add a ``cluster`` column: argmin over the broadcast center set,
    ties to the smallest cid. One narrow Arrow-batched pass, no shuffle
    (the centers travel as task-closure constants — k x dim doubles)."""
    return df.withColumn("cluster", _assign_udf(centers)(F.col(vec_col)))


def _mean_centers(assigned: DataFrame, vec_col: str) -> DataFrame:
    """Per-cluster mean vector as (cluster, pos, m) rows, pos 1-based.

    posexplode then groupBy(cluster, pos): the map-side combine bounds
    the shuffle at k*dim rows per input partition regardless of N.
    """
    flat = assigned.select(
        "cluster", F.posexplode(F.col(vec_col)).alias("pos0", "v")
    ).select(
        "cluster",
        (F.col("pos0") + 1).alias("pos"),
        F.col("v").cast("double").alias("v"),
    )
    return flat.groupBy("cluster", "pos").agg(F.avg("v").alias("m"))


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    center_updates: int = 1,
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Run Lloyd's with deterministic smallest-id init.

    Returns (assigned, centers): ``assigned`` carries the final
    ``cluster`` column (computed against the last updated centers) and
    ``centers`` is the center dict used for that final assignment. Each
    center update collects exactly k*dim doubles to the driver.
    """
    init_rows = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centers = {i: list(r["v"]) for i, r in enumerate(init_rows)}
    for _ in range(center_updates):
        assigned = assign_clusters(df, vec_col, centers)
        mean_rows = _mean_centers(assigned, vec_col).collect()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        centers = {
            cid: [pos_m[p] for p in sorted(pos_m)]
            for cid, pos_m in sorted(by_cluster.items())
        }
    return assign_clusters(df, vec_col, centers), centers


def cluster_profile(assigned: DataFrame, vec_col: str) -> DataFrame:
    """Final per-cluster summary, value-checkable after rounding:
    member count, squared norm of the member-mean center, and the sum of
    the center's first 4 coordinates."""
    means = _mean_centers(assigned, vec_col)
    counts = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    prof = means.groupBy("cluster").agg(
        F.round(F.sum(F.col("m") * F.col("m")), 6).alias("norm_sq"),
        F.round(
            F.sum(F.when(F.col("pos") <= 4, F.col("m")).otherwise(0.0)), 6
        ).alias("head_sum"),
    )
    return counts.join(prof, "cluster").select(
        F.col("cluster").cast("int").alias("cluster"),
        "n",
        "norm_sq",
        "head_sum",
    )


def semantic_dedup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    center_updates: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means clusters are
    the candidate buckets, exact cosine runs only within a cluster.

    This is the third candidate-generation strategy of the near-dup
    family (exact fingerprints, hyperplane LSH, and now learned
    clusters), and the one SemDeDup (Abbas et al., 2023) showed scales
    to web corpora: the pair join is keyed on ``cluster``, so the
    quadratic term is bounded by the largest cluster, not the corpus.
    At scale, ``k`` grows with N to hold the expected cluster size
    constant (SemDeDup uses ~50k clusters for LAION-scale); cluster ids
    then make a fine shuffle key. With demo-scale k the cluster key is
    coarse — callers at scale should also write the assigned table
    partitioned by cluster so re-dedup prunes on disk. Both properties
    are EVIDENCED, not just claimed: tests/test_clustering.py::
    test_semdedup_scaled_k_bounds_pair_join_and_prunes runs k=64 over
    2000 vectors and asserts sum(n_c^2) << N^2, single-cluster partition
    pruning of the stored assignment, and planted-pair recall.

    Exact verification reuses the Arrow-batched exact-fold pair dot
    (operators.similarity) so the cosine is bit-identical to a serial
    SQL engine and the threshold is oracle-checkable.
    """
    from .similarity import _pair_dot_udf, norm_expr

    assigned, _ = kmeans_fit(
        df, vec_col, id_col, k=k, center_updates=center_updates
    )
    side = assigned.select(
        "cluster",
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm_expr(F.col(vec_col)).alias("nrm"),
    )
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(b, "cluster")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                _pair_dot_udf()(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def _dist_to_center_udf(centers: dict[int, list[float]]):
    """Arrow-batched squared-L2 distance from each row's vector to its
    OWN cluster's center — same serial-over-dims exact-fold contract as
    ``_assign_udf`` (bit-identical to the SQL twin's in-order list_sum)."""
    from pyspark.sql.types import DoubleType

    C = {int(cid): np.asarray(c, dtype=np.float64) for cid, c in centers.items()}

    @F.pandas_udf(DoubleType())
    def dist(vecs: pd.Series, clusters: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype=np.float64)
        cl = clusters.to_numpy()
        out = np.zeros(len(X))
        for cid, c in C.items():
            m = cl == cid
            if not m.any():
                continue
            acc = np.zeros(int(m.sum()))
            Xm = X[m]
            for k in range(X.shape[1]):
                d = Xm[:, k] - c[k]
                acc += d * d
            out[m] = acc
        return pd.Series(out)

    return dist


def embedding_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    center_updates: int = 1,
    top_n: int = 20,
) -> DataFrame:
    """Embedding outlier scan: the ``top_n`` vectors farthest from their
    own k-means centroid — the standard embedding-space quality gate
    (mislabeled / corrupt / off-distribution samples rank first).

    Distances use the exact-fold kernel so the DuckDB twin reproduces
    them; ranking orders on the 6dp-ROUNDED distance (ties to the
    smaller id) so the cross-engine rank is stable even though grouped
    AVG centroids can differ in the last float bit. Two-phase top-n:
    per-partition prune to ``top_n`` before the single global sort of
    the ~top_n * P survivors.
    """
    from pyspark.sql.window import Window

    assigned, _ = kmeans_fit(
        df, vec_col, id_col, k=k, center_updates=center_updates
    )
    # Distances are measured against the MEMBER-MEAN center of the final
    # assignment (not the center the assignment was made with): that is
    # the centroid the cluster actually has, and what the SQL twin
    # re-derives. One more k*dim collect.
    mean_rows = _mean_centers(assigned, vec_col).collect()
    by_cluster: dict[int, dict[int, float]] = {}
    for r in mean_rows:
        by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
    centers = {
        cid: [pos_m[p] for p in sorted(pos_m)]
        for cid, pos_m in sorted(by_cluster.items())
    }
    scored = assigned.select(
        "cluster",
        F.col(id_col).alias("id"),
        F.round(
            _dist_to_center_udf(centers)(F.col(vec_col), F.col("cluster")), 6
        ).alias("dist_sq"),
    )
    part = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("dist_sq").desc(), F.col("id")
    )
    pruned = scored.withColumn("__pr", F.row_number().over(part)).filter(
        F.col("__pr") <= top_n
    )
    w = Window.orderBy(F.col("dist_sq").desc(), F.col("id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select(
            F.col("id").alias(id_col),
            F.col("cluster").cast("int").alias("cluster"),
            "dist_sq",
            "rank",
        )
    )


def _min_dist_udf(centers: dict[int, list[float]]):
    """Arrow-batched distance to the NEAREST center (same exact-fold
    contract as ``_assign_udf``; the min over centers of in-order sums)."""
    from pyspark.sql.types import DoubleType

    cids = sorted(centers)
    C = [np.asarray(centers[cid], dtype=np.float64) for cid in cids]

    @F.pandas_udf(DoubleType())
    def min_dist(vecs: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype=np.float64)
        D = np.empty((X.shape[0], len(C)))
        for j, c in enumerate(C):
            acc = np.zeros(X.shape[0])
            for k in range(X.shape[1]):
                d = X[:, k] - c[k]
                acc += d * d
            D[:, j] = acc
        return pd.Series(D.min(axis=1))

    return min_dist


def kmeans_trajectory(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    center_updates: int = 1,
) -> DataFrame:
    """Per-iteration convergence report for the deterministic Lloyd run:
    (iteration, inertia, n_moved) where inertia is the summed
    nearest-center squared distance under that iteration's centers and
    n_moved counts points whose assignment changed vs the previous
    iteration (0 rows moved == converged). Lloyd guarantees inertia is
    non-increasing; a cross-engine twin re-derives the whole trajectory,
    so a drifting update step (wrong means, wrong tie-break, lost
    cluster) shows up as a value mismatch, not just a weaker invariant.

    Each iteration is one narrow Arrow pass + a 2-value aggregate; the
    per-iteration center collect is k*dim doubles, as in kmeans_fit.
    """
    init_rows = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    centers = {i: list(r["v"]) for i, r in enumerate(init_rows)}
    prev_assigned = None
    reports = []
    for it in range(center_updates + 1):
        # vec_col rides along so the mean-update below reuses THIS
        # assignment frame instead of re-invoking assign_clusters
        # (Catalyst prunes __d out of the mean branch, so the reuse does
        # not drag the distance fold into the update pass).
        assigned = assign_clusters(df, vec_col, centers).select(
            F.col(id_col).alias("id"),
            "cluster",
            F.col(vec_col),
            _min_dist_udf(centers)(F.col(vec_col)).alias("__d"),
        )
        inertia = assigned.agg(
            F.round(F.sum("__d"), 2).alias("inertia")
        )
        if prev_assigned is None:
            moved = inertia.select(F.lit(None).cast("long").alias("n_moved"))
        else:
            moved = (
                assigned.alias("cur")
                .join(prev_assigned.alias("prv"), "id")
                .agg(
                    F.sum(
                        (F.col("cur.cluster") != F.col("prv.cluster")).cast(
                            "long"
                        )
                    ).alias("n_moved")
                )
            )
        reports.append(
            inertia.crossJoin(moved).select(
                F.lit(it).alias("iteration"), "inertia", "n_moved"
            )
        )
        prev_assigned = assigned.select("id", "cluster")
        if it < center_updates:
            mean_rows = _mean_centers(assigned, vec_col).collect()
            by_cluster: dict[int, dict[int, float]] = {}
            for r in mean_rows:
                by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
            centers = {
                cid: [pos_m[p] for p in sorted(pos_m)]
                for cid, pos_m in sorted(by_cluster.items())
            }
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
