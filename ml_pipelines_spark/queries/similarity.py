"""Similarity-search queries over the embeddings table.

The brute-force cosine top-k is exactly oracle-checked: both engines
compute float64 dot products as an index-order left fold, which is
bit-identical (verified empirically), so ranking and top-k membership
match with no tolerance. The LSH variants embed the same seeded
hyperplane literals in both plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ann_lsh_topk,
    embedding_near_dup_pairs,
    hyperplanes,
    knn_bruteforce,
    query_vector,
)
from .registry import query
from .relational import t

DIM = 64
K = 10
QUERY_VEC = query_vector(DIM, seed=7)
PLANES = hyperplanes(DIM, n_planes=4, seed=13)
NEAR_DUP_T = 0.4


def _sql_vec(vec: list[float]) -> str:
    # CAST to DOUBLE[] — DuckDB otherwise types long float literals as
    # DECIMAL and overflows scale 38 on multiplication.
    return "CAST([" + ", ".join(repr(v) for v in vec) + "] AS DOUBLE[])"


def _sql_dot(vec_expr: str, lit_list: str) -> str:
    """Index-order left-fold dot product — mirrors operators.similarity
    dot_expr exactly."""
    return (
        f"list_aggregate(list_transform(generate_series(1, len({vec_expr})), "
        f"i -> CAST({vec_expr}[i] AS DOUBLE) * ({lit_list})[i]), 'sum')"
    )


def _sql_self_dot(vec_expr: str) -> str:
    return (
        f"list_aggregate(list_transform(generate_series(1, len({vec_expr})), "
        f"i -> CAST({vec_expr}[i] AS DOUBLE) * CAST({vec_expr}[i] AS DOUBLE)), 'sum')"
    )


_QLIT = _sql_vec(QUERY_VEC)

# Query bucket computed once in Python (exactly as ann_lsh_topk does) and
# embedded as a literal in the oracle — never re-derived in SQL, where a
# float32 roundtrip could flip a near-zero projection sign.
import numpy as _np

_QBUCKET = "".join(
    "1" if float(_np.dot(_np.array(QUERY_VEC), _np.array(p))) >= 0 else "0"
    for p in PLANES
)
# Query-vector norm, same fold construction over the same literals.
_QNORM = (
    f"sqrt(list_aggregate(list_transform(generate_series(1, {DIM}), "
    f"i -> ({_QLIT})[i] * ({_QLIT})[i]), 'sum'))"
)


@query(
    "knn_bruteforce",
    f"""
    WITH scored AS (
        SELECT vec_id,
               {_sql_dot('embedding', _QLIT)} / (sqrt({_sql_self_dot('embedding')}) * {_QNORM}) AS cosine
        FROM embeddings
    ),
    ranked AS (
        SELECT vec_id, cosine,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT vec_id, ROUND(cosine, 6) AS cosine, rank FROM ranked WHERE rank <= {K}
    """,
)
def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return knn_bruteforce(emb, QUERY_VEC, k=K)


def _bucket_sql(vec_expr: str) -> str:
    bits = [
        f"CASE WHEN {_sql_dot(vec_expr, _sql_vec(p))} >= 0 THEN '1' ELSE '0' END"
        for p in PLANES
    ]
    return " || ".join(bits)


@query(
    "ann_lsh_topk",
    f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
        FROM embeddings
    ),
    cand AS (SELECT vec_id, embedding FROM bucketed WHERE bucket = '{_QBUCKET}'),
    scored AS (
        SELECT vec_id,
               {_sql_dot('embedding', _QLIT)} / (sqrt({_sql_self_dot('embedding')}) * {_QNORM}) AS cosine
        FROM cand
    ),
    ranked AS (
        SELECT vec_id, cosine,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT vec_id, ROUND(cosine, 6) AS cosine, rank FROM ranked WHERE rank <= {K}
    """,
)
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, QUERY_VEC, k=K, planes=PLANES)


# ---------------------------------------------------------------------------
# Multiprobe LSH ANN: the query bucket plus all flip-1-bit neighbors.
# Unlike the IVF invariant check below, this one is a TRUE cross-engine
# oracle: the probe set is a deterministic literal list, DuckDB re-derives
# every vector's bucket from the same hyperplane literals, and the exact
# cosine ranking over the probed union is value-checked end to end.
# ---------------------------------------------------------------------------
from ..operators.similarity import multiprobe_buckets as _mpb

_PROBES = _mpb(QUERY_VEC, PLANES)
_PROBES_SQL = ", ".join(f"'{b}'" for b in _PROBES)


@query(
    "ann_multiprobe_topk",
    f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
        FROM embeddings
    ),
    cand AS (
        SELECT vec_id, embedding FROM bucketed WHERE bucket IN ({_PROBES_SQL})
    ),
    scored AS (
        SELECT vec_id,
               {_sql_dot('embedding', _QLIT)} / (sqrt({_sql_self_dot('embedding')}) * {_QNORM}) AS cosine
        FROM cand
    ),
    ranked AS (
        SELECT vec_id, cosine,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT vec_id, ROUND(cosine, 6) AS cosine, rank FROM ranked WHERE rank <= {K}
    """,
)
def ann_multiprobe_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_multiprobe_topk

    emb = t(spark, sf_dir, "embeddings")
    return ann_multiprobe_topk(emb, QUERY_VEC, k=K, planes=PLANES)


# ---------------------------------------------------------------------------
# IVF ANN: MLlib k-means coarse cells + n_probe nearest-cell scan. The
# quantizer is library-trained (not SQL-reproducible), so — like
# approx_distinct_users — the oracle contract is the INVARIANT, computed
# in the same Spark plan: the probe returns exactly k results and its
# recall against the exact brute-force top-k clears the same >= 0.5 bar
# the property tests assert (tests/test_similarity.py). A broken
# quantizer, probe selection, or ranking flips a pinned value and fails
# the driver's hash compare.
# ---------------------------------------------------------------------------
@query(
    "ann_ivf_topk",
    f"SELECT CAST({K} AS BIGINT) AS n_results, TRUE AS recall_ge_50pct",
)
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_ivf_topk, kmeans_centroids

    emb = t(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=8, seed=17)
    ivf = ann_ivf_topk(emb, QUERY_VEC, k=K, centroids=cents, n_probe=3).select(
        "vec_id"
    )
    exact = knn_bruteforce(emb, QUERY_VEC, k=K).select("vec_id")
    hits = ivf.join(exact, "vec_id", "left_semi")
    return (
        ivf.agg(F.count(F.lit(1)).alias("n_results"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("__hits")))
        .select(
            "n_results",
            (F.col("__hits") >= F.lit(K // 2)).alias("recall_ge_50pct"),
        )
    )


_PAIR_DOT = (
    "list_aggregate(list_transform(generate_series(1, len(a.vec)), "
    "i -> CAST(a.vec[i] AS DOUBLE) * CAST(b.vec[i] AS DOUBLE)), 'sum')"
)
_PAIR_COS = (
    f"{_PAIR_DOT} / (sqrt({_sql_self_dot('a.vec')}) * sqrt({_sql_self_dot('b.vec')}))"
)

# Multi-table LSH (OR-amplification): L=4 independent 7-plane tables —
# same expected pair volume as the old single 4-plane table, far better
# recall (see operators.similarity.embedding_near_dup_pairs). The oracle
# rebuilds the same L bucket keys from the same seeded plane literals,
# unions the per-table collisions, and verifies distinct pairs exactly.
from ..operators.similarity import hyperplane_tables as _hpt

N_TABLES, N_PLANES = 4, 7
TABLES = _hpt(DIM, N_TABLES, N_PLANES, seed=13)


def _table_bucket_sql(vec_expr: str, planes) -> str:
    bits = [
        f"CASE WHEN {_sql_dot(vec_expr, _sql_vec(p))} >= 0 THEN '1' ELSE '0' END"
        for p in planes
    ]
    return " || ".join(bits)


_TABLE_UNION = " UNION ALL ".join(
    f"SELECT {ti} AS table_idx, vec_id AS id, "
    f"{_table_bucket_sql('embedding', planes)} AS bucket FROM embeddings"
    for ti, planes in enumerate(TABLES)
)

@query(
    "embedding_near_dup",
    f"""
    WITH banded AS ({_TABLE_UNION}),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b
          ON a.table_idx = b.table_idx AND a.bucket = b.bucket
        WHERE a.id < b.id
    ),
    vecs AS (SELECT vec_id AS id, embedding AS vec FROM embeddings)
    SELECT id_a, id_b, ROUND({_PAIR_COS}, 6) AS cosine
    FROM cand
    JOIN vecs a ON a.id = id_a
    JOIN vecs b ON b.id = id_b
    WHERE {_PAIR_COS} >= {NEAR_DUP_T}
    """,
)
def embedding_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=NEAR_DUP_T, tables=TABLES)


# ---------------------------------------------------------------------------
# Per-label embedding centroids (class prototypes): element-wise mean
# over array<float> vectors. posexplode + (label, pos) groupBy is the
# scale shape — the shuffle key is (label × dim), so parallelism is
# label-count × dimension rather than label-count, and no executor ever
# holds more than one running sum per (label, pos). Reassembly sorts by
# position inside an array_agg of (pos, avg) structs.
# ---------------------------------------------------------------------------
@query(
    "embedding_centroids",
    """
    WITH flat AS (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    means AS (
        SELECT label, pos, AVG(v) AS m FROM flat GROUP BY label, pos
    )
    SELECT label,
           COUNT(*) AS dim,
           ROUND(SUM(m * m), 6) AS norm_sq,
           ROUND(SUM(CASE WHEN pos <= 4 THEN m ELSE 0 END), 6) AS head_sum
    FROM means
    GROUP BY label
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("pos0", "v"),
    ).select("label", (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double").alias("v"))
    means = flat.groupBy("label", "pos").agg(F.avg("v").alias("m"))
    return means.groupBy("label").agg(
        F.count(F.lit(1)).alias("dim"),
        F.round(F.sum(F.col("m") * F.col("m")), 6).alias("norm_sq"),
        F.round(
            F.sum(F.when(F.col("pos") <= 4, F.col("m")).otherwise(0.0)), 6
        ).alias("head_sum"),
    )


# ---------------------------------------------------------------------------
# Int8-quantized ANN: per-vector symmetric quantization (floor(x/s + .5),
# identical float64 ops in both engines) then cosine top-k over the int
# arrays. The scale cancels out of cosine, so the oracle reproduces the
# ranking exactly — quantization error itself is value-checked, not
# tolerance-waved.
# ---------------------------------------------------------------------------
@query(
    "ann_quantized_topk",
    f"""
    WITH s AS (
        SELECT vec_id, embedding,
               greatest(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-30) AS scale
        FROM embeddings
    ),
    q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) / scale + 0.5)) AS qv
        FROM s
    ),
    scored AS (
        SELECT vec_id,
               {_sql_dot('qv', _QLIT)}
                   / (sqrt({_sql_self_dot('qv')}) * {_QNORM}) AS cosine
        FROM q
    ),
    ranked AS (
        SELECT vec_id, cosine,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT vec_id, ROUND(cosine, 6) AS cosine, rank FROM ranked WHERE rank <= {K}
    """,
)
def ann_quantized_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import quantize_embeddings, quantized_topk

    emb = t(spark, sf_dir, "embeddings")
    return quantized_topk(quantize_embeddings(emb), QUERY_VEC, k=K)


# ---------------------------------------------------------------------------
# Iterative k-means (Lloyd) with a FULL cross-engine value oracle: the
# deterministic smallest-id init + in-order float64 distance folds +
# (dist, cid) tie-break make both engines walk the same trajectory —
# init assign -> mean update -> final assign — so per-cluster counts and
# rounded center stats value-match. The SQL re-derives both iterations
# with CTEs (cross join vs k centers; Spark instead unrolls the centers
# as plan literals — no join at all). operators/clustering.py documents
# the 100 TB shape (scan + k*dim-row shuffle per iteration).
# ---------------------------------------------------------------------------
_KM_DIST = (
    "list_sum(list_transform(generate_series(1, len(emb.e)), "
    "i -> (emb.e[i] - {c}.c[i]) * (emb.e[i] - {c}.c[i])))"
)

# Shared Lloyd-trajectory CTEs (init c0 -> assign a1 -> means c1 ->
# final assign a2) — reused by the k-means profile AND the SemDeDup
# pair query so both oracles walk the identical trajectory.
_KM_CTES = f"""emb AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    c0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
               e AS c
        FROM emb ORDER BY vec_id LIMIT 8
    ),
    d1 AS (
        SELECT emb.vec_id, emb.e, c0.cid, {_KM_DIST.format(c='c0')} AS d
        FROM emb CROSS JOIN c0
    ),
    a1 AS (
        SELECT vec_id, e, cid AS cluster FROM d1
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
    ),
    m1 AS (
        SELECT cluster, pos, AVG(v) AS m FROM (
            SELECT cluster, unnest(generate_series(1, len(e))) AS pos,
                   unnest(e) AS v
            FROM a1
        ) GROUP BY cluster, pos
    ),
    c1 AS (
        SELECT cluster AS cid, list(m ORDER BY pos) AS c FROM m1
        GROUP BY cluster
    ),
    d2 AS (
        SELECT emb.vec_id, emb.e, c1.cid, {_KM_DIST.format(c='c1')} AS d
        FROM emb CROSS JOIN c1
    ),
    a2 AS (
        SELECT vec_id, e, cid AS cluster FROM d2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
    )"""


@query(
    "kmeans_embeddings",
    f"""
    WITH {_KM_CTES},
    m2 AS (
        SELECT cluster, pos, AVG(v) AS m FROM (
            SELECT cluster, unnest(generate_series(1, len(e))) AS pos,
                   unnest(e) AS v
            FROM a2
        ) GROUP BY cluster, pos
    ),
    cnt AS (SELECT cluster, COUNT(*) AS n FROM a2 GROUP BY cluster)
    SELECT CAST(m2.cluster AS INT) AS cluster, ANY_VALUE(cnt.n) AS n,
           ROUND(SUM(m * m), 6) AS norm_sq,
           ROUND(SUM(CASE WHEN pos <= 4 THEN m ELSE 0 END), 6) AS head_sum
    FROM m2 JOIN cnt ON m2.cluster = cnt.cluster
    GROUP BY m2.cluster
    """,
)
def kmeans_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import cluster_profile, kmeans_fit

    emb = t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit(emb, "embedding", "vec_id", k=8, center_updates=1)
    return cluster_profile(assigned, "embedding")


# ---------------------------------------------------------------------------
# SemDeDup: semantic near-dup pairs inside k-means clusters. Same Lloyd
# trajectory as kmeans_embeddings (shared CTEs), then an exact in-order
# cosine over within-cluster pairs only — the oracle value-checks BOTH
# the clustering and the pair threshold in one query.
# ---------------------------------------------------------------------------
_SEMDEDUP_T = 0.40

@query(
    "semantic_dedup_pairs",
    f"""
    WITH {_KM_CTES},
    side AS (
        SELECT cluster, vec_id AS id, e,
               sqrt({_sql_self_dot('e')}) AS nrm
        FROM a2
    ),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               list_aggregate(list_transform(generate_series(1, len(a.e)),
                   i -> a.e[i] * b.e[i]), 'sum') / (a.nrm * b.nrm) AS cosine
        FROM side a JOIN side b
          ON a.cluster = b.cluster AND a.id < b.id
    )
    SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
    FROM pairs WHERE cosine >= {_SEMDEDUP_T}
    """,
)
def semantic_dedup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import semantic_dedup_pairs

    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(emb, _SEMDEDUP_T, k=8, center_updates=1)


# ---------------------------------------------------------------------------
# Diversity-aware curation: top-2 documents per SEMANTIC cluster by text
# quality — the SemDeDup-era counterpart of curate_corpus (which gates
# on per-doc signals only). Composes the k-means clusters (shared Lloyd
# CTEs) with the quality formula (shared with text_quality) and a
# per-cluster top-k window; ordering is on the 5dp-ROUNDED score (the
# same discretization the value check uses) with doc_id ties, so the
# rank is engine-stable. Per-cluster window partitions by cluster id —
# task size is bounded by cluster population, the knob SemDeDup-scale k
# controls.
# ---------------------------------------------------------------------------
@query(
    "diverse_curation",
    None,  # assembled below — needs the quality twin from queries.text
)
def diverse_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions import text as T
    from ..operators.clustering import kmeans_fit

    emb = t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit(emb, "embedding", "vec_id", k=8, center_updates=1)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.round(T.quality_score(F.col("text")), 5).alias("quality")
    )
    joined = assigned.select("cluster", "vec_id").join(
        docs, assigned["vec_id"] == docs["doc_id"], "inner"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 2)
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "rank",
            "doc_id",
            "quality",
        )
    )


def _register_diverse_curation_oracle() -> None:
    from .registry import ORACLES
    from .text import quality_sql

    ORACLES["diverse_curation"] = f"""
    WITH {_KM_CTES},
    q AS (
        SELECT doc_id, ROUND({quality_sql('text')}, 5) AS quality
        FROM documents
    ),
    joined AS (
        SELECT a2.cluster, q.doc_id, q.quality
        FROM a2 JOIN q ON a2.vec_id = q.doc_id
    )
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(ROW_NUMBER() OVER (PARTITION BY cluster
                ORDER BY quality DESC, doc_id) AS INT) AS rank,
           doc_id, quality
    FROM joined
    QUALIFY rank <= 2
    """


_register_diverse_curation_oracle()


# ---------------------------------------------------------------------------
# Embedding outlier scan: top-20 vectors farthest from their own k-means
# centroid (mislabeled/corrupt/off-distribution detector). Shares the
# Lloyd CTEs; distances rank on the 6dp-rounded value with vec_id ties
# so the cross-engine rank is stable.
# ---------------------------------------------------------------------------
@query(
    "embedding_outliers",
    f"""
    WITH {_KM_CTES},
    m2 AS (
        SELECT cluster, pos, AVG(v) AS m FROM (
            SELECT cluster, unnest(generate_series(1, len(e))) AS pos,
                   unnest(e) AS v
            FROM a2
        ) GROUP BY cluster, pos
    ),
    c2 AS (
        SELECT cluster, list(m ORDER BY pos) AS c FROM m2 GROUP BY cluster
    ),
    scored AS (
        SELECT a2.vec_id, a2.cluster,
               ROUND(list_sum(list_transform(generate_series(1, len(a2.e)),
                   i -> (a2.e[i] - c2.c[i]) * (a2.e[i] - c2.c[i]))), 6)
                   AS dist_sq
        FROM a2 JOIN c2 ON a2.cluster = c2.cluster
    )
    SELECT vec_id, CAST(cluster AS INT) AS cluster, dist_sq,
           CAST(ROW_NUMBER() OVER (ORDER BY dist_sq DESC, vec_id) AS INT)
               AS rank
    FROM scored
    QUALIFY rank <= 20
    """,
)
def embedding_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import embedding_outliers

    emb = t(spark, sf_dir, "embeddings")
    return embedding_outliers(emb, k=8, center_updates=1, top_n=20)


# ---------------------------------------------------------------------------
# Lloyd convergence trajectory: per-iteration inertia + moved-point
# count, fully value-checked (the oracle re-derives both iterations from
# the shared CTEs). Inertia must be non-increasing — but rather than
# pinning the inequality, the actual values cross-check.
# ---------------------------------------------------------------------------
@query(
    "kmeans_inertia",
    f"""
    WITH {_KM_CTES},
    i1 AS (
        SELECT ROUND(SUM(md), 2) AS inertia
        FROM (SELECT MIN(d) AS md FROM d1 GROUP BY vec_id)
    ),
    i2 AS (
        SELECT ROUND(SUM(md), 2) AS inertia
        FROM (SELECT MIN(d) AS md FROM d2 GROUP BY vec_id)
    ),
    mv AS (
        SELECT CAST(SUM(CASE WHEN x.cluster <> y.cluster THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved
        FROM a1 x JOIN a2 y USING (vec_id)
    )
    SELECT 0 AS iteration, inertia, CAST(NULL AS BIGINT) AS n_moved FROM i1
    UNION ALL
    SELECT 1 AS iteration, i2.inertia, mv.n_moved FROM i2, mv
    """,
)
def kmeans_inertia_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans_trajectory

    emb = t(spark, sf_dir, "embeddings")
    return kmeans_trajectory(emb, "embedding", "vec_id", k=8, center_updates=1)


# ---------------------------------------------------------------------------
# Product-quantization ANN (operators.similarity.pq_codebooks/pq_encode/
# pq_topk): M=8 subspaces x 16 codes over the 64-dim embeddings — the
# stored representation is 8 small ints per vector (32x lighter than
# float32) and query scoring is 8 LUT lookups + 7 adds per row, pure
# codegen (ADC; Jégou et al. 2011). Deterministic codebooks (sub-slices
# of the 16 smallest-id vectors) + exact-fold encode + in-order LUT sums
# make the FULL approximate ranking a cross-engine value oracle — the
# quantization error itself is hash-checked, not tolerance-waved, same
# contract as ann_quantized_topk.
# ---------------------------------------------------------------------------
_PQ_M = 8
_PQ_DS = DIM // _PQ_M
_PQ_KS = 16


@query(
    "ann_pq_topk",
    f"""
    WITH emb AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    base AS (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {_PQ_KS}),
    subs AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m),
    cb AS (
        SELECT subs.m,
               CAST(ROW_NUMBER() OVER (PARTITION BY subs.m
                                       ORDER BY base.vec_id) - 1 AS INT) AS c,
               base.e[subs.m * {_PQ_DS} + 1 : subs.m * {_PQ_DS} + {_PQ_DS}] AS cv
        FROM base CROSS JOIN subs
    ),
    enc AS (
        SELECT emb.vec_id, cb.m, cb.c,
               list_sum(list_transform(generate_series(1, {_PQ_DS}),
                   i -> (emb.e[cb.m * {_PQ_DS} + i] - cb.cv[i])
                        * (emb.e[cb.m * {_PQ_DS} + i] - cb.cv[i]))) AS d
        FROM emb CROSS JOIN cb
    ),
    codes AS (
        SELECT vec_id, m, c FROM enc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, c) = 1
    ),
    q AS (SELECT {_QLIT} AS qv),
    lut AS (
        SELECT cb.m, cb.c,
               list_sum(list_transform(generate_series(1, {_PQ_DS}),
                   i -> (q.qv[cb.m * {_PQ_DS} + i] - cb.cv[i])
                        * (q.qv[cb.m * {_PQ_DS} + i] - cb.cv[i]))) AS ld
        FROM cb CROSS JOIN q
    ),
    scored AS (
        SELECT codes.vec_id,
               ROUND(list_sum(list(lut.ld ORDER BY codes.m)), 6) AS approx_dist
        FROM codes JOIN lut ON codes.m = lut.m AND codes.c = lut.c
        GROUP BY codes.vec_id
    ),
    ranked AS (
        SELECT vec_id, approx_dist,
               ROW_NUMBER() OVER (ORDER BY approx_dist, vec_id) AS rank
        FROM scored
    )
    SELECT vec_id, approx_dist, rank FROM ranked WHERE rank <= {K}
    """,
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_codebooks, pq_encode, pq_topk

    emb = t(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, num_sub=_PQ_M, num_codes=_PQ_KS)
    encoded = pq_encode(emb, books)
    return pq_topk(encoded, books, QUERY_VEC, k=K)


# ---------------------------------------------------------------------------
# k-NN label agreement — embedding-space LABEL-NOISE detection: for each
# vector, its top-5 LSH-candidate neighbors vote on its label; a vector
# whose neighborhood disagrees (<= 1 of 5 matches) is a relabel/review
# candidate. The per-label report (micro agreement + suspect count) is
# the dataset-quality number labeling teams track. Candidates come from
# the same L=4 x 7-plane multi-table LSH as embedding_near_dup (bounded
# bucket joins, never all-pairs); cosines use the index-order left-fold,
# bit-identical on both engines, so the top-5 rank and every agreement
# ratio are full cross-engine values. Suspect test uses the integer form
# 5*matches <= k (no float ratio compare); micro agreement is a ratio
# of BIGINT totals — exact.
# ---------------------------------------------------------------------------
_KNN_AGREE_K = 5


@query(
    "knn_label_agreement",
    f"""
    WITH banded AS ({_TABLE_UNION}),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b
          ON a.table_idx = b.table_idx AND a.bucket = b.bucket
        WHERE a.id <> b.id
    ),
    vecs AS (SELECT vec_id AS id, embedding AS vec, label FROM embeddings),
    scored AS (
        SELECT c.id_a, c.id_b, a.label AS label_a, b.label AS label_b,
               {_PAIR_COS} AS cos
        FROM cand c JOIN vecs a ON a.id = c.id_a JOIN vecs b ON b.id = c.id_b
    ),
    ranked AS (
        SELECT id_a, label_a, label_b,
               ROW_NUMBER() OVER (PARTITION BY id_a
                                  ORDER BY cos DESC, id_b) AS rn
        FROM scored
    ),
    agr AS (
        SELECT id_a, label_a,
               COUNT(*) AS k,
               SUM(CASE WHEN label_a = label_b THEN 1 ELSE 0 END) AS matches
        FROM ranked WHERE rn <= {_KNN_AGREE_K}
        GROUP BY id_a, label_a
    )
    SELECT label_a AS label,
           COUNT(*) AS n_scored,
           CAST(SUM(k) AS BIGINT) AS n_votes,
           CAST(SUM(matches) AS BIGINT) AS n_matches,
           floor(CAST(SUM(matches) AS DOUBLE) / SUM(k) * 1000000.0 + 0.5)
               / 1000000.0 AS micro_agreement,
           CAST(SUM(CASE WHEN {_KNN_AGREE_K} * matches <= k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_suspect
    FROM agr GROUP BY label_a
    """,
)
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.similarity import _pair_dot_udf, _table_keys_udf, norm_expr

    emb = t(spark, sf_dir, "embeddings")
    # One scan + one Arrow-batched projection pass yields all L bucket
    # keys per row (posexplode = L rows/vector), exactly as
    # embedding_near_dup_pairs — the expression-level per-table variant
    # re-scanned embeddings L times and evaluated L·b interpreted HOF
    # folds per row.
    banded = emb.select(
        F.col("vec_id").alias("id"),
        F.posexplode(_table_keys_udf(TABLES)(F.col("embedding"))).alias(
            "table_idx", "bucket"
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    # Candidates as UNORDERED pairs: one exact-fold cosine per pair,
    # mirrored afterwards for the per-vector neighbor lists (the cosine
    # is direction-symmetric — same products, same fold order).
    cand = (
        a.join(b, on=["table_idx", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
        norm_expr(F.col("embedding")).alias("nrm"),
        "label",
    )
    va = vecs.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
        F.col("nrm").alias("nrm_a"), F.col("label").alias("label_a"),
    )
    vb = vecs.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
        F.col("nrm").alias("nrm_b"), F.col("label").alias("label_b"),
    )
    pair = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            "label_a",
            "label_b",
            (
                _pair_dot_udf()(F.col("vec_a"), F.col("vec_b"))
                / (F.col("nrm_a") * F.col("nrm_b"))
            ).alias("cos"),
        )
    )
    # Mirror each unordered pair into both directed rows with ONE explode
    # in the same stage, instead of a union whose two legs each re-execute
    # the candidate join + Arrow cosine kernel (exchange reuse only caches
    # the exchanges, not the join or the Python eval above them — the old
    # plan carried the whole lineage twice: 16 parquet scans and 12
    # ArrowEvalPython nodes collapse to one of each per consumer).
    mirrored = F.explode(
        F.array(
            F.struct(
                F.col("id_a").alias("id_a"),
                F.col("id_b").alias("id_b"),
                F.col("label_a").alias("label_a"),
                F.col("label_b").alias("label_b"),
                F.col("cos").alias("cos"),
            ),
            F.struct(
                F.col("id_b").alias("id_a"),
                F.col("id_a").alias("id_b"),
                F.col("label_b").alias("label_a"),
                F.col("label_a").alias("label_b"),
                F.col("cos").alias("cos"),
            ),
        )
    )
    scored = pair.select(mirrored.alias("__m")).select(
        "__m.id_a", "__m.id_b", "__m.label_a", "__m.label_b", "__m.cos"
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cos").desc(), "id_b")
    agr = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_AGREE_K)
        .groupBy("id_a", "label_a")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(
                F.when(F.col("label_a") == F.col("label_b"), 1).otherwise(0)
            ).alias("matches"),
        )
    )
    return agr.groupBy(F.col("label_a").alias("label")).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("k").cast("long").alias("n_votes"),
        F.sum("matches").cast("long").alias("n_matches"),
        (
            F.floor(
                F.sum("matches").cast("double") / F.sum("k") * 1000000.0 + 0.5
            )
            / 1000000.0
        ).alias("micro_agreement"),
        F.sum(
            F.when(_KNN_AGREE_K * F.col("matches") <= F.col("k"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_suspect"),
    )


# ---------------------------------------------------------------------------
# Semi-supervised label propagation over the LSH neighbor graph — the
# "label 25% of the data, spread labels through embedding space"
# workflow (weak supervision / pseudo-labeling). Seeds: vectors with
# vec_id % 4 == 0 keep their true label; three majority-vote rounds
# propagate labels along LSH candidate edges (votes are INTEGER counts,
# ties to the smallest label — fully deterministic without
# quantization; no-labeled-neighbor nodes keep their previous state).
# The oracle replays every round in chained MATERIALIZED CTEs, so all
# intermediate majorities are value-checked, not just the final state.
# ---------------------------------------------------------------------------
_LP_ITERS = 3


def _lp_sql() -> str:
    ctes = [
        f"banded AS MATERIALIZED ({_TABLE_UNION})",
        """edges AS MATERIALIZED (
        SELECT DISTINCT a.id AS s, b.id AS d
        FROM banded a JOIN banded b
          ON a.table_idx = b.table_idx AND a.bucket = b.bucket
        WHERE a.id <> b.id
    )""",
        """l0 AS MATERIALIZED (
        SELECT vec_id AS id,
               CASE WHEN vec_id % 4 = 0 THEN label END AS l
        FROM embeddings
    )""",
    ]
    for it in range(_LP_ITERS):
        ctes.append(
            f"""c{it} AS MATERIALIZED (
        SELECT e.d AS id, l.l AS nl, COUNT(*) AS c
        FROM edges e JOIN l{it} l ON e.s = l.id
        WHERE l.l IS NOT NULL GROUP BY e.d, l.l
    )"""
        )
        ctes.append(
            f"""b{it} AS MATERIALIZED (
        SELECT id, nl FROM (
            SELECT id, nl,
                   ROW_NUMBER() OVER (PARTITION BY id
                                      ORDER BY c DESC, nl) AS rn
            FROM c{it}
        ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""l{it + 1} AS MATERIALIZED (
        SELECT p.id,
               CASE WHEN p.id % 4 = 0 THEN p.l
                    ELSE COALESCE(b.nl, p.l) END AS l
        FROM l{it} p LEFT JOIN b{it} b USING (id)
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT id AS vec_id, CAST(COALESCE(l, -1) AS INT) AS label_out,
           (id % 4 = 0) AS is_seed
    FROM l{_LP_ITERS}
    """
    )


@query("label_prop_communities", _lp_sql())
def label_prop_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import label_propagation
    from ..operators.similarity import _table_keys_udf

    emb = t(spark, sf_dir, "embeddings")
    banded = emb.select(
        F.col("vec_id").alias("id"),
        F.posexplode(_table_keys_udf(TABLES)(F.col("embedding"))).alias(
            "table_idx", "bucket"
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    edges = (
        a.join(b, on=["table_idx", "bucket"])
        .filter(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("s"), F.col("b.id").alias("d"))
        .distinct()
    )
    seeds = emb.select(
        F.col("vec_id").alias("id"),
        F.when(F.col("vec_id") % 4 == 0, F.col("label")).alias("label"),
    )
    out = label_propagation(edges, seeds, iters=_LP_ITERS)
    return out.select(
        F.col("id").alias("vec_id"),
        F.coalesce(F.col("lbl"), F.lit(-1)).cast("int").alias("label_out"),
        (F.col("id") % 4 == 0).alias("is_seed"),
    )


# ---------------------------------------------------------------------------
# Label-centroid similarity matrix — the embedding-space label-quality
# diagnostic: cosine similarity between every pair of label centroids
# (near-identical centroids = candidate label merge or annotation
# confusion; the k×k output is the confusion-risk heat map). Centroid
# components quantize to integer micro-units AFTER the mean (the same
# 6dp tolerance class as embedding_centroids' green oracle), so every
# dot product and norm is an exact BIGINT sum and the cosine is a
# deterministic function of exact integers. The per-(label, dim) mean
# is one shuffle over |vectors|·dim flattened values; the pair join
# runs over k·dim rows — dictionary-sized, broadcast, never touching
# the vector table again.
# ---------------------------------------------------------------------------
@query(
    "label_centroid_similarity",
    """
    WITH flat AS (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    means AS (
        SELECT label, pos,
               CAST(floor(AVG(v) * 1000000.0 + 0.5) AS BIGINT) AS mq
        FROM flat GROUP BY label, pos
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(CAST(SUM(a.mq * b.mq) AS DOUBLE)
                 / (sqrt(CAST(SUM(a.mq * a.mq) AS DOUBLE))
                    * sqrt(CAST(SUM(b.mq * b.mq) AS DOUBLE))), 6) AS cosine
    FROM means a
    JOIN means b ON a.pos = b.pos AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos0", "v")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("v").cast("double").alias("v"),
    )
    means = flat.groupBy("label", "pos").agg(
        F.floor(F.avg("v") * 1000000.0 + 0.5).cast("long").alias("mq")
    )
    a = means.alias("a")
    b = means.alias("b")
    joined = a.join(
        F.broadcast(b),
        (F.col("a.pos") == F.col("b.pos"))
        & (F.col("a.label") < F.col("b.label")),
    )
    return (
        joined.groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.round(
                F.sum(F.col("a.mq") * F.col("b.mq")).cast("double")
                / (
                    F.sqrt(
                        F.sum(F.col("a.mq") * F.col("a.mq")).cast("double")
                    )
                    * F.sqrt(
                        F.sum(F.col("b.mq") * F.col("b.mq")).cast("double")
                    )
                ),
                6,
            ).alias("cosine")
        )
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation — the QA report every approximate index owes
# its users (the vector-search twin of dedup_recall_eval): recall@k of
# each ANN variant (single-bucket LSH, multiprobe LSH, int8-quantized
# scan) against the exact brute-force top-k, one row per method. The
# oracle COMPOSES the already-value-checked constructions of the
# underlying queries (each CTE body is that query's registered oracle),
# so the evaluation measures exactly what the individual queries
# return. Hits are integer set intersections; recall is an exact ratio.
# ---------------------------------------------------------------------------
def _ann_eval_sql() -> str:
    from .registry import ORACLES

    exact = ORACLES["knn_bruteforce"]
    methods = {
        "lsh": ORACLES["ann_lsh_topk"],
        "multiprobe": ORACLES["ann_multiprobe_topk"],
        "quantized": ORACLES["ann_quantized_topk"],
    }
    parts = []
    for name, sql in methods.items():
        parts.append(
            f"""
    SELECT '{name}' AS method,
           (SELECT COUNT(*) FROM ({sql}) a
            WHERE a.vec_id IN (SELECT vec_id FROM ({exact}))) AS n_hit,
           ROUND((SELECT COUNT(*) FROM ({sql}) a
                  WHERE a.vec_id IN (SELECT vec_id FROM ({exact})))
                 * 1.0 / {K}, 6) AS recall_at_k"""
        )
    return " UNION ALL ".join(parts)


@query("ann_recall_eval", _ann_eval_sql())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import (
        ann_multiprobe_topk,
        quantize_embeddings,
        quantized_topk,
    )

    emb = t(spark, sf_dir, "embeddings")
    # Collect the k exact top-k ids once (k = 10 — a bounded scalar
    # anchor, like rfm's 1-row max): they probe all three method rows,
    # and as a lazy semi-join side the full brute-force cosine scan
    # re-executed once PER method (3 extra corpus passes). Each hit
    # count is now a literal IN filter — no join build, no extra scan.
    exact_ids = [
        r["vec_id"]
        for r in knn_bruteforce(emb, QUERY_VEC, k=K).select("vec_id").collect()
    ]
    methods = {
        "lsh": ann_lsh_topk(emb, QUERY_VEC, k=K, planes=PLANES),
        "multiprobe": ann_multiprobe_topk(emb, QUERY_VEC, k=K, planes=PLANES),
        "quantized": quantized_topk(quantize_embeddings(emb), QUERY_VEC, k=K),
    }
    out = None
    for name, df in methods.items():
        row = (
            df.select("vec_id")
            .filter(F.col("vec_id").isin(exact_ids))
            .agg(
                F.lit(name).alias("method"),
                F.count(F.lit(1)).alias("n_hit"),
                F.round(F.count(F.lit(1)) * 1.0 / K, 6).alias(
                    "recall_at_k"
                ),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# Contrastive-pair mining — the training-data operator that sits on top
# of the similarity stack: for each anchor vector, emit POSITIVES (the
# top-3 most-similar candidates) and HARD NEGATIVES (ranks 11-15 — the
# "confusable but wrong" band that makes contrastive embeddings sharp;
# random negatives are trivially easy and teach nothing). Anchors are
# the 5 smallest vec_ids (deterministic); candidates score via the
# exact-fold pairwise cosine and rank on 6dp-ROUNDED cosine with a
# cand_id tie-break (the embedding_outliers convention — a raw-cosine
# order could flip on the last ulp across engines). Per-anchor ranking
# is two-phase: each partition keeps its local top-15 per anchor before
# the global window, so no task ever sorts a full candidate list. At
# 100 TB the anchor side is the small relation (broadcast); the scan is
# one pass of the vector table.
# ---------------------------------------------------------------------------
_HNM_ANCHORS = 5
_HNM_POS = 3
_HNM_NEG_LO = 10  # exclusive
_HNM_NEG_HI = 15  # inclusive


@query(
    "hard_negative_mining",
    f"""
    WITH anchors AS (
        SELECT vec_id AS anchor_id, embedding AS vec
        FROM embeddings ORDER BY vec_id LIMIT {_HNM_ANCHORS}
    ),
    pairs AS (
        SELECT a.anchor_id, b.vec_id AS cand_id,
               {_PAIR_DOT.replace('b.vec', 'b.embedding')}
               / (sqrt({_sql_self_dot('a.vec')})
                  * sqrt({_sql_self_dot('b.embedding')})) AS cosine
        FROM anchors a JOIN embeddings b ON b.vec_id <> a.anchor_id
    ),
    ranked AS (
        SELECT anchor_id, cand_id, ROUND(cosine, 6) AS cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY anchor_id
                   ORDER BY ROUND(cosine, 6) DESC, cand_id) AS INT) AS rank
        FROM pairs
    )
    SELECT anchor_id, cand_id, cosine, rank,
           CASE WHEN rank <= {_HNM_POS} THEN 'positive'
                ELSE 'hard_negative' END AS label
    FROM ranked
    WHERE rank <= {_HNM_POS}
       OR (rank > {_HNM_NEG_LO} AND rank <= {_HNM_NEG_HI})
    ORDER BY anchor_id, rank
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_expr

    emb = t(spark, sf_dir, "embeddings")
    anchors = (
        emb.orderBy("vec_id")
        .limit(_HNM_ANCHORS)
        .select(
            F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("vec")
        )
    )
    pairs = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine_expr(F.col("vec"), F.col("embedding")), 6).alias(
                "cosine"
            ),
        )
    )
    from pyspark.sql.window import Window

    order = [F.col("cosine").desc(), F.col("cand_id")]
    local = Window.partitionBy(
        F.spark_partition_id(), "anchor_id"
    ).orderBy(*order)
    per_anchor = Window.partitionBy("anchor_id").orderBy(*order)
    ranked = (
        pairs.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= _HNM_NEG_HI)
        .drop("__lr")
        .withColumn("rank", F.row_number().over(per_anchor).cast("int"))
    )
    return (
        ranked.filter(
            (F.col("rank") <= _HNM_POS)
            | (
                (F.col("rank") > _HNM_NEG_LO)
                & (F.col("rank") <= _HNM_NEG_HI)
            )
        )
        .select(
            "anchor_id",
            "cand_id",
            "cosine",
            "rank",
            F.when(F.col("rank") <= _HNM_POS, "positive")
            .otherwise("hard_negative")
            .alias("label"),
        )
        .orderBy("anchor_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ composed index (operators.similarity.write_ivfpq_index /
# ann_ivfpq_probe_stored): the production ANN layout — coarse cells as
# HIVE PARTITIONS (probing = partition pruning, physically asserted in
# tests/test_similarity.py) holding only M=8 PQ codes per vector, the
# float vectors never stored. Both quantizers are the deterministic
# constructions (8 smallest-id vectors as coarse centers, the PQ
# codebook sub-slices, exact in-order distance folds with smallest-id
# ties), so the oracle replays index build + probe + ADC ranking
# bit-for-bit: coarse assignment, probe-cell choice, candidate set, and
# every approximate distance are hash-checked values.
# ---------------------------------------------------------------------------
_IVFPQ_C = 8
_IVFPQ_PROBE = 3
_IVFPQ_DIRS: dict[tuple[str, str], str] = {}


def _ivfpq_dir(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    from ..operators.similarity import (
        pq_codebooks,
        smallest_id_vectors,
        write_ivfpq_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVFPQ_DIRS:
        out_dir = tempfile.mkdtemp(prefix="ivfpq_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        emb = t(spark, sf_dir, "embeddings")
        coarse = smallest_id_vectors(emb, _IVFPQ_C)
        books = pq_codebooks(emb, num_sub=_PQ_M, num_codes=_PQ_KS)
        write_ivfpq_index(emb, f"{out_dir}/index", coarse, books)
        _IVFPQ_DIRS[key] = out_dir
    return _IVFPQ_DIRS[key]


@query(
    "ann_ivfpq_topk",
    f"""
    WITH emb AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    base AS (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {_PQ_KS}),
    subs AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m),
    cb AS (
        SELECT subs.m,
               CAST(ROW_NUMBER() OVER (PARTITION BY subs.m
                                       ORDER BY base.vec_id) - 1 AS INT) AS c,
               base.e[subs.m * {_PQ_DS} + 1 : subs.m * {_PQ_DS} + {_PQ_DS}] AS cv
        FROM base CROSS JOIN subs
    ),
    coarse AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               e AS ce
        FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {_IVFPQ_C})
    ),
    assign AS (
        SELECT emb.vec_id, coarse.cell,
               list_sum(list_transform(generate_series(1, {DIM}),
                   i -> (emb.e[i] - coarse.ce[i])
                        * (emb.e[i] - coarse.ce[i]))) AS d
        FROM emb CROSS JOIN coarse
    ),
    cells AS (
        SELECT vec_id, cell FROM assign
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1
    ),
    q AS (SELECT {_QLIT} AS qv),
    qd AS (
        SELECT coarse.cell,
               list_sum(list_transform(generate_series(1, {DIM}),
                   i -> (q.qv[i] - coarse.ce[i])
                        * (q.qv[i] - coarse.ce[i]))) AS d
        FROM coarse CROSS JOIN q
    ),
    probes AS (
        SELECT cell FROM qd
        QUALIFY ROW_NUMBER() OVER (ORDER BY d, cell) <= {_IVFPQ_PROBE}
    ),
    enc AS (
        SELECT emb.vec_id, cb.m, cb.c,
               list_sum(list_transform(generate_series(1, {_PQ_DS}),
                   i -> (emb.e[cb.m * {_PQ_DS} + i] - cb.cv[i])
                        * (emb.e[cb.m * {_PQ_DS} + i] - cb.cv[i]))) AS d
        FROM emb CROSS JOIN cb
    ),
    codes AS (
        SELECT vec_id, m, c FROM enc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, c) = 1
    ),
    cand AS (
        SELECT codes.vec_id, codes.m, codes.c
        FROM codes JOIN cells USING (vec_id)
        WHERE cells.cell IN (SELECT cell FROM probes)
    ),
    lut AS (
        SELECT cb.m, cb.c,
               list_sum(list_transform(generate_series(1, {_PQ_DS}),
                   i -> (q.qv[cb.m * {_PQ_DS} + i] - cb.cv[i])
                        * (q.qv[cb.m * {_PQ_DS} + i] - cb.cv[i]))) AS ld
        FROM cb CROSS JOIN q
    ),
    scored AS (
        SELECT cand.vec_id,
               ROUND(list_sum(list(lut.ld ORDER BY cand.m)), 6) AS approx_dist
        FROM cand JOIN lut ON cand.m = lut.m AND cand.c = lut.c
        GROUP BY cand.vec_id
    )
    SELECT vec_id, approx_dist, rank FROM (
        SELECT vec_id, approx_dist,
               ROW_NUMBER() OVER (ORDER BY approx_dist, vec_id) AS rank
        FROM scored
    ) WHERE rank <= {K}
    """,
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import (
        ann_ivfpq_probe_stored,
        pq_codebooks,
        smallest_id_vectors,
    )

    path = _ivfpq_dir(spark, sf_dir)
    emb = t(spark, sf_dir, "embeddings")
    coarse = smallest_id_vectors(emb, _IVFPQ_C)
    books = pq_codebooks(emb, num_sub=_PQ_M, num_codes=_PQ_KS)
    return ann_ivfpq_probe_stored(
        spark,
        f"{path}/index",
        QUERY_VEC,
        k=K,
        coarse=coarse,
        codebooks=books,
        n_probe=_IVFPQ_PROBE,
    )


# ---------------------------------------------------------------------------
# Incremental IVF-PQ maintenance: the index is BUILT from the even-id
# half of the corpus (quantizers trained there and then FROZEN — the
# production contract: retraining means re-encoding the whole index,
# so codebooks are versioned artifacts), and the odd-id half arrives
# later as an append batch encoded under the frozen quantizers into
# the existing cell partitions (files only added, never rewritten).
# The probe then ranks over old+new together. The oracle replays both
# generations declaratively — quantizers from the even half's smallest
# ids, every vector encoded under them — so a stale append, a
# re-encoded old row, or a probe that misses fresh vectors breaks the
# hash.
# ---------------------------------------------------------------------------
_IVFPQ_INC_DIRS: dict[tuple[str, str], str] = {}


def _ivfpq_inc_dir(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    from ..operators.similarity import (
        append_ivfpq_index,
        pq_codebooks,
        smallest_id_vectors,
        write_ivfpq_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVFPQ_INC_DIRS:
        out_dir = tempfile.mkdtemp(prefix="ivfpq_inc_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        emb = t(spark, sf_dir, "embeddings")
        even = emb.filter(F.col("vec_id") % 2 == 0)
        odd = emb.filter(F.col("vec_id") % 2 == 1)
        coarse = smallest_id_vectors(even, _IVFPQ_C)
        books = pq_codebooks(even, num_sub=_PQ_M, num_codes=_PQ_KS)
        write_ivfpq_index(even, f"{out_dir}/index", coarse, books)
        append_ivfpq_index(odd, f"{out_dir}/index", coarse, books)
        _IVFPQ_INC_DIRS[key] = out_dir
    return _IVFPQ_INC_DIRS[key]


@query(
    "ann_ivfpq_incremental",
    f"""
    WITH emb AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    base AS (
        SELECT vec_id, e FROM emb WHERE vec_id % 2 = 0
        ORDER BY vec_id LIMIT {_PQ_KS}
    ),
    subs AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m),
    cb AS (
        SELECT subs.m,
               CAST(ROW_NUMBER() OVER (PARTITION BY subs.m
                                       ORDER BY base.vec_id) - 1 AS INT) AS c,
               base.e[subs.m * {_PQ_DS} + 1 : subs.m * {_PQ_DS} + {_PQ_DS}] AS cv
        FROM base CROSS JOIN subs
    ),
    coarse AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               e AS ce
        FROM (SELECT vec_id, e FROM emb WHERE vec_id % 2 = 0
              ORDER BY vec_id LIMIT {_IVFPQ_C})
    ),
    assign AS (
        SELECT emb.vec_id, coarse.cell,
               list_sum(list_transform(generate_series(1, {DIM}),
                   i -> (emb.e[i] - coarse.ce[i])
                        * (emb.e[i] - coarse.ce[i]))) AS d
        FROM emb CROSS JOIN coarse
    ),
    cells AS (
        SELECT vec_id, cell FROM assign
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1
    ),
    q AS (SELECT {_QLIT} AS qv),
    qd AS (
        SELECT coarse.cell,
               list_sum(list_transform(generate_series(1, {DIM}),
                   i -> (q.qv[i] - coarse.ce[i])
                        * (q.qv[i] - coarse.ce[i]))) AS d
        FROM coarse CROSS JOIN q
    ),
    probes AS (
        SELECT cell FROM qd
        QUALIFY ROW_NUMBER() OVER (ORDER BY d, cell) <= {_IVFPQ_PROBE}
    ),
    enc AS (
        SELECT emb.vec_id, cb.m, cb.c,
               list_sum(list_transform(generate_series(1, {_PQ_DS}),
                   i -> (emb.e[cb.m * {_PQ_DS} + i] - cb.cv[i])
                        * (emb.e[cb.m * {_PQ_DS} + i] - cb.cv[i]))) AS d
        FROM emb CROSS JOIN cb
    ),
    codes AS (
        SELECT vec_id, m, c FROM enc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, c) = 1
    ),
    cand AS (
        SELECT codes.vec_id, codes.m, codes.c
        FROM codes JOIN cells USING (vec_id)
        WHERE cells.cell IN (SELECT cell FROM probes)
    ),
    lut AS (
        SELECT cb.m, cb.c,
               list_sum(list_transform(generate_series(1, {_PQ_DS}),
                   i -> (q.qv[cb.m * {_PQ_DS} + i] - cb.cv[i])
                        * (q.qv[cb.m * {_PQ_DS} + i] - cb.cv[i]))) AS ld
        FROM cb CROSS JOIN q
    ),
    scored AS (
        SELECT cand.vec_id,
               ROUND(list_sum(list(lut.ld ORDER BY cand.m)), 6) AS approx_dist
        FROM cand JOIN lut ON cand.m = lut.m AND cand.c = lut.c
        GROUP BY cand.vec_id
    )
    SELECT vec_id, approx_dist, rank,
           CAST(vec_id % 2 AS BIGINT) AS generation
    FROM (
        SELECT vec_id, approx_dist,
               ROW_NUMBER() OVER (ORDER BY approx_dist, vec_id) AS rank
        FROM scored
    ) WHERE rank <= {K}
    """,
)
def ann_ivfpq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import (
        ann_ivfpq_probe_stored,
        pq_codebooks,
        smallest_id_vectors,
    )

    path = _ivfpq_inc_dir(spark, sf_dir)
    even = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 2 == 0)
    coarse = smallest_id_vectors(even, _IVFPQ_C)
    books = pq_codebooks(even, num_sub=_PQ_M, num_codes=_PQ_KS)
    top = ann_ivfpq_probe_stored(
        spark,
        f"{path}/index",
        QUERY_VEC,
        k=K,
        coarse=coarse,
        codebooks=books,
        n_probe=_IVFPQ_PROBE,
    )
    return top.withColumn(
        "generation", (F.col("vec_id") % 2).cast("long")
    )
