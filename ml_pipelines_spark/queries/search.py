"""Search / information-retrieval queries — BM25 ranking over the
documents table and reciprocal-rank-fusion hybrid retrieval (BM25 ∪
embedding cosine), the modern training-data retrieval stack.

Shape notes for scale: the BM25 leg is ONE narrow scan — per-document
term frequencies for the (tiny, literal) query term set are computed as
codegen array expressions, never an explode+groupBy over the full token
stream — plus a one-row global statistics aggregate broadcast back. The
semantic leg is the existing brute-force cosine two-phase top-k. The
fusion join runs over two ≤50-row rank lists. Per-document scores are
FIXED-ORDER sums over the literal term list, so no float summation-order
risk exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T
from ..operators.similarity import knn_bruteforce
from .registry import query
from .relational import t
from .similarity import QUERY_VEC, _QLIT, _QNORM, _sql_dot, _sql_self_dot

QUERY_TERMS = ["vector", "merge", "stream"]
K1 = 1.2
B = 0.75
RRF_K = 60
N_FUSE = 50  # depth of each rank list entering the fusion


def _tf_col(term: str) -> Column:
    toks = T.tokens(F.trim(F.lower(F.col("text"))))
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def _tf_sql(term: str) -> str:
    return (
        "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"x -> x = '{term}'))"
    )


def _score_sql() -> str:
    parts = []
    for i, _term in enumerate(QUERY_TERMS):
        idf = f"ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        tfn = (
            f"(tf{i} * {K1 + 1.0}) / "
            f"(tf{i} + {K1} * (1.0 - {B} + {B} * dl * n_docs / sum_dl))"
        )
        parts.append(f"{idf} * {tfn}")
    # fixed left-to-right order — identical on both engines
    return " + ".join(f"({p})" for p in parts)


_BM25_CTES = f"""
    docstats AS (
        SELECT doc_id,
               (CASE WHEN len(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END)
                   AS dl,
               {', '.join(f"{_tf_sql(term)} AS tf{i}" for i, term in enumerate(QUERY_TERMS))}
        FROM documents
    ),
    corpus AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
               {', '.join(f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}" for i in range(len(QUERY_TERMS)))}
        FROM docstats
    ),
    bm25 AS (
        SELECT doc_id, ({_score_sql()}) AS score
        FROM docstats CROSS JOIN corpus
        WHERE {' + '.join(f'tf{i}' for i in range(len(QUERY_TERMS)))} > 0
    )
"""


def _doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dl, tf0..tfN) — the per-document BM25 statistics from
    ONE tokenize pass over the corpus, eagerly localCheckpoint'd.

    Every consumer of the statistics (the corpus aggregate, the score
    join, the relevance grades in search_eval_ndcg) previously
    re-executed the tokenize lineage — 2 corpus scans per bm25/rrf
    invocation and 3+ for the eval query (guide §1.2: remove redundant
    passes first). The checkpoint is a corpus-row but ~5-int-column
    frame (at 100 TB: a written doc-stats table, the standard IR
    posture); blocks are ContextCleaner-reclaimed with the plan, same
    as the audio fingerprint boundary."""
    docs = t(spark, sf_dir, "documents")
    stats = docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("dl"),
        *[
            _tf_col(term).alias(f"tf{i}")
            for i, term in enumerate(QUERY_TERMS)
        ],
    )
    return stats.localCheckpoint(eager=True)


def _bm25_scores(
    spark: SparkSession, sf_dir: str, stats: DataFrame | None = None
) -> DataFrame:
    """(doc_id, score) for documents matching ≥1 query term."""
    if stats is None:
        stats = _doc_stats(spark, sf_dir)
    corpus = stats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(
                f"df{i}"
            )
            for i in range(len(QUERY_TERMS))
        ],
    )
    score = None
    for i in range(len(QUERY_TERMS)):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}").cast("double")
        n = F.col("n_docs").cast("double")
        idf = F.log((n - df + 0.5) / (df + 0.5) + 1.0)
        tfn = (tf * (K1 + 1.0)) / (
            tf
            + K1
            * (
                1.0
                - B
                + B
                * F.col("dl").cast("double")
                * n
                / F.col("sum_dl").cast("double")
            )
        )
        term_score = idf * tfn
        score = term_score if score is None else score + term_score
    matched = sum(
        (F.col(f"tf{i}") for i in range(1, len(QUERY_TERMS))),
        F.col("tf0"),
    )
    return (
        stats.join(F.broadcast(corpus))
        .filter(matched > 0)
        .select("doc_id", score.alias("score"))
    )


@query(
    "bm25_top_docs",
    f"""
    WITH {_BM25_CTES},
    ranked AS (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM bm25
    )
    SELECT doc_id, ROUND(score, 6) AS score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 20
    """,
)
def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scores(spark, sf_dir)
    # two-phase top-k: per-partition prune, then rank the k·P survivors
    local = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("score").desc(), "doc_id"
    )
    pruned = (
        scored.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= 20)
        .drop("__lr")
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("doc_id", F.round("score", 6).alias("score"), "rank")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: lexical BM25 and embedding-cosine rankings fused by
# reciprocal rank — rrf = 1/(60+r_lex) + 1/(60+r_sem), a doc missing
# from one list contributes nothing for that leg. vec_id and doc_id
# share a domain in the testdata (the embedding of document i), which
# is exactly the production layout of a dual-indexed corpus.
# ---------------------------------------------------------------------------
@query(
    "rrf_hybrid_search",
    f"""
    WITH {_BM25_CTES},
    lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r_lex
        FROM bm25
        QUALIFY r_lex <= {N_FUSE}
    ),
    sem_scored AS (
        SELECT vec_id,
               {_sql_dot('embedding', _QLIT)}
               / (sqrt({_sql_self_dot('embedding')}) * {_QNORM}) AS cosine
        FROM embeddings
    ),
    sem AS (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS r_sem
        FROM sem_scored
        QUALIFY r_sem <= {N_FUSE}
    ),
    fused AS (
        SELECT doc_id,
               COALESCE(1.0 / ({RRF_K} + r_lex), 0.0)
               + COALESCE(1.0 / ({RRF_K} + r_sem), 0.0) AS rrf,
               r_lex, r_sem
        FROM lex FULL OUTER JOIN sem USING (doc_id)
    )
    SELECT doc_id, ROUND(rrf, 9) AS rrf,
           CAST(r_lex AS INT) AS r_lex, CAST(r_sem AS INT) AS r_sem,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT)
               AS rank
    FROM fused
    QUALIFY rank <= 20
    """,
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scores(spark, sf_dir)
    # two-phase: per-partition prune to N_FUSE before the global window
    local = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("score").desc(), "doc_id"
    )
    lex_w = Window.orderBy(F.col("score").desc(), "doc_id")
    lex = (
        scored.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= N_FUSE)
        .withColumn("r_lex", F.row_number().over(lex_w))
        .filter(F.col("r_lex") <= N_FUSE)
        .select("doc_id", "r_lex")
    )
    emb = t(spark, sf_dir, "embeddings")
    sem = knn_bruteforce(emb, QUERY_VEC, k=N_FUSE).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("r_sem")
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (RRF_K + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("r_sem")), F.lit(0.0))
        ).alias("rrf"),
        "r_lex",
        "r_sem",
    )
    w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            "doc_id",
            F.round("rrf", 9).alias("rrf"),
            F.col("r_lex").cast("int").alias("r_lex"),
            F.col("r_sem").cast("int").alias("r_sem"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Index-backed point lookup (operators/invindex.py): the lookup-service
# twin of bm25_top_docs. The posting lists are written ONCE per
# (session, sf) hive-partitioned by term hash bucket; the query then
# reads at most q of the B=16 bucket directories (partition pruning,
# physically asserted in tests/test_invindex.py) and never touches the
# corpus. The oracle recomputes the same boolean-AND lookup from the
# documents table directly — the index must be invisible in the values.
# ---------------------------------------------------------------------------
_INDEX_DIRS: dict[tuple[str, str], str] = {}
_LOOKUP_TERMS = ["join", "filter", "scan"]
_INDEX_BUCKETS = 16


def _inverted_index_dir(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    from ..operators.invindex import write_inverted_index

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _INDEX_DIRS:
        out_dir = tempfile.mkdtemp(prefix="inv_index_")
        atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
        docs = t(spark, sf_dir, "documents").select("doc_id", "text")
        write_inverted_index(
            docs, out_dir, "doc_id", "text", num_buckets=_INDEX_BUCKETS
        )
        _INDEX_DIRS[key] = out_dir
    return _INDEX_DIRS[key]


@query(
    "indexed_term_lookup",
    f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents
    ),
    q AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM tok
        WHERE term IN ('join', 'filter', 'scan')
        GROUP BY term, doc_id
    )
    SELECT doc_id,
           COUNT(DISTINCT term) AS n_terms,
           CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM q
    GROUP BY doc_id
    HAVING COUNT(DISTINCT term) = 3
    """,
)
def indexed_term_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.invindex import search_indexed

    path = _inverted_index_dir(spark, sf_dir)
    return search_indexed(
        spark,
        path,
        _LOOKUP_TERMS,
        num_buckets=_INDEX_BUCKETS,
        require_all=True,
    )


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: nDCG@10 and MRR@10 for the three
# rankers above (lexical BM25, embedding cosine, RRF fusion) against a
# DETERMINISTIC graded relevance — rel(doc) = number of distinct query
# terms present (0..3) — so the eval is a pure function of the corpus
# and both engines re-derive it exactly. The oracle recomputes the
# rankings AND the metrics declaratively; ties at the IDCG@10 boundary
# are harmless (equal rel contributes equally regardless of which doc
# fills the slot). Fixed-order sums + ROUND(…, 6) absorb last-ulp
# summation noise in the ≤10-term DCG sums.
# ---------------------------------------------------------------------------
_EVAL_K = 10


def _rel_sql() -> str:
    return " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
        for i in range(len(QUERY_TERMS))
    )


@query(
    "search_eval_ndcg",
    f"""
    WITH {_BM25_CTES},
    rel AS (
        SELECT doc_id, {_rel_sql()} AS rel FROM docstats
    ),
    idcg AS (
        SELECT SUM((POW(2.0, rel) - 1.0) / log2(rk + 1.0)) AS v
        FROM (
            SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC) AS rk
            FROM rel
        ) WHERE rk <= {_EVAL_K}
    ),
    lex10 AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM bm25 QUALIFY rank <= {_EVAL_K}
    ),
    sem_scored AS (
        SELECT vec_id,
               {_sql_dot('embedding', _QLIT)}
               / (sqrt({_sql_self_dot('embedding')}) * {_QNORM}) AS cosine
        FROM embeddings
    ),
    sem10 AS (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank
        FROM sem_scored QUALIFY rank <= {_EVAL_K}
    ),
    lexf AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r_lex
        FROM bm25 QUALIFY r_lex <= {N_FUSE}
    ),
    semf AS (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS r_sem
        FROM sem_scored QUALIFY r_sem <= {N_FUSE}
    ),
    rrf10 AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rank
        FROM (
            SELECT doc_id,
                   COALESCE(1.0 / ({RRF_K} + r_lex), 0.0)
                   + COALESCE(1.0 / ({RRF_K} + r_sem), 0.0) AS rrf
            FROM lexf FULL OUTER JOIN semf USING (doc_id)
        ) QUALIFY rank <= {_EVAL_K}
    ),
    legs AS (
        SELECT 'bm25' AS method, doc_id, rank FROM lex10
        UNION ALL
        SELECT 'cosine', doc_id, rank FROM sem10
        UNION ALL
        SELECT 'rrf', doc_id, rank FROM rrf10
    )
    SELECT method,
           ROUND(SUM((POW(2.0, COALESCE(r.rel, 0)) - 1.0)
                     / log2(l.rank + 1.0))
                 / (SELECT v FROM idcg), 6) AS ndcg_at_10,
           ROUND(COALESCE(MAX(1.0 / CASE WHEN COALESCE(r.rel, 0) >= 2
                                         THEN l.rank END), 0.0), 6)
               AS mrr_at_10,
           CAST(SUM(CASE WHEN COALESCE(r.rel, 0) >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rel_in_top10
    FROM legs l LEFT JOIN rel r USING (doc_id)
    GROUP BY method
    """,
)
def search_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import knn_bruteforce

    # ONE tokenize pass feeds the relevance grades, the IDCG anchor and
    # the BM25 leg (previously 3+ corpus scans per invocation): rel is
    # CASE WHEN tf_i > 0 over the shared checkpointed stats — the exact
    # definition the oracle's rel CTE computes from docstats.
    stats = _doc_stats(spark, sf_dir)
    rel = stats.select(
        "doc_id",
        sum(
            (
                F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)
                for i in range(1, len(QUERY_TERMS))
            ),
            F.when(F.col("tf0") > 0, 1).otherwise(0),
        ).alias("rel"),
    )
    idcg = (
        rel.orderBy(F.col("rel").desc())
        .limit(_EVAL_K)
        .select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.col("rel").desc()))
            .alias("rk"),
        )
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("rk") + F.lit(1.0))
            )
        )
        .collect()[0][0]
    )
    scored = _bm25_scores(spark, sf_dir, stats=stats)
    # two-phase top-k (the bm25_top_docs pattern): per-partition prune
    # to N_FUSE so the global rank window sees k·P survivors, never the
    # full matched corpus
    local = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("score").desc(), "doc_id"
    )
    pruned = (
        scored.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= N_FUSE)
        .drop("__lr")
    )
    lex_w = Window.orderBy(F.col("score").desc(), "doc_id")
    lex_full = pruned.withColumn("rank", F.row_number().over(lex_w))
    lex10 = lex_full.filter(F.col("rank") <= _EVAL_K).select(
        "doc_id", "rank"
    )
    emb = t(spark, sf_dir, "embeddings")
    # NOTE (r13, measured and REJECTED): collecting this ≤N_FUSE-row
    # leg into a local anchor (the idcg idiom) removes the 4 duplicate
    # embeddings scans its two lazy consumers cause, but the extra
    # BLOCKING job regressed the query +0.9-1.0 s at sf0.1 AND
    # +1.1-3.2 s at the 10× tier in interleaved A/B (the lazy scans
    # evaluate inside ONE job and partially dedupe via exchange reuse;
    # the anchor serializes a driver round-trip) — the same
    # fixed-cost-at-small-scale trade VERDICT r12 ordered undone for
    # the edf probes. Kept lazy; waived under DUP_SCAN_TWO_PASS.
    sem_all = knn_bruteforce(emb, QUERY_VEC, k=N_FUSE).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    sem10 = sem_all.filter(F.col("rank") <= _EVAL_K)
    lexf = lex_full.filter(F.col("rank") <= N_FUSE).select(
        "doc_id", F.col("rank").alias("r_lex")
    )
    semf = sem_all.select("doc_id", F.col("rank").alias("r_sem"))
    rrf_w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    rrf10 = (
        lexf.join(semf, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(1.0 / (RRF_K + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("r_sem")), F.lit(0.0))
            ).alias("rrf"),
        )
        .withColumn("rank", F.row_number().over(rrf_w))
        .filter(F.col("rank") <= _EVAL_K)
        .select("doc_id", "rank")
    )
    legs = (
        lex10.select(F.lit("bm25").alias("method"), "doc_id", "rank")
        .unionByName(
            sem10.select(F.lit("cosine").alias("method"), "doc_id", "rank")
        )
        .unionByName(
            rrf10.select(F.lit("rrf").alias("method"), "doc_id", "rank")
        )
    )
    # Spark cannot build the right side of a right-outer broadcast
    # join (the hint is silently dropped and the corpus would shuffle
    # through a sort-merge join), so: (1) broadcast-SEMI-join the
    # corpus-sized relevance table down to the ≤30 leg doc_ids
    # (LeftSemi BuildRight is supported), then (2) broadcast that
    # bounded slice into the legs with a left join (LeftOuter
    # BuildRight is supported) — outer semantics preserved, corpus
    # never shuffled
    leg_ids = legs.select("doc_id").distinct()
    rel_small = rel.join(F.broadcast(leg_ids), "doc_id", "left_semi")
    joined = legs.join(F.broadcast(rel_small), "doc_id", "left").select(
        "method",
        "rank",
        F.coalesce("rel", F.lit(0)).alias("rel"),
    )
    return joined.groupBy("method").agg(
        F.round(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("rank") + F.lit(1.0))
            )
            / F.lit(float(idcg)),
            6,
        ).alias("ndcg_at_10"),
        F.round(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("rel") >= 2, 1.0 / F.col("rank")
                    )
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("mrr_at_10"),
        F.sum(F.when(F.col("rel") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_rel_in_top10"),
    )
