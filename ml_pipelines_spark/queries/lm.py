"""Language-model perplexity scoring query.

The oracle retrains the same bigram model and rescoring entirely in
SQL: same tokenization, same add-alpha smoothing, same vocabulary.
avg_nll is rounded on both sides (sum order differs across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lm import ngram_counts, perplexity
from .registry import query
from .relational import t

ALPHA = 0.4

_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


@query(
    "lm_perplexity_docs",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)
    ),
    uni AS (SELECT w1 AS w, COUNT(*) AS c_uni FROM bg GROUP BY w1),
    bi AS (SELECT w1, w2, COUNT(*) AS c_bi FROM bg GROUP BY w1, w2),
    v AS (
        SELECT COUNT(DISTINCT w) AS vocab FROM (
            SELECT w1 AS w FROM bg UNION SELECT w2 AS w FROM bg
        )
    ),
    scored AS (
        SELECT bg.doc_id,
               -ln((coalesce(bi.c_bi, 0) + {ALPHA})
                   / (coalesce(uni.c_uni, 0) + {ALPHA} * v.vocab)) AS nll
        FROM bg
        LEFT JOIN bi ON bg.w1 = bi.w1 AND bg.w2 = bi.w2
        LEFT JOIN uni ON bg.w1 = uni.w
        CROSS JOIN v
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           round(AVG(nll), 5) AS avg_nll,
           round(exp(AVG(nll)), 2) AS ppl
    FROM scored GROUP BY doc_id
    """,
)
def lm_perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    uni, bi, vocab = ngram_counts(docs, "doc_id", "text")
    scored = perplexity(docs, "doc_id", "text", uni, bi, vocab, alpha=ALPHA)
    return scored.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_nll", 5).alias("avg_nll"),
        F.round("ppl", 2).alias("ppl"),
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram model. Every term is a grouped count
# over the SAME bigram CTE on both engines; D = 0.75 is binary-exact
# and the per-row probability is one IEEE expression, so round(6) is
# the only tolerance needed. Distinct-shape note: left/continuation/
# type counts are aggregates OF the bigram-count aggregate (model-sized
# inputs), not re-scans of the corpus.
# ---------------------------------------------------------------------------
@query(
    "kneser_ney_bigrams",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bg AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS u(i)
    ),
    bi AS (SELECT w1, w2, COUNT(*) AS c_bi FROM bg GROUP BY w1, w2),
    lft AS (
        SELECT w1, CAST(SUM(c_bi) AS BIGINT) AS c_w1,
               COUNT(*) AS n_follow
        FROM bi GROUP BY w1
    ),
    cont AS (SELECT w2, COUNT(*) AS n_prec FROM bi GROUP BY w2),
    tt AS (SELECT COUNT(*) AS t_types FROM bi)
    SELECT bi.w1, bi.w2, bi.c_bi,
           ROUND(greatest(bi.c_bi - 0.75, 0.0) / lft.c_w1
                 + (0.75 * lft.n_follow / lft.c_w1)
                 * (cont.n_prec / tt.t_types), 6) AS p_kn
    FROM bi
    JOIN lft  ON lft.w1 = bi.w1
    JOIN cont ON cont.w2 = bi.w2
    CROSS JOIN tt
    """,
)
def kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import kneser_ney_bigrams as kn
    from .registry import swap_cache

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return kn(
        docs,
        "doc_id",
        "text",
        discount=0.75,
        materialize=lambda name, frame: swap_cache(
            f"lm.kn.{name}", sf_dir, frame
        ),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING (operators/lm.bpe_train_merges): the first 6
# merge operations learned from the corpus. After one corpus pass
# builds the word-frequency table, every round runs on the VOCABULARY
# (production-BPE shape). The DuckDB oracle replays all 6 rounds in
# chained MATERIALIZED CTEs on the same paren-wrapped representation —
# pair counting, the (count desc, left, right) argmax, and the
# replace-based greedy merge application are value-identical, so the
# full merge table is cross-engine checked (the logreg/kmeans
# trajectory-oracle pattern applied to tokenizer training).
# ---------------------------------------------------------------------------
_BPE_K = 6


def _bpe_oracle_sql(k: int) -> str:
    sql = r"""
    WITH words AS MATERIALIZED (
        SELECT tk AS word, COUNT(*) AS freq
        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tk
              FROM documents)
        WHERE tk <> '' AND tk NOT LIKE '%(%' AND tk NOT LIKE '%)%'
        GROUP BY tk
    ),
    seg0 AS MATERIALIZED (
        SELECT array_to_string(list_transform(regexp_extract_all(word, '.'),
                                              c -> '(' || c || ')'),
                               '') AS s,
               freq
        FROM words
    )"""
    for i in range(1, k + 1):
        prev = f"seg{i - 1}"
        sql += f""",
    p{i} AS MATERIALIZED (
        SELECT l, r, CAST(SUM(freq) AS BIGINT) AS c
        FROM (
            SELECT y[i] AS l, y[i + 1] AS r, freq
            FROM (SELECT regexp_extract_all(s, '\\(([^)]*)\\)', 1) AS y,
                         freq
                  FROM {prev}),
                 unnest(generate_series(1, greatest(len(y) - 1, 0))) AS t(i)
        )
        GROUP BY l, r
    ),
    m{i} AS MATERIALIZED (
        SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1
    ),
    seg{i} AS MATERIALIZED (
        SELECT replace(s,
                       '(' || (SELECT l FROM m{i}) || ')('
                           || (SELECT r FROM m{i}) || ')',
                       '(' || (SELECT l FROM m{i})
                           || (SELECT r FROM m{i}) || ')') AS s,
               freq
        FROM {prev}
    )"""
    sql += "\n    " + "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, l AS merge_left,"
        f" r AS merge_right, c AS pair_count FROM m{i}"
        for i in range(1, k + 1)
    )
    return sql


@query("bpe_train_merges", _bpe_oracle_sql(_BPE_K))
def bpe_train_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens as _tokens
    from ..operators.lm import bpe_train_merges

    words = (
        t(spark, sf_dir, "documents")
        .select(
            F.explode(_tokens(F.trim(F.lower(F.col("text"))))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges = bpe_train_merges(words, k=_BPE_K)
    return spark.createDataFrame(
        merges,
        "step long, merge_left string, merge_right string, pair_count long",
    )
