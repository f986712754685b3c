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
