"""Data-mixture queries — temperature re-weighting, epoch repeats,
token budgets, training order.

Every sampling decision is the md5 hex-bucket construction shared with
queries.splits, so DuckDB recomputes the identical decision per row —
the oracle checks WHICH rows were kept/replicated, not just how many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mixture import (
    _rate_threshold,
    domain_mixture_sample,
    epoch_repeat,
    temperature_weights,
    token_budget_select,
    training_order,
)
from .registry import query
from .relational import t

# ---------------------------------------------------------------------------
# Temperature-tau mixture sampling. The oracle recomputes the rates from
# counts entirely in SQL (same pow/normalize/threshold arithmetic), so
# the Python helper's math is itself under test.
# ---------------------------------------------------------------------------
TAU = 2.0


@query(
    "mixture_temperature_sample",
    f"""
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT SUM(n) AS t FROM counts),
    raw AS (SELECT source, pow(n / t, {1.0 / TAU}) / (n / t) AS r FROM counts, tot),
    mx AS (SELECT MAX(r) AS m FROM raw),
    th AS (SELECT source,
                  CASE WHEN r / m >= 1.0 THEN 'zzzz'
                       ELSE printf('%04x', CAST(round(r / m * 65536) AS INT))
                  END AS thr
           FROM raw, mx)
    SELECT d.doc_id, d.source
    FROM documents d JOIN th USING (source)
    WHERE substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 4) < thr
    """,
)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rates = temperature_weights(counts, tau=TAU)
    return domain_mixture_sample(docs, "source", rates, "doc_id", salt="mix").select(
        "doc_id", "source"
    )


# ---------------------------------------------------------------------------
# Fractional per-domain epoch repeats: src1 ×2.5, src3 ×1.25, src7 ×0.5,
# everything else ×1. The oracle rebuilds copy counts (floor + hash-
# selected fractional extra) and fans out with generate_series.
# ---------------------------------------------------------------------------
EPOCHS = {"src1": 2.5, "src3": 1.25, "src7": 0.5}

_FULL_CASE = " ".join(
    f"WHEN '{d}' THEN {int(e // 1)}" for d, e in EPOCHS.items()
)
_THR_CASE = " ".join(
    f"WHEN '{d}' THEN '{_rate_threshold(e - int(e // 1))}'" for d, e in EPOCHS.items()
)


@query(
    "epoch_repeat_docs",
    f"""
    WITH e AS (
        SELECT doc_id, source,
               CASE source {_FULL_CASE} ELSE 1 END AS n_full,
               CASE source {_THR_CASE} ELSE '0000' END AS thr
        FROM documents
    ),
    c AS (
        SELECT doc_id, source,
               n_full + CASE WHEN substring(md5('epoch:' || CAST(doc_id AS VARCHAR)), 1, 4) < thr
                             THEN 1 ELSE 0 END AS n
        FROM e
    )
    SELECT doc_id, source, CAST(unnest(generate_series(1, n)) AS BIGINT) AS epoch
    FROM c WHERE n >= 1
    """,
)
def epoch_repeat_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return epoch_repeat(docs, "source", EPOCHS, "doc_id").select(
        "doc_id", "source", F.col("epoch").cast("long")
    )


# ---------------------------------------------------------------------------
# Per-domain token budget, cheapest-first greedy prefix: one window pass,
# shuffle keyed on the domain.
# ---------------------------------------------------------------------------
CHAR_BUDGET = 20000


@query(
    "token_budget_per_source",
    f"""
    SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
               SUM(n_chars) OVER (PARTITION BY source ORDER BY n_chars, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM documents
    ) WHERE cum <= {CHAR_BUDGET}
    """,
)
def token_budget_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return token_budget_select(
        docs,
        "source",
        "n_chars",
        CHAR_BUDGET,
        order_cols=["n_chars", "doc_id"],
    ).select("doc_id", "source", "n_chars")


# ---------------------------------------------------------------------------
# Deterministic training order: dense position in md5(salt:doc_id) order.
# Spark side uses distributed dense ids (no single-task sort); the oracle
# states the contract directly as a global row_number.
# ---------------------------------------------------------------------------
@query(
    "training_order_docs",
    """
    SELECT doc_id,
           row_number() OVER (ORDER BY md5('curr:' || CAST(doc_id AS VARCHAR))) - 1 AS pos
    FROM documents
    """,
)
def training_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return training_order(docs, "doc_id", salt="curr").select(
        "doc_id", F.col("pos").cast("long")
    )


# ---------------------------------------------------------------------------
# Source-mix divergence — the mixture-planning metric: KL(current mix ||
# target mix) plus per-source share deltas against the declared target
# weights. One count aggregate; the KL fold is a handful of exact
# float64 terms, rounded on both sides.
# ---------------------------------------------------------------------------
_TARGET_MIX = {"web": 0.4, "books": 0.2, "code": 0.2, "wiki": 0.1, "news": 0.1}


@query(
    "source_mix_kl",
    f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n) AS total FROM counts),
    shares AS (
        SELECT source, n, n / CAST(total AS DOUBLE) AS p,
               CASE source
                   {' '.join(f"WHEN '{s}' THEN {w}" for s, w in _TARGET_MIX.items())}
                   ELSE 0.0 END AS q
        FROM counts, tot
    )
    SELECT source, n,
           ROUND(p, 6) AS share,
           ROUND(p - q, 6) AS delta_vs_target,
           ROUND(CASE WHEN q > 0 THEN p * ln(p / q) END, 6) AS kl_term
    FROM shares
    """,
)
def source_mix_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    q = F.lit(0.0)
    for s, w in _TARGET_MIX.items():
        q = F.when(F.col("source") == s, F.lit(float(w))).otherwise(q)
    p = F.col("n") / F.col("total").cast("double")
    return counts.crossJoin(F.broadcast(total)).select(
        "source",
        "n",
        F.round(p, 6).alias("share"),
        F.round(p - q, 6).alias("delta_vs_target"),
        F.round(F.when(q > 0, p * F.log(p / q)), 6).alias("kl_term"),
    )


# ---------------------------------------------------------------------------
# Token budget under the PINNED-BPE cost (functions.tokenizer): the
# opt-in wiring of the subword-tokenizer seam into budget planning
# (VERDICT r4 item 4). Same greedy cheapest-first prefix rule as
# token_budget_per_source; the cost is subword tokens from the
# pinned-vocab model instead of characters, and the DuckDB twin
# re-derives every count from the same literal vocab, so the selection
# stays value-checked row for row.
# ---------------------------------------------------------------------------
from ..functions.tokenizer import pinned_token_count, pinned_token_count_sql  # noqa: E402

BPE_BUDGET = 4000


@query(
    "token_budget_bpe",
    f"""
    SELECT doc_id, source, n_bpe_tokens FROM (
        SELECT doc_id, source, n_bpe_tokens,
               SUM(n_bpe_tokens) OVER (
                   PARTITION BY source ORDER BY n_bpe_tokens, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM (
            SELECT doc_id, source,
                   {pinned_token_count_sql('text')} AS n_bpe_tokens
            FROM documents
        )
    ) WHERE cum <= {BPE_BUDGET}
    """,
)
def token_budget_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        pinned_token_count(F.col("text")).alias("n_bpe_tokens"),
    )
    return token_budget_select(
        docs,
        "source",
        "n_bpe_tokens",
        BPE_BUDGET,
        order_cols=["n_bpe_tokens", "doc_id"],
    ).select("doc_id", "source", "n_bpe_tokens")


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al., 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw document
# by log p_target(doc) - log p_raw(doc) under bag-of-hashed-unigram
# multinomials with add-one smoothing; resampling by this weight shifts
# the corpus toward the target domain (here: the English slice stands
# in for DSIR's Wikipedia-quality target). Spark shape at 100 TB: one
# token explode, ONE groupBy(bucket) building both models in the same
# pass (conditional count), a 64-row broadcast of the log-ratio
# dictionary back onto the token stream, and a per-document sum — no
# pair joins, no driver-side model. The oracle re-derives the bucket
# models, the smoothing, and every per-document sum in SQL.
# ---------------------------------------------------------------------------
_DSIR_B = 64
_DSIR_TOK = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"
)


@query(
    "dsir_importance_weights",
    f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest({_DSIR_TOK}) AS w FROM documents
    ),
    b AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(w), 1, 4)) AS INTEGER) % {_DSIR_B}
                   AS bucket
        FROM tok
    ),
    dim AS (
        SELECT bucket, COUNT(*) AS raw_c,
               COUNT(CASE WHEN lang = 'en' THEN 1 END) AS tgt_c
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT SUM(raw_c) AS r, SUM(tgt_c) AS tt FROM dim),
    lr AS (
        SELECT bucket,
               ln((tgt_c + 1.0) / (tt + {_DSIR_B}.0))
             - ln((raw_c + 1.0) / (r + {_DSIR_B}.0)) AS lr
        FROM dim, tot
    ),
    per AS (
        SELECT doc_id, COUNT(*) AS n_tokens, SUM(lr) AS s
        FROM b JOIN lr USING (bucket) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
           ROUND(COALESCE(s, 0.0), 5) AS log_w,
           COALESCE(s, 0.0) >= 0 AS keep
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixture import dsir_log_weights

    docs = t(spark, sf_dir, "documents").withColumn(
        "__is_en", F.col("lang") == "en"
    )
    w = dsir_log_weights(docs, "doc_id", "text", "__is_en", buckets=_DSIR_B)
    return w.select(
        "doc_id",
        "n_tokens",
        F.round("log_w", 5).alias("log_w"),
        (F.col("log_w") >= 0).alias("keep"),
    )
