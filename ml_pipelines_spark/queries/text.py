"""Text-analysis queries over the documents table — token counting,
quality scoring, language ID, fingerprinting, shingling.

All implementations are pure JVM-side column expressions
(functions.text); the DuckDB twins mirror every normalization step, so
these double as cross-engine specs of the text pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from .registry import query
from .relational import t

_SW = "', '".join(T.ENGLISH_STOPWORDS)


def token_count_sql(txt: str) -> str:
    """DuckDB twin of functions.text.token_count for expression ``txt``.

    DuckDB's ``string_split_regex('', ...)`` returns ``['']`` (length 1)
    while Spark's ``token_count`` is guarded to 0 for blank text — so
    the twin carries the same guard (ADVICE r4: without it, a blank
    document would hash-diverge even though both engines are
    self-consistent)."""
    return (
        f"(CASE WHEN len(trim({txt})) = 0 THEN 0"
        f" ELSE len(string_split_regex(trim({txt}), '\\s+')) END)"
    )


def quality_sql(txt: str) -> str:
    """DuckDB twin of functions.text.quality_score for expression ``txt``
    — same terms in the same order, so the float64 result matches the
    Spark expression bit-for-bit on identical inputs (the arithmetic is
    a few ops over small integer counts). The length term counts tokens
    through the blank-guarded ``token_count_sql``; the mean-word-length
    denominator deliberately keeps the unguarded ``greatest(len(...),1)``
    because Spark's mean_token_length divides by ``greatest(size,1)`` of
    the raw split, which is 1 for blank on both engines."""
    punct = (
        f"(len({txt}) - len(regexp_replace({txt}, "
        "'[!-/:-@\\[-`{-~]', '', 'g')))"
    )
    wt = f"string_split_regex(trim({txt}), '\\s+')"
    mwl = (
        f"list_aggregate(list_transform({wt}, x -> len(x)), 'sum')"
        f" / greatest(len({wt}), 1)"
    )
    return (
        f"least({token_count_sql(txt)} / 64.0, 1.0) * 0.4"
        f" + (1.0 - least(4.0 * {punct} / greatest(len({txt}), 1), 1.0)) * 0.3"
        f" + (CASE WHEN {mwl} BETWEEN 2.0 AND 12.0"
        " THEN 1.0 ELSE 0.3 END) * 0.3"
    )


@query(
    "text_quality",
    f"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS ws_toks,
               string_split_regex(lower(text), '\\s+') AS lower_toks,
               text
        FROM documents
    )
    SELECT doc_id,
           (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(ws_toks) END)
               AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           ROUND((len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))
                 / greatest(len(text), 1), 5) AS punct_ratio,
           ROUND(len(list_filter(lower_toks, x -> list_contains(['{_SW}'], x)))
                 / greatest(len(ws_toks), 1), 5) AS stopword_ratio,
           ROUND(list_aggregate(list_transform(ws_toks, x -> len(x)), 'sum')
                 / greatest(len(ws_toks), 1), 5) AS mean_token_len,
           ROUND(least((CASE WHEN len(trim(text)) = 0 THEN 0
                             ELSE len(ws_toks) END) / 64.0, 1.0) * 0.4
                 + (1.0 - least(4.0 * (len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))
                                       / greatest(len(text), 1), 1.0)) * 0.3
                 + (CASE WHEN list_aggregate(list_transform(ws_toks, x -> len(x)), 'sum')
                              / greatest(len(ws_toks), 1) BETWEEN 2.0 AND 12.0
                         THEN 1.0 ELSE 0.3 END) * 0.3, 5) AS quality
    FROM toks
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    txt = F.col("text")
    return docs.select(
        "doc_id",
        T.token_count(txt).alias("n_tokens"),
        T.bpe_ish_token_count(txt).alias("n_bpe_tokens"),
        F.round(T.punct_ratio(txt), 5).alias("punct_ratio"),
        F.round(T.stopword_ratio(txt), 5).alias("stopword_ratio"),
        F.round(T.mean_token_length(txt), 5).alias("mean_token_len"),
        F.round(T.quality_score(txt), 5).alias("quality"),
    )


def _lang_hits_sql(lang: str) -> str:
    markers = "', '".join(T.LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split_regex(lower(text), '\\s+'), "
        f"x -> list_contains(['{markers}'], x)))"
    )


_LANGS = list(T.LANG_MARKERS)
_HITS = {lang: _lang_hits_sql(lang) for lang in _LANGS}
_BEST = "greatest(" + ", ".join(_HITS.values()) + ")"
_CASE = "CASE WHEN " + _BEST + " = 0 THEN 'und' " + " ".join(
    f"WHEN {_HITS[lang]} = {_BEST} THEN '{lang}'" for lang in _LANGS
) + " END"


@query(
    "lang_id",
    f"""
    SELECT doc_id, lang AS labeled_lang, {_CASE} AS pred_lang
    FROM documents
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.lang_id(F.col("text")).alias("pred_lang"),
    )


@query(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


# ---------------------------------------------------------------------------
# End-to-end corpus curation — the canonical LLM training-data pass,
# composed entirely from the oracle-checked building blocks: language
# gate (lang_id), quality gate (quality_score >= 0.8), normalized-
# fingerprint dedup keeping the lowest doc_id, deterministic 90/5/5
# split assignment. One declarative plan: the gates evaluate in the
# scan stage, dedup is the only shuffle, the split adds none.
# Thresholds: 0.9 -> 'e666', 0.95 -> 'f333'.
# ---------------------------------------------------------------------------
_QUALITY_SQL = f"ROUND({quality_sql('text')}, 5)"


@query(
    "curate_corpus",
    f"""
    WITH scored AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
               {_QUALITY_SQL} AS quality,
               {_CASE} AS pred_lang
        FROM documents
    ),
    kept AS (
        SELECT doc_id, fp, quality FROM scored
        WHERE pred_lang = 'en' AND quality >= 0.8
        QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    )
    SELECT doc_id, quality,
           CASE WHEN substr(md5('cur' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'train'
                WHEN substr(md5('cur' || CAST(doc_id AS VARCHAR)), 1, 4) < 'f333' THEN 'val'
                ELSE 'test' END AS split
    FROM kept
    """,
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup
    from ..operators.splits import hash_split_expr

    docs = t(spark, sf_dir, "documents")
    txt = F.col("text")
    scored = docs.select(
        "doc_id",
        T.fingerprint(txt).alias("fp"),
        F.round(T.quality_score(txt), 5).alias("quality"),
        T.lang_id(txt).alias("pred_lang"),
    )
    kept = scored.filter(
        (F.col("pred_lang") == "en") & (F.col("quality") >= 0.8)
    )
    deduped = exact_dedup(kept, ["fp"], order_col="doc_id")
    return deduped.select(
        "doc_id",
        "quality",
        hash_split_expr(
            F.col("doc_id"), {"train": 0.9, "val": 0.05, "test": 0.05}, salt="cur"
        ),
    )


@query(
    "word_shingles",
    """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(w) < 3 THEN 0 ELSE len(w) - 2 END AS n_shingles,
           CASE WHEN len(w) < 3 THEN NULL
                ELSE w[1] || ' ' || w[2] || ' ' || w[3] END AS first_shingle,
           CASE WHEN len(w) < 3 THEN 0
                ELSE len(list_distinct(list_transform(
                         generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) END AS n_distinct_shingles
    FROM toks
    """,
)
def word_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sh = T.word_shingles(F.col("text"), k=3)
    return docs.select(
        "doc_id",
        F.size(sh).alias("n_shingles"),
        F.element_at(sh, 1).alias("first_shingle"),
        F.size(F.array_distinct(sh)).alias("n_distinct_shingles"),
    )


# ---------------------------------------------------------------------------
# Vocabulary building — top-50 tokens by document frequency (the
# tokenizer-training / corpus-stats pass). Distinct-per-doc tokens
# explode once; the groupBy is the only data shuffle; the top-k runs
# two-phase (per-partition prune, then a k·P-row global sort), never a
# full global sort. Ties break lexicographically for cross-engine
# stability.
# ---------------------------------------------------------------------------
@query(
    "vocab_topk",
    """
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(
                   string_split_regex(trim(lower(text)), '\\s+'))) AS token
        FROM documents
    ),
    df_counts AS (
        SELECT token, COUNT(*) AS doc_freq FROM tok GROUP BY token
    )
    SELECT token, doc_freq,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_freq DESC, token) AS INT) AS rank
    FROM df_counts
    QUALIFY rank <= 50
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(T.tokens(F.trim(F.lower(F.col("text")))))
        ).alias("token"),
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    # two-phase top-k: per-partition prune to <= 50 rows, then rank the
    # k·P survivors globally (bytes, not data)
    local = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("doc_freq").desc(), F.col("token")
    )
    pruned = (
        counts.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= 50)
        .drop("__lr")
    )
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("token"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 50)
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document — the canonical text-feature op. Term
# frequencies and document frequencies come from two groupBys over ONE
# token explode (the df side aggregates the same exploded table);
# idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style). Top-3 terms per
# doc via a per-doc window — partitioned by doc_id, so the "sort" is
# thousands of tiny per-doc heaps, not a global order. Ties break
# lexicographically for cross-engine stability.
# ---------------------------------------------------------------------------
@query(
    "tfidf_top_terms",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ),
    df_t AS (
        SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               tf.tf * (ln((n.n_docs + 1.0) / (df_t.df + 1.0)) + 1.0) AS tfidf
        FROM tf JOIN df_t USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, ROUND(tfidf, 5) AS tfidf,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()  # one tiny driver scalar; embeds as a literal
    tok = docs.select(
        "doc_id",
        F.explode(T.tokens(F.trim(F.lower(F.col("text"))))).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_t, "token").select(
        "doc_id",
        "token",
        (
            F.col("tf")
            * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0)
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", F.round("tfidf", 5).alias("tfidf"), "rank")
    )


# ---------------------------------------------------------------------------
# Gopher-style document filters (Rae et al. 2021, "Scaling Language
# Models" §A1.1 — public rule set): bounds on word count / mean word
# length, punctuation share, and a repetition gate via the distinct-word
# ratio. All built-in expressions; the composite pass flag is the corpus
# gate a curation pipeline applies before training. (The corpus has no
# newlines, so the line-based Gopher rules are vacuous here; the
# word-level rules are the meaningful subset.)
# ---------------------------------------------------------------------------
_G_MIN_WORDS, _G_MAX_WORDS = 50, 100000
_G_MIN_MWL, _G_MAX_MWL = 3.0, 10.0
_G_MAX_PUNCT = 0.2
_G_MIN_DISTINCT = 0.2


@query(
    "gopher_quality_flags",
    f"""
    WITH s AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS ws_toks,
               string_split_regex(trim(lower(text)), '\\s+') AS lo_toks,
               text
        FROM documents
    )
    SELECT doc_id,
           len(ws_toks) AS n_words,
           ROUND(list_aggregate(list_transform(ws_toks, x -> len(x)), 'sum')
                 / greatest(len(ws_toks), 1), 5) AS mean_word_len,
           ROUND(len(list_distinct(lo_toks)) / greatest(len(lo_toks), 1), 5)
               AS distinct_ratio,
           ROUND((len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))
                 / greatest(len(text), 1), 5) AS punct_ratio,
           (len(ws_toks) BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS})
           AND (list_aggregate(list_transform(ws_toks, x -> len(x)), 'sum')
                / greatest(len(ws_toks), 1) BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL})
           AND ((len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))
                / greatest(len(text), 1) <= {_G_MAX_PUNCT})
           AND (len(list_distinct(lo_toks)) / greatest(len(lo_toks), 1)
                >= {_G_MIN_DISTINCT})
               AS passes
    FROM s
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    txt = F.col("text")
    n = T.token_count(txt)
    mwl = T.mean_token_length(txt)
    punct = T.punct_ratio(txt)
    distinct = T.distinct_word_ratio(txt)
    passes = (
        n.between(_G_MIN_WORDS, _G_MAX_WORDS)
        & mwl.between(_G_MIN_MWL, _G_MAX_MWL)
        & (punct <= _G_MAX_PUNCT)
        & (distinct >= _G_MIN_DISTINCT)
    )
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.round(mwl, 5).alias("mean_word_len"),
        F.round(distinct, 5).alias("distinct_ratio"),
        F.round(punct, 5).alias("punct_ratio"),
        passes.alias("passes"),
    )


# ---------------------------------------------------------------------------
# Top-bigram share (the other Gopher repetition axis): the share of a
# document's adjacent word pairs taken by its most common pair. Explode →
# per-(doc, bigram) count → per-doc argmax — one shuffle keyed on the
# doc, no per-row quadratic HOF work; ties break lexicographically.
# ---------------------------------------------------------------------------
@query(
    "top_bigram_share",
    """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i + 1])) AS bigram,
               len(w) - 1 AS n_bigrams
        FROM toks
        WHERE len(w) >= 2
    ),
    counted AS (
        SELECT doc_id, bigram, n_bigrams, COUNT(*) AS cnt
        FROM bg GROUP BY doc_id, bigram, n_bigrams
    ),
    ranked AS (
        SELECT doc_id, bigram, cnt, n_bigrams,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, bigram) AS rn
        FROM counted
    )
    SELECT doc_id, bigram AS top_bigram,
           ROUND(cnt / n_bigrams, 5) AS top_share
    FROM ranked WHERE rn = 1
    """,
)
def top_bigram_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    bg = (
        docs.select("doc_id", F.explode(T.word_bigrams(F.col("text"))).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .count()
    )
    w_doc = Window.partitionBy("doc_id")
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("count"), F.asc("bigram"))
    return (
        bg.withColumn("n_bigrams", F.sum("count").over(w_doc))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bigram").alias("top_bigram"),
            F.round(F.col("count") / F.col("n_bigrams"), 5).alias("top_share"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction (training-corpus scrub). The driver corpus carries no
# PII, so the query plants deterministic synthetic PII derived from
# doc_id — identically in both engines — and the redaction regexes
# (shared RE2-compatible pattern strings) run against real matches.
# ---------------------------------------------------------------------------
@query(
    "pii_redact_docs",
    f"""
    WITH planted AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or +1 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17'
                   AS text
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{T.PII_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{T.PII_IPV4_RE}')) AS n_ips,
           len(regexp_extract_all(regexp_replace(text, '{T.PII_IPV4_RE}', '[IP]', 'g'),
                                  '{T.PII_PHONE_RE}')) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{T.PII_EMAIL_RE}', '[EMAIL]', 'g'),
               '{T.PII_IPV4_RE}', '[IP]', 'g'),
               '{T.PII_PHONE_RE}', '[PHONE]', 'g') AS redacted
    FROM planted
    """,
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com or +1 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".17"),
        ).alias("text"),
    )
    counts = T.pii_counts(F.col("text"))
    return planted.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_ips"].alias("n_ips"),
        counts["n_phones"].alias("n_phones"),
        T.pii_redact(F.col("text")).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Overlapping token-window chunking (RAG / context-window preprocessing):
# every document becomes ceil-spaced windows of _CHUNK_W tokens with
# stride _CHUNK_S. Chunk count and boundaries are pure integer math —
# identical in both engines — and the fan-out is posexplode of a
# computed sequence (no Python, no per-row loops).
# ---------------------------------------------------------------------------
_CHUNK_W, _CHUNK_S = 64, 48


@query(
    "chunk_documents",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    spec AS (
        SELECT doc_id, w,
               greatest(1, ((len(w) - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S}) + 1)
                   AS n_chunks
        FROM toks
    )
    SELECT doc_id,
           i AS chunk_idx,
           array_to_string(list_slice(w, i * {_CHUNK_S} + 1,
                                      i * {_CHUNK_S} + {_CHUNK_W}), ' ') AS chunk,
           len(list_slice(w, i * {_CHUNK_S} + 1, i * {_CHUNK_S} + {_CHUNK_W}))
               AS chunk_tokens
    FROM spec, unnest(generate_series(0, n_chunks - 1)) AS t(i)
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - _CHUNK_W + _CHUNK_S - 1) / _CHUNK_S).cast("int") + 1,
    )
    spec = docs.select(
        "doc_id",
        toks.alias("w"),
        F.sequence(F.lit(0), n_chunks - 1).alias("idxs"),
    )
    piece = F.slice(
        F.col("w"), F.col("chunk_idx") * _CHUNK_S + 1, _CHUNK_W
    )
    return spec.select(
        "doc_id", F.explode("idxs").alias("chunk_idx"), "w"
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk"),
        F.size(piece).alias("chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# Corpus-wide duplicated-shingle fraction — the cross-document companion
# of the within-doc Gopher repetition flags: for every document, the
# share of its distinct 3-word shingles that occur in >= 2 documents
# (RefinedWeb/CCNet-style contamination-by-boilerplate signal; docs with
# a high ratio are near-copies of corpus boilerplate even when no single
# pair-level dedup fires). Shape at 100 TB: distinct-per-doc shingles
# explode once; ONE groupBy(shingle) builds the doc-frequency table
# (map-side combine collapses repeats), ONE join back on shingle tags
# each doc's shingles, ONE groupBy(doc_id) folds the ratio. No pair
# join, no window — the same aggregate-only skeleton as vocab_topk, so
# hot shingles cost a counter, not a fan-out. The shingle subtree is
# deliberately evaluated twice (two scans of documents.text): at corpus
# scale, persisting the exploded shingle table costs more than
# re-deriving it, and a window-over-shingle alternative would put every
# occurrence of a hot shingle in ONE task with no map-side combine —
# the two-pass groupBy+join is the skew-robust shape (CCNet runs the
# same two passes).
# ---------------------------------------------------------------------------
@query(
    "dup_ngram_fraction",
    """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        FROM toks
    ),
    freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
    per AS (
        SELECT sh.doc_id,
               COUNT(*) AS n_distinct,
               COUNT(*) FILTER (WHERE freq.df >= 2) AS n_dup
        FROM sh JOIN freq USING (shingle)
        GROUP BY sh.doc_id
    )
    SELECT doc_id, n_distinct, n_dup,
           ROUND(CAST(n_dup AS DOUBLE) / n_distinct, 6) AS dup_ratio
    FROM per
    """,
)
def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(T.word_shingles(F.col("text"), k=3))).alias(
            "shingle"
        ),
    )
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per = (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.count(F.when(F.col("df") >= 2, 1)).alias("n_dup"),
        )
    )
    return per.select(
        "doc_id",
        "n_distinct",
        "n_dup",
        F.round(F.col("n_dup").cast("double") / F.col("n_distinct"), 6).alias(
            "dup_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Feature-hashed document vectors — the hashing trick (Weinberger et al.,
# 2009; vowpal-wabbit style): token counts bucketed by md5 into a fixed
# 16-dim vector, the model-free way to get documents into vector space
# (clusterable / ANN-searchable with the embedding operators). One
# explode + ONE groupBy(doc_id) with conditional sums — no pivot
# discovery scan, map-side combine collapses each doc's tokens early.
# md5 bucketing is engine-portable, so every component value-checks.
# ---------------------------------------------------------------------------
_HASH_DIM = 16

@query(
    "hashed_doc_vectors",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS w
        FROM documents
    ),
    b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(w), 1, 4)) AS INTEGER) % {_HASH_DIM}
                   AS bucket
        FROM tok
    )
    SELECT doc_id,
           {", ".join(f"CAST(COUNT(CASE WHEN bucket = {i} THEN 1 END) AS BIGINT) AS c{i}" for i in range(16))}
    FROM b GROUP BY doc_id
    """,
)
def hashed_doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda x: x != ""
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("long"),
        F.lit(_HASH_DIM),
    )
    exploded = docs.select("doc_id", F.explode(toks).alias("w")).select(
        "doc_id", bucket.alias("bucket")
    )
    return exploded.groupBy("doc_id").agg(
        *[
            F.count(F.when(F.col("bucket") == i, 1)).alias(f"c{i}")
            for i in range(_HASH_DIM)
        ]
    )


# ---------------------------------------------------------------------------
# Cross-document duplicated-passage extraction — the drill-down
# companion of dup_ngram_fraction: WHICH passages are the corpus
# boilerplate. Top-15 most-duplicated 3-word shingles with their doc
# frequency and a bounded doc-id witness pair (min/max — never a
# collect of the full posting list, which for true boilerplate is the
# whole corpus). Same aggregate-only skeleton: explode distinct
# shingles once, one groupBy(shingle) with min/max riding the count,
# heap top-k. Rank ties break lexicographically for a stable
# cross-engine order.
# ---------------------------------------------------------------------------
@query(
    "top_dup_passages",
    """
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - 2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        FROM toks
    ),
    freq AS (
        SELECT shingle, COUNT(*) AS df,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM sh GROUP BY shingle
    )
    SELECT shingle, df, first_doc, last_doc
    FROM freq WHERE df >= 2
    ORDER BY df DESC, shingle LIMIT 15
    """,
)
def top_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(T.word_shingles(F.col("text"), k=3))
        ).alias("shingle"),
    )
    return (
        sh.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("df") >= 2)
        .orderBy(F.col("df").desc(), "shingle")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Per-document unigram entropy — the information-density quality signal
# (low-entropy docs are repetitive/templated; CCNet buckets on exactly
# this kind of statistic). H = ln(N) - (Σ c·ln c)/N over token counts:
# one explode, one (doc, token) groupBy with map-side combine, one
# (doc) fold. ln is IEEE double on both engines; the 5dp round on both
# sides absorbs summation-order ulps, the same contract as
# lm_perplexity_docs.
# ---------------------------------------------------------------------------
@query(
    "unigram_entropy_docs",
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents
    ),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
    p AS (SELECT doc_id, SUM(c) AS n, SUM(c * ln(c)) AS s
          FROM c GROUP BY doc_id)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           ROUND(ln(n) - s / n, 5) AS entropy
    FROM p
    """,
)
def unigram_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    cnt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("s"),
    )
    return per.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.round(F.log(F.col("n")) - F.col("s") / F.col("n"), 5).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# Quantile normalization of per-source length distributions — the
# cross-source comparability transform: each document's WITHIN-SOURCE
# rank is mapped onto the GLOBAL token-length distribution, so a "long
# doc for src3" and a "long doc for src9" land on the same normalized
# scale even when the sources' raw length distributions differ wildly
# (the standard bioinformatics/feature-prep construction). The global
# distribution is carried as a 101-point exact-percentile GRID — a
# one-row aggregate broadcast to every row, O(1) state, never a join
# against the sorted global table — with linear interpolation between
# grid points. Ranks use the explicit (rank-1)/max(n-1,1) form, which
# both engines compute identically (and which is well-defined for
# single-document sources, where percent_rank's 0/0 is engine-specific).
# ---------------------------------------------------------------------------
_QN_GRID = 100  # grid points 0..100 -> percentiles i/100


@query(
    "quantile_normalize_lengths",
    f"""
    WITH d AS (
        SELECT doc_id, source, {token_count_sql('text')} AS n_tokens
        FROM documents
    ),
    g AS (
        SELECT quantile_cont(n_tokens,
                   [x / {_QN_GRID}.0 FOR x IN generate_series(0, {_QN_GRID})])
                   AS grid
        FROM d
    ),
    rk AS (
        SELECT doc_id, source, n_tokens,
               (RANK() OVER (PARTITION BY source
                             ORDER BY n_tokens, doc_id) - 1) AS r0,
               GREATEST(COUNT(*) OVER (PARTITION BY source) - 1, 1) AS nd
        FROM d
    ),
    pos AS (
        SELECT doc_id, source, n_tokens,
               CAST(r0 AS DOUBLE) / nd * {_QN_GRID} AS p
        FROM rk
    )
    SELECT pos.doc_id, pos.source, pos.n_tokens,
           floor(CAST(pos.p AS DOUBLE) / {_QN_GRID} * 1000000.0 + 0.5)
               / 1000000.0 AS src_rank,
           floor((g.grid[LEAST(CAST(floor(p) AS INT), {_QN_GRID}) + 1]
                  + (p - floor(p))
                    * (g.grid[LEAST(CAST(floor(p) AS INT) + 1, {_QN_GRID}) + 1]
                       - g.grid[LEAST(CAST(floor(p) AS INT), {_QN_GRID}) + 1]))
                 * 10000.0 + 0.5) / 10000.0 AS norm_tokens
    FROM pos, g
    """,
)
def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", T.token_count(F.col("text")).alias("n_tokens")
    )
    grid = docs.agg(
        F.percentile(
            "n_tokens",
            F.array(*[F.lit(i / _QN_GRID) for i in range(_QN_GRID + 1)]),
        ).alias("grid")
    )
    # source is a skewed dictionary key — the within-source rank and
    # count ride edf.grouped_ordered_rank (per-(source, range-bucket)
    # window partitions + driver-cumulated offsets), never a bare
    # per-source window over the fact table (r12 skew-partition-window
    # lint). (doc_id is unique, so RANK == ROW_NUMBER here.)
    from ..operators.edf import grouped_ordered_rank

    rk = grouped_ordered_rank(
        docs, ["source"], ["n_tokens", "doc_id"], "__i", total_col="__n"
    )
    p = (
        (F.col("__i") - 1).cast("double")
        / F.greatest(F.col("__n") - 1, F.lit(1))
        * _QN_GRID
    )
    ranked = rk.select("doc_id", "source", "n_tokens", p.alias("p"))
    lo = F.least(F.floor("p").cast("int"), F.lit(_QN_GRID))
    hi = F.least(lo + 1, F.lit(_QN_GRID))
    glo = F.element_at(F.col("grid"), lo + 1)
    ghi = F.element_at(F.col("grid"), hi + 1)
    norm = glo + (F.col("p") - F.floor("p")) * (ghi - glo)
    return ranked.join(F.broadcast(grid)).select(
        "doc_id",
        "source",
        "n_tokens",
        (F.floor(F.col("p") / _QN_GRID * 1000000.0 + 0.5) / 1000000.0).alias(
            "src_rank"
        ),
        (F.floor(norm * 10000.0 + 0.5) / 10000.0).alias("norm_tokens"),
    )


# ---------------------------------------------------------------------------
# Zipf slope per source — corpus-statistics fit: OLS slope of ln(freq)
# on ln(rank) over each source's top-100 terms (natural text ≈ −1;
# boilerplate-heavy or synthetic sources drift off it, which makes this
# a data-quality signal next to gopher_quality_flags). Determinism: the
# rank order ties break on token; ln() is evaluated per VALUE and
# quantized to integer micro-units BEFORE any sum, so the OLS moments
# are exact integers (the 1e-6 factors cancel in the slope ratio) and
# no cross-engine float-summation-order risk exists. The per-source
# window partitions on source — never a global sort.
# ---------------------------------------------------------------------------
@query(
    "zipf_slope_by_source",
    """
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
        FROM documents
    ),
    tf AS (
        SELECT source, token, COUNT(*) AS freq FROM tok GROUP BY source, token
    ),
    ranked AS (
        SELECT source, freq,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY freq DESC, token) AS rank
        FROM tf
        QUALIFY rank <= 100
    ),
    q AS (
        SELECT source,
               CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS x,
               CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS y
        FROM ranked
    )
    SELECT source, COUNT(*) AS n_terms,
           round(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
                 / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE),
                 6) AS zipf_slope
    FROM q GROUP BY source
    """,
)
def zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(T.tokens(F.trim(F.lower(F.col("text"))))).alias("token"),
    )
    tf = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("freq")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("token")
    )
    ranked = (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
    )
    q = ranked.select(
        "source",
        F.floor(F.log(F.col("rank").cast("double")) * 1000000.0 + 0.5)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("freq").cast("double")) * 1000000.0 + 0.5)
        .cast("long")
        .alias("y"),
    )
    n = F.count(F.lit(1))
    num = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")).cast(
        "double"
    )
    den = (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")).cast(
        "double"
    )
    return q.groupBy("source").agg(
        n.alias("n_terms"), F.round(num / den, 6).alias("zipf_slope")
    )


# ---------------------------------------------------------------------------
# Mixed-language document detection — a document whose 40-token chunks
# disagree on predicted language is usually a template page, a
# boilerplate sandwich, or a bad concatenation; monolingual training
# corpora want these flagged, and a whole-document lang-ID (lang_id
# query) structurally can't see them. Chunks are array SLICES of one
# tokenize (no re-scan per chunk); per-chunk prediction replays the
# same marker-argmax CASE as lang_id, so the two queries share
# semantics. Counts and distinct-counts are exact integers. The explode
# fans out ~n_tokens/40 rows per doc ahead of one doc_id aggregation —
# the shuffle carries chunk predictions (strings), never chunk text.
# ---------------------------------------------------------------------------
_LANG_CHUNK_W = 40


def _chunk_hits_sql(lang: str) -> str:
    markers = "', '".join(T.LANG_MARKERS[lang])
    return f"len(list_filter(c, x -> list_contains(['{markers}'], x)))"


_CHITS = {lang: _chunk_hits_sql(lang) for lang in _LANGS}
_CBEST = "greatest(" + ", ".join(_CHITS.values()) + ")"
_CCASE = "CASE WHEN " + _CBEST + " = 0 THEN 'und' " + " ".join(
    f"WHEN {_CHITS[lang]} = {_CBEST} THEN '{lang}'" for lang in _LANGS
) + " END"


@query(
    "mixed_lang_docs",
    f"""
    WITH w AS (
        SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
        FROM documents
    ),
    ch AS (
        SELECT doc_id,
               w[(i * {_LANG_CHUNK_W} + 1):(i * {_LANG_CHUNK_W} + {_LANG_CHUNK_W})] AS c
        FROM w, unnest(generate_series(
                 0, CAST(ceil(len(w) / {_LANG_CHUNK_W}.0) AS INT) - 1)) AS t(i)
    ),
    pred AS (SELECT doc_id, {_CCASE} AS chunk_lang FROM ch)
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT chunk_lang) AS n_langs,
           COUNT(DISTINCT chunk_lang) > 1 AS mixed
    FROM pred GROUP BY doc_id
    """,
)
def mixed_lang_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", T.tokens(F.lower(F.col("text"))).alias("w")
    )
    chunks = w.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("w") / F.lit(float(_LANG_CHUNK_W))).cast("int") - 1,
            )
        ).alias("i"),
        "w",
    ).select(
        "doc_id",
        F.slice("w", F.col("i") * _LANG_CHUNK_W + 1, _LANG_CHUNK_W).alias("c"),
    )
    def _hits(lang: str) -> F.Column:
        arr = F.array(*[F.lit(m) for m in T.LANG_MARKERS[lang]])
        return F.size(
            F.filter(F.col("c"), lambda x: F.array_contains(arr, x))
        )

    hit_cols = {lang: _hits(lang) for lang in _LANGS}
    best = F.greatest(*hit_cols.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in _LANGS:
        pred = pred.when(hit_cols[lang] == best, F.lit(lang))
    return (
        chunks.select("doc_id", pred.alias("chunk_lang"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_lang").alias("n_langs"),
            (F.countDistinct("chunk_lang") > 1).alias("mixed"),
        )
    )


# ---------------------------------------------------------------------------
# PMI collocations — pointwise mutual information over adjacent token
# pairs: pmi = ln c_xy + 2·ln N_uni − ln N_bi − ln c_x − ln c_y, every
# term the ln of an exact integer count and summed in a FIXED order, so
# both engines walk identical float64 arithmetic. One explode for
# unigrams, one for bigrams (built as a codegen transform over token
# positions — no self-join); the unigram dictionary is broadcast back
# onto the pair counts. Top-30 by (rounded pmi, pair) with a support
# floor so rare co-occurrences don't dominate.
# ---------------------------------------------------------------------------
_PMI_MIN_COUNT = 10


@query(
    "pmi_bigrams",
    f"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS tk
        FROM documents WHERE len(trim(text)) > 0
    ),
    uni AS (
        SELECT unnest(tk) AS w FROM toks
    ),
    uni_counts AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
    n_uni AS (SELECT SUM(c) AS n FROM uni_counts),
    bi AS (
        SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM toks
    ),
    bi_pairs AS (
        SELECT tk[i] AS w1, tk[i + 1] AS w2, COUNT(*) AS c_xy
        FROM bi GROUP BY 1, 2
    ),
    n_bi AS (SELECT SUM(c_xy) AS n FROM bi_pairs),
    scored AS (
        SELECT w1, w2, c_xy,
               ln(CAST(c_xy AS DOUBLE)) + ln(CAST(n_uni.n AS DOUBLE))
               + ln(CAST(n_uni.n AS DOUBLE)) - ln(CAST(n_bi.n AS DOUBLE))
               - ln(CAST(u1.c AS DOUBLE)) - ln(CAST(u2.c AS DOUBLE)) AS pmi
        FROM bi_pairs
        JOIN uni_counts u1 ON u1.w = w1
        JOIN uni_counts u2 ON u2.w = w2
        CROSS JOIN n_uni CROSS JOIN n_bi
        WHERE c_xy >= {_PMI_MIN_COUNT}
    )
    SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
           ROUND(pmi, 6) AS pmi,
           CAST(ROW_NUMBER() OVER (ORDER BY ROUND(pmi, 6) DESC, w1, w2)
                AS INT) AS rank
    FROM scored
    QUALIFY rank <= 30
    """,
)
def pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    tk = T.tokens(F.trim(F.lower(F.col("text"))))
    toks = docs.select(tk.alias("tk"))
    uni_counts = toks.select(F.explode("tk").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    n_uni = uni_counts.agg(F.sum("c").alias("n_u"))
    pairs = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("tk"), i).alias("w1"),
                        F.element_at(F.col("tk"), i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MIN_COUNT)
    )
    n_bi_df = (
        toks.select((F.size("tk") - 1).alias("nb"))
        .filter(F.col("nb") > 0)
        .agg(F.sum("nb").alias("n_b"))
    )
    u1 = uni_counts.select(
        F.col("w").alias("w1"), F.col("c").alias("c_x")
    )
    u2 = uni_counts.select(
        F.col("w").alias("w2"), F.col("c").alias("c_y")
    )
    ln = F.log
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    scored = (
        pairs.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi_df))
        .select(
            "w1",
            "w2",
            "c_xy",
            (
                ln(d("c_xy"))
                + ln(d("n_u"))
                + ln(d("n_u"))
                - ln(d("n_b"))
                - ln(d("c_x"))
                - ln(d("c_y"))
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.round("pmi", 6).desc(), "w1", "w2")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 30)
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.round("pmi", 6).alias("pmi"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Curation funnel audit — the observability table for the curate_corpus
# pass: per-stage in/out/dropped counts and drop rates for the language
# gate, the quality gate, and the fingerprint dedup, computed in ONE
# corpus pass (per-doc gate flags + one distinct-fp count; the stages
# are conjunctive, so four counters reconstruct the whole funnel — the
# corpus is never re-scanned per stage). The oracle re-derives the same
# four counters declaratively from the same gate definitions.
# ---------------------------------------------------------------------------
@query(
    "curation_funnel_audit",
    f"""
    WITH flags AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
               ({_CASE}) = 'en' AS f_lang,
               {_QUALITY_SQL} >= 0.8 AS f_quality
        FROM documents
    ),
    c AS (
        SELECT COUNT(*) AS n_total,
               SUM(CASE WHEN f_lang THEN 1 ELSE 0 END) AS n_lang,
               SUM(CASE WHEN f_lang AND f_quality THEN 1 ELSE 0 END)
                   AS n_lq,
               COUNT(DISTINCT CASE WHEN f_lang AND f_quality
                                   THEN fp END) AS n_dedup
        FROM flags
    )
    SELECT stage, stage_order,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_out AS BIGINT) AS docs_out,
           CAST(docs_in - docs_out AS BIGINT) AS docs_dropped,
           FLOOR((docs_in - docs_out) * 10000.0
                 / CASE WHEN docs_in = 0 THEN 1 ELSE docs_in END + 0.5)
               / 100.0 AS drop_pct
    FROM (
        SELECT 'lang_gate' AS stage, 1 AS stage_order,
               n_total AS docs_in, n_lang AS docs_out FROM c
        UNION ALL
        SELECT 'quality_gate', 2, n_lang, n_lq FROM c
        UNION ALL
        SELECT 'fingerprint_dedup', 3, n_lq, n_dedup FROM c
    ) ORDER BY stage_order
    """,
)
def curation_funnel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    txt = F.col("text")
    flags = docs.select(
        T.fingerprint(txt).alias("fp"),
        (T.lang_id(txt) == "en").alias("f_lang"),
        (F.round(T.quality_score(txt), 5) >= 0.8).alias("f_quality"),
    )
    c = flags.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("f_lang"), 1).otherwise(0)).alias("n_lang"),
        F.sum(
            F.when(F.col("f_lang") & F.col("f_quality"), 1).otherwise(0)
        ).alias("n_lq"),
        F.countDistinct(
            F.when(F.col("f_lang") & F.col("f_quality"), F.col("fp"))
        ).alias("n_dedup"),
    )
    funnel = c.selectExpr(
        """stack(3,
            'lang_gate', 1, n_total, n_lang,
            'quality_gate', 2, n_lang, n_lq,
            'fingerprint_dedup', 3, n_lq, n_dedup
        ) AS (stage, stage_order, docs_in, docs_out)"""
    )
    return funnel.select(
        "stage",
        "stage_order",
        F.col("docs_in").cast("long").alias("docs_in"),
        F.col("docs_out").cast("long").alias("docs_out"),
        (F.col("docs_in") - F.col("docs_out"))
        .cast("long")
        .alias("docs_dropped"),
        (
            F.floor(
                (F.col("docs_in") - F.col("docs_out"))
                * 10000.0
                / F.when(F.col("docs_in") == 0, 1).otherwise(
                    F.col("docs_in")
                )
                + 0.5
            )
            / 100.0
        ).alias("drop_pct"),
    ).orderBy("stage_order")
