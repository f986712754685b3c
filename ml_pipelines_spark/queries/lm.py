"""Language-model perplexity scoring query.

The oracle retrains the same bigram model and rescoring entirely in
SQL: same tokenization, same add-alpha smoothing, same vocabulary.
avg_nll is rounded on both sides (sum order differs across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lm import perplexity
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
    # One tokenize pass per invocation (r13, duplicate-scan rule): the
    # bigram-count MODEL is materialized once per (session, sf) behind
    # the swap_cache warm boundary — the written-model-table posture
    # kneser_ney_bigrams already uses — and the unigram counts and
    # vocabulary are EXACT integer aggregates OF the model
    # (c_uni(w) = Σ_w2 c_bi(w, w2); vocab = |w1 ∪ w2 over bi|), so no
    # value changes. Previously ngram_counts tokenized the corpus for
    # uni+bi, AGAIN for the vocab count() action, and perplexity()
    # tokenized a third time for the per-document stream; only the
    # last of those remains. Scoring float math is untouched
    # (instance-grain AVG, same join shape).
    from ..operators.lm import _doc_bigrams
    from .registry import swap_cache

    docs = t(spark, sf_dir, "documents")
    bi = swap_cache(
        "lm.ppl.bigram_model",
        sf_dir,
        _doc_bigrams(docs, "doc_id", "text")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bi")),
    )
    uni = bi.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c_bi").cast("long").alias("c_uni")
    )
    vocab = (
        bi.select(F.col("w1").alias("w"))
        .unionByName(bi.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
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


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer training under the oracle
# gate — the hard-EM twin of bpe_train_merges. The objective is
# deliberately integer-only (fewest pieces, then highest total piece
# count, then lexicographically-smallest space-joined path; see
# operators/unigram.py for why that tie-break composes inside the DP),
# so DuckDB can replay the ENTIRE training — substring seeding, two
# Viterbi-segmentation EM rounds (as recursive-CTE path enumerations),
# usage re-estimation, and pruning — and the final piece table must
# match bit-for-bit. The Spark side is the scale-shaped plan: ONE
# corpus pass for word counts, then everything on the distinct-word
# table with the (seed_k-bounded) vocabulary broadcast.
# ---------------------------------------------------------------------------
_UNI_LEN, _UNI_SEED, _UNI_KEEP, _UNI_TOP = 6, 120, 60, 30


def _unigram_oracle_sql() -> str:
    max_len, seed_k, keep, top = _UNI_LEN, _UNI_SEED, _UNI_KEEP, _UNI_TOP
    round_tmpl = """
paths{r} AS (
  SELECT word, wcount, 0 AS pos, 0 AS n,
         CAST(0 AS BIGINT) AS sumw, '' AS path
  FROM words
  UNION ALL
  SELECT p.word, p.wcount, p.pos + length(s.piece), p.n + 1,
         p.sumw + s.cnt,
         CASE WHEN p.path = '' THEN s.piece
              ELSE p.path || ' ' || s.piece END
  FROM paths{r} p
  JOIN {vocab} s
    ON substr(p.word, p.pos + 1, length(s.piece)) = s.piece
  WHERE p.pos < length(p.word)
),
best{r} AS (
  SELECT word, wcount, path FROM (
    SELECT word, wcount, path,
           row_number() OVER (
               PARTITION BY word ORDER BY n, sumw DESC, path
           ) AS rk
    FROM paths{r} WHERE pos = length(word)
  ) WHERE rk = 1
),
counts{r} AS (
  SELECT piece, CAST(SUM(wcount) AS BIGINT) AS cnt FROM (
    SELECT wcount, unnest(string_split(path, ' ')) AS piece
    FROM best{r}
  ) GROUP BY piece
),
vocab{rnext} AS (
  SELECT piece, cnt FROM (
    SELECT piece, cnt,
           row_number() OVER (ORDER BY cnt DESC, piece) AS rk
    FROM counts{r}
  ) WHERE rk <= {keep}
  UNION ALL
  SELECT s.piece, CAST(COALESCE(c.cnt, 0) AS BIGINT)
  FROM seed s LEFT JOIN counts{r} c USING (piece)
  WHERE length(s.piece) = 1 AND s.piece NOT IN (
    SELECT piece FROM (
      SELECT piece, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
      FROM counts{r}
    ) WHERE rk <= {keep}
  )
)"""
    r1 = round_tmpl.format(r=1, rnext=2, vocab="seed", keep=keep)
    r2 = round_tmpl.format(r=2, rnext=3, vocab="vocab2", keep=keep)
    return f"""
    WITH RECURSIVE
    -- GUARD: the recursive segmentation CTEs below enumerate EVERY
    -- piece path per word — exponential in word length (~2^(L-1) when
    -- single chars cover). The oracle is therefore only usable while
    -- words stay short (corpus max today: 8 chars). A corpus change
    -- that introduces a word past the bound must fail LOUDLY here, not
    -- hang the correctness harness.
    words AS (
      SELECT CASE WHEN length(word) > 16 THEN error(
                 'unigram oracle: word longer than 16 chars would '
                 || 'explode the recursive segmentation CTE: ' || word)
             ELSE word END AS word,
             COUNT(*) AS wcount FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE length(word) > 0 GROUP BY word
    ),
    subs AS (
      SELECT substr(word, i, l) AS piece,
             CAST(SUM(wcount) AS BIGINT) AS cnt
      FROM (
        SELECT word, wcount,
               unnest(generate_series(1, length(word))) AS i
        FROM words
      ), LATERAL (
        SELECT unnest(generate_series(
            1, least({max_len}, length(word) - i + 1))) AS l
      )
      GROUP BY 1
    ),
    seed AS (
      SELECT piece, cnt FROM (
        SELECT piece, cnt,
               row_number() OVER (ORDER BY cnt DESC, piece) AS rk
        FROM subs
      ) WHERE rk <= {seed_k} OR length(piece) = 1
    ),
    {r1},
    {r2}
    SELECT piece, cnt, CAST(rank AS BIGINT) AS rank FROM (
      SELECT piece, cnt,
             row_number() OVER (ORDER BY cnt DESC, piece) AS rank
      FROM vocab3
    ) WHERE rank <= {top}
    """


# Deliberately NOT routed through the _UNI_VOCABS session cache the
# apply query uses: this query's bench timing IS the training cost, and
# a cached vocabulary would turn the measurement into a no-op.
@query("unigram_tokenizer_train", _unigram_oracle_sql())
def unigram_tokenizer_train(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.unigram import unigram_train

    docs = t(spark, sf_dir, "documents")
    vocab = unigram_train(
        docs,
        "text",
        max_len=_UNI_LEN,
        seed_k=_UNI_SEED,
        n_pieces=_UNI_KEEP,
        rounds=2,
    )
    return (
        vocab.withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("piece")))
            .cast("long"),
        )
        .filter(F.col("rank") <= _UNI_TOP)
        .select("piece", "cnt", "rank")
    )


# ---------------------------------------------------------------------------
# Tokenizer APPLY path: token counts + fertility per language under the
# unigram vocabulary trained above — the canonical budget question a
# training pipeline asks ("how many tokens is this corpus under MY
# tokenizer"). Spark side: train (weights cached per session), Viterbi-
# segment the DISTINCT words once, broadcast-join the per-word token
# count onto the exploded corpus. The oracle re-runs the full training
# CTE and a third recursive segmentation pass under the final
# vocabulary, then joins declaratively — the whole train->apply chain
# is value-checked end to end.
# ---------------------------------------------------------------------------
_UNI_VOCABS: dict[tuple[str, str], dict] = {}


def _unigram_vocab(spark: SparkSession, sf_dir: str) -> dict:
    from ..operators.unigram import unigram_train

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _UNI_VOCABS:
        vocab = unigram_train(
            t(spark, sf_dir, "documents"),
            "text",
            max_len=_UNI_LEN,
            seed_k=_UNI_SEED,
            n_pieces=_UNI_KEEP,
            rounds=2,
        )
        _UNI_VOCABS[key] = {
            r["piece"]: int(r["cnt"]) for r in vocab.collect()
        }
    return _UNI_VOCABS[key]


def _unigram_apply_oracle_sql() -> str:
    train = _unigram_oracle_sql()
    head, tail = train.split("SELECT piece, cnt, CAST(rank AS BIGINT)", 1)
    seg3 = """
    paths3 AS (
      SELECT word, 0 AS pos, 0 AS n,
             CAST(0 AS BIGINT) AS sumw, '' AS path
      FROM words
      UNION ALL
      SELECT p.word, p.pos + length(s.piece), p.n + 1,
             p.sumw + s.cnt,
             CASE WHEN p.path = '' THEN s.piece
                  ELSE p.path || ' ' || s.piece END
      FROM paths3 p
      JOIN vocab3 s
        ON substr(p.word, p.pos + 1, length(s.piece)) = s.piece
      WHERE p.pos < length(p.word)
    ),
    word_tokens AS (
      SELECT word, n AS n_tokens FROM (
        SELECT word, n,
               row_number() OVER (
                   PARTITION BY word ORDER BY n, sumw DESC, path
               ) AS rk
        FROM paths3 WHERE pos = length(word)
      ) WHERE rk = 1
    ),
    corpus AS (
      SELECT doc_id, lang, word FROM (
        SELECT doc_id, lang,
               unnest(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE length(word) > 0
    )
    SELECT lang,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_words,
           CAST(SUM(t.n_tokens) AS BIGINT) AS n_tokens,
           FLOOR(CAST(SUM(t.n_tokens) AS DOUBLE) / COUNT(*) * 10000
                 + 0.5) / 10000.0 AS tokens_per_word
    FROM corpus c JOIN word_tokens t USING (word)
    GROUP BY lang
    """
    # head ends right after vocab3's closing paren — splice the apply
    # CTEs in with the comma the training SQL's final SELECT replaced
    return head + ",\n    " + seg3.strip() + "\n"


@query("unigram_token_counts", _unigram_apply_oracle_sql())
def unigram_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import _segment

    weights = _unigram_vocab(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.col("text"), " ")).alias("word"),
        )
        .filter(F.length("word") > 0)
    )
    # segment the DISTINCT words distributed (the word table is the
    # language's vocabulary — never collected), weights broadcast
    bweights = spark.sparkContext.broadcast(weights)

    def seg(batches):
        import pandas as pd

        w = bweights.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_tokens": [
                        len(_segment(x, w)) for x in pdf["word"]
                    ],
                }
            )

    tok = (
        words.select("word")
        .distinct()
        .mapInPandas(seg, "word string, n_tokens long")
    )
    return (
        words.join(tok, "word")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            (
                F.floor(
                    F.sum("n_tokens").cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + 0.5
                )
                / 10000.0
            ).alias("tokens_per_word"),
        )
    )
