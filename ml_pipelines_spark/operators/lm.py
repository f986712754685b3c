"""N-gram language-model scoring — the CCNet-style quality filter.

Production corpus curation scores every document against a reference
language model and drops the high-perplexity tail (CCNet / RedPajama
use a KenLM 5-gram; the construction is identical at any order). This
module implements the distributed version with a bigram model trained
on a reference corpus held in a DataFrame:

1. ``ngram_counts`` — unigram + bigram counts: one token explode, two
   map-side-combined groupBys.
2. ``perplexity`` — per-document mean negative log-likelihood under
   add-alpha smoothing, and its exp (the perplexity):
   P(w2 | w1) = (c(w1,w2) + a) / (c(w1) + a·V).

Scale shape: scoring is one explode of document bigrams plus two left
joins (bigram table on (w1, w2), unigram table on w1), then a
groupBy(doc). Vocabulary pruning (``min_count``) bounds the model
tables so they broadcast and the scored corpus never shuffles its own
rows; with an unpruned web-scale model both joins shuffle on their key
— one exchange each. Everything is expression-level (no UDFs), and the
whole construction has an exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair, lowercased."""
    toks = df.select(
        F.col(id_col).alias("id"),
        tokens(F.trim(F.lower(F.col(text_col)))).alias("t"),
    )
    return toks.select(
        "id",
        F.posexplode(F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0)))).alias(
            "i", "w1"
        ),
        F.col("t"),
    ).select("id", "w1", F.element_at("t", F.col("i") + 2).alias("w2"))


def ngram_counts(
    corpus: DataFrame, id_col: str, text_col: str, min_count: int = 1
) -> tuple[DataFrame, DataFrame, int]:
    """Train the model: (unigram_counts, bigram_counts, vocab_size).

    ``min_count`` prunes rare bigrams from the model (they fall back to
    the smoothing mass) — the knob that keeps the model table small
    enough to broadcast. Vocabulary size counts distinct tokens BEFORE
    pruning, as smoothing semantics require.
    """
    bg = _doc_bigrams(corpus, id_col, text_col)
    uni = (
        bg.groupBy(F.col("w1").alias("w"))
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    if min_count > 1:
        bi = bi.filter(F.col("c_bi") >= min_count)
    vocab = (
        bg.select(F.col("w1").alias("w"))
        .unionByName(bg.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
    return uni, bi, vocab


def perplexity(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    alpha: float = 0.4,
) -> DataFrame:
    """Score documents: (id, n_bigrams, avg_nll, ppl).

    avg_nll is the mean of -ln P(w2|w1) over the document's bigrams;
    ppl = exp(avg_nll). Documents with fewer than 2 tokens produce no
    bigrams and are absent from the output (nothing to score).

    Two left joins — document bigrams against the bigram table on
    (w1, w2) and the unigram table on w1; unseen counts coalesce to 0,
    so unseen bigrams and unseen contexts degrade smoothly to the
    smoothing mass.
    """
    dbg = _doc_bigrams(docs, id_col, text_col)
    scored = (
        dbg.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams.withColumnRenamed("w", "w1"), "w1", "left")
        .select(
            "id",
            (
                -F.log(
                    (F.coalesce("c_bi", F.lit(0)) + alpha)
                    / (F.coalesce("c_uni", F.lit(0)) + alpha * vocab_size)
                )
            ).alias("nll"),
        )
    )
    return (
        scored.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("nll").alias("avg_nll"),
        )
        .withColumn("ppl", F.exp("avg_nll"))
    )


def kneser_ney_bigrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
    materialize=None,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram model trained in three aggregate
    passes — the smoothing actually used for n-gram LM quality/filter
    scoring (add-alpha, ``perplexity``'s model, systematically
    overweights unseen continuations of frequent words).

      P_KN(w2|w1) = max(c(w1,w2) - D, 0) / c(w1)
                    + (D * N1+(w1,*) / c(w1)) * (N1+(*,w2) / T)

    where N1+(w1,*) = distinct continuations of w1, N1+(*,w2) =
    distinct left-contexts of w2 (the continuation probability's
    numerator), and T = total distinct bigram TYPES. Every statistic is
    a grouped count over the bigram relation: one explode of the
    corpus, three map-side-combinable groupBys, and a 1-row type-count
    broadcast — output is model-sized (<= vocab^2 rows), never
    corpus-sized, so the whole computation is corpus-scan-bound at
    100 TB. D = 0.75 is exactly representable in binary, so the
    probability is one deterministic IEEE expression per row.

    Output: (w1, w2, c_bi, p_kn), p_kn rounded to 6 digits.
    """
    bg = _doc_bigrams(df, id_col, text_col)
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    # bi feeds FOUR consumers (left contexts, continuations, the type
    # total, and the output join); without a warm boundary each one
    # replays the corpus explode. The hook ((name, df) -> df, e.g. the
    # query layer's swap_cache) pins the model-sized count table so the
    # corpus is scanned once.
    if materialize is not None:
        bi = materialize("bigram_counts", bi)
    left = bi.groupBy("w1").agg(
        F.sum("c_bi").alias("c_w1"),
        F.count(F.lit(1)).alias("n_follow"),
    )
    cont = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("n_prec"))
    types_total = bi.agg(F.count(F.lit(1)).alias("t_types"))
    d = F.lit(discount)
    p_kn = (
        F.greatest(F.col("c_bi") - d, F.lit(0.0)) / F.col("c_w1")
        + (d * F.col("n_follow") / F.col("c_w1"))
        * (F.col("n_prec") / F.col("t_types"))
    )
    return (
        bi.join(F.broadcast(left), "w1")
        .join(F.broadcast(cont), "w2")
        .join(F.broadcast(types_total))
        .select("w1", "w2", "c_bi", F.round(p_kn, 6).alias("p_kn"))
    )


# Truncate bpe_train_merges' per-round lineage at this depth: deep
# enough to amortize the materialization, shallow enough that plan
# compile stays O(k) overall.
_BPE_CKPT_EVERY = 8


def bpe_train_merges(
    words: DataFrame,
    k: int = 6,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[int, str, str, int]]:
    """Learn the first ``k`` BPE merge operations from a word-frequency
    table — the tokenizer-TRAINING half of the subword stack (the
    pinned-vocab encoder in functions/tokenizer consumes a merge table
    like the one produced here).

    Standard BPE (Sennrich et al. 2016): repeat k times — count
    adjacent symbol pairs across the vocabulary weighted by word
    frequency, merge the most frequent pair (ties to the
    lexicographically smallest), re-segment. Everything after the one
    corpus pass that builds ``words`` runs on the VOCABULARY, exactly
    like production BPE trainers — the corpus is never rescanned, so
    at 100 TB the k rounds cost k vocabulary-sized shuffles.

    Segmentations are carried as paren-wrapped symbol strings
    ("(c)(h)(a)(t)"): applying a merge is then ONE ``replace`` of the
    literal "(l)(r)" with "(lr)" — and because string replace scans
    left-to-right non-overlapping, this IS greedy BPE application, with
    identical semantics in Spark and DuckDB (the oracle replays all k
    rounds in chained CTEs on the same representation; parens cannot
    collide with symbol text since tokens never contain parens — rows
    that do are filtered). Pair counts are exact integer sums; the
    per-round argmax orders by (count desc, left, right), so the whole
    merge table is deterministic and cross-engine value-checkable.

    Returns [(step, left, right, pair_count), ...] — driver-side merge
    table literals, like k-means centers (k rows, never data-sized).
    """
    seg = words.filter(
        ~F.col(word_col).contains("(") & ~F.col(word_col).contains(")")
    ).select(
        F.expr(
            f"array_join(transform(regexp_extract_all({word_col}, '.', 0),"
            " c -> concat('(', c, ')')), '')"
        ).alias("s"),
        F.col(freq_col).alias("freq"),
    )
    # Materialize the VOCABULARY once before the loop (r12): without
    # this boundary every round's argmax job replays the full lineage
    # under ``words`` — for a corpus-derived word table that is k
    # corpus scans, not the advertised one (interleaved A/B, min of 3
    # per session, two sessions per tree: 6.9 -> 1.9 s at sf0.1 for
    # k=6). Eager localCheckpoint blocks are ContextCleaner-
    # reclaimed with the plan; at 100 TB this boundary is the written
    # word-frequency table every production BPE trainer starts from.
    seg = seg.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, k + 1):
        syms = F.expr(r"regexp_extract_all(s, '\\(([^)]*)\\)', 1)")
        pairs = (
            seg.select(syms.alias("y"), "freq")
            # single-symbol words contribute no pairs (and Spark's
            # sequence(1, 0) DESCENDS rather than being empty)
            .filter(F.size("y") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(y) - 1),"
                        " i -> struct(y[i-1] AS l, y[i] AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").cast("long").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1).collect()
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((step, l, r, c))
        seg = seg.withColumn(
            "s",
            F.replace(
                F.col("s"), F.lit(f"({l})({r})"), F.lit(f"({l}{r})")
            ),
        )
        # Lineage hygiene: each round chains another replace stage onto
        # ``seg``, and round t's argmax job re-compiles the whole
        # t-stage chain — O(k^2) plan compile at production merge
        # counts (10k+). Truncate like the components/incremental
        # loops: an eager localCheckpoint of the VOCABULARY-sized
        # frame every few rounds keeps compile depth bounded without
        # touching the corpus.
        if step % _BPE_CKPT_EVERY == 0:
            seg = seg.localCheckpoint(eager=True)
    return merges
