"""Unigram-LM subword tokenizer training (SentencePiece-style hard EM).

The second of the two standard subword tokenizers (``operators/lm.py``
trains the BPE one): start from a large seed vocabulary of candidate
pieces, alternate segment-the-corpus / re-estimate-piece-weights, and
prune to the target size (Kudo 2018, "Subword Regularization", §3.2 —
this is the hard-EM/Viterbi variant of that trainer). At 100 TB the
decomposition that matters is: piece statistics are ONE distributed
pass over the corpus, and every later step runs on the DISTINCT-WORD
table (bounded by the language's vocabulary, millions of rows at web
scale — not the corpus) with the piece vocabulary broadcast.

Objective (deliberately integer-only so the training replays
bit-identically on any engine, the property every oracle here relies
on): a segmentation of a word is scored by

    1. fewest pieces (the MDL term a uniform piece prior reduces to),
    2. then highest total piece weight (current round's counts),
    3. then lexicographically-smallest piece list.

Tie-break 3 is well-defined inside the DP: two candidate paths for the
same (word, position, piece-count) state are equal-length strings
(same covered chars + same number of separators), so lexicographic
order is preserved under the common suffix appended later.

Rounds: seed counts = every substring occurrence up to ``max_len``
weighted by word frequency, kept to the top ``seed_k`` (all single
characters always survive — coverage guarantee); each EM round
re-segments the distinct words under the current weights and keeps the
``n_pieces`` most-used pieces (plus singles). Everything is exact
integer arithmetic on counts.

Reference parity note: permaling/ml-pipelines has no tokenizer at all;
this exists for the training-data-pipeline surface (token budgeting,
sequence packing) whose pinned-vocab seams are in
``functions/tokenizer.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount) — the ONE corpus-wide pass; everything after
    runs on this bounded distinct-word table."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def seed_pieces(
    words: DataFrame, max_len: int = 6, seed_k: int = 120
) -> DataFrame:
    """Candidate pieces: every substring occurrence up to ``max_len``,
    weighted by word frequency; top ``seed_k`` by (count, piece) plus
    ALL single characters. Pure expression plan (no Python)."""
    subs = words.select(
        "wcount",
        F.explode(
            F.expr(
                f"""
                flatten(transform(
                    sequence(1, length(word)),
                    i -> transform(
                        sequence(1, least({max_len}, length(word) - i + 1)),
                        l -> substring(word, i, l)
                    )
                ))
                """
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("wcount").alias("cnt"))
    from pyspark.sql import Window

    ranked = counts.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("piece"))
        ),
    )
    return ranked.filter(
        (F.col("rk") <= seed_k) | (F.length("piece") == 1)
    ).select("piece", "cnt")


def _segment(word: str, weights: dict) -> list[str]:
    """Viterbi DP under the integer objective. States are positions;
    best[j] = (n_pieces, -sum_weight, path_string) minimized, where
    path_string joins pieces with a SPACE — a separator that sorts
    below every word character, so the string order here is identical
    to the piece-list order and to what a SQL replay comparing
    separator-joined paths computes. Candidate paths for equal
    (pos, n_pieces) are equal-length strings, so the comparison
    composes under the common suffix appended later."""
    n = len(word)
    INF = (1 << 60, 0, "")
    best: list[tuple] = [INF] * (n + 1)
    best[0] = (0, 0, "")
    max_piece = max((len(p) for p in weights), default=1)
    for j in range(1, n + 1):
        cands = []
        for i in range(max(0, j - max_piece), j):
            if best[i][0] >= (1 << 60):
                continue
            piece = word[i:j]
            w = weights.get(piece)
            if w is None:
                continue
            bn, bw, bp = best[i]
            cands.append(
                (bn + 1, bw - w, piece if not bp else bp + " " + piece)
            )
        if cands:
            best[j] = min(cands)
    if best[n][0] >= (1 << 60):  # uncovered char: fall back to chars
        return list(word)
    return best[n][2].split(" ")


def em_round(
    words: DataFrame, vocab: DataFrame, n_keep: int
) -> DataFrame:
    """One hard-EM round: Viterbi-segment every distinct word under
    the current vocabulary weights, sum piece usage weighted by word
    frequency, keep the ``n_keep`` most-used pieces plus all single
    characters (absent singles keep count 0). The vocabulary is
    collected and broadcast — bounded by seed_k, stated in the module
    docstring; the corpus never moves."""
    spark = words.sparkSession
    weights = {r["piece"]: int(r["cnt"]) for r in vocab.collect()}
    sc = spark.sparkContext
    bweights = sc.broadcast(weights)

    def seg(batches):
        import pandas as pd

        w = bweights.value
        for pdf in batches:
            out_w, out_p = [], []
            for word, wcount in zip(pdf["word"], pdf["wcount"]):
                for piece in _segment(word, w):
                    out_w.append(int(wcount))
                    out_p.append(piece)
            yield pd.DataFrame({"piece": out_p, "wcount": out_w})

    used = (
        words.mapInPandas(seg, "piece string, wcount long")
        .groupBy("piece")
        .agg(F.sum("wcount").alias("cnt"))
    )
    from pyspark.sql import Window

    ranked = used.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("piece"))
        ),
    )
    kept = ranked.filter(F.col("rk") <= n_keep).select("piece", "cnt")
    singles = (
        vocab.filter(F.length("piece") == 1)
        .select("piece")
        .join(used, "piece", "left")
        .select("piece", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .join(kept.select("piece"), "piece", "left_anti")
    )
    return kept.unionByName(singles)


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 6,
    seed_k: int = 120,
    n_pieces: int = 60,
    rounds: int = 2,
) -> DataFrame:
    """Full trainer: seed -> ``rounds`` hard-EM rounds -> final piece
    table (piece, cnt). Deterministic and integer-exact end to end."""
    words = word_counts(docs, text_col).localCheckpoint()
    vocab = seed_pieces(words, max_len, seed_k)
    for _ in range(rounds):
        vocab = em_round(words, vocab, n_pieces)
    return vocab
