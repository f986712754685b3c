"""Bigram LM semantics on a hand-computable corpus."""

from __future__ import annotations

import math

import pytest

from ml_pipelines_spark.operators.lm import ngram_counts, perplexity


def test_ngram_counts_and_perplexity(spark):
    corpus = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    uni, bi, vocab = ngram_counts(corpus, "doc_id", "text")
    assert vocab == 3  # a, b, c
    u = {r["w"]: r["c_uni"] for r in uni.collect()}
    # bigram contexts: doc1 = (a,b),(b,a),(a,b); doc2 = (a,b),(b,c)
    assert u == {"a": 3, "b": 2}
    b = {(r["w1"], r["w2"]): r["c_bi"] for r in bi.collect()}
    assert b == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}

    scored = {
        r["doc_id"]: r
        for r in perplexity(
            corpus, "doc_id", "text", uni, bi, vocab, alpha=0.5
        ).collect()
    }
    a = 0.5
    V = 3
    # doc2: (a,b): -(ln(3+a) - ln(3+a*V)); (b,c): -(ln(1+a) - ln(2+a*V))
    nll = (
        -(math.log(3 + a) - math.log(3 + a * V))
        - (math.log(1 + a) - math.log(2 + a * V))
    ) / 2
    assert scored[2]["n_bigrams"] == 2
    assert scored[2]["avg_nll"] == pytest.approx(nll)
    assert scored[2]["ppl"] == pytest.approx(math.exp(nll))


def test_perplexity_skips_short_docs(spark):
    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "single"), (3, "")], ["doc_id", "text"]
    )
    uni, bi, vocab = ngram_counts(corpus, "doc_id", "text")
    scored = perplexity(corpus, "doc_id", "text", uni, bi, vocab)
    assert [r["doc_id"] for r in scored.collect()] == [1]


def test_min_count_prunes_model_not_vocab(spark):
    corpus = spark.createDataFrame(
        [(1, "a b a b a c")], ["doc_id", "text"]
    )
    uni, bi, vocab = ngram_counts(corpus, "doc_id", "text", min_count=2)
    b = {(r["w1"], r["w2"]): r["c_bi"] for r in bi.collect()}
    assert b == {("a", "b"): 2, ("b", "a"): 2}  # (a,c) pruned
    assert vocab == 3  # vocabulary unaffected by pruning
