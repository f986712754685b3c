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


def test_kneser_ney_full_vocab_mass_is_one(spark):
    # Interpolated KN is a proper distribution: over the FULL vocab,
    # sum_w2 P(w2|w1) = (c_w1 - D*n_follow)/c_w1 + (D*n_follow/c_w1)*1.
    # The operator emits observed bigrams only, so reconstruct the
    # unseen mass from the continuation stats the output itself carries
    # and assert the total is 1 for every context, to float precision.
    from ml_pipelines_spark.operators.lm import kneser_ney_bigrams

    docs = spark.createDataFrame(
        [
            (1, "a b a c a b d e a b"),
            (2, "b c a a b c d a e b"),
            (3, "e d c b a e d c b a"),
        ],
        ["doc_id", "text"],
    )
    D = 0.75
    # raw (unrounded) reconstruction straight from the bigram counts
    rows = kneser_ney_bigrams(docs, "doc_id", "text", discount=D).collect()
    import collections

    c_bi = {(r.w1, r.w2): r.c_bi for r in rows}
    c_w1 = collections.Counter()
    n_follow = collections.Counter()
    n_prec = collections.Counter()
    for (w1, w2), c in c_bi.items():
        c_w1[w1] += c
        n_follow[w1] += 1
        n_prec[w2] += 1
    T = len(c_bi)
    vocab = set(n_prec)  # every w2 that ever appears as a continuation
    for w1 in c_w1:
        lam = D * n_follow[w1] / c_w1[w1]
        total = 0.0
        for w2 in vocab:
            seen = max(c_bi.get((w1, w2), 0) - D, 0.0) / c_w1[w1]
            total += seen + lam * (n_prec[w2] / T)
        assert abs(total - 1.0) < 1e-9, (w1, total)
        # and the rounded operator p_kn agrees with the reconstruction
    for r in rows:
        lam = D * n_follow[r.w1] / c_w1[r.w1]
        want = (
            max(c_bi[(r.w1, r.w2)] - D, 0.0) / c_w1[r.w1]
            + lam * (n_prec[r.w2] / T)
        )
        # round(x, 6) moves a half-way value exactly 5e-7
        assert abs(r.p_kn - want) <= 5e-7 + 1e-12


def _serial_bpe(word_freqs, k):
    # textbook reference: dict of word -> list of symbols
    segs = {w: list(w) for w in word_freqs}
    out = []
    for step in range(1, k + 1):
        counts = {}
        for w, syms in segs.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((step, l, r, c))
        for w, syms in segs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            segs[w] = merged
    return out


def test_bpe_train_matches_serial_reference(spark):
    from ml_pipelines_spark.operators.lm import bpe_train_merges

    # includes the greedy-overlap case (aaaa), ties, and a second-order
    # merge (learned symbol participating in a later pair)
    freqs = {
        "aaaa": 10,
        "banana": 7,
        "bandana": 5,
        "cabana": 4,
        "abba": 3,
        "a": 2,
    }
    df = spark.createDataFrame(list(freqs.items()), ["word", "freq"])
    got = bpe_train_merges(df, k=5)
    want = _serial_bpe(freqs, 5)
    assert got == want


def test_bpe_greedy_overlap_application(spark):
    # merging (a,a) over "aaaa" must yield [aa, aa] (non-overlapping
    # left-to-right), so round 2's top pair is (aa, aa)
    from ml_pipelines_spark.operators.lm import bpe_train_merges

    df = spark.createDataFrame([("aaaa", 5)], ["word", "freq"])
    got = bpe_train_merges(df, k=2)
    assert got == [(1, "a", "a", 15), (2, "aa", "aa", 5)]


def test_bpe_checkpoint_boundary_is_equivalence_preserving(spark, monkeypatch):
    """The lineage-truncation boundary (localCheckpoint every N rounds)
    must never change the learned merge table: run the same training
    with the boundary forced onto every round vs. effectively disabled
    and against the serial reference, across the boundary step."""
    from ml_pipelines_spark.operators import lm

    freqs = {
        "banana": 7,
        "bandana": 5,
        "cabana": 4,
        "abba": 3,
        "cabal": 2,
        "canal": 2,
    }
    df = spark.createDataFrame(list(freqs.items()), ["word", "freq"])
    k = 10  # crosses the default boundary (8) and several forced ones
    monkeypatch.setattr(lm, "_BPE_CKPT_EVERY", 1)
    every_round = lm.bpe_train_merges(df, k=k)
    monkeypatch.setattr(lm, "_BPE_CKPT_EVERY", 10**9)
    never = lm.bpe_train_merges(df, k=k)
    assert every_round == never == _serial_bpe(freqs, k)


def test_bpe_input_lineage_executes_once(spark):
    """r12: the trainer materializes the vocabulary (eager
    localCheckpoint) BEFORE the merge loop, so the lineage feeding
    ``words`` executes exactly once — not once per round. Counted with
    an accumulator inside a mapInPandas stage on the input path: after
    k rounds the count must equal the number of input partitions, not
    k x partitions (the pre-r12 shape re-ran the corpus scan per
    round's argmax job)."""
    from ml_pipelines_spark.operators.lm import bpe_train_merges

    acc = spark.sparkContext.accumulator(0)

    def tap(batches):
        for b in batches:
            acc.add(1)
            yield b

    base = spark.createDataFrame(
        [("banana", 7), ("bandana", 5), ("cabana", 4), ("abba", 3)],
        ["word", "freq"],
    ).repartition(2)
    words = base.mapInPandas(tap, schema="word string, freq long")
    got = bpe_train_merges(words, k=4)
    assert len(got) == 4
    # one Arrow batch per partition at this size; the assertion is the
    # upper bound that matters: the tap ran during ONE materialization,
    # not once per merge round.
    assert acc.value <= 2, f"input lineage re-executed: tap ran {acc.value}x"
