"""Unigram-LM tokenizer trainer: DP optimality vs brute force,
coverage fallback, determinism, and vocabulary bounds."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.operators.unigram import (
    _segment,
    seed_pieces,
    unigram_train,
    word_counts,
)


def _brute_best(word: str, weights: dict) -> list[str]:
    """Enumerate every segmentation; pick by the module's objective:
    (n_pieces, -sum_weight, space-joined path)."""
    n = len(word)
    best = None
    for k in range(n):  # k cut points
        for cuts in combinations(range(1, n), k):
            bounds = [0, *cuts, n]
            pieces = [
                word[bounds[i] : bounds[i + 1]]
                for i in range(len(bounds) - 1)
            ]
            if any(p not in weights for p in pieces):
                continue
            cand = (
                len(pieces),
                -sum(weights[p] for p in pieces),
                " ".join(pieces),
            )
            if best is None or cand < best:
                best = cand
    return best[2].split(" ") if best else list(word)


@pytest.mark.parametrize(
    "word",
    ["batch", "customer", "the", "a", "window", "sparkly", "aaaaab"],
)
def test_segment_matches_brute_force(word):
    weights = {
        "a": 10, "b": 8, "c": 7, "d": 6, "e": 9, "h": 5, "i": 4,
        "k": 3, "l": 2, "m": 6, "n": 7, "o": 8, "p": 5, "r": 9,
        "s": 11, "t": 12, "u": 4, "w": 3, "y": 2,
        "at": 30, "ch": 25, "th": 40, "the": 90, "er": 35, "om": 20,
        "cust": 50, "omer": 45, "win": 33, "dow": 31, "aa": 14,
        "aaa": 13, "ab": 16, "spark": 70, "ly": 22, "ba": 12,
        "tch": 18,
    }
    assert _segment(word, weights) == _brute_best(word, weights)


def test_segment_tiebreak_is_joined_string_order():
    # equal piece count, equal weight: 'a bc' must beat 'ab c' because
    # the SPACE separator sorts below every letter
    weights = {"a": 5, "b": 1, "c": 5, "ab": 3, "bc": 3}
    assert _segment("abc", {**weights, "ab": 3, "bc": 3}) == ["a", "bc"]


def test_segment_uncovered_char_falls_back_to_chars():
    assert _segment("axb", {"a": 1, "b": 1}) == ["a", "x", "b"]


def test_train_deterministic_and_bounded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v1 = unigram_train(docs, rounds=2).collect()
    v2 = unigram_train(docs, rounds=2).collect()
    assert sorted(map(tuple, v1)) == sorted(map(tuple, v2))
    words = word_counts(docs)
    n_singles = (
        seed_pieces(words).filter(F.length("piece") == 1).count()
    )
    assert len(v1) <= 60 + n_singles
    # coverage guarantee: every single character survives training
    singles = {r["piece"] for r in v1 if len(r["piece"]) == 1}
    all_chars = {
        c
        for r in words.select("word").collect()
        for c in r["word"]
    }
    assert all_chars <= singles


# ---------------------------------------------------------------------------
# Property: DP == brute force on random small instances
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        word=st.text(alphabet="ab", min_size=1, max_size=9),
        extra=st.dictionaries(
            st.text(alphabet="ab", min_size=2, max_size=4),
            st.integers(min_value=0, max_value=100),
            max_size=8,
        ),
    )
    @settings(max_examples=150, deadline=None)
    def test_segment_property_matches_brute_force(word, extra):
        weights = {"a": 3, "b": 5, **extra}
        assert _segment(word, weights) == _brute_best(word, weights)

except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass
