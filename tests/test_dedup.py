"""Decontamination operator semantics on a hand-built micro-corpus."""

from __future__ import annotations

from ml_pipelines_spark.operators.dedup import (
    contamination_flags,
    decontaminate,
)


def _corpus(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "The Quick, Brown Fox jumps over the lazy dog tonight!"),  # fp-dup of eval 100
            (3, "completely unrelated text about spark shuffles and joins"),
            (4, "alpha beta gamma delta epsilon zeta eta theta"),  # shares 5-gram with eval 101
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight"),
            (101, "prefix words alpha beta gamma delta epsilon trailing"),
        ],
        ["doc_id", "text"],
    )
    return train, ev


def test_contamination_flags(spark):
    train, ev = _corpus(spark)
    flags = {
        r["doc_id"]: (r["contaminated_exact"], r["contaminated_ngram"])
        for r in contamination_flags(train, ev, "doc_id", "text", shingle_k=5).collect()
    }
    # doc 1 is verbatim eval text: both rules fire.
    assert flags[1] == (True, True)
    # doc 2 differs in case/punctuation only: fingerprint fires; its
    # whitespace shingles differ ("Quick," != "quick"), so ngram may not.
    assert flags[2][0] is True
    assert flags[3] == (False, False)
    # doc 4 shares the 5-gram "alpha beta gamma delta epsilon".
    assert flags[4][1] is True


def test_decontaminate_drops_flagged(spark):
    train, ev = _corpus(spark)
    kept = decontaminate(train, ev, "doc_id", "text", shingle_k=5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3]
    assert set(kept.columns) == {"doc_id", "text"}
