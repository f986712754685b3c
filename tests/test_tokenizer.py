"""Tokenizer-seam tests (functions.tokenizer): whichever backend the
import-availability seam selects must behave; the pinned fallback is
checked exactly against a serial Python model."""

from __future__ import annotations

import math

import pytest

from ml_pipelines_spark.functions import tokenizer as tk


def _pinned_model(text: str) -> int:
    if not text.strip():
        return 0
    total = 0
    for w in text.strip().lower().split():
        total += 1 if w in tk.PINNED_VOCAB else math.ceil(len(w) / 4)
    return total


def test_backend_is_declared():
    assert tk.backend() in {"tiktoken", "tokenizers", "pinned"}
    # the seam flags and the declared backend must agree
    if tk.backend() == "pinned":
        assert not tk.HAS_TIKTOKEN and not tk.HAS_HF_TOKENIZERS


SAMPLES = [
    "the quick brown fox jumps over the lazy dog",
    "",
    "   ",
    "antidisestablishmentarianism",
    "a a a a the the",
    "Data and time, with punctuation!",
]


def test_pinned_expression_matches_serial_model(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "id long, text string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", tk.pinned_token_count(F.col("text")).alias("n")
        ).collect()
    }
    for i, s in enumerate(SAMPLES):
        assert got[i] == _pinned_model(s), (i, s)


def test_pinned_expression_is_jvm_only(spark):
    # the fallback must stay a pure expression (no Python in the hot
    # path): the plan contains no BatchEvalPython / ArrowEvalPython
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "hello world")], "id long, text string")
    plan = (
        df.select(tk.pinned_token_count(F.col("text")).alias("n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_real_backend_udf_or_stub(spark):
    if tk.backend() == "pinned":
        with pytest.raises(NotImplementedError, match="STUB"):
            tk.bpe_token_count_udf()
    else:  # pragma: no cover - exercised only where a real lib exists
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "")], "id long, text string"
        )
        rows = {
            r["id"]: r["n"]
            for r in df.select(
                "id", tk.bpe_token_count_udf()(F.col("text")).alias("n")
            ).collect()
        }
        assert rows[1] > 0 and rows[2] == 0
