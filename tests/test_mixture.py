"""Mixture operator semantics: temperature math, epoch fan-out,
budget prefixes, training-order permutation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.mixture import (
    domain_mixture_sample,
    epoch_repeat,
    temperature_weights,
    token_budget_select,
    training_order,
)


def test_temperature_weights_tau1_is_noop():
    rates = temperature_weights({"a": 100, "b": 10}, tau=1.0)
    assert rates == {"a": 1.0, "b": 1.0}


def test_temperature_weights_upweights_small_domains():
    rates = temperature_weights({"big": 900, "small": 100}, tau=2.0)
    assert rates["small"] == 1.0  # most-upweighted domain keeps all
    assert 0 < rates["big"] < 1.0
    # share^(1/tau-1) ratio: (0.9/0.1)^(-0.5) = 1/3
    assert rates["big"] == pytest.approx(1 / 3)


def test_temperature_weights_rejects_bad_tau():
    with pytest.raises(ValueError):
        temperature_weights({"a": 1}, tau=0)


def _docs(spark, n=400, domains=("a", "b")):
    rows = [(i, domains[i % len(domains)], 10 + i % 50) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])


def test_domain_mixture_sample_rates_and_determinism(spark):
    df = _docs(spark)
    out = domain_mixture_sample(df, "source", {"a": 1.0, "b": 0.25}, "doc_id")
    rows = out.collect()
    a = [r for r in rows if r["source"] == "a"]
    b = [r for r in rows if r["source"] == "b"]
    assert len(a) == 200  # rate 1.0 keeps everything
    assert 20 <= len(b) <= 80  # ~50 expected at rate 0.25
    again = domain_mixture_sample(df, "source", {"a": 1.0, "b": 0.25}, "doc_id")
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in rows
    )


def test_domain_mixture_sample_drops_unlisted_domains(spark):
    df = _docs(spark)
    out = domain_mixture_sample(df, "source", {"a": 1.0}, "doc_id")
    assert out.filter(F.col("source") == "b").count() == 0


def test_epoch_repeat_integer_and_fractional(spark):
    df = _docs(spark)
    out = epoch_repeat(df, "source", {"a": 2.0, "b": 0.5}, "doc_id")
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    a_ids = [i for i in range(400) if i % 2 == 0]
    assert all(counts[i] == 2 for i in a_ids)  # exactly 2 epochs each
    b_kept = [i for i in counts if i % 2 == 1]
    assert all(counts[i] == 1 for i in b_kept)
    assert 50 <= len(b_kept) <= 150  # ~100 of 200 at 0.5
    # epoch index is 1-based and dense per row
    eps = out.filter(F.col("doc_id") == a_ids[0]).select("epoch").collect()
    assert sorted(r["epoch"] for r in eps) == [1, 2]


def test_epoch_repeat_default_one(spark):
    df = _docs(spark)
    out = epoch_repeat(df, "source", {"a": 3.0}, "doc_id")
    assert out.filter(F.col("source") == "b").count() == 200


def test_token_budget_select_greedy_prefix(spark):
    df = _docs(spark, n=40)
    out = token_budget_select(df, "source", "n_chars", budget=100)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], []).append(r["n_chars"])
    for src, costs in per.items():
        assert sum(costs) <= 100
    # cheapest-first: the kept set per domain is a prefix of the sorted costs
    all_costs = {}
    for r in df.collect():
        all_costs.setdefault(r["source"], []).append(r["n_chars"])
    for src, kept in per.items():
        expect, cum = [], 0
        for c in sorted(all_costs[src]):
            if cum + c > 100:
                break
            expect.append(c)
            cum += c
        assert sorted(kept) == expect


def test_training_order_is_dense_deterministic_permutation(spark):
    df = _docs(spark, n=300)
    out = training_order(df, "doc_id").collect()
    assert sorted(r["pos"] for r in out) == list(range(300))
    again = training_order(df, "doc_id").collect()
    assert {r["doc_id"]: r["pos"] for r in out} == {
        r["doc_id"]: r["pos"] for r in again
    }
