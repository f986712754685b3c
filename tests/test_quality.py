"""df.observe instrumentation: counters must match exact counts and
cost no extra pass (same action computes result + metrics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.quality import (
    observed_filter,
    observed_null_rates,
)
from ml_pipelines_spark.queries.relational import t


def test_observed_filter_counters_match_exact(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    cond = F.col("n_chars") >= 200
    filtered, obs = observed_filter(docs, cond, "len_gate")
    kept_rows = filtered.count()  # the ONE action computes metrics too
    m = obs.get
    assert m["len_gate_kept"] == kept_rows
    assert m["len_gate_in"] == docs.count()
    assert m["len_gate_dropped"] == m["len_gate_in"] - m["len_gate_kept"]


def test_observed_null_rates(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "id long, s string"
    )
    out, obs = observed_null_rates(df, ["s"], name="ing")
    assert out.count() == 4  # pass-through
    assert obs.get == {"ing_rows": 4, "ing_null_s": 2}


def test_gates_chain_without_extra_passes(spark, sf_dir):
    """Two chained observed gates: one action yields both gates'
    counters, and the funnel is consistent."""
    docs = t(spark, sf_dir, "documents")
    g1, o1 = observed_filter(docs, F.col("n_chars") >= 100, "g1")
    g2, o2 = observed_filter(g1, F.col("lang") == "en", "g2")
    final = g2.count()
    assert o1.get["g1_kept"] == o2.get["g2_in"]
    assert o2.get["g2_kept"] == final
