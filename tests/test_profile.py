"""Column-profiling operator semantics."""

from __future__ import annotations

from ml_pipelines_spark.operators.profile import profile_columns, top_values


def test_profile_columns_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, None, None), (4, "b", 2.0)],
        "id int, s string, x double",
    )
    rep = {r["column"]: r for r in profile_columns(df, exact_distinct=True).collect()}
    assert rep["id"]["total"] == 4
    assert rep["id"]["nulls"] == 0
    assert rep["id"]["approx_distinct"] == 4
    assert (rep["id"]["min"], rep["id"]["max"]) == ("1", "4")
    assert rep["id"]["mean"] == 2.5
    assert rep["s"]["nulls"] == 1
    assert rep["s"]["approx_distinct"] == 2
    assert rep["s"]["mean"] is None  # non-numeric
    assert rep["x"]["nulls"] == 1
    assert rep["x"]["mean"] == 2.0  # avg ignores nulls


def test_profile_columns_approx_mode_runs(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id int")
    rep = profile_columns(df).collect()
    # HLL estimate is close at this cardinality
    assert abs(rep[0]["approx_distinct"] - 100) <= 5


def test_top_values(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1, "v string"
    )
    out = top_values(df, "v", k=3).collect()
    assert [(r["value"], r["n"]) for r in out] == [("a", 5), ("b", 3), ("c", 3)]
