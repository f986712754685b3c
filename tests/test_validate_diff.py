"""Validation-suite and snapshot-diff operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.diff import snapshot_diff
from ml_pipelines_spark.operators.validate import (
    Suite,
    accepted_values,
    in_range,
    matches,
    not_null,
    satisfies,
    validate,
)


def test_validate_row_checks(spark):
    df = spark.createDataFrame(
        [(1, 5, "A"), (2, 60, "N"), (3, None, "X"), (None, 10, "R")],
        "id int, qty int, flag string",
    )
    rep = {
        r["constraint"]: (r["violations"], r["total"], r["passed"])
        for r in validate(
            df,
            Suite()
            .add(not_null("id"))
            .add(in_range("qty", 1, 50))
            .add(accepted_values("flag", ["A", "N", "R"]))
            .add(matches("flag", "^[A-Z]$"))
            .add(satisfies("id_lt_qty", F.col("id") < F.col("qty"))),
        ).collect()
    }
    assert rep["not_null(id)"] == (1, 4, False)
    assert rep["in_range(qty,1,50)"] == (2, 4, False)  # 60 and NULL
    assert rep["accepted_values(flag)"] == (1, 4, False)  # X
    assert rep["matches(flag)"] == (0, 4, True)
    # id<qty: rows (1,5) ok, (2,60) ok, (3,None) null→not counted,
    # (None,10) null→not counted... violated = NOT(pred); null pred is
    # not counted as a violation by design
    assert rep["id_lt_qty"] == (0, 4, True)


def test_validate_unique_and_fk(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    rep = {
        r["constraint"]: (r["violations"], r["passed"])
        for r in validate(
            child,
            Suite().unique("k", "v").references(["k"], parent, ["pk"]),
        ).collect()
    }
    assert rep["unique(k,v)"] == (1, False)  # one excess copy of (1,a)
    assert rep["references(k)"] == (1, False)  # k=3 orphaned


def test_validate_empty_suite(spark):
    df = spark.createDataFrame([(1,)], "id int")
    assert validate(df, Suite()).count() == 0


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0), (4, None, 40.0)],
        "k int, s string, p double",
    )
    new = spark.createDataFrame(
        [(2, "y", 20.0), (3, "z", 31.0), (4, "w", 40.0), (5, "n", 50.0)],
        "k int, s string, p double",
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert rows[1]["status"] == "removed"
    assert rows[5]["status"] == "added"
    assert rows[3]["status"] == "changed" and rows[3]["changed_cols"] == ["p"]
    # NULL -> 'w' is a change (null-safe compare)
    assert rows[4]["status"] == "changed" and rows[4]["changed_cols"] == ["s"]
    assert 2 not in rows  # unchanged filtered by default


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "a")], "k int, v string")
    new = spark.createDataFrame([(1, "a")], "k int, v string")
    out = snapshot_diff(old, new, ["k"], include_unchanged=True).collect()
    assert len(out) == 1 and out[0]["status"] == "unchanged"
    assert out[0]["changed_cols"] == []


def test_validate_fk_strategies_agree(spark, sf_dir):
    """auto (None), forced-broadcast, and left-anti fallback must produce
    the identical report for the same suite."""
    from ml_pipelines_spark.operators.validate import Suite, validate
    from ml_pipelines_spark.queries.relational import t

    li = t(spark, sf_dir, "lineitem").limit(2000)
    orders = t(spark, sf_dir, "orders")
    suite = Suite().references(["l_orderkey"], orders, ["o_orderkey"])

    def rows(bp):
        return sorted(
            map(tuple, validate(li, suite, broadcast_parents=bp).collect())
        )

    auto, forced, anti = rows(None), rows(True), rows(False)
    assert auto == forced == anti
    assert any("references" in r[0] for r in auto)


def test_scd2_build_runs_gaps_and_currency(spark):
    from ml_pipelines_spark.operators.diff import scd2_build

    def snap(rows):
        return spark.createDataFrame(rows, "k long, v string")

    # k=1: value change at v2 (two chained runs, first closed at 2)
    # k=2: present v1, deleted v2, reappears v3 (gap closes run at 2)
    # k=3: unchanged throughout (single current run)
    s1 = snap([(1, "a"), (2, "x"), (3, "c")])
    s2 = snap([(1, "b"), (3, "c")])
    s3 = snap([(1, "b"), (2, "x"), (3, "c")])
    hist = scd2_build([(1, s1), (2, s2), (3, s3)], ["k"], ["v"])
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in hist.collect()
    }
    assert got == {
        (1, "a", 1, 2, False),
        (1, "b", 2, None, True),
        (2, "x", 1, 2, False),
        (2, "x", 3, None, True),
        (3, "c", 1, None, True),
    }


def test_scd2_build_exhaustive_single_key_patterns(spark):
    """All 27 presence/value patterns of one key across 3 snapshot
    versions (absent / 'a' / 'b' each version), checked against a serial
    reference model — covers every combination of appear, change,
    disappear, and reappear in one Spark job."""
    from itertools import product

    from ml_pipelines_spark.operators.diff import scd2_build

    patterns = list(product([None, "a", "b"], repeat=3))

    def ref(seq):
        runs, cur = [], None  # cur = [val, start, last]
        for v, val in enumerate(seq, start=1):
            if val is None:
                if cur:
                    runs.append(cur)
                    cur = None
            elif cur and cur[2] == v - 1 and cur[0] == val:
                cur[2] = v
            else:
                if cur:
                    runs.append(cur)
                cur = [val, v, v]
        if cur:
            runs.append(cur)
        return {
            (val, start, None if last == 3 else last + 1, last == 3)
            for val, start, last in runs
        }

    snaps = []
    for version in (1, 2, 3):
        rows = [
            (k, pat[version - 1])
            for k, pat in enumerate(patterns)
            if pat[version - 1] is not None
        ]
        snaps.append(
            (version, spark.createDataFrame(rows, "k long, v string"))
        )
    hist = scd2_build(snaps, ["k"], ["v"])
    got = {}
    for r in hist.collect():
        got.setdefault(r["k"], set()).add(
            (r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        )
    for k, pat in enumerate(patterns):
        assert got.get(k, set()) == ref(pat), f"pattern {pat}"
