"""Unit tests for the bin-bucketed point-in-interval range join
(operators.rangejoin) — boundary semantics, multi-bin intervals,
numeric axes, and the no-duplicate guarantee."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.operators.rangejoin import range_join

UTC = dt.timezone.utc


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s, tzinfo=UTC)


@pytest.fixture(scope="module")
def pair_inputs(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(0, 30), "a"),   # inside iv1
            (1, _ts(5, 0), "b"),    # inside iv1, different bin (w=3600)
            (1, _ts(6, 0), "c"),    # == iv1 end boundary
            (1, _ts(7, 0), "d"),    # outside everything
            (2, _ts(0, 30), "e"),   # right key for iv2
        ],
        "user_id long, ts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [
            (10, 1, _ts(0), _ts(6)),   # 6 h: spans 7 bins at w=3600
            (20, 2, _ts(0), _ts(1)),
        ],
        "interval_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def _pairs(points, intervals, **kw):
    out = range_join(
        points, intervals,
        key_cols=["user_id"], point_col="ts",
        start_col="start_ts", end_col="end_ts",
        **kw,
    )
    return sorted(
        (r["interval_id"], r["tag"]) for r in out.collect()
    )


def test_half_open_excludes_end_and_spans_bins(pair_inputs):
    points, intervals = pair_inputs
    # bin width 1 h << 6 h interval: matches must survive bin fan-out,
    # each exactly once, and the end-boundary point "c" must be excluded
    assert _pairs(points, intervals, bin_width=3600, closed="left") == [
        (10, "a"), (10, "b"), (20, "e"),
    ]


def test_closed_both_includes_end(pair_inputs):
    points, intervals = pair_inputs
    assert _pairs(points, intervals, bin_width=3600, closed="both") == [
        (10, "a"), (10, "b"), (10, "c"), (20, "e"),
    ]


def test_bin_width_larger_than_interval(pair_inputs):
    points, intervals = pair_inputs
    # one giant bin: everything meets in bin 0, residual filter decides
    assert _pairs(points, intervals, bin_width=10**9, closed="left") == [
        (10, "a"), (10, "b"), (20, "e"),
    ]


def test_numeric_axis(spark):
    points = spark.createDataFrame(
        [(1, 5.0, "p"), (1, 15.0, "q")], "k long, x double, tag string"
    )
    intervals = spark.createDataFrame(
        [(7, 1, 0.0, 10.0)], "interval_id long, k long, lo double, hi double"
    )
    out = range_join(
        points, intervals, key_cols=["k"], point_col="x",
        start_col="lo", end_col="hi", bin_width=4.0,
    )
    assert [(r["interval_id"], r["tag"]) for r in out.collect()] == [(7, "p")]


def test_column_collision_raises(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0, 4.0)], "k long, x double, lo double, hi double")
    with pytest.raises(ValueError, match="collide"):
        range_join(df, df, ["k"], "x", "lo", "hi", bin_width=1.0)


def test_invalid_closed_raises(spark):
    df = spark.createDataFrame([(1, 2.0)], "k long, x double")
    iv = spark.createDataFrame([(1, 0.0, 5.0)], "k long, lo double, hi double")
    with pytest.raises(ValueError, match="closed"):
        range_join(df, iv, ["k"], "x", "lo", "hi", bin_width=1.0, closed="right")


def test_plans_as_equi_join_not_nested_loop(spark):
    """The bin rewrite must plan as a hash/sort-merge equi-join on
    (keys, bin) — never a nested-loop/cartesian over candidate pairs."""
    points = spark.range(1000).selectExpr(
        "id % 7 as k", "CAST(id AS DOUBLE) as x", "id as pid"
    )
    intervals = spark.range(100).selectExpr(
        "id as interval_id", "id % 7 as k",
        "CAST(id * 10 AS DOUBLE) as lo", "CAST(id * 10 + 25 AS DOUBLE) as hi",
    )
    out = range_join(
        points, intervals, key_cols=["k"], point_col="x",
        start_col="lo", end_col="hi", bin_width=10.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan


def test_band_join_edges_and_plan(spark):
    from pyspark.sql import functions as F

    from ml_pipelines_spark.operators.rangejoin import band_join

    left = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "lid long, lv double"
    )
    right = spark.createDataFrame(
        # exactly on the edge (|diff| = delta) is IN; just past is OUT
        [(10, 9.5), (11, 10.5), (12, 10.51), (13, 19.5), (14, 25.0)],
        "rid long, rv double",
    )
    got = {
        (r["lid"], r["rid"])
        for r in band_join(left, right, "lv", "rv", delta=0.5).collect()
    }
    assert got == {(1, 10), (1, 11), (2, 13)}

    # bin rewrite must plan an equi-join on the bin, never a nested loop
    plan = band_join(left, right, "lv", "rv", delta=0.5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # no duplicate pairs (each pair meets in exactly one bin)
    rows = band_join(left, right, "lv", "rv", delta=0.5).select("lid", "rid").collect()
    assert len(rows) == len(set((r["lid"], r["rid"]) for r in rows))
