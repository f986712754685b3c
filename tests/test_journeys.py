"""Sequence-pattern operator (operators/journeys.py): journey
construction, match counting, funnel depth, and the whale-key cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.journeys import (
    event_code,
    funnel_depth,
    journey_strings,
    match_count,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint, event_type string"
    )


CODES = {"signup": "s", "view": "v", "purchase": "p", "error": "e"}


def test_journey_order_and_codes(spark):
    ev = _events(
        spark,
        [
            (1, 30, 1, "purchase"),
            (1, 10, 2, "signup"),
            (1, 20, 3, "view"),
            # same ts: event_id breaks the tie deterministically
            (2, 10, 2, "view"),
            (2, 10, 1, "signup"),
            (2, 10, 3, "unknown_type"),
        ],
    )
    j = journey_strings(
        ev, "user_id", ["ts", "event_id"], event_code("event_type", CODES)
    )
    got = {r.user_id: r.journey for r in j.collect()}
    assert got == {1: "svp", 2: "sv_"}


def test_match_count_and_depth(spark):
    ev = _events(
        spark,
        [
            # user 1: two clean funnels back to back
            (1, 1, 1, "signup"),
            (1, 2, 2, "view"),
            (1, 3, 3, "purchase"),
            (1, 4, 4, "signup"),
            (1, 5, 5, "view"),
            (1, 6, 6, "purchase"),
            # user 2: error inside the funnel kills the regex match,
            # but the in-order depth still completes
            (2, 1, 1, "signup"),
            (2, 2, 2, "error"),
            (2, 3, 3, "view"),
            (2, 4, 4, "purchase"),
            # user 3: stalls after view
            (3, 1, 1, "signup"),
            (3, 2, 2, "view"),
        ],
    )
    j = journey_strings(
        ev, "user_id", ["ts", "event_id"], event_code("event_type", CODES)
    )
    out = j.select(
        "user_id",
        match_count("journey", "s[^e]*?v[^e]*?p").alias("m"),
        funnel_depth("journey", "svp").alias("d"),
    )
    got = {r.user_id: (r.m, r.d) for r in out.collect()}
    assert got == {1: (2, 3), 2: (0, 3), 3: (0, 2)}


def test_whale_key_cap(spark):
    rows = [(1, i, i, "view") for i in range(100)]
    rows[5] = (1, 5, 5, "purchase")
    ev = _events(spark, rows)
    j = journey_strings(
        ev,
        "user_id",
        ["ts", "event_id"],
        event_code("event_type", CODES),
        max_events=10,
    )
    journey = j.collect()[0].journey
    assert len(journey) == 10
    assert journey == "vvvvvpvvvv"  # first 10 by order, not arbitrary


def test_journey_plan_is_python_free(spark):
    ev = _events(spark, [(1, 1, 1, "view")])
    j = journey_strings(
        ev, "user_id", ["ts", "event_id"], event_code("event_type", CODES)
    ).select(match_count("journey", "s[^e]*?v").alias("m"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
