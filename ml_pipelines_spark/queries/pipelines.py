"""Pipeline-level compositions — end-to-end flows stitched from
already-verified operators, value-checked as ONE plan.

Per-operator driver rows prove each piece; these queries prove the
COMPOSITION: the reference's flagship training-assembly lifecycle
(TrainDatasets.py:235-287 ``image_sampler``) run as a single Spark plan
with its leakage invariant asserted in-plan, and a Holt linear-trend
forecaster extending the time-series family beyond one-step smoothers.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.splits import _hex_threshold, hash_split_expr
from .registry import query
from .relational import t

# ---------------------------------------------------------------------------
# E1: the reference's training-dataset assembly, end to end
# (TrainDatasets.py:235-287): select a project universe, derive each
# image's tag set from its annotations, drop images whose tags overlap
# the skip list (skip_tags, TrainDatasets.py:201,236), restrict
# annotations to surviving images, split at IMAGE granularity so every
# annotation of an image lands in exactly one split (the leakage
# invariant of TrainDatasets.py:149-150), and report per-split sizes.
#
# Table mapping: customers ≙ images (entity keys), orders ≙ annotations,
# nation-key range ≙ project_ids, the per-customer order-priority SET ≙
# the image's tag list. The reference's unseeded pandas ``.sample`` is
# replaced by the md5 hash split (the production-deterministic twin the
# splits family already verifies) with the reference's default
# proportions: p=0.2 held out, 80% of it validation → train/val/test =
# 0.80/0.16/0.04. Deterministic end to end, so the WHOLE pipeline gets
# a cross-engine value oracle — and leak_free is computed IN-PLAN from
# the assembled result, not assumed from the construction.
#
# Plan shape at 100 TB: one broadcast semi-join (customer dim), one
# groupBy per image for tags (map-side combinable), an anti-join on the
# skip set, and a final two-level aggregate — no collect, no driver
# loop, every stage keyed and shuffle-minimal.
# ---------------------------------------------------------------------------
_E1_FRACTIONS = {"train": 0.8, "val": 0.16, "test": 0.04}
_E1_T1 = _hex_threshold(0.8)
_E1_T2 = _hex_threshold(0.96)
_E1_SKIP = "1-URGENT"
_E1_NATIONS = 12


@query(
    "e1_training_assembly",
    f"""
    WITH eligible AS (
      SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
      WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_nationkey < {_E1_NATIONS})
    ),
    skip AS (
      SELECT o_custkey FROM eligible GROUP BY o_custkey
      HAVING list_has_any(list_distinct(list(o_orderpriority)),
                          ['{_E1_SKIP}'])
    ),
    annos AS (
      SELECT o_orderkey, o_custkey,
        CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4)
                  < '{_E1_T1}' THEN 'train'
             WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4)
                  < '{_E1_T2}' THEN 'val'
             ELSE 'test' END AS split
      FROM eligible WHERE o_custkey NOT IN (SELECT o_custkey FROM skip)
    ),
    leak AS (
      SELECT CAST(MAX(n_splits) AS BIGINT) = 1 AS lf FROM (
        SELECT COUNT(DISTINCT split) AS n_splits
        FROM annos GROUP BY o_custkey) t
    )
    SELECT split,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_images,
           CAST(COUNT(*) AS BIGINT) AS n_annos,
           (SELECT lf FROM leak) AS leak_free
    FROM annos GROUP BY split
    """,
)
def e1_training_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") < _E1_NATIONS
    )
    orders = t(spark, sf_dir, "orders")
    # project scan: annotations of the selected image universe (J2,
    # dimension broadcast — the key list never lands on the driver)
    eligible = orders.join(
        F.broadcast(cust.select("c_custkey")),
        orders.o_custkey == cust.c_custkey,
        "left_semi",
    ).select("o_orderkey", "o_custkey", "o_orderpriority")
    # per-image tag set (A5 flatten-collect), skip-tag overlap (P6),
    # exclusion (J3)
    skip = (
        eligible.groupBy("o_custkey")
        .agg(F.collect_set("o_orderpriority").alias("tags"))
        .filter(F.arrays_overlap("tags", F.array(F.lit(_E1_SKIP))))
        .select("o_custkey")
    )
    annos = eligible.join(skip, "o_custkey", "left_anti").withColumn(
        "split", hash_split_expr(F.col("o_custkey"), _E1_FRACTIONS)
    )
    # ONE fact pass: reduce to the image dimension (per-image
    # annotation count + the number of DISTINCT labels its annotations
    # actually received), roll the per-image frame up per split
    # CARRYING max(n_splits), and resolve the global leakage invariant
    # with a window over the 3-row split frame. A naive
    # counts-crossJoin-leak shape executes the whole scan→join→tag
    # subtree TWICE (verified in the physical plan) — two passes over
    # orders at 100 TB for one answer; this chain scans once.
    from pyspark.sql import Window

    per_image = annos.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_annos_img"),
        F.countDistinct("split").alias("n_splits"),
        F.first("split").alias("split"),
    )
    counts = per_image.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.sum("n_annos_img").cast("long").alias("n_annos"),
        F.max("n_splits").alias("__mx"),
    )
    # leakage invariant, asserted from the RESULT: max distinct labels
    # over any image's assembled annotations must be 1 (global window
    # over the split-dimension frame — <= 3 rows)
    w = Window.partitionBy()
    return counts.select(
        "split",
        "n_images",
        "n_annos",
        (F.max("__mx").over(w) == F.lit(1)).alias("leak_free"),
    )


# ---------------------------------------------------------------------------
# Holt linear-trend forecast (double exponential smoothing) on the
# per-type daily event-count series — the trend-aware step past the
# seasonal-naive and EWMA forecasters already in the family:
#   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
#   b_t = γ·(l_t − l_{t−1}) + (1−γ)·b_{t−1},   l_1 = y_1, b_1 = y_2 − y_1
# then ŷ(T+h) = l_T + h·b_T for h = 1..7.
#
# The recursion is inherently serial per series, but the series is
# CALENDAR-bounded (days per event type), not data-bounded — at 100 TB
# the heavy pass is still just the events→daily groupBy; the kernel
# runs on a ~type×days frame inside applyInPandas. The smoothing
# constants are written as the SAME decimal literals on both sides
# (never computed as 1−α, whose double differs from the parsed "0.7"),
# and the oracle replays the recursion as a recursive CTE with l_t
# inlined into b_t — identical float64 expression trees, so the fold is
# bit-for-bit (the serial-fold recipe from the PQ/unigram oracles).
# ---------------------------------------------------------------------------
_HOLT_A, _HOLT_OMA = 0.3, 0.7   # α, 1−α as literals — see note above
_HOLT_G, _HOLT_OMG = 0.1, 0.9   # γ, 1−γ
_HOLT_H = 7


@query(
    "holt_linear_forecast",
    f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS d,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, CAST(n AS DOUBLE) AS y,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
      FROM daily
    ),
    sizes AS (SELECT event_type, MAX(i) AS t FROM seq GROUP BY event_type),
    rec AS (
      SELECT s1.event_type, 1 AS i, s1.y AS l,
             COALESCE(s2.y - s1.y, 0.0) AS b
      FROM seq s1 LEFT JOIN seq s2
        ON s1.event_type = s2.event_type AND s2.i = 2
      WHERE s1.i = 1
      UNION ALL
      SELECT r.event_type, r.i + 1,
             {_HOLT_A}*s.y + {_HOLT_OMA}*(r.l + r.b),
             {_HOLT_G}*(({_HOLT_A}*s.y + {_HOLT_OMA}*(r.l + r.b)) - r.l)
                 + {_HOLT_OMG}*r.b
      FROM rec r JOIN seq s
        ON s.event_type = r.event_type AND s.i = r.i + 1
    ),
    final AS (
      SELECT r.event_type, r.l, r.b
      FROM rec r JOIN sizes z ON r.event_type = z.event_type AND r.i = z.t
    )
    SELECT event_type, CAST(h AS BIGINT) AS h,
           floor((l + h*b) * 10000.0 + 0.5) / 10000.0 AS yhat
    FROM final, LATERAL (
      SELECT unnest(generate_series(1, {_HOLT_H})) AS h)
    """,
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_date(F.to_date(F.date_trunc("day", "ts"))).alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))

    a, oma, g, omg, horizon = (
        _HOLT_A, _HOLT_OMA, _HOLT_G, _HOLT_OMG, _HOLT_H
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        y = pdf["n"].to_numpy(dtype="float64")
        lvl = y[0]
        trd = (y[1] - y[0]) if len(y) > 1 else 0.0
        for i in range(1, len(y)):
            new_lvl = a * y[i] + oma * (lvl + trd)
            trd = g * (new_lvl - lvl) + omg * trd
            lvl = new_lvl
        et = pdf["event_type"].iloc[0]
        return pd.DataFrame(
            {
                "event_type": [et] * horizon,
                "h": list(range(1, horizon + 1)),
                "yhat": [
                    math.floor((lvl + h * trd) * 10000.0 + 0.5) / 10000.0
                    for h in range(1, horizon + 1)
                ],
            }
        )

    return daily.groupBy("event_type").applyInPandas(
        _holt, "event_type string, h long, yhat double"
    )
