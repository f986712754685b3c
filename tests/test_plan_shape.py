"""Plan-shape regressions for the round-3 perf fixes.

These pin the STRUCTURE that makes the operators scale, not timings:
timings vary run to run, but a reintroduced extra scan or window pass
shows up deterministically in the physical plan.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_validate_fuses_fk_into_one_child_scan(spark, sf_dir):
    # Row checks + FK orphan count must share ONE scan of the child
    # table; uniqueness adds exactly one more. A regression to the
    # anti-join-per-FK shape adds a third lineitem scan (plus a
    # separate total-count scan).
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["validate_lineitem"](spark, sf_dir))
    lineitem_scans = len(re.findall(r"Scan parquet .*lineitem", plan))
    assert lineitem_scans == 2, f"expected 2 lineitem scans, got {lineitem_scans}"


def test_dense_ids_single_window_pass(spark):
    # Offsets must come from a count aggregation, not from re-executing
    # the ranked subtree: exactly one row_number window over the data.
    from ml_pipelines_spark.operators.ids import dense_ids

    df = spark.range(0, 10000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    out = dense_ids(df, ["k", "v"], id_col="rid")
    plan = _plan(out)
    windows = len(re.findall(r"\bWindow\b", plan))
    # one data window (row_number per bucket) + one bounded cumsum
    # window over <= num-bucket rows
    assert windows <= 2, f"expected <=2 Window nodes, got {windows}:\n{plan}"


def test_coco_records_no_global_data_window(spark, sf_dir):
    # The export must never funnel annotation data through an
    # unpartitioned window; only dictionary-sized inputs (categories,
    # image dimension) may. Guard: the number of window nodes stays at
    # the fused shape's count.
    from ml_pipelines_spark.queries.registry import QUERIES

    plan = _plan(QUERIES["coco_records"](spark, sf_dir))
    windows = len(re.findall(r"\bWindow\b", plan))
    assert windows <= 4, f"expected <=4 Window nodes, got {windows}"
