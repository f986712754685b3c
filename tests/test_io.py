"""Datalake I/O tests — partitioned writes, partition pruning, and the
metadata-only partition-value scan (SURVEY.md §2.1 S1/S2/S5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.io import (
    partition_values,
    partition_values_from_paths,
    read_table,
    write_partitioned,
)
from ml_pipelines_spark.queries.relational import t


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    """orders written hive-partitioned by orderstatus."""
    d = str(tmp_path_factory.mktemp("lake") / "orders")
    orders = t(spark, "/root/testdata/sf0.001", "orders")
    write_partitioned(orders, d, ["o_orderstatus"], mode="overwrite")
    return d, orders


def test_partitioned_write_layout(lake):
    d, _ = lake
    dirs = {p for p in os.listdir(d) if p.startswith("o_orderstatus=")}
    assert len(dirs) >= 2  # one hive directory per status


def test_roundtrip_and_partition_pruning(spark, lake):
    d, orders = lake
    back = read_table(spark, d)
    assert back.count() == orders.count()
    # a partition-key filter must prune to the single hive directory
    one = back.filter(F.col("o_orderstatus") == "F")
    files = one.select(F.input_file_name().alias("f")).distinct().collect()
    assert len(files) > 0
    assert all("o_orderstatus=F" in r["f"] for r in files)


def test_partition_values_metadata_scan(spark, lake):
    d, orders = lake
    back = read_table(spark, d)
    vals = {r["o_orderstatus"] for r in
            partition_values(back, ["o_orderstatus"]).collect()}
    want = {r["o_orderstatus"] for r in
            orders.select("o_orderstatus").distinct().collect()}
    assert vals == want
    # the scan must not read any data columns (metadata/partition-only)
    plan = partition_values(back, ["o_orderstatus"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ReadSchema: struct<>" in plan


def test_partition_values_from_paths(spark, lake):
    d, orders = lake
    back = read_table(spark, d)
    vals = partition_values_from_paths(
        back, r"o_orderstatus=([^/]+)/", ["o_orderstatus"]
    )
    got = {r["o_orderstatus"] for r in vals.collect()}
    want = {r["o_orderstatus"] for r in
            orders.select("o_orderstatus").distinct().collect()}
    assert got == want
