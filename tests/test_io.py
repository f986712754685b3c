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


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    """Two tables bucketed on the join key must sort-merge join with no
    shuffle exchange — the co-located join contract."""
    from ml_pipelines_spark.io import write_bucketed

    base = str(tmp_path_factory.mktemp("buckets"))
    orders = t(spark, "/root/testdata/sf0.001", "orders")
    lineitem = t(spark, "/root/testdata/sf0.001", "lineitem")
    write_bucketed(orders, "b_orders", base + "/o", ["o_orderkey"], 4,
                   sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", base + "/l", ["o_orderkey"], 4,
        sort_cols=["o_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # tiny test tables would broadcast (which bypasses bucketing);
        # force the SMJ path the buckets exist for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


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


def test_overwrite_partitions_touches_only_present_partitions(spark, tmp_path):
    from ml_pipelines_spark.io import overwrite_partitions, write_partitioned

    path = str(tmp_path / "dyn")
    base = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 11), (2, "a", 20), (2, "b", 21)],
        "pid long, name string, v long",
    )
    write_partitioned(base, path, ["pid"])
    # replace ONLY pid=1 with a single new row
    fix = spark.createDataFrame([(1, "c", 99)], "pid long, name string, v long")
    overwrite_partitions(fix, path, ["pid"])
    got = sorted(
        (r["pid"], r["name"], r["v"])
        for r in spark.read.parquet(path).collect()
    )
    # pid=1 fully replaced; pid=2 untouched
    assert got == [(1, "c", 99), (2, "a", 20), (2, "b", 21)]
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper()
        == "STATIC"
    )


def test_read_timestamp_table_raises_on_unprobeable(spark):
    import pytest

    from ml_pipelines_spark.io import read_timestamp_table
    from ml_pipelines_spark.schemas import TESTDATA_SCHEMAS

    schema = TESTDATA_SCHEMAS["events"]
    # a remote-scheme path local pyarrow cannot probe
    with pytest.raises(ValueError, match="units"):
        read_timestamp_table(
            spark, "gs://bucket/events.parquet", schema, ["ts"]
        )
    # explicit override takes the guess out: no probe is attempted (the
    # local events table is 'us', and the override says so -> plain
    # pinned read with the declared timestamp type)
    df = read_timestamp_table(
        spark,
        "/root/testdata/sf0.001/events.parquet",
        schema,
        ["ts"],
        units={"ts": "us"},
    )
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    # The 100 TB shape: fact partitioned on the join key's functional
    # image, dimension filtered on an attribute — Spark must inject a
    # dynamicpruningexpression into the fact scan so only the dim's
    # surviving partitions are listed/read at runtime (star-schema
    # queries at scale live or die on this).
    import pyspark.sql.functions as F

    fact_dir = str(tmp_path / "fact")
    spark.range(0, 10000).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).alias("p"),
        (F.col("id") * 3).alias("v"),
    ).write.partitionBy("p").mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.range(0, 20).select(
        F.col("id").alias("p"), (F.col("id") % 4).alias("grp")
    )
    joined = fact.join(dim.filter(F.col("grp") == 1), "p").agg(
        F.sum("v").alias("s")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result is correct
    want = sum(i * 3 for i in range(10000) if (i % 20) % 4 == 1)
    assert joined.collect()[0]["s"] == want


def test_orc_round_trip_with_partitions(spark, tmp_path, sf_dir):
    import pyspark.sql.functions as F

    from ml_pipelines_spark.io import read_orc, write_orc

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    d = str(tmp_path / "orders_orc")
    write_orc(orders, d, partition_by=["o_orderstatus"])
    back = read_orc(spark, d)
    assert back.count() == orders.count()
    got = {
        r.o_orderstatus: r.s
        for r in back.groupBy("o_orderstatus")
        .agg(F.sum("o_orderkey").alias("s"))
        .collect()
    }
    want = {
        r.o_orderstatus: r.s
        for r in orders.groupBy("o_orderstatus")
        .agg(F.sum("o_orderkey").alias("s"))
        .collect()
    }
    assert got == want
    # partition pruning works on the ORC layout too
    plan = (
        back.filter(F.col("o_orderstatus") == "O")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan or "o_orderstatus" in plan
