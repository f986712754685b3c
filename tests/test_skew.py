"""Salted skew join: result equality with the plain join, salt spread,
and edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_pipelines_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed_inputs(spark):
    # 10k rows, 90% on one hot key
    big = spark.range(10000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k",
        "id AS payload",
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(7)], "k long, name string"
    )
    return big, small


def test_matches_unsalted_inner(spark, skewed_inputs):
    big, small = skewed_inputs
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, ["k"], factor=8).select(
        "k", "payload", "name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_matches_unsalted_left(spark, skewed_inputs):
    big, small = skewed_inputs
    # drop key 0 from the dim so left join has misses on the hot key
    small_missing = small.filter(F.col("k") != 0)
    plain = big.join(small_missing, "k", "left").select("k", "payload", "name")
    salted = salted_join(big, small_missing, ["k"], factor=8, how="left").select(
        "k", "payload", "name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_actually_spreads_hot_key(spark, skewed_inputs):
    big, _ = skewed_inputs
    other = [c for c in big.columns if c != "k"]
    salts = (
        big.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in other]), F.lit(8))
        )
        .filter(F.col("k") == 0)
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 8  # the hot key occupies every salt bucket


def test_factor_one_is_plain_join(spark, skewed_inputs):
    big, small = skewed_inputs
    plain = big.join(small, "k").count()
    assert salted_join(big, small, ["k"], factor=1).count() == plain


def test_invalid_args(spark, skewed_inputs):
    big, small = skewed_inputs
    with pytest.raises(ValueError, match="factor"):
        salted_join(big, small, ["k"], factor=0)
    with pytest.raises(ValueError, match="how"):
        salted_join(big, small, ["k"], factor=2, how="full")


def test_aqe_splits_skewed_join_partitions(spark):
    # The runtime half of the skew story (salted_join is the manual
    # half): under AQE, a hot join key must be detected from runtime
    # stats and the skewed partition SPLIT — the executed plan carries
    # SortMergeJoin(skew=true) with an AQEShuffleRead marked skewed.
    # Thresholds are lowered to make test-sized data exhibit the
    # production shape; values are asserted against the plain join.
    import pyspark.sql.functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32k",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(0, 300000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(dim, "k").agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        got = j.collect()[0]["s"]
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        # and splitting never changes the answer
        want = sum(
            i + 2 * (7 if i % 10 < 9 else i % 100)
            for i in range(300000)
            if (7 if i % 10 < 9 else i % 100) < 100
        )
        assert got == want
    finally:
        for k, val in saved.items():
            if val is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, val)
