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
