"""Bloom-filter semi-join pruning (operators.bloom).

Checks the two properties that make the operator safe and worth it:
no false negatives (the pruned-then-joined result equals the plain
semi-join row-for-row) and real pruning (the bloom survivor count is
close to the true match count, far below the full table).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.bloom import (
    bloom_might_contain,
    bloom_prune,
    bloom_semi_join,
    build_bloom,
)


def _keys(spark, sf_dir):
    from ml_pipelines_spark.queries.relational import t

    return (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 200000)
        )
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )


def test_semi_join_equality(spark, sf_dir):
    from ml_pipelines_spark.queries.relational import t

    li = t(spark, sf_dir, "lineitem")
    keys = _keys(spark, sf_dir)
    got = bloom_semi_join(li, keys, ["l_orderkey"]).select("l_orderkey", "l_linenumber")
    want = li.join(keys.distinct(), "l_orderkey", "left_semi").select(
        "l_orderkey", "l_linenumber"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_no_false_negatives_and_prunes(spark, sf_dir):
    from ml_pipelines_spark.queries.relational import t

    li = t(spark, sf_dir, "lineitem")
    keys = _keys(spark, sf_dir)
    total = li.count()
    true_matches = li.join(keys.distinct(), "l_orderkey", "left_semi").count()
    survivors = bloom_prune(li, keys, ["l_orderkey"]).count()
    # superset of the true matches, but not by much (fpp-bounded)
    assert survivors >= true_matches
    assert survivors <= true_matches + max(50, int(0.05 * total))
    assert survivors < total  # it actually pruned something


def test_membership_predicate_exact_on_members(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    members = df.filter(F.col("k") < 100)
    words = build_bloom(members, ["k", "g"], num_bits=1 << 12)
    hits = df.filter(bloom_might_contain(words, ["k", "g"])).count()
    assert hits >= 100  # every member passes
    assert hits < 1000  # non-members mostly rejected


def test_multi_column_keys(spark):
    big = spark.range(0, 5000).select(
        (F.col("id") % 50).alias("a"), (F.col("id") % 11).alias("b"), "id"
    )
    keys = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["a", "b"])
    got = bloom_semi_join(big, keys, ["a", "b"])
    want = big.join(keys, ["a", "b"], "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
