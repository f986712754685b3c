"""Bucketed co-located joins (operators/bucketing.py): the physical
claim — a join between tables bucketed on the join key plans with NO
shuffle on either side — plus value equality with the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.bucketing import (
    count_exchanges,
    session_table_name,
    write_bucketed_table,
)


def _frames(spark):
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("a")
    )
    right = spark.range(0, 10000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("b")
    )
    return left, right


def test_bucketed_join_has_no_shuffle(spark):
    left, right = _frames(spark)
    lt = session_table_name(spark, "t_bkt_l", "unit")
    rt = session_table_name(spark, "t_bkt_r", "unit")
    try:
        write_bucketed_table(left, lt, "k", 4)
        write_bucketed_table(right, rt, "k", 4)
        lb, rb = spark.table(lt), spark.table(rt)
        joined = lb.hint("merge").join(rb, "k").select("k", "a", "b")
        # co-located: ZERO exchanges anywhere in the join plan
        assert count_exchanges(joined) == 0
        # the plain (unbucketed) join shuffles both sides
        plain = (
            left.hint("merge")
            .join(right, "k")
            .select("k", "a", "b")
        )
        assert count_exchanges(plain) >= 2
        # same values either way
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
        # an aggregate ON the bucket key also rides the bucketing
        # (no pre-aggregate exchange on the scan side)
        agg = lb.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        assert count_exchanges(agg) == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_query_plan_and_values(spark, sf_dir):
    from ml_pipelines_spark.queries import QUERIES
    from ml_pipelines_spark.queries.relational import t

    df = QUERIES["bucketed_join_revenue"](spark, sf_dir)
    # one exchange total: the final groupBy(o_orderpriority) — none for
    # the join itself
    assert count_exchanges(df) == 1
    got = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in df.collect()
    }
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    exp = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ),
                    2,
                ).alias("revenue"),
            )
            .collect()
        )
    }
    assert got == exp
