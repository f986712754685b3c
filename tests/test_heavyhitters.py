"""Two-pass exact heavy hitters: candidate superset guarantee + exact
final counts, partition-layout invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_pipelines_spark.operators.heavyhitters import (
    exact_heavy_hitters,
    heavy_hitter_candidates,
)


def _zipfish(spark, n=20000):
    # value v = floor(sqrt(id)): counts grow linearly with v — a
    # deterministic skew with many near-threshold values
    return spark.range(0, n).select(
        F.floor(F.sqrt(F.col("id"))).cast("long").alias("v")
    )


def _exact(df, phi):
    total = df.count()
    return {
        (r["v"], r["cnt"])
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > phi * total)
        .collect()
    }


def test_matches_exact_groupby(spark):
    df = _zipfish(spark)
    phi = 0.005
    got = {
        (r["v"], r["cnt"])
        for r in exact_heavy_hitters(df, "v", phi).collect()
    }
    assert got == _exact(df, phi)
    assert got  # non-degenerate: hitters exist at this phi


def test_candidates_are_superset_of_hitters(spark):
    df = _zipfish(spark)
    phi = 0.01
    cand = {
        r["v"]
        for r in heavy_hitter_candidates(df, "v", phi)
        .distinct()
        .collect()
    }
    hitters = {v for v, _ in _exact(df, phi)}
    assert hitters <= cand


def test_partition_layout_invariance(spark):
    df = _zipfish(spark)
    phi = 0.005
    a = {
        tuple(r)
        for r in exact_heavy_hitters(
            df.repartition(1), "v", phi
        ).collect()
    }
    b = {
        tuple(r)
        for r in exact_heavy_hitters(
            df.repartition(13), "v", phi
        ).collect()
    }
    assert a == b == _exact(df, phi)


def test_adversarial_spread_value_still_found(spark):
    # a hitter spread PERFECTLY EVENLY across partitions — the case a
    # per-partition top-1-style heuristic can miss but the averaging
    # guarantee cannot: share > phi globally implies share > 1/k in
    # some batch
    base = spark.range(0, 9000).select(
        (F.col("id") % 3000).alias("v")  # 3000 values, 3 rows each
    )
    heavy = spark.range(0, 1000).select(
        F.lit(99999).cast("long").alias("v")  # 10% of the total
    )
    df = base.unionByName(heavy).repartition(16)
    got = exact_heavy_hitters(df, "v", 0.05).collect()
    assert [(r["v"], r["cnt"]) for r in got] == [(99999, 1000)]


def test_string_column(spark):
    df = spark.range(0, 5000).select(
        F.concat(
            F.lit("u"), (F.floor(F.sqrt(F.col("id")))).cast("string")
        ).alias("v")
    )
    phi = 0.01
    got = {
        (r["v"], r["cnt"])
        for r in exact_heavy_hitters(df, "v", phi).collect()
    }
    assert got == _exact(df, phi)
    assert got


def test_null_heavy_hitter_found(spark):
    # ADVICE r10: a NULL above the threshold must be reported exactly
    # like groupBy().count() would report it — pandas value_counts
    # dropped it and the equi semi-join never matched it
    base = spark.range(0, 900).select((F.col("id") % 300).alias("v"))
    nulls = spark.range(0, 100).select(F.lit(None).cast("long").alias("v"))
    df = base.unionByName(nulls).repartition(8)
    got = {(r["v"], r["cnt"]) for r in exact_heavy_hitters(df, "v", 0.05).collect()}
    assert got == {(None, 100)}


def test_null_string_heavy_hitter(spark):
    base = spark.range(0, 900).select(
        F.concat(F.lit("u"), (F.col("id") % 300).cast("string")).alias("v")
    )
    nulls = spark.range(0, 100).select(F.lit(None).cast("string").alias("v"))
    df = base.unionByName(nulls).repartition(8)
    got = {(r["v"], r["cnt"]) for r in exact_heavy_hitters(df, "v", 0.05).collect()}
    assert got == {(None, 100)}


def test_two_scans_not_three(spark):
    # the returned plan reads the input ONCE (pass 2); pass 1 is the
    # cached candidate/total job — so two scans total, with no separate
    # df.count() third scan. The swap_cache'd pass-1 frame prints its
    # full lineage inside the InMemoryRelation block (unlike the old
    # localCheckpoint's truncated LogicalRDD), but at runtime the
    # InMemoryTableScan reads materialized blocks — discount one
    # printed subtree per InMemoryRelation.
    df = _zipfish(spark)
    plan = (
        exact_heavy_hitters(df, "v", 0.005)
        ._jdf.queryExecution().executedPlan().toString()
    )
    cached_prints = plan.count("InMemoryRelation")
    assert plan.count("InMemoryTableScan") >= 1
    assert plan.count("Range (0, 20000") - cached_prints <= 1
